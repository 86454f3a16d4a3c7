#!/usr/bin/env python
"""In-kernel cost breakdown of the fused AR decode via its ablate switches.

Runs the fused kernel with ablate in {none, sa, srcattn, prenet} in ONE
process, captures an xplane profile per variant, and reports each
variant's DEVICE-busy time (wall clock on this backend is 70-90%
host/transport noise — BASELINE.md). The difference none-minus-ablated
attributes device time to the ablated component.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_kernel_ablate.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from self_attention_tacotron_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from bench import flagship_hparams
from scripts.analyze_xplane import find_xplane, load_hlo_stats
from self_attention_tacotron_tpu.models.models import (
    TacotronNetwork,
    tacotron_model_factory,
)
from self_attention_tacotron_tpu.ops.fused_decode import fused_decode

B, S, MAX_ITERS = 32, 128, 500


def device_busy_ms(profile_dir: str) -> float:
    rows = load_hlo_stats(find_xplane(profile_dir))
    return sum(r["self_us"] or 0.0 for r in rows) / 1e3


def main():
    hp = flagship_hparams()
    model = tacotron_model_factory(hp)
    net = model.network(is_training=False)
    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.randint(2, hp.num_symbols, (B, S)), jnp.int32)
    src_len = jnp.full((B,), S, jnp.int32)
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "zoneout": jax.random.PRNGKey(2),
    }
    targets = jnp.zeros((B, hp.outputs_per_step * 2, hp.num_mels))
    variables = net.init(
        rngs, source, src_len, targets, jnp.full((B,), targets.shape[1], jnp.int32)
    )
    cond, _ = net.apply(
        variables, source, src_len, None, None,
        method=TacotronNetwork.encode, rngs={"dropout": jax.random.PRNGKey(3)},
    )

    variants = sys.argv[1].split(",") if len(sys.argv) > 1 else [
        "none", "sa", "srcattn", "prenet"
    ]
    results = {}
    conds = {B: cond}
    for spec in variants:
        # spec: "<ablate>[:ch<chunk>][:b<batch>]" e.g. "none:ch64:b64"
        parts = spec.split(":")
        ablate, chunk, bsz = parts[0], 64, B
        for part in parts[1:]:
            if part.startswith("ch"):
                chunk = int(part[2:])
            elif part.startswith("b"):
                bsz = int(part[1:])
        if bsz not in conds:
            src_b = jnp.tile(source, (bsz // B + 1, 1))[:bsz]
            len_b = jnp.full((bsz,), S, jnp.int32)
            conds[bsz], _ = net.apply(
                variables, src_b, len_b, None, None,
                method=TacotronNetwork.encode,
                rngs={"dropout": jax.random.PRNGKey(3)},
            )

        def run(seed, ablate=ablate, chunk=chunk, bsz=bsz):
            return fused_decode(
                variables=variables, cond=conds[bsz], hp=hp, batch=bsz,
                max_iters=MAX_ITERS, seed=seed, ablate=ablate,
                cache_chunk=chunk,
            )

        run_j = jax.jit(run)
        out = run_j(jnp.zeros((), jnp.int32))  # compile + warm
        jax.block_until_ready(out["frames"]["mel"])
        assert int(out["num_steps"]) == MAX_ITERS
        pdir = f"/tmp/prof_ablate_{spec.replace(':', '_')}"
        os.system(f"rm -rf {pdir}")
        with jax.profiler.trace(pdir):
            out = run_j(jnp.ones((), jnp.int32))
            jax.block_until_ready(out["frames"]["mel"])
        ms = device_busy_ms(pdir)
        results[spec] = round(ms, 3)
        print(f"[ablate={spec}] device_busy={ms:.3f} ms "
              f"({ms * 1e3 / MAX_ITERS:.1f} us/step)", file=sys.stderr)

    if "none" in results:
        full = results["none"]
        attribution = {
            k: round(full - v, 3) for k, v in results.items() if k != "none"
        }
        print(json.dumps({
            "device_busy_ms": results,
            "component_cost_ms": attribution,
            "per_step_us": {k: round(v * 1e3 / MAX_ITERS, 2) for k, v in results.items()},
        }))
    else:
        print(json.dumps({"device_busy_ms": results}))


if __name__ == "__main__":
    main()
