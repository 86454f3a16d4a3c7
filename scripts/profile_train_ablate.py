#!/usr/bin/env python
"""Attribute the teacher-forced training step's device time.

Variants toggle the per-step stochastic work inside the decoder scan
(zoneout masks, prenet dropout) and the compute dtype, each profiled by
DEVICE time in one process (wall clock under-reports on this backend —
block_until_ready returns early; see BASELINE.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train_ablate.py [specs]

A spec is ``variant[:bNN][:fNNN]`` — e.g. ``full``, ``ls:b32``,
``full:b64``, ``xla:b64:f800``. ``bNN`` overrides the batch (default 32),
``fNNN`` the teacher-forced frame count (default 800). Round-4 rows:
``ls`` trains the location-sensitive comparison family through the fused
LS teacher kernel (VERDICT r3 missing #2); ``full:b64`` exercises the
teacher kernel's sequential batch-block slicing (missing #3); ``xla:*``
is the nn.scan fallback (use_pallas_kernels=false) for the same shapes.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from self_attention_tacotron_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bench import flagship_hparams
from scripts.analyze_xplane import find_xplane, load_hlo_stats
from self_attention_tacotron_tpu.models.models import tacotron_model_factory
from self_attention_tacotron_tpu.training.schedules import make_optimizer
from self_attention_tacotron_tpu.training.trainer import TrainState

B, SRC, FRAMES = 32, 128, 800

VARIANTS = {
    "full": {},
    "ls": dict(attention="location_sensitive"),
    # TAP-build attribution: the in-kernel location-feature TAP matrix is
    # built with one masked roll + 1-lane VMEM store PER TAP per step
    # (fwd, bwd recompute, and adjoint scatter); shrinking the kernel from
    # 31 to 3 taps scales that cost ~10x while the folded matmul and the
    # rest of the step stay ~constant
    "ls_k3": dict(attention="location_sensitive", attention_kernel=3),
    # previous- instead of cumulative-alignment conv input: drops the
    # cumulative-field carry stream
    "ls_prev": dict(attention="location_sensitive", cumulative_weights=False),
    "xla": dict(use_pallas_kernels=False),
    "ls_xla": dict(attention="location_sensitive", use_pallas_kernels=False),
    "no_zoneout": dict(zoneout_factor_cell=0.0, zoneout_factor_output=0.0),
    "no_dropout": dict(
        decoder_prenet_drop_rate=0.0,
        encoder_prenet_drop_rate=0.0,
        decoder_self_attention_drop_rate=0.0,
        self_attention_drop_rate=0.0,
    ),
    "no_rng": dict(
        zoneout_factor_cell=0.0, zoneout_factor_output=0.0,
        decoder_prenet_drop_rate=0.0, encoder_prenet_drop_rate=0.0,
        decoder_self_attention_drop_rate=0.0, self_attention_drop_rate=0.0,
    ),
}


def device_busy_ms(profile_dir: str) -> float:
    rows = load_hlo_stats(find_xplane(profile_dir))
    return sum(r["self_us"] or 0.0 for r in rows) / 1e3


def build_step(hp, batch_size=B, frames=FRAMES):
    model = tacotron_model_factory(hp)
    net = model.network(is_training=True)
    rng = np.random.RandomState(0)
    batch = {
        "source": jnp.asarray(
            rng.randint(2, hp.num_symbols, (batch_size, SRC)), jnp.int32
        ),
        "source_lengths": jnp.full((batch_size,), SRC, jnp.int32),
        "mel": jnp.asarray(
            rng.rand(batch_size, frames, hp.num_mels), jnp.float32
        ),
        "target_lengths": jnp.full((batch_size,), frames, jnp.int32),
        "done": jnp.zeros((batch_size, frames), jnp.float32),
    }
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "zoneout": jax.random.PRNGKey(2),
    }
    variables = net.init(
        rngs, batch["source"], batch["source_lengths"], batch["mel"],
        batch["target_lengths"],
    )
    tx = make_optimizer(hp)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats", {}),
    )

    @jax.jit
    def train_step(state, b, rng):
        def loss_fn(p):
            vs = {"params": p}
            if state.batch_stats:
                vs["batch_stats"] = state.batch_stats
            out, mut = net.apply(
                vs, b["source"], b["source_lengths"], b["mel"],
                b["target_lengths"],
                rngs={"dropout": rng, "zoneout": jax.random.fold_in(rng, 1)},
                mutable=["batch_stats"],
            )
            losses = model.loss(out, b, params=p)
            return losses["loss"], mut.get("batch_stats", {})

        grads, new_stats = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        return TrainState(
            step=state.step + 1,
            params=optax.apply_updates(state.params, updates),
            opt_state=new_opt,
            batch_stats=new_stats,
        )

    return train_step, state, batch


def parse_spec(spec: str):
    parts = spec.split(":")
    name, batch, frames = parts[0], B, FRAMES
    for p in parts[1:]:
        if p.startswith("b"):
            batch = int(p[1:])
        elif p.startswith("f"):
            frames = int(p[1:])
        else:
            raise SystemExit(f"bad spec component {p!r} in {spec!r}")
    return name, batch, frames


def main():
    specs = sys.argv[1].split(",") if len(sys.argv) > 1 else list(VARIANTS)
    results = {}
    for spec in specs:
        name, batch_size, frames = parse_spec(spec)
        hp = flagship_hparams()
        for k, v in VARIANTS[name].items():
            setattr(hp, k, v)
        step, state, batch = build_step(hp, batch_size, frames)
        key = jax.random.PRNGKey(5)
        state = step(state, batch, key)  # compile + warm
        jax.block_until_ready(state.params)
        pdir = f"/tmp/prof_train_{spec.replace(':', '_')}"
        os.system(f"rm -rf {pdir}")
        with jax.profiler.trace(pdir):
            state = step(state, batch, jax.random.fold_in(key, 1))
            jax.block_until_ready(state.params)
        # hard materialization so the traced step really finished
        _ = float(jax.tree.leaves(state.params)[0].sum())
        ms = device_busy_ms(pdir)
        results[spec] = round(ms, 3)
        n_steps = frames // hp.outputs_per_step
        if ms > 0:
            fps = batch_size * frames / (ms / 1e3)
            print(f"[{spec}] device_busy={ms:.2f} ms "
                  f"({ms * 1e3 / n_steps:.1f} us/decoder-step, "
                  f"{fps / 1e6:.2f} M frames/s)", file=sys.stderr)
        else:  # empty xplane capture — keep the other variants' results
            print(f"[{spec}] EMPTY device capture", file=sys.stderr)
    print(json.dumps({"device_busy_ms": results}))


if __name__ == "__main__":
    main()
