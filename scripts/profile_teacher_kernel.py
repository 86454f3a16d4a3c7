#!/usr/bin/env python
"""Device-time of the fused teacher-forced decode kernel (fwd + bwd).

Flagship shapes (batch 32, S=128, N=400 decoder steps ≡ 800 frames at
r=2). Compares against the XLA-scan training step's measured cost
(BASELINE.md). Prints one JSON line with fwd-only and fwd+bwd device ms.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_teacher_kernel.py
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

from scripts.analyze_xplane import find_xplane, load_hlo_stats
from self_attention_tacotron_tpu.ops import fused_teacher

B, S, N = 32, 128, 400
F, P1, P2 = 80, 256, 128
AU, A1, A2, DU = 256, 224, 32, 256
E1 = E2 = 256


def device_busy_ms(profile_dir: str) -> float:
    rows = load_hlo_stats(find_xplane(profile_dir))
    return sum(r["self_us"] or 0.0 for r in rows) / 1e3


def main():
    rng = np.random.RandomState(0)
    r = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.1)
    a_tot = A1 + A2
    in_att = P2 + E1 + E2 + AU
    in1 = AU + E1 + E2 + DU
    weights = dict(
        w_p1=r(F, P1), b_p1=r(P1), w_p2=r(P1, P2), b_p2=r(P2),
        w_attg=r(in_att, 4 * AU), b_attg=r(4 * AU),
        w_qp=r(AU, a_tot), vblk=r(a_tot, 2),
        w_ta=r(E1 + AU, 1), b_ta=r(1),
        w_l1=r(in1, 4 * DU), b_l1=r(4 * DU),
        w_l2=r(2 * DU, 4 * DU), b_l2=r(4 * DU),
    )
    keys = r(B, S, a_tot)
    mem1, mem2 = r(B, S, E1), r(B, S, E2)
    bias = jnp.zeros((B, S), jnp.float32)
    feeds = r(B, N, F)
    hp_like = dict(
        dual=True, use_ta=False, prenet_units=(P1, P2),
        att_units=AU, att1_units=A1, att2_units=A2, dec_units=DU,
        zoneout_cell=0.1, zoneout_output=0.1, prenet_drop_rate=0.5,
        io_dtype="bfloat16",
    )

    @jax.jit
    def fwd(weights, keys, mem1, mem2, feeds):
        f, a = fused_teacher.teacher_decode(
            weights=weights, keys=keys, mem1=mem1, mem2=mem2,
            score_bias=bias, spk=None, feeds=feeds,
            seed=jnp.asarray(7, jnp.int32), hp_like=hp_like,
        )
        return jnp.sum(f) + jnp.sum(a)

    @jax.jit
    def fwdbwd(weights, keys, mem1, mem2, feeds):
        def loss(w, k, m1, m2):
            f, a = fused_teacher.teacher_decode(
                weights=w, keys=k, mem1=m1, mem2=m2,
                score_bias=bias, spk=None, feeds=feeds,
                seed=jnp.asarray(7, jnp.int32), hp_like=hp_like,
            )
            return jnp.sum(f * f) + jnp.sum(a)

        return jax.grad(loss, argnums=(0, 1, 2, 3))(weights, keys, mem1, mem2)

    results = {}
    for name, fn, args in (
        ("fwd", fwd, (weights, keys, mem1, mem2, feeds)),
        ("fwdbwd", fwdbwd, (weights, keys, mem1, mem2, feeds)),
    ):
        out = fn(*args)
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        assert np.isfinite(np.asarray(leaf)).all()
        pdir = f"/tmp/prof_teacher_{name}"
        os.system(f"rm -rf {pdir}")
        with jax.profiler.trace(pdir):
            out = fn(*args)
            jax.block_until_ready(out)
        _ = np.asarray(jax.tree.leaves(out)[0])
        ms = device_busy_ms(pdir)
        results[name] = round(ms, 3)
        print(f"[{name}] device_busy={ms:.2f} ms", file=sys.stderr)
    print(json.dumps({"device_busy_ms": results,
                      "per_decoder_step_us": {
                          k: round(v * 1e3 / N, 2) for k, v in results.items()}}))


if __name__ == "__main__":
    main()
