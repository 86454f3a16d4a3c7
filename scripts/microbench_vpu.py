#!/usr/bin/env python
"""Micro-benchmark the VPU primitives that dominate the fused decode step.

Each variant runs the op ITERS times inside ONE Pallas kernel (a fori_loop
with a data dependence so nothing folds away), profiled by device time.
Purpose: establish the per-step floor for the source-attention block —
scripts/profile_kernel_ablate.py attributes 14.9 µs/step to it; this
decomposes that into tanh / score-matmul / softmax / context-reduce costs
at the exact bench shapes (B=32, S=128, A1=224, E=256).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/microbench_vpu.py
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts.analyze_xplane import find_xplane, load_hlo_stats

B, S, A1, E = 32, 128, 224, 256
ITERS = 500


def _loop_kernel(op):
    """op(x_vec, refs...) -> (B,) f32 update; looped ITERS times."""

    def kernel(*refs):
        out_ref = refs[-1]

        def body(i, acc):
            return op(acc, i, refs[:-1])

        out_ref[:] = jax.lax.fori_loop(
            0, ITERS, body, jnp.zeros((B, 128), jnp.float32)
        )

    return kernel


def run_case(name, op, operands):
    kernel = _loop_kernel(op)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    fj = jax.jit(f)
    out = fj(*operands)
    jax.block_until_ready(out)
    pdir = f"/tmp/micro_{name}"
    os.system(f"rm -rf {pdir}")
    with jax.profiler.trace(pdir):
        out = fj(*operands)
        jax.block_until_ready(out)
    rows = load_hlo_stats(find_xplane(pdir))
    ms = sum(r["self_us"] or 0.0 for r in rows) / 1e3
    us_per_iter = ms * 1e3 / ITERS
    print(f"[{name}] {ms:.3f} ms total, {us_per_iter:.2f} us/iter", file=sys.stderr)
    return us_per_iter


def main():
    rng = np.random.RandomState(0)
    keys = jnp.asarray(rng.randn(B, S, A1) * 0.1, jnp.bfloat16)
    keys_f32 = keys.astype(jnp.float32)
    v = jnp.asarray(rng.randn(A1, 1) * 0.1, jnp.float32)
    mem = jnp.asarray(rng.randn(B, S, E) * 0.1, jnp.bfloat16)

    def feed(acc, i):
        # (B, 128) f32 -> (B, A1) query-like vector, data-dependent on acc
        return (
            jnp.broadcast_to(acc[:, :1], (B, A1)) * 1e-3
            + i.astype(jnp.float32) * 1e-6
        )

    results = {}

    def baseline(acc, i, refs):
        return acc + 1e-6

    results["empty_loop"] = run_case("empty", baseline, [keys])

    def tanh_only(acc, i, refs):
        (k,) = refs
        q = feed(acc, i)
        t = jnp.tanh(k[:].astype(jnp.float32) + q[:, None, :])
        return acc + jnp.sum(t, axis=1)[:, :128] * 1e-6

    results["tanh_bf16keys"] = run_case("tanh", tanh_only, [keys])

    def tanh_f32keys(acc, i, refs):
        (k,) = refs
        q = feed(acc, i)
        t = jnp.tanh(k[:] + q[:, None, :])
        return acc + jnp.sum(t, axis=1)[:, :128] * 1e-6

    results["tanh_f32keys"] = run_case("tanhf32", tanh_f32keys, [keys_f32])

    def add_only(acc, i, refs):
        (k,) = refs
        q = feed(acc, i)
        t = k[:].astype(jnp.float32) + q[:, None, :]
        return acc + jnp.sum(t, axis=1)[:, :128] * 1e-6

    results["add_reduce_only"] = run_case("add", add_only, [keys])

    def full_score(acc, i, refs):
        k, vv = refs
        q = feed(acc, i)
        t = jnp.tanh(k[:].astype(jnp.float32) + q[:, None, :])
        e = jnp.dot(
            t.reshape(B * S, A1), vv[:], preferred_element_type=jnp.float32
        ).reshape(B, S)
        a = jax.nn.softmax(e, axis=-1)
        return acc + a * 1e-6

    results["score_softmax"] = run_case("score", full_score, [keys, v])

    def ctx_reduce(acc, i, refs):
        (m,) = refs
        alpha = jax.nn.softmax(acc[:, :128] * 1e-2, axis=-1)  # (B, S)
        c = jnp.sum(alpha[:, :, None] * m[:].astype(jnp.float32), axis=1)
        return acc + c[:, :128] * 1e-6

    results["context_reduce"] = run_case("ctx", ctx_reduce, [mem])

    net = {
        k: round(v - results["empty_loop"], 2)
        for k, v in results.items()
        if k != "empty_loop"
    }
    print(json.dumps({"us_per_iter": {k: round(v, 2) for k, v in results.items()},
                      "net_us_per_iter": net}))


if __name__ == "__main__":
    main()
