"""Fused bidirectional GRU: the whole scan in one Pallas kernel.

The CBHG's BiGRU is a 2×S-step sequential scan; under XLA on the serving
path each step costs ~4 dispatched ops (~50 µs each on the bench v5e —
scripts/profile_decode.py), putting the encoder at ~26 ms for S=128.
Inside one kernel the same scan runs at MXU speed with weights resident
in VMEM (~1 ms). Both directions advance in the same loop iteration
(independent carries; the backward pass iterates S-1→0 directly, skipping
per-lane padding, which is equivalent to reverse→scan→reverse).

Numerics and gate order mirror models.modules.GRUCell exactly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(S: int, B: int, C: int, H: int, io_dtype):
    def gru_step(x_t, h, wg, bg, wc, bc):
        inp = jnp.concatenate([x_t, h.astype(io_dtype)], axis=-1)
        rz = jax.nn.sigmoid(
            jnp.dot(inp, wg[:], preferred_element_type=jnp.float32)
            + bg[:].astype(jnp.float32)
        )
        r, z = rz[:, :H], rz[:, H:]
        inp2 = jnp.concatenate([x_t, (r * h).astype(io_dtype)], axis=-1)
        n = jnp.tanh(
            jnp.dot(inp2, wc[:], preferred_element_type=jnp.float32)
            + bc[:].astype(jnp.float32)
        )
        return (1.0 - z) * n + z * h

    def kernel(
        xs_ref,        # (S, B, C) io_dtype
        len_ref,       # (B, 1) i32
        wg_f, bg_f, wc_f, bc_f,
        wg_b, bg_b, wc_b, bc_b,
        yf_ref,        # (S, B, H) io_dtype out
        yb_ref,        # (S, B, H) io_dtype out
    ):
        lengths = len_ref[:]  # (B, 1)

        def body(s, carry):
            h_f, h_b = carry
            # forward
            x_t = xs_ref[s]
            new_f = gru_step(x_t, h_f, wg_f, bg_f, wc_f, bc_f)
            valid_f = (s < lengths).astype(jnp.float32)
            h_f = valid_f * new_f + (1.0 - valid_f) * h_f
            yf_ref[s] = (h_f * valid_f).astype(io_dtype)
            # backward (iterates S-1 → 0; padding tail leaves carry at init)
            sb = S - 1 - s
            x_b = xs_ref[sb]
            new_b = gru_step(x_b, h_b, wg_b, bg_b, wc_b, bc_b)
            valid_b = (sb < lengths).astype(jnp.float32)
            h_b = valid_b * new_b + (1.0 - valid_b) * h_b
            yb_ref[sb] = (h_b * valid_b).astype(io_dtype)
            return h_f, h_b

        zero = jnp.zeros((B, H), jnp.float32)
        jax.lax.fori_loop(0, S, body, (zero, zero))

    return kernel


@functools.partial(jax.jit, static_argnames=("hidden", "interpret"))
def bigru_pallas(
    xs: jnp.ndarray,              # (B, S, C)
    lengths: jnp.ndarray,         # (B,)
    params_fwd,                   # {"gates": {...}, "candidate": {...}}
    params_bwd,
    *,
    hidden: int,
    interpret: bool = False,
) -> jnp.ndarray:
    B, S, C = xs.shape
    H = hidden
    io_dtype = xs.dtype if xs.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32

    def w(x):
        return jnp.asarray(x, io_dtype)

    operands = (
        xs.transpose(1, 0, 2).astype(io_dtype),     # (S, B, C)
        lengths.reshape(B, 1).astype(jnp.int32),
        w(params_fwd["gates"]["kernel"]), w(params_fwd["gates"]["bias"]),
        w(params_fwd["candidate"]["kernel"]), w(params_fwd["candidate"]["bias"]),
        w(params_bwd["gates"]["kernel"]), w(params_bwd["gates"]["bias"]),
        w(params_bwd["candidate"]["kernel"]), w(params_bwd["candidate"]["bias"]),
    )
    yf, yb = pl.pallas_call(
        _make_kernel(S, B, C, H, io_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((S, B, H), io_dtype),
            jax.ShapeDtypeStruct((S, B, H), io_dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(*operands)
    return jnp.concatenate([yf, yb], axis=-1).transpose(1, 0, 2).astype(xs.dtype)
