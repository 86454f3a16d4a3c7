"""Fused bidirectional RNN scans (GRU and ZoneoutLSTM) in one Pallas kernel.

The CBHG's BiGRU and the ZoneoutEncoderV1's BiLSTM are 2×S-step
sequential scans; under XLA on the serving path each step costs ~4
dispatched ops (~50 µs each on the bench v5e —
scripts/profile_decode.py), putting the encoder at ~26 ms for S=128.
Inside one kernel the same scan runs at MXU speed with weights resident
in VMEM (~1 ms). Both directions advance in the same loop iteration
(independent carries; the backward pass iterates S-1→0 directly, skipping
per-lane padding, which is equivalent to reverse→scan→reverse).

Numerics and gate order mirror models.modules.GRUCell /
ZoneoutLSTMCell (eval semantics) exactly.
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


# --------------------------------------------------------------------------- #
# Bidirectional ZoneoutLSTM (eval semantics) — ZoneoutEncoderV1 path
# --------------------------------------------------------------------------- #


def _make_lstm_kernel(S: int, B: int, C: int, H: int, io_dtype, zc: float, zo: float):
    def lstm_step(x_t, c, h, w, b):
        inp = jnp.concatenate([x_t, h.astype(io_dtype)], axis=-1)
        z = jnp.dot(inp, w[:], preferred_element_type=jnp.float32) + b[:].astype(
            jnp.float32
        )
        i, g, f, o = jnp.split(z, 4, axis=-1)
        new_c = jax.nn.sigmoid(f + 1.0) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        new_h = jax.nn.sigmoid(o) * jnp.tanh(new_c)
        return zc * c + (1.0 - zc) * new_c, zo * h + (1.0 - zo) * new_h

    def kernel(
        xs_ref,        # (S, B, C) io_dtype
        len_ref,       # (B, 1) i32
        w_f, b_f, w_b, b_b,
        yf_ref, yb_ref,  # (S, B, H) io_dtype out
    ):
        lengths = len_ref[:]

        def body(s, carry):
            cf, hf, cb, hb = carry
            x_t = xs_ref[s]
            ncf, nhf = lstm_step(x_t, cf, hf, w_f, b_f)
            valid_f = (s < lengths).astype(jnp.float32)
            cf = valid_f * ncf + (1.0 - valid_f) * cf
            hf = valid_f * nhf + (1.0 - valid_f) * hf
            yf_ref[s] = (hf * valid_f).astype(io_dtype)

            sb = S - 1 - s
            x_b = xs_ref[sb]
            ncb, nhb = lstm_step(x_b, cb, hb, w_b, b_b)
            valid_b = (sb < lengths).astype(jnp.float32)
            cb = valid_b * ncb + (1.0 - valid_b) * cb
            hb = valid_b * nhb + (1.0 - valid_b) * hb
            yb_ref[sb] = (hb * valid_b).astype(io_dtype)
            return cf, hf, cb, hb

        zero = jnp.zeros((B, H), jnp.float32)
        jax.lax.fori_loop(0, S, body, (zero, zero, zero, zero))

    return kernel


@functools.partial(
    jax.jit, static_argnames=("hidden", "zoneout_cell", "zoneout_output", "interpret")
)
def bilstm_pallas(
    xs: jnp.ndarray,              # (B, S, C)
    lengths: jnp.ndarray,         # (B,)
    params_fwd,                   # {"gates": {"kernel", "bias"}}
    params_bwd,
    *,
    hidden: int,
    zoneout_cell: float = 0.0,
    zoneout_output: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused bidirectional ZoneoutLSTM, eval-mode zoneout interpolation."""
    B, S, C = xs.shape
    H = hidden
    io_dtype = xs.dtype if xs.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32

    def w(x):
        return jnp.asarray(x, io_dtype)

    operands = (
        xs.transpose(1, 0, 2).astype(io_dtype),
        lengths.reshape(B, 1).astype(jnp.int32),
        w(params_fwd["gates"]["kernel"]), w(params_fwd["gates"]["bias"]),
        w(params_bwd["gates"]["kernel"]), w(params_bwd["gates"]["bias"]),
    )
    yf, yb = pl.pallas_call(
        _make_lstm_kernel(S, B, C, H, io_dtype, zoneout_cell, zoneout_output),
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
