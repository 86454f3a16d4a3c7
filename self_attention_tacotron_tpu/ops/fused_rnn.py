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
import numpy as np
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
# Trainable BiGRU: custom VJP over the fused forward kernel
# --------------------------------------------------------------------------- #
#
# The GRU cell has no train-time stochasticity, so the fused forward is
# exact for training too; what was missing is a backward. Key structure:
# given the forward's masked hidden stacks y, every per-step gate value
# (rz, n) recomputes IN PARALLEL outside the kernel (h_prev is just y
# shifted by one step), as do the weight gradients (one (S·B)-deep MXU
# contraction per matrix) and d_x (two batched matmuls). Only the
# backward carry recursion g_h[t-1] <- f(g_h[t]) is sequential — that
# alone runs in a small Pallas kernel (2 thin matmuls + ~10 VPU ops per
# step per direction), replacing the flax axes_scan whiles that cost
# ~1.1 ms/step of training device time (BASELINE.md round-5
# attribution).


def _make_bwd_carry_kernel(S: int, B: int, C: int, H: int, io_dtype):
    """Sequential adjoint-carry pass for both directions in one loop.

    Direction f ran t = 0..S-1, so its adjoint walks t = S-1..0;
    direction b ran t = S-1..0, so its adjoint walks t = 0..S-1 — both
    directions advance in the same fori iteration, like the forward.
    """

    def dir_step(t, g_carry, g_y_ref, rz_ref, n_ref, hp_ref, lengths,
                 wgh_T, wch_T, g_ag_ref, g_ac_ref):
        v = (t < lengths).astype(jnp.float32)        # (B, 1)
        rz = rz_ref[t]
        r, z = rz[:, :H], rz[:, H:]
        n = n_ref[t]
        hp = hp_ref[t]
        g_h = g_carry + g_y_ref[t].astype(jnp.float32) * v
        g_hat = g_h * v                               # d h_t / d ĥ_t = valid
        g_z = g_hat * (hp - n)
        g_n = g_hat * (1.0 - z)
        g_ac = g_n * (1.0 - n * n)
        g_rh = jnp.dot(
            g_ac.astype(io_dtype), wch_T[:], preferred_element_type=jnp.float32
        )
        g_r = g_rh * hp
        g_ag = jnp.concatenate([g_r, g_z], axis=-1) * rz * (1.0 - rz)
        g_carry_new = (
            g_h * (1.0 - v)                           # carry pass-through
            + g_hat * z                               # ĥ = ... + z·h_prev
            + g_rh * r                                # inp2's r·h_prev
            + jnp.dot(
                g_ag.astype(io_dtype), wgh_T[:],
                preferred_element_type=jnp.float32,
            )                                         # inp's h_prev columns
        )
        g_ag_ref[t] = g_ag
        g_ac_ref[t] = g_ac
        return g_carry_new

    def kernel(
        len_ref,                       # (B, 1) i32
        g_yf_ref, g_yb_ref,            # (S, B, H) upstream grads
        rz_f_ref, n_f_ref, hp_f_ref,   # recomputed fwd internals (f32)
        rz_b_ref, n_b_ref, hp_b_ref,
        wgh_fT, wch_fT, wgh_bT, wch_bT,  # (2H, H) / (H, H) io_dtype
        g_ag_f_ref, g_ac_f_ref,        # (S, B, 2H) / (S, B, H) f32 out
        g_ag_b_ref, g_ac_b_ref,
    ):
        lengths = len_ref[:]

        def body(s, carry):
            gc_f, gc_b = carry
            gc_f = dir_step(
                S - 1 - s, gc_f, g_yf_ref, rz_f_ref, n_f_ref, hp_f_ref,
                lengths, wgh_fT, wch_fT, g_ag_f_ref, g_ac_f_ref,
            )
            gc_b = dir_step(
                s, gc_b, g_yb_ref, rz_b_ref, n_b_ref, hp_b_ref,
                lengths, wgh_bT, wch_bT, g_ag_b_ref, g_ac_b_ref,
            )
            return gc_f, gc_b

        zero = jnp.zeros((B, H), jnp.float32)
        jax.lax.fori_loop(0, S, body, (zero, zero))

    return kernel


def _bigru_primal(cfg, xs_sbc, lengths_b1, pf, pb):
    S, B, C, H, interpret, io_name = cfg
    io_dtype = jnp.bfloat16 if io_name == "bfloat16" else jnp.float32

    def w(x):
        return jnp.asarray(x, io_dtype)

    operands = (
        xs_sbc.astype(io_dtype),
        lengths_b1,
        w(pf["gates"]["kernel"]), w(pf["gates"]["bias"]),
        w(pf["candidate"]["kernel"]), w(pf["candidate"]["bias"]),
        w(pb["gates"]["kernel"]), w(pb["gates"]["bias"]),
        w(pb["candidate"]["kernel"]), w(pb["candidate"]["bias"]),
    )
    return pl.pallas_call(
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bigru(cfg, xs_sbc, lengths_b1, pf, pb):
    return _bigru_primal(cfg, xs_sbc, lengths_b1, pf, pb)


def _bigru_fwd(cfg, xs_sbc, lengths_b1, pf, pb):
    yf, yb = _bigru_primal(cfg, xs_sbc, lengths_b1, pf, pb)
    return (yf, yb), (xs_sbc, lengths_b1, pf, pb, yf, yb)


def _bigru_bwd(cfg, residuals, cotangents):
    S, B, C, H, interpret, io_name = cfg
    io_dtype = jnp.bfloat16 if io_name == "bfloat16" else jnp.float32
    xs, lengths_b1, pf, pb, yf, yb = residuals
    g_yf, g_yb = cotangents
    f32 = jnp.float32
    xs32 = xs.astype(f32)
    yf32, yb32 = yf.astype(f32), yb.astype(f32)

    # h_prev stacks: the forward carry entering step t. y is h masked by
    # validity, and the first masked-out step still sees the last valid
    # hidden, so the shift is exact everywhere gradients are nonzero.
    zrow = jnp.zeros((1, B, H), f32)
    hp_f = jnp.concatenate([zrow, yf32[:-1]], axis=0)
    hp_b = jnp.concatenate([yb32[1:], zrow], axis=0)

    def recompute(p, hp):
        wg, bg = jnp.asarray(p["gates"]["kernel"]), jnp.asarray(p["gates"]["bias"])
        wc, bc = (
            jnp.asarray(p["candidate"]["kernel"]),
            jnp.asarray(p["candidate"]["bias"]),
        )
        inp = jnp.concatenate([xs32, hp], axis=-1)
        rz = jax.nn.sigmoid(
            jnp.dot(
                inp.reshape(S * B, C + H).astype(io_dtype), wg.astype(io_dtype),
                preferred_element_type=f32,
            ).reshape(S, B, 2 * H)
            + bg.astype(f32)
        )
        inp2 = jnp.concatenate([xs32, rz[..., :H] * hp], axis=-1)
        n = jnp.tanh(
            jnp.dot(
                inp2.reshape(S * B, C + H).astype(io_dtype), wc.astype(io_dtype),
                preferred_element_type=f32,
            ).reshape(S, B, H)
            + bc.astype(f32)
        )
        return rz, n, inp, inp2, wg, wc

    rz_f, n_f, inp_f, _, wg_f, wc_f = recompute(pf, hp_f)
    rz_b, n_b, inp_b, _, wg_b, wc_b = recompute(pb, hp_b)

    def hT(wmat):
        return jnp.transpose(jnp.asarray(wmat)[C:, :]).astype(io_dtype)

    operands = (
        lengths_b1,
        g_yf.astype(f32), g_yb.astype(f32),
        rz_f, n_f, hp_f, rz_b, n_b, hp_b,
        hT(wg_f), hT(wc_f), hT(wg_b), hT(wc_b),
    )
    out4 = pl.pallas_call(
        _make_bwd_carry_kernel(S, B, C, H, io_dtype),
        out_shape=(
            jax.ShapeDtypeStruct((S, B, 2 * H), f32),
            jax.ShapeDtypeStruct((S, B, H), f32),
            jax.ShapeDtypeStruct((S, B, 2 * H), f32),
            jax.ShapeDtypeStruct((S, B, H), f32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(operands),
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(4)
        ),
        interpret=interpret,
    )(*operands)
    g_ag_f, g_ac_f, g_ag_b, g_ac_b = out4

    def io2d(x, w_last):
        return x.reshape(S * B, w_last).astype(io_dtype)

    def wgrads(p, g_ag, g_ac, inp, rz, hp):
        inp2 = jnp.concatenate([xs32, rz[..., :H] * hp], axis=-1)
        dwg = jax.lax.dot_general(
            io2d(inp, C + H), io2d(g_ag, 2 * H),
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        dwc = jax.lax.dot_general(
            io2d(inp2, C + H), io2d(g_ac, H),
            (((0,), (0,)), ((), ())), preferred_element_type=f32,
        )
        return {
            "gates": {
                "kernel": dwg.astype(jnp.asarray(p["gates"]["kernel"]).dtype),
                "bias": jnp.sum(g_ag, axis=(0, 1)).astype(
                    jnp.asarray(p["gates"]["bias"]).dtype
                ),
            },
            "candidate": {
                "kernel": dwc.astype(jnp.asarray(p["candidate"]["kernel"]).dtype),
                "bias": jnp.sum(g_ac, axis=(0, 1)).astype(
                    jnp.asarray(p["candidate"]["bias"]).dtype
                ),
            },
        }

    g_pf = wgrads(pf, g_ag_f, g_ac_f, inp_f, rz_f, hp_f)
    g_pb = wgrads(pb, g_ag_b, g_ac_b, inp_b, rz_b, hp_b)

    def cT(wmat):
        return jnp.transpose(jnp.asarray(wmat)[:C, :]).astype(io_dtype)

    def dx(g_ag, g_ac, wg, wc):
        return jax.lax.dot_general(
            io2d(g_ag, 2 * H), cT(wg),
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        ) + jax.lax.dot_general(
            io2d(g_ac, H), cT(wc),
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )

    g_x = (dx(g_ag_f, g_ac_f, wg_f, wc_f) + dx(g_ag_b, g_ac_b, wg_b, wc_b))
    g_x = g_x.reshape(S, B, C).astype(xs.dtype)
    g_len = np.zeros(lengths_b1.shape, jax.dtypes.float0)
    return (g_x, g_len, g_pf, g_pb)


_bigru.defvjp(_bigru_fwd, _bigru_bwd)


def bigru_train(
    xs: jnp.ndarray,              # (B, S, C)
    lengths: jnp.ndarray,         # (B,)
    params_fwd,
    params_bwd,
    *,
    hidden: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused BiGRU (forward identical to bigru_pallas)."""
    B, S, C = xs.shape
    io_dtype = xs.dtype if xs.dtype in (jnp.bfloat16, jnp.float32) else jnp.float32
    io_name = "bfloat16" if io_dtype == jnp.bfloat16 else "float32"
    cfg = (S, B, C, hidden, interpret, io_name)
    yf, yb = _bigru(
        cfg,
        xs.transpose(1, 0, 2).astype(io_dtype),
        lengths.reshape(B, 1).astype(jnp.int32),
        params_fwd,
        params_bwd,
    )
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
