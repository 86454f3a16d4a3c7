"""Fused full-sequence multi-head self-attention (encoder eval path).

XLA lowers the batched attention einsums on this serving path to per-
(batch, head) small ops (~50 µs each — scripts/profile_decode.py), making
one encoder transformer block cost ~25 ms at (32, 128, 256). This kernel
grids over the batch and runs each lane's per-head attention as plain 2D
MXU matmuls: logits → masked softmax → context, returning probabilities
for the alignment plots.

QKV and output projections stay in XLA (they are single large matmuls,
already fast). Non-causal only — the causal path is training-only, where
the XLA formulation is fine (one program for the whole batch).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9


def _make_kernel(T: int, D: int, H: int):
    HD = D // H

    def kernel(qkv_ref, bias_ref, out_ref, probs_ref):
        # blocks: qkv (1, T, 3D), bias (1, 1, T), out (1, T, D), probs (1, H, T, T)
        qkv = qkv_ref[0]
        bias = bias_ref[0].astype(jnp.float32)         # (1, T)
        for h in range(H):
            q = qkv[:, h * HD : (h + 1) * HD]
            k = qkv[:, D + h * HD : D + (h + 1) * HD]
            v = qkv[:, 2 * D + h * HD : 2 * D + (h + 1) * HD]
            logits = jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) / np.sqrt(HD)                            # (T, T)
            logits = logits + bias                     # broadcast keys mask
            lmax = jnp.max(logits, axis=-1, keepdims=True)
            lexp = jnp.exp(logits - lmax)
            probs = lexp / jnp.sum(lexp, axis=-1, keepdims=True)
            probs_ref[0, h] = probs
            out_ref[0, :, h * HD : (h + 1) * HD] = jnp.dot(
                probs.astype(v.dtype), v, preferred_element_type=jnp.float32
            ).astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def mha_full_pallas(
    qkv: jnp.ndarray,            # (B, T, 3D) packed query‖key‖value
    mask,                        # (B, T) bool valid-key mask or None
    *,
    num_heads: int,
    interpret: bool = False,
):
    """Returns (context (B, T, D), probs (B, H, T, T))."""
    B, T, three_d = qkv.shape
    D = three_d // 3
    if mask is None:
        bias = jnp.zeros((B, 1, T), jnp.float32)
    else:
        bias = jnp.where(mask, 0.0, _NEG_INF).astype(jnp.float32)[:, None, :]
    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, three_d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, num_heads, T, T), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ),
    )
    return pl.pallas_call(
        _make_kernel(T, D, num_heads),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, D), qkv.dtype),
            jax.ShapeDtypeStruct((B, num_heads, T, T), jnp.float32),
        ),
        interpret=interpret,
    )(qkv, bias)
