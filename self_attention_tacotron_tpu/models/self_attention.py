"""Multi-head self-attention blocks (encoder stream + decoder variants).

Capability parity with the reference ``SelfAttentionTransformer`` /
``MultiHeadAttention`` modules (``self-attention-tacotron/modules/`` per
SURVEY.md §2.1 [M] — reconstructed; mount empty), per the ICASSP 2019
paper (arXiv:1810.11960): stacked multi-head scaled-dot-product
self-attention blocks with residual connections and sinusoidal positional
encodings, applied over LSTM/CBHG outputs in the encoder (producing a
second memory stream) and optionally over decoder states.

TPU-first notes:

* Full-sequence attention (training, encoder) is one batched einsum chain
  — lands on the MXU with zero gather/scatter.
* Autoregressive decoding uses explicit K/V cache buffers threaded through
  the decode carry (``write_kv`` / ``attend_one``): static shapes, one
  dynamic_update_slice per step, no recomputation of past projections.
* Softmax always in float32.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any
_NEG_INF = -1e9


@functools.lru_cache(maxsize=16)
def _sinusoid_table(length: int, dim: int) -> np.ndarray:
    pos = np.arange(length, dtype=np.float64)[:, None]
    i = np.arange(dim, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, (2.0 * (i // 2)) / dim)
    table = np.where(i % 2 == 0, np.sin(angle), np.cos(angle))
    return table.astype(np.float32)


def positional_encoding(length: int, dim: int, dtype: Dtype = jnp.float32) -> jnp.ndarray:
    """Sinusoidal positional encoding table, (length, dim)."""
    return jnp.asarray(_sinusoid_table(length, dim), dtype)


class MultiHeadAttention(nn.Module):
    """Multi-head *self*-attention with optional causal masking.

    TPU-first: Q, K, V are ONE fused (D → 3D) matmul — on this model's
    small dims each extra matmul op costs far more than its FLOPs (v5e
    measurement: ~55 µs fixed per small matmul, scripts/profile_decode.py),
    and one wide matmul also tiles better on the MXU.
    """

    num_heads: int
    num_units: int             # total (= heads × head_dim)
    drop_rate: float = 0.0
    is_training: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.num_units % self.num_heads == 0
        self.qkv_proj = nn.Dense(
            3 * self.num_units, use_bias=False, dtype=self.dtype, name="qkv"
        )
        self.out_proj = nn.Dense(self.num_units, dtype=self.dtype, name="out")
        self.attn_drop = nn.Dropout(rate=self.drop_rate)

    def _split(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, _ = x.shape
        return x.reshape(b, t, self.num_heads, -1).transpose(0, 2, 1, 3)

    def __call__(
        self,
        x: jnp.ndarray,                      # (B, T, D) self-attention input
        mask: Optional[jnp.ndarray] = None,  # (B, T) valid mask
        causal: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        qkv = self.qkv_proj(x)
        if (
            self.use_pallas
            and not self.is_training
            and not causal
            and not self.is_initializing()
            and jax.default_backend() != "cpu"
        ):
            from self_attention_tacotron_tpu.ops.fused_attention import mha_full_pallas

            ctx, probs = mha_full_pallas(qkv, mask, num_heads=self.num_heads)
            return self.out_proj(ctx), probs
        q, k, v = (self._split(p) for p in jnp.split(qkv, 3, axis=-1))
        d = q.shape[-1]
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        logits = logits / np.sqrt(d)
        if mask is not None:
            logits = jnp.where(mask[:, None, None, :], logits, _NEG_INF)
        if causal:
            tq, tk = logits.shape[-2:]
            cmask = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
            logits = jnp.where(cmask[None, None], logits, _NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        if self.drop_rate > 0.0 and self.is_training:
            probs = self.attn_drop(probs, deterministic=False)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        b, h, tq, dd = ctx.shape
        out = self.out_proj(ctx.transpose(0, 2, 1, 3).reshape(b, tq, h * dd))
        return out, probs

    # ---------------- incremental (AR decode) API ---------------- #

    def fused_step(
        self,
        x: jnp.ndarray,          # (B, D) current step input (already normed)
        k_cache: jnp.ndarray,    # (B, Tmax, D)
        v_cache: jnp.ndarray,
        index: jnp.ndarray,      # () current step (keys 0..index valid)
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """One causal step: fused QKV, cache write, attend. → (out, k, v)."""
        qkv = self.qkv_proj(x[:, None, :])                 # (B, 1, 3D)
        q1, k1, v1 = jnp.split(qkv, 3, axis=-1)
        k_cache = jax.lax.dynamic_update_slice_in_dim(k_cache, k1, index, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(v_cache, v1, index, axis=1)
        q = self._split(q1)                                # (B, H, 1, d)
        k = self._split(k_cache)                           # (B, H, T, d)
        v = self._split(v_cache)
        d = q.shape[-1]
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) / np.sqrt(d)
        valid = jnp.arange(k_cache.shape[1]) <= index
        logits = jnp.where(valid[None, None, None, :], logits, _NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        b, h, _, dd = ctx.shape
        return self.out_proj(ctx.reshape(b, h * dd)), k_cache, v_cache


class SelfAttentionBlock(nn.Module):
    """Pre-LN transformer block: LN→MHA→res, LN→FFN→res."""

    num_heads: int
    num_units: int
    ffn_units: int = 1024
    drop_rate: float = 0.05
    is_training: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.ln1 = nn.LayerNorm(dtype=self.dtype, name="ln1")
        self.ln2 = nn.LayerNorm(dtype=self.dtype, name="ln2")
        self.mha = MultiHeadAttention(
            num_heads=self.num_heads,
            num_units=self.num_units,
            drop_rate=self.drop_rate,
            is_training=self.is_training,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="mha",
        )
        self.ffn1 = nn.Dense(self.ffn_units, dtype=self.dtype, name="ffn1")
        self.ffn2 = nn.Dense(self.num_units, dtype=self.dtype, name="ffn2")
        self.drop = nn.Dropout(rate=self.drop_rate)

    def _ffn(self, x):
        h = nn.relu(self.ffn1(x))
        return self.ffn2(h)

    def __call__(self, x, mask=None, causal=False):
        h, probs = self.mha(self.ln1(x), mask=mask, causal=causal)
        h = self.drop(h, deterministic=not self.is_training)
        x = x + h
        f = self.drop(self._ffn(self.ln2(x)), deterministic=not self.is_training)
        return x + f, probs

    # incremental (must mirror __call__ with is_training=False exactly)
    def step(self, x, k_cache, v_cache, index):
        h, k_cache, v_cache = self.mha.fused_step(self.ln1(x), k_cache, v_cache, index)
        x = x + h
        return x + self._ffn(self.ln2(x)), k_cache, v_cache


class SelfAttentionTransformer(nn.Module):
    """Stack of ``num_hop`` self-attention blocks + input projection + PE.

    Used by the self-attention encoder (second memory stream) and the
    self-attention decoder variants. Returns the transformed sequence and
    per-block attention probabilities (for alignment plots).
    """

    num_hop: int
    num_heads: int
    num_units: int
    ffn_units: int = 1024
    drop_rate: float = 0.05
    use_positional_encoding: bool = True
    is_training: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.in_proj = nn.Dense(self.num_units, dtype=self.dtype, name="in_proj")
        self.blocks = [
            SelfAttentionBlock(
                num_heads=self.num_heads,
                num_units=self.num_units,
                ffn_units=self.ffn_units,
                drop_rate=self.drop_rate,
                is_training=self.is_training,
                use_pallas=self.use_pallas,
                dtype=self.dtype,
                name=f"block_{i}",
            )
            for i in range(self.num_hop)
        ]

    def __call__(self, x, mask=None, causal=False):
        x = self.in_proj(x)
        if self.use_positional_encoding:
            x = x + positional_encoding(x.shape[1], self.num_units, x.dtype)[None]
        probs_all = []
        for block in self.blocks:
            x, probs = block(x, mask=mask, causal=causal)
            probs_all.append(probs)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x, probs_all

    # ---------------- incremental (AR decode) API ---------------- #

    def init_cache(self, batch: int, max_len: int):
        """Per-block (K, V) cache buffers for autoregressive decoding."""
        return tuple(
            (
                jnp.zeros((batch, max_len, self.num_units), self.dtype),
                jnp.zeros((batch, max_len, self.num_units), self.dtype),
            )
            for _ in range(self.num_hop)
        )

    def incremental_step(self, x: jnp.ndarray, caches, index: jnp.ndarray):
        """One causal decode step; must match ``__call__(causal=True)`` row t.

        x: (B, D) block-stack input at step ``index``. Returns (y, caches).
        """
        x = self.in_proj(x)
        if self.use_positional_encoding:
            max_len = caches[0][0].shape[1]
            pe = positional_encoding(max_len, self.num_units, x.dtype)
            x = x + jax.lax.dynamic_index_in_dim(pe, index, axis=0, keepdims=False)
        new_caches = []
        for block, (k_cache, v_cache) in zip(self.blocks, caches):
            x, k_cache, v_cache = block.step(x, k_cache, v_cache, index)
            new_caches.append((k_cache, v_cache))
        return x, tuple(new_caches)
