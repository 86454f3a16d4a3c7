"""Loss functions: masked spec L1/MSE, stop-token cross-entropy, regularizers.

Capability parity with ``tacotron2/tacotron/losses.py`` (SURVEY.md §2.2 [M]
— reconstructed; mount empty): spec loss (L1 and/or MSE) + stop-token
binary cross-entropy (+ optional postnet term, L2 regularization, binary
divergence). All losses mask padding by true target lengths and reduce in
float32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from self_attention_tacotron_tpu.models.modules import sequence_mask


def _frame_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    return sequence_mask(lengths, max_len).astype(jnp.float32)


def spec_loss(
    prediction: jnp.ndarray,       # (B, T, D)
    target: jnp.ndarray,           # (B, T, D)
    lengths: jnp.ndarray,          # (B,)
    loss_type: str = "l1",
) -> jnp.ndarray:
    mask = _frame_mask(lengths, target.shape[1])[..., None]
    diff = (prediction.astype(jnp.float32) - target.astype(jnp.float32)) * mask
    if loss_type == "l1":
        total = jnp.sum(jnp.abs(diff))
    elif loss_type == "mse":
        total = jnp.sum(jnp.square(diff))
    else:
        raise ValueError(f"unknown spec_loss_type {loss_type!r}")
    denom = jnp.maximum(jnp.sum(mask) * target.shape[-1], 1.0)
    return total / denom


def stop_token_loss(
    logits: jnp.ndarray,           # (B, T)
    done: jnp.ndarray,             # (B, T) 0/1 targets (1 at/after last frame)
    lengths: jnp.ndarray,          # (B,)
) -> jnp.ndarray:
    """Sigmoid binary cross-entropy over valid frames."""
    mask = _frame_mask(lengths, logits.shape[1])
    logits = logits.astype(jnp.float32)
    labels = done.astype(jnp.float32)
    per = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.sum(per * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def classification_loss(
    logits: jnp.ndarray,           # (B, T, C) (lf0 quantized head)
    labels: jnp.ndarray,           # (B, T) int or (B, T, C) one-hot
    lengths: jnp.ndarray,
) -> jnp.ndarray:
    mask = _frame_mask(lengths, logits.shape[1])
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if labels.ndim == 2:
        picked = jnp.take_along_axis(logp, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    else:
        picked = jnp.sum(logp * labels.astype(jnp.float32), axis=-1)
    return -jnp.sum(picked * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def binary_divergence(
    prediction: jnp.ndarray,
    target: jnp.ndarray,
    lengths: jnp.ndarray,
) -> jnp.ndarray:
    """Bernoulli KL between normalized [0,1] spectrogram values (optional)."""
    mask = _frame_mask(lengths, target.shape[1])[..., None]
    p = jnp.clip(prediction.astype(jnp.float32), 1e-5, 1.0 - 1e-5)
    t = jnp.clip(target.astype(jnp.float32), 0.0, 1.0)
    per = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    ent = -(
        t * jnp.log(jnp.clip(t, 1e-5, 1.0)) + (1.0 - t) * jnp.log(jnp.clip(1.0 - t, 1e-5, 1.0))
    )
    return jnp.sum((per - ent) * mask) / jnp.maximum(jnp.sum(mask) * target.shape[-1], 1.0)


def l2_regularization(params, weight: float) -> jnp.ndarray:
    leaves = [
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree.leaves(params)
        if x.ndim >= 2  # kernels only, not biases/scales (reference convention)
    ]
    return weight * sum(leaves)
