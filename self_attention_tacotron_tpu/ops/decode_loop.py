"""Fully on-device batched autoregressive decode (the north-star hot path).

Replaces the reference's ``tf.contrib.seq2seq.dynamic_decode`` +
InferenceHelper (SURVEY.md §3.3 [M]) with a ``jax.lax.while_loop`` that:

* keeps every batch lane running after its stop token fires (static
  shapes; per-lane ``finished`` flags and true lengths are tracked and the
  tail is masked afterwards) — no host round trips, no recompiles;
* writes frames / stop probabilities / alignment histories into
  preallocated buffers via ``dynamic_update_slice`` (one slice per step);
* terminates early when all lanes are finished or ``max_iters`` is hit —
  XLA keeps the loop entirely on-device, so early exit saves real time;
* threads self-attention K/V caches through the carry for the
  self-attention decoder variants.

The model-specific step functions are injected, so this driver is shared
by every decoder family (mel, MgcLf0, single/dual-source, ±self-attention).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class DecodeResult:
    """Outputs of one batched AR synthesis call (all statically shaped)."""

    frames: Dict[str, jnp.ndarray]        # head → (B, max_iters·r, dim)
    stop_probs: jnp.ndarray               # (B, max_iters·r)
    lengths: jnp.ndarray                  # (B,) true frame counts
    alignments: Tuple[jnp.ndarray, ...]   # per source: (B, max_iters, S_i)
    finished: jnp.ndarray                 # (B,) stop token fired before cap
    num_steps: jnp.ndarray                # () decoder steps actually run


def decode_incrementally(
    *,
    step_fn: Callable,        # (state, feed, t) -> (state, feature, aligns)
    post_step_fn: Callable,   # (feature, caches, t) -> (frames, stop, caches)
    init_state: Any,
    init_caches: Any,
    go_frame: jnp.ndarray,    # (B, n_feed·out_dim)
    src_shapes: Tuple[int, ...],   # S_i per attention source (alignment buffers)
    head_dims: Dict[str, int],
    batch: int,
    max_iters: int,
    outputs_per_step: int,
    n_feed_frame: int,
    stop_threshold: float,
) -> DecodeResult:
    r = outputs_per_step

    frame_bufs = {
        h: jnp.zeros((batch, max_iters, r, d), jnp.float32) for h, d in head_dims.items()
    }
    stop_buf = jnp.zeros((batch, max_iters, r), jnp.float32)
    align_bufs = tuple(jnp.zeros((batch, max_iters, s), jnp.float32) for s in src_shapes)

    carry0 = dict(
        state=init_state,
        caches=init_caches,
        feed=go_frame,
        t=jnp.zeros((), jnp.int32),
        finished=jnp.zeros((batch,), bool),
        lengths=jnp.zeros((batch,), jnp.int32),
        frames=frame_bufs,
        stops=stop_buf,
        aligns=align_bufs,
    )

    def cond(c):
        return jnp.logical_and(c["t"] < max_iters, ~jnp.all(c["finished"]))

    def body(c):
        t = c["t"]
        state, feature, aligns = step_fn(c["state"], c["feed"], t)
        frames, stop_logits, caches = post_step_fn(feature, c["caches"], t)

        new_frames = {
            h: jax.lax.dynamic_update_slice_in_dim(
                c["frames"][h], frames[h].astype(jnp.float32)[:, None], t, axis=1
            )
            for h in frames
        }
        stop_probs = jax.nn.sigmoid(stop_logits.astype(jnp.float32))  # (B, r)
        new_stops = jax.lax.dynamic_update_slice_in_dim(
            c["stops"], stop_probs[:, None, :], t, axis=1
        )
        new_aligns = tuple(
            jax.lax.dynamic_update_slice_in_dim(
                buf, a.astype(jnp.float32)[:, None, :], t, axis=1
            )
            for buf, a in zip(c["aligns"], aligns)
        )

        fired_mask = stop_probs > stop_threshold          # (B, r)
        fired = jnp.any(fired_mask, axis=-1)
        first_fire = jnp.argmax(fired_mask, axis=-1)      # 0 if none, guarded by fired
        newly = fired & ~c["finished"]
        lengths = jnp.where(newly, t * r + first_fire + 1, c["lengths"])
        finished = c["finished"] | fired

        # Feed back the last n_feed_frame predicted frames (all heads
        # concat). Classification heads (lf0) feed back SOFTMAX
        # probabilities: training teacher-feeds one-hot rows
        # (trainer.targets_from_batch), so the free-running feed must live
        # in the same [0,1] simplex domain — raw logit scale diverges from
        # everything the prenet saw in training (round-4 convergence
        # matrix: held-out lf0 accuracy at chance before this fix).
        block = jnp.concatenate(
            [
                jax.nn.softmax(frames[h], axis=-1) if h == "lf0" else frames[h]
                for h, _ in head_dims.items()
            ],
            axis=-1,
        )
        feed = block[:, r - n_feed_frame :, :].reshape(batch, -1)

        return dict(
            state=state,
            caches=caches,
            feed=feed,
            t=t + 1,
            finished=finished,
            lengths=lengths,
            frames=new_frames,
            stops=new_stops,
            aligns=new_aligns,
        )

    c = jax.lax.while_loop(cond, body, carry0)
    # lanes that never fired decode to the step cap
    lengths = jnp.where(c["finished"], c["lengths"], c["t"] * r)
    return DecodeResult(
        frames={
            h: buf.reshape(batch, max_iters * r, head_dims[h])
            for h, buf in c["frames"].items()
        },
        stop_probs=c["stops"].reshape(batch, max_iters * r),
        lengths=lengths,
        alignments=c["aligns"],
        finished=c["finished"],
        num_steps=c["t"],
    )
