"""Batched synthesis (PREDICT mode): jitted on-device AR mel decoding.

Reference counterpart: estimator PREDICT mode + InferenceHelper
(SURVEY.md §3.3 [M] — reconstructed; mount empty). This module builds ONE
jitted function per model configuration that runs: encode (full-parallel)
→ ``lax.while_loop`` AR decode with per-lane stop tokens (ops/decode_loop)
→ postnets, entirely on-device. This is the north-star benchmark path.

Forced-alignment mode (``hparams.use_forced_alignment_mode``): when the
attention is a teacher-forcing variant, supply ``target_lengths`` in the
batch and the diagonal ratio is derived automatically.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from self_attention_tacotron_tpu.models.models import TacotronModelBase, TacotronNetwork
from self_attention_tacotron_tpu.ops.decode_loop import DecodeResult, decode_incrementally


def make_predict_fn(
    model: TacotronModelBase,
    max_iters: Optional[int] = None,
    use_fused: Optional[bool] = None,
    mxu_attend: bool = False,
):
    """Build a jitted ``predict(variables, batch, rng) -> dict`` function.

    ``batch`` fields: ``source`` (B,S) int32, ``source_lengths`` (B,),
    optional ``accent_type`` (B,S), ``speaker_id`` (B,), optional
    ``target_lengths`` (B,) for forced-alignment mode.

    ``use_fused``: run the whole-loop Pallas decode kernel
    (ops/fused_decode.py). Default: auto — on for the flagship
    configuration on real accelerators, off (XLA while-loop) otherwise;
    forced-on on CPU runs the kernel in interpreter mode (tests).
    """
    import jax as _jax

    from self_attention_tacotron_tpu.ops.fused_decode import (
        fused_decode,
        fused_decode_max_batch,
        supports_fused_decode,
    )

    hp = model.hparams
    net: TacotronNetwork = model.network(is_training=False)
    max_steps = int(max_iters or hp.max_iters)
    r = hp.outputs_per_step
    on_cpu = _jax.default_backend() == "cpu"
    auto_mode = use_fused is None
    if auto_mode:
        use_fused = hp.use_pallas_kernels and supports_fused_decode(hp) and not on_cpu
    elif use_fused and not supports_fused_decode(hp):
        raise ValueError("configuration not supported by the fused decode kernel")

    @functools.partial(jax.jit, static_argnames=())
    def predict(variables, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        source = batch["source"]
        src_len = batch["source_lengths"]
        batch_size, src_max = source.shape
        enc_rng, dec_rng = jax.random.split(rng)

        cond, enc_sa = net.apply(
            variables,
            source,
            src_len,
            batch.get("accent_type"),
            batch.get("speaker_id"),
            method=TacotronNetwork.encode,
            rngs={"dropout": enc_rng},
        )
        if "target_lengths" in batch:
            # S/T_dec positions per decoder step for teacher-forcing attention
            dec_steps = jnp.maximum(batch["target_lengths"] // r, 1)
            cond = cond.replace(
                teacher_ratio=src_len.astype(jnp.float32) / dec_steps.astype(jnp.float32)
            )

        # batch/length are static at trace time: large batches run as
        # sequential fused batch blocks (fused_decode slices internally);
        # auto mode only falls back to the XLA loop when even an 8-lane
        # launch exceeds the VMEM budget (e.g. extreme max_iters)
        use_fused_here = use_fused and (
            not auto_mode or fused_decode_max_batch(hp, max_steps, src_max) > 0
        )
        if use_fused_here:
            seed = jax.random.randint(dec_rng, (), 0, jnp.iinfo(jnp.int32).max)
            result = DecodeResult(
                **fused_decode(
                    variables=variables,
                    cond=cond,
                    hp=hp,
                    batch=batch_size,
                    max_iters=max_steps,
                    seed=seed,
                    interpret=on_cpu,
                    mxu_attend=mxu_attend,
                )
            )
            return _assemble_outputs(result, enc_sa, hp, net, variables, cond)

        init_state = net.apply(variables, cond, method=TacotronNetwork.decoder_initial_state)
        init_caches = net.apply(
            variables, batch_size, max_steps, method=TacotronNetwork.decoder_init_caches
        )
        go = net.apply(variables, batch_size, method=TacotronNetwork.decoder_go_frame)

        # Precompute every step's prenet dropout masks in one RNG call —
        # sampling threefry inside the while_loop costs ~100us/step on v5e
        # (measured; see scripts/profile_decode.py), dwarfing the matmuls.
        keep = 1.0 - hp.decoder_prenet_drop_rate
        mask_keys = jax.random.split(dec_rng, len(hp.decoder_prenet_out_units) + 1)
        dec_rng = mask_keys[-1]
        prenet_masks = tuple(
            jax.random.bernoulli(k, keep, (max_steps, batch_size, units))
            for k, units in zip(mask_keys[:-1], hp.decoder_prenet_out_units)
        )

        def step_fn(state, feed, t):
            masks = tuple(
                jax.lax.dynamic_index_in_dim(m, t, axis=0, keepdims=False)
                for m in prenet_masks
            )
            new_state, (feature, aligns) = net.apply(
                variables,
                state,
                feed,
                cond,
                masks,
                method=TacotronNetwork.decoder_step,
            )
            return new_state, feature, aligns

        def post_step_fn(feature, caches, t):
            return net.apply(
                variables, feature, caches, t, method=TacotronNetwork.decoder_post_step
            )

        head_dims = model.head_dims()
        result: DecodeResult = decode_incrementally(
            step_fn=step_fn,
            post_step_fn=post_step_fn,
            init_state=init_state,
            init_caches=init_caches,
            go_frame=go,
            src_shapes=tuple(m.shape[1] for m in cond.memories),
            head_dims=head_dims,
            batch=batch_size,
            max_iters=max_steps,
            outputs_per_step=r,
            n_feed_frame=hp.n_feed_frame,
            stop_threshold=hp.stop_token_threshold,
        )

        return _assemble_outputs(result, enc_sa, hp, net, variables, cond)

    return predict


def make_sharded_predict_fn(
    model: TacotronModelBase,
    mesh,
    max_iters: Optional[int] = None,
    use_fused: Optional[bool] = None,
):
    """Data-parallel batched synthesis over a ``jax.sharding.Mesh``.

    New TPU capability (SURVEY.md §2.3 — the reference is single-device):
    the batch is split over the mesh ``data`` axis with ``shard_map``; each
    device runs the full decode (fused Pallas kernel or XLA loop) on its
    shard, so B utterances synthesize on N chips in the time of B/N. The
    only cross-device communication is one ``pmax`` of the step counter.

    Batch size must be divisible by the data axis; params are replicated.
    """
    import jax.sharding as jsh

    predict = make_predict_fn(model, max_iters=max_iters, use_fused=use_fused)
    P = jsh.PartitionSpec
    data_axis = "data"

    def per_shard(variables, batch, rng):
        out = predict(variables, batch, rng)
        # per-shard early exit can stop at different steps; replicate the max
        out["num_steps"] = jax.lax.pmax(out["num_steps"], data_axis)
        return out

    cache = {}

    def sharded_predict(variables, batch: Dict[str, jnp.ndarray], rng: jax.Array):
        b = batch["source"].shape[0]
        n = mesh.shape[data_axis]
        if b % n != 0:
            raise ValueError(f"batch {b} must divide the data axis ({n})")
        key = (b,) + tuple(sorted(batch))
        if key not in cache:
            in_specs = (
                jax.tree.map(lambda _: P(), variables),
                {k: P(data_axis) for k in batch},
                P(),
            )
            out_shapes = jax.eval_shape(per_shard_like, variables, batch, rng)
            out_specs = jax.tree.map(lambda _: P(data_axis), out_shapes)
            out_specs["num_steps"] = P()
            cache[key] = jax.jit(
                jax.shard_map(
                    per_shard,
                    mesh=mesh,
                    in_specs=in_specs,
                    out_specs=out_specs,
                    check_vma=False,
                )
            )
        return cache[key](variables, batch, rng)

    def per_shard_like(variables, batch, rng):
        # eval_shape target with FULL batch: leading dims differ from the
        # per-shard call but the pytree STRUCTURE (what out_specs needs)
        # is identical
        return predict(variables, batch, rng)

    return sharded_predict


def _assemble_outputs(result: DecodeResult, enc_sa, hp, net, variables, cond=None):
    out = {
        "lengths": result.lengths,
        "stop_probs": result.stop_probs,
        "alignments": result.alignments,
        "encoder_sa_alignments": enc_sa,
        "finished": result.finished,
        "num_steps": result.num_steps,
    }
    out.update(result.frames)
    if "mel" in result.frames and (hp.use_postnet_v2 or hp.use_linear_spectrogram_postnet):
        postnet_mel, linear = net.apply(
            variables,
            result.frames["mel"],
            result.lengths,
            None if cond is None else cond.speaker_embed,
            method=TacotronNetwork.postnet_apply,
        )
        if postnet_mel is not None:
            out["postnet_mel"] = postnet_mel
        if linear is not None:
            out["linear"] = linear
    return out
