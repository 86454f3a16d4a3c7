#!/usr/bin/env python
"""Decompose the AR decode step cost on the current accelerator.

Variants, per loop iteration at the bench config (batch 32, bf16):
  A. empty while_loop body
  B. prenet only (precomputed masks)
  C. rnn+attention step only
  D. output head only (SA KV cache + projections)
  E. step+head, no result-buffer writes
  F. buffer writes only (frames/stops/aligns dynamic_update_slice)
  G. full body (= what bench.py runs per step)
"""

from __future__ import annotations

import time

from self_attention_tacotron_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from bench import flagship_hparams
from self_attention_tacotron_tpu.models.models import TacotronNetwork, tacotron_model_factory

B, S, ITERS = 32, 128, 200


def timeit(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return min(times)


def while_loop_runner(body):
    @jax.jit
    def run(carry):
        def cond(c):
            return c[0] < ITERS

        def b(c):
            t = c[0]
            rest = body(t, c[1])
            return (t + 1, rest)

        return jax.lax.while_loop(cond, b, (jnp.zeros((), jnp.int32), carry))

    return run


def main():
    hp = flagship_hparams()
    hp.max_iters = ITERS
    model = tacotron_model_factory(hp)
    net = model.network(is_training=False)
    rng = np.random.RandomState(0)
    source = jnp.asarray(rng.randint(2, hp.num_symbols, (B, S)), jnp.int32)
    src_len = jnp.full((B,), S, jnp.int32)
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(["params", "dropout", "zoneout"])}
    targets = jnp.zeros((B, 4, hp.num_mels))
    variables = net.init(rngs, source, src_len, targets, jnp.full((B,), 4, jnp.int32))

    cond_enc, _ = jax.jit(
        lambda v, s, l, r: net.apply(v, s, l, method=TacotronNetwork.encode, rngs={"dropout": r})
    )(variables, source, src_len, jax.random.PRNGKey(5))
    init_state = net.apply(variables, cond_enc, method=TacotronNetwork.decoder_initial_state)
    caches = net.apply(variables, B, ITERS, method=TacotronNetwork.decoder_init_caches)
    go = net.apply(variables, B, method=TacotronNetwork.decoder_go_frame)

    keep = 1.0 - hp.decoder_prenet_drop_rate
    mask_keys = jax.random.split(jax.random.PRNGKey(7), len(hp.decoder_prenet_out_units))
    masks_all = tuple(
        jax.random.bernoulli(k, keep, (ITERS, B, u))
        for k, u in zip(mask_keys, hp.decoder_prenet_out_units)
    )

    def masks_at(t):
        return tuple(
            jax.lax.dynamic_index_in_dim(m, t, axis=0, keepdims=False) for m in masks_all
        )

    def dec_step(t, state, feed):
        return net.apply(
            variables, state, feed, cond_enc, masks_at(t),
            method=TacotronNetwork.decoder_step,
        )

    def head(t, feat, cch):
        return net.apply(variables, feat, cch, t, method=TacotronNetwork.decoder_post_step)

    r = hp.outputs_per_step
    frame_buf = jnp.zeros((B, ITERS, r, hp.num_mels))
    stop_buf = jnp.zeros((B, ITERS, r))
    align_bufs = tuple(jnp.zeros((B, ITERS, S)) for _ in range(2))
    feat0 = jnp.zeros((B, hp.decoder_out_units), jnp.bfloat16)
    align0 = tuple(jnp.zeros((B, S), jnp.float32) for _ in range(2))
    frames0 = {"mel": jnp.zeros((B, r, hp.num_mels), jnp.bfloat16)}
    stop0 = jnp.zeros((B, r), jnp.bfloat16)

    # A empty
    t_a = timeit(while_loop_runner(lambda t, c: c + 1.0), jnp.zeros(())) / ITERS

    # B prenet only
    def b_prenet(t, c):
        out = net.apply(
            variables, c, masks_at(t), method=lambda m, x, mk: m.decoder.prenet(x, mk)
        )
        return jnp.concatenate([out[:, :1].astype(c.dtype) * 0 + c[:, :1], c[:, 1:]], 1)

    t_b = timeit(while_loop_runner(b_prenet), go) / ITERS

    # C rnn+attn step
    def c_step(t, c):
        state, feed = c
        new_state, (feat, _) = dec_step(t, state, feed)
        return new_state, feat[:, : go.shape[1]].astype(feed.dtype)

    t_c = timeit(while_loop_runner(c_step), (init_state, go)) / ITERS

    # D head only
    def d_head(t, c):
        feat, cch = c
        frames, stop, cch = head(t, feat, cch)
        return feat, cch

    t_d = timeit(while_loop_runner(d_head), (feat0, caches)) / ITERS

    # E step + head, no writes
    def e_nowrites(t, c):
        state, feed, cch = c
        new_state, (feat, aligns) = dec_step(t, state, feed)
        frames, stop, cch = head(t, feat, cch)
        feed = frames["mel"][:, -1].reshape(B, -1).astype(feed.dtype)
        return new_state, feed, cch

    t_e = timeit(while_loop_runner(e_nowrites), (init_state, go, caches)) / ITERS

    # F writes only
    def f_writes(t, c):
        fb, sb, abufs = c
        fb = jax.lax.dynamic_update_slice_in_dim(
            fb, frames0["mel"].astype(jnp.float32)[:, None], t, axis=1
        )
        sb = jax.lax.dynamic_update_slice_in_dim(
            sb, stop0.astype(jnp.float32)[:, None], t, axis=1
        )
        abufs = tuple(
            jax.lax.dynamic_update_slice_in_dim(buf, a[:, None, :], t, axis=1)
            for buf, a in zip(abufs, align0)
        )
        return fb, sb, abufs

    t_f = timeit(while_loop_runner(f_writes), (frame_buf, stop_buf, align_bufs)) / ITERS

    # G full body
    def g_full(t, c):
        state, feed, cch, fb, sb, abufs = c
        new_state, (feat, aligns) = dec_step(t, state, feed)
        frames, stop, cch = head(t, feat, cch)
        fb = jax.lax.dynamic_update_slice_in_dim(
            fb, frames["mel"].astype(jnp.float32)[:, None], t, axis=1
        )
        sb = jax.lax.dynamic_update_slice_in_dim(
            sb, stop.astype(jnp.float32)[:, None], t, axis=1
        )
        abufs = tuple(
            jax.lax.dynamic_update_slice_in_dim(
                buf, a.astype(jnp.float32)[:, None, :], t, axis=1
            )
            for buf, a in zip(abufs, aligns)
        )
        feed = frames["mel"][:, -1].reshape(B, -1).astype(feed.dtype)
        return new_state, feed, cch, fb, sb, abufs

    t_g = timeit(
        while_loop_runner(g_full),
        (init_state, go, caches, frame_buf, stop_buf, align_bufs),
    ) / ITERS

    us = lambda x: f"{x * 1e6:8.1f} us"
    print(f"A empty body      : {us(t_a)}")
    print(f"B prenet (masks)  : {us(t_b)}")
    print(f"C rnn+attn step   : {us(t_c)}")
    print(f"D output head     : {us(t_d)}")
    print(f"E step+head       : {us(t_e)}")
    print(f"F buffer writes   : {us(t_f)}")
    print(f"G full body       : {us(t_g)}")
    print(f"frames/sec at G   : {B * r / t_g:,.0f}")


if __name__ == "__main__":
    main()
