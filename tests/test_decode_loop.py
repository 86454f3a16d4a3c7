import jax
import jax.numpy as jnp
import numpy as np

from self_attention_tacotron_tpu.ops.decode_loop import decode_incrementally


def _run(stop_step_per_lane, batch=3, max_iters=10, r=2, dim=4):
    """Drive the loop with stub step fns; lane i fires its stop at a given step."""
    stop_steps = jnp.asarray(stop_step_per_lane)

    def step_fn(state, feed, step_index):
        t = state
        feature = jnp.full((batch, dim), t, jnp.float32)
        aligns = (jnp.ones((batch, 5)) / 5.0,)
        return t + 1, feature, aligns

    def post_step_fn(feature, caches, t):
        frames = {"mel": jnp.broadcast_to(feature[:, None, :], (batch, r, dim))}
        # fire stop on the *second* frame of the block at the lane's stop step
        fire = (t >= stop_steps).astype(jnp.float32)
        stop_logits = jnp.stack([jnp.full((batch,), -10.0), 20.0 * fire - 10.0], axis=-1)
        return frames, stop_logits, caches

    return decode_incrementally(
        step_fn=step_fn,
        post_step_fn=post_step_fn,
        init_state=jnp.zeros((), jnp.int32),
        init_caches=(),
        go_frame=jnp.zeros((batch, dim)),
        src_shapes=(5,),
        head_dims={"mel": dim},
        batch=batch,
        max_iters=max_iters,
        outputs_per_step=r,
        n_feed_frame=1,
        stop_threshold=0.5,
    )


def test_early_exit_when_all_lanes_finish():
    res = _run([1, 2, 0])
    # all fired by step 2 (0-indexed) → loop ran exactly 3 steps
    assert int(res.num_steps) == 3
    assert bool(res.finished.all())


def test_per_lane_lengths_from_first_stop_frame():
    res = _run([1, 2, 0])
    # lane fires on 2nd frame of block at step s → length = s*r + 2
    np.testing.assert_array_equal(np.asarray(res.lengths), [4, 6, 2])


def test_never_firing_lane_hits_cap():
    res = _run([100, 0, 0], max_iters=5)
    assert int(res.num_steps) == 5
    assert not bool(res.finished[0])
    assert int(res.lengths[0]) == 10  # 5 steps * r frames


def test_buffers_written_and_zero_after_exit():
    res = _run([0, 0, 0], max_iters=8)
    mel = np.asarray(res.frames["mel"])
    assert mel.shape == (3, 16, 4)
    # step 0 wrote value 0 (feature = t = 0); later region untouched (zeros)
    np.testing.assert_allclose(mel[:, 2:], 0.0)
    probs = np.asarray(res.stop_probs)
    assert probs.shape == (3, 16)
    # first frame of block: logit -10 → prob ~0; second frame fired → ~1
    assert probs[0, 0] < 0.01 and probs[0, 1] > 0.99


def test_alignment_history_recorded():
    res = _run([1, 1, 1], max_iters=6)
    a = np.asarray(res.alignments[0])
    assert a.shape == (3, 6, 5)
    np.testing.assert_allclose(a[:, :2].sum(-1), 1.0, atol=1e-6)
    np.testing.assert_allclose(a[:, 2:], 0.0)
