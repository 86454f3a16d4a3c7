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


def test_lf0_feedback_is_softmaxed_to_training_domain():
    """Classification (lf0) heads feed back probabilities, not logits.

    Training teacher-feeds one-hot lf0 rows (trainer.targets_from_batch);
    the free-running feed must live in the same [0,1] simplex domain or
    synthesis diverges from everything the prenet saw (round-4 convergence
    matrix caught this: held-out lf0 accuracy at chance). The STORED output
    frames stay raw logits (losses/argmax consumers expect them).

    The stub ECHOES the tail of each step's incoming feed into the "mgc"
    head, so the lf0 slice of the feed the loop actually constructed is
    observable in the output buffers one step later.
    """
    batch, r, n_mgc, n_lf0, max_iters = 2, 2, 3, 4, 3
    feed_dim = n_mgc + n_lf0

    lf0_logits = jnp.asarray([[5.0, -3.0, 0.5, 2.0]] * batch)

    def step_fn(state, feed, step_index):
        return state + 1, feed, (jnp.ones((batch, 5)) / 5.0,)

    def post_step_fn(feature, caches, t):
        # feature == the incoming feed; echo its LAST n_mgc lanes (= the
        # tail of the feed's lf0 slice) as this step's mgc output
        frames = {
            "mgc": jnp.broadcast_to(
                feature[:, None, -n_mgc:], (batch, r, n_mgc)
            ),
            "lf0": jnp.broadcast_to(lf0_logits[:, None, :], (batch, r, n_lf0)),
        }
        stop_logits = jnp.full((batch, r), -10.0)
        return frames, stop_logits, caches

    res = decode_incrementally(
        step_fn=step_fn,
        post_step_fn=post_step_fn,
        init_state=jnp.zeros((), jnp.int32),
        init_caches=(),
        go_frame=jnp.zeros((batch, feed_dim)),
        src_shapes=(5,),
        head_dims={"mgc": n_mgc, "lf0": n_lf0},
        batch=batch,
        max_iters=max_iters,
        outputs_per_step=r,
        n_feed_frame=1,
        stop_threshold=0.5,
    )
    # decode step 1's echo reveals the feed built at step 0: its last
    # n_mgc lanes are the tail of softmax(lf0_logits), NOT the raw logits
    echoed_tail = np.asarray(res.frames["mgc"][0, r])  # step 1, frame 0
    np.testing.assert_allclose(
        echoed_tail,
        np.asarray(jax.nn.softmax(lf0_logits[0]))[-n_mgc:],
        atol=1e-6,
    )
    # stored lf0 output frames remain raw logits
    np.testing.assert_allclose(
        np.asarray(res.frames["lf0"][0, 0]), np.asarray(lf0_logits[0])
    )
