"""Fused whole-loop Pallas decode kernel vs the generic XLA decode path.

Runs the kernel in interpreter mode on CPU with float32 compute and
prenet dropout disabled (the only intentionally non-bit-identical part of
the kernel is its on-core PRNG dropout stream), and checks mel frames,
alignments, stop behavior, and lengths against ops/decode_loop.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.models.models import tacotron_model_factory
from self_attention_tacotron_tpu.synthesis import make_predict_fn
from tests.test_models import tiny_hparams


@pytest.fixture(scope="module")
def setup():
    hp = tiny_hparams(
        tacotron_model="DualSourceSelfAttentionTacotronModel",
        encoder="SelfAttentionCBHGEncoder",
        decoder="DualSourceSelfAttentionDecoder",
        attention="forward",
        attention2="additive",
        decoder_prenet_drop_rate=0.0,   # determinism: PRNG streams differ
        max_iters=10,
        stop_token_threshold=2.0,       # never fires → both paths run 10 steps
        compute_dtype="float32",
    )
    model = tacotron_model_factory(hp)
    net = model.network(is_training=False)
    B, S = 2, 16
    source = jnp.asarray(
        np.random.RandomState(0).randint(2, hp.num_symbols, (B, S)), jnp.int32
    )
    batch = {
        "source": source,
        "source_lengths": jnp.array([S, S - 5], jnp.int32),
    }
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(["params", "dropout", "zoneout"])}
    targets = jnp.zeros((B, 4, hp.num_mels))
    variables = net.init(
        rngs, source, batch["source_lengths"], targets, jnp.full((B,), 4, jnp.int32)
    )
    return hp, model, variables, batch


def _run(model, variables, batch, use_fused):
    predict = make_predict_fn(model, use_fused=use_fused)
    # identical rng → identical encoder prenet dropout in both paths
    return predict(variables, batch, jax.random.PRNGKey(42))


def test_fused_matches_xla_decode(setup):
    hp, model, variables, batch = setup
    ref = _run(model, variables, batch, use_fused=False)
    got = _run(model, variables, batch, use_fused=True)

    assert got["mel"].shape == ref["mel"].shape
    np.testing.assert_allclose(
        np.asarray(got["mel"]), np.asarray(ref["mel"]), atol=2e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["stop_probs"]), np.asarray(ref["stop_probs"]), atol=2e-3
    )
    for a, b in zip(got["alignments"], ref["alignments"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(got["lengths"]), np.asarray(ref["lengths"]))
    assert int(got["num_steps"]) == int(ref["num_steps"]) == hp.max_iters


def test_fused_stop_token_lengths(setup):
    """With a permissive threshold the kernel tracks per-lane lengths."""
    hp, model, variables, batch = setup
    hp.stop_token_threshold = 0.4  # untrained logits ≈ 0 → sigmoid ≈ 0.5 fires
    try:
        got = _run(model, variables, batch, use_fused=True)
        ref = _run(model, variables, batch, use_fused=False)
        np.testing.assert_array_equal(
            np.asarray(got["lengths"]), np.asarray(ref["lengths"])
        )
        np.testing.assert_array_equal(
            np.asarray(got["finished"]), np.asarray(ref["finished"])
        )
    finally:
        hp.stop_token_threshold = 2.0


def test_supports_fused_decode_gating():
    from self_attention_tacotron_tpu.ops.fused_decode import supports_fused_decode

    hp = tiny_hparams(decoder="DualSourceSelfAttentionDecoder", attention="forward",
                      attention2="additive")
    assert supports_fused_decode(hp)
    hp.attention = "location_sensitive"
    assert not supports_fused_decode(hp)
    hp.attention = "forward"
    hp.n_feed_frame = 2
    assert not supports_fused_decode(hp)


def test_fused_matches_xla_with_transition_agent():
    """Forward attention + transition agent path of the fused kernel."""
    hp = tiny_hparams(
        tacotron_model="DualSourceSelfAttentionTacotronModel",
        encoder="SelfAttentionCBHGEncoder",
        decoder="DualSourceSelfAttentionDecoder",
        attention="forward_transition_agent",
        attention2="additive",
        decoder_prenet_drop_rate=0.0,
        max_iters=8,
        stop_token_threshold=2.0,
        compute_dtype="float32",
    )
    model = tacotron_model_factory(hp)
    net = model.network(is_training=False)
    B, S = 2, 16
    source = jnp.asarray(
        np.random.RandomState(1).randint(2, hp.num_symbols, (B, S)), jnp.int32
    )
    batch = {"source": source, "source_lengths": jnp.array([S, S - 4], jnp.int32)}
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(["params", "dropout", "zoneout"])}
    variables = net.init(
        rngs, source, batch["source_lengths"], jnp.zeros((B, 4, hp.num_mels)),
        jnp.full((B,), 4, jnp.int32),
    )
    ref = make_predict_fn(model, use_fused=False)(variables, batch, jax.random.PRNGKey(9))
    got = make_predict_fn(model, use_fused=True)(variables, batch, jax.random.PRNGKey(9))
    np.testing.assert_allclose(
        np.asarray(got["mel"]), np.asarray(ref["mel"]), atol=2e-3, rtol=1e-3
    )
    for a, b in zip(got["alignments"], ref["alignments"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
