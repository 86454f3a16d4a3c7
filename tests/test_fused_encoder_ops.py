"""Fused BiGRU / full-seq MHA Pallas kernels vs the XLA module paths."""

import jax
import jax.numpy as jnp
import numpy as np

from self_attention_tacotron_tpu.models import modules
from self_attention_tacotron_tpu.models.self_attention import MultiHeadAttention
from self_attention_tacotron_tpu.ops.fused_attention import mha_full_pallas
from self_attention_tacotron_tpu.ops.fused_rnn import bigru_pallas


def test_bigru_pallas_matches_birnn():
    B, S, C, H = 4, 12, 10, 8
    xs = jax.random.normal(jax.random.PRNGKey(0), (B, S, C))
    lengths = jnp.array([12, 7, 1, 12])
    rnn = modules.BiRNN(
        cell_fwd=modules.GRUCell(H, name="gru_fwd"),
        cell_bwd=modules.GRUCell(H, name="gru_bwd"),
        rng_names=(),
    )
    init = jnp.zeros((B, H))
    variables = rnn.init(jax.random.PRNGKey(1), xs, lengths, init, init)
    ref = rnn.apply(variables, xs, lengths, init, init)

    got = bigru_pallas(
        xs,
        lengths,
        variables["params"]["cell_fwd"],
        variables["params"]["cell_bwd"],
        hidden=H,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_mha_full_pallas_matches_xla():
    B, T, D, heads = 3, 10, 16, 2
    mha = MultiHeadAttention(num_heads=heads, num_units=D, is_training=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    mask = jnp.arange(T)[None, :] < jnp.array([10, 6, 3])[:, None]
    variables = mha.init(jax.random.PRNGKey(1), x, mask)
    ref_out, ref_probs = mha.apply(variables, x, mask)

    qkv = x @ variables["params"]["qkv"]["kernel"]
    ctx, probs = mha_full_pallas(qkv, mask, num_heads=heads, interpret=True)
    got_out = (
        ctx @ variables["params"]["out"]["kernel"]
        + variables["params"]["out"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(ref_probs), atol=2e-5)


def test_mha_full_pallas_no_mask():
    B, T, D, heads = 2, 6, 8, 2
    qkv = jax.random.normal(jax.random.PRNGKey(2), (B, T, 3 * D))
    ctx, probs = mha_full_pallas(qkv, None, num_heads=heads, interpret=True)
    assert ctx.shape == (B, T, D)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_bilstm_pallas_matches_birnn():
    from self_attention_tacotron_tpu.ops.fused_rnn import bilstm_pallas

    B, S, C, H = 4, 10, 6, 8
    xs = jax.random.normal(jax.random.PRNGKey(3), (B, S, C))
    lengths = jnp.array([10, 4, 1, 10])
    rnn = modules.BiRNN(
        cell_fwd=modules.ZoneoutLSTMCell(
            H, zoneout_factor_cell=0.1, zoneout_factor_output=0.1,
            is_training=False, name="lstm_fwd",
        ),
        cell_bwd=modules.ZoneoutLSTMCell(
            H, zoneout_factor_cell=0.1, zoneout_factor_output=0.1,
            is_training=False, name="lstm_bwd",
        ),
    )
    init = modules.ZoneoutLSTMCell.initial_state(B, H)
    variables = rnn.init(jax.random.PRNGKey(1), xs, lengths, init, init)
    ref = rnn.apply(variables, xs, lengths, init, init)
    got = bilstm_pallas(
        xs,
        lengths,
        variables["params"]["cell_fwd"],
        variables["params"]["cell_bwd"],
        hidden=H,
        zoneout_cell=0.1,
        zoneout_output=0.1,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
