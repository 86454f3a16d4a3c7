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


def test_bigru_train_matches_birnn_values_and_grads():
    """bigru_train's custom VJP vs jax.grad of the flax-scan BiRNN:
    values, every weight gradient, and the input gradient."""
    from self_attention_tacotron_tpu.ops.fused_rnn import bigru_train

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
    params = variables["params"]
    wsum = jax.random.normal(jax.random.PRNGKey(2), (B, S, 2 * H))

    def loss_ref(params, xs):
        y = rnn.apply({"params": params}, xs, lengths, init, init)
        return jnp.sum(y * wsum)

    def loss_kernel(params, xs):
        y = bigru_train(
            xs, lengths, params["cell_fwd"], params["cell_bwd"],
            hidden=H, interpret=True,
        )
        return jnp.sum(y * wsum)

    ref_val, (g_p_ref, g_x_ref) = jax.value_and_grad(
        loss_ref, argnums=(0, 1)
    )(params, xs)
    got_val, (g_p, g_x) = jax.value_and_grad(
        loss_kernel, argnums=(0, 1)
    )(params, xs)
    np.testing.assert_allclose(float(got_val), float(ref_val), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_x), np.asarray(g_x_ref), atol=3e-5, rtol=1e-4
    )
    flat_ref = jax.tree_util.tree_flatten_with_path(g_p_ref)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(g_p)[0]
    for (path, rv), (_, gv) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(rv), atol=3e-5, rtol=1e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_bigru_train_eval_primal_identical():
    """Outside jax.grad, bigru_train must produce bitwise the same output
    as bigru_pallas (same forward kernel)."""
    from self_attention_tacotron_tpu.ops.fused_rnn import bigru_train

    B, S, C, H = 3, 9, 6, 8
    xs = jax.random.normal(jax.random.PRNGKey(4), (B, S, C))
    lengths = jnp.array([9, 5, 2])
    rnn = modules.BiRNN(
        cell_fwd=modules.GRUCell(H, name="gru_fwd"),
        cell_bwd=modules.GRUCell(H, name="gru_bwd"),
        rng_names=(),
    )
    init = jnp.zeros((B, H))
    variables = rnn.init(jax.random.PRNGKey(1), xs, lengths, init, init)
    a = bigru_pallas(
        xs, lengths, variables["params"]["cell_fwd"],
        variables["params"]["cell_bwd"], hidden=H, interpret=True,
    )
    b = bigru_train(
        xs, lengths, variables["params"]["cell_fwd"],
        variables["params"]["cell_bwd"], hidden=H, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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
