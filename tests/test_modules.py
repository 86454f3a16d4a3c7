import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.models import modules


def _rngs(seed=0, names=("params", "dropout", "zoneout")):
    keys = jax.random.split(jax.random.PRNGKey(seed), len(names))
    return dict(zip(names, keys))


def test_sequence_mask():
    m = modules.sequence_mask(jnp.array([2, 0, 3]), 4)
    np.testing.assert_array_equal(
        np.asarray(m),
        [[1, 1, 0, 0], [0, 0, 0, 0], [1, 1, 1, 0]],
    )


def test_reverse_sequence_keeps_padding():
    xs = jnp.arange(12, dtype=jnp.float32).reshape(2, 6, 1)
    lengths = jnp.array([3, 6])
    rev = modules.reverse_sequence(xs, lengths)
    np.testing.assert_array_equal(
        np.asarray(rev[0, :, 0]), [2, 1, 0, 3, 4, 5]
    )
    np.testing.assert_array_equal(
        np.asarray(rev[1, :, 0]), [11, 10, 9, 8, 7, 6]
    )
    # double reverse is identity
    np.testing.assert_array_equal(
        np.asarray(modules.reverse_sequence(rev, lengths)), np.asarray(xs)
    )


def test_embedding_offset():
    emb = modules.Embedding(num_symbols=10, embedding_dim=8, index_offset=100)
    params = emb.init(jax.random.PRNGKey(0), jnp.array([[100, 105]]))
    out = emb.apply(params, jnp.array([[100, 105]]))
    assert out.shape == (1, 2, 8)
    table = params["params"]["embedding"]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(table[0]))
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(table[5]))


def test_prenet_dropout_always_on():
    prenet = modules.PreNet(out_units=(16, 8), drop_rate=0.5)
    x = jnp.ones((4, 32))
    params = prenet.init(_rngs(), x)
    y1 = prenet.apply(params, x, rngs={"dropout": jax.random.PRNGKey(1)})
    y2 = prenet.apply(params, x, rngs={"dropout": jax.random.PRNGKey(2)})
    assert y1.shape == (4, 8)
    # different dropout rngs → different outputs even outside training
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_highway_identity_when_gate_closed():
    hw = modules.HighwayNet(out_units=8)
    x = jnp.ones((2, 8)) * 0.3
    params = hw.init(jax.random.PRNGKey(0), x)
    y = hw.apply(params, x)
    assert y.shape == x.shape


def test_zoneout_lstm_eval_deterministic_and_interpolates():
    cell = modules.ZoneoutLSTMCell(
        num_units=16, zoneout_factor_cell=0.5, zoneout_factor_output=0.5, is_training=False
    )
    x = jnp.ones((3, 8))
    carry = modules.ZoneoutLSTMCell.initial_state(3, 16)
    params = cell.init(_rngs(), carry, x)
    (c1, h1), y1 = cell.apply(params, carry, x)
    (c2, h2), y2 = cell.apply(params, carry, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2))
    # zoneout towards zero initial state halves magnitude vs factor=0 cell
    cell0 = modules.ZoneoutLSTMCell(num_units=16, is_training=False)
    params0 = {"params": params["params"]}
    (_, _), y0 = cell0.apply(params0, carry, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0) * 0.5, atol=1e-6)


def test_zoneout_lstm_train_mask_is_binary_mixture():
    cell = modules.ZoneoutLSTMCell(
        num_units=32, zoneout_factor_cell=1.0, zoneout_factor_output=1.0, is_training=True
    )
    x = jnp.ones((2, 8))
    carry = modules.ZoneoutLSTMCell.initial_state(2, 32)
    params = cell.init(_rngs(), carry, x)
    (c, h), y = cell.apply(params, carry, x, rngs={"zoneout": jax.random.PRNGKey(3)})
    # factor 1.0 → always keep old state (zeros)
    np.testing.assert_allclose(np.asarray(c), 0.0)
    np.testing.assert_allclose(np.asarray(y), 0.0)


def test_run_rnn_masks_padding():
    cell = modules.ZoneoutLSTMCell(num_units=8, is_training=False)
    xs = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4))
    lengths = jnp.array([3, 5])
    init = modules.ZoneoutLSTMCell.initial_state(2, 8)
    params = cell.init(_rngs(), init, xs[:, 0])

    def run(xs_in, lens):
        return modules.run_rnn(cell.bind(params), xs_in, lens, init)

    final, ys = run(xs, lengths)
    # outputs beyond length are zero
    np.testing.assert_allclose(np.asarray(ys[0, 3:]), 0.0)
    # final carry for row 0 equals carry after 3 steps regardless of padding values
    xs_mod = xs.at[0, 3:].set(99.0)
    final2, _ = run(xs_mod, lengths)
    np.testing.assert_allclose(np.asarray(final[0][0]), np.asarray(final2[0][0]), atol=1e-6)


def test_birnn_shapes_and_direction_sensitivity():
    fwd = modules.GRUCell(num_units=6, name="f")
    bwd = modules.GRUCell(num_units=6, name="b")
    rnn = modules.BiRNN(cell_fwd=fwd, cell_bwd=bwd, rng_names=())
    xs = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 4))
    lengths = jnp.array([4, 7])
    init = jnp.zeros((2, 6))
    params = rnn.init(jax.random.PRNGKey(0), xs, lengths, init, init)
    out = rnn.apply(params, xs, lengths, init, init)
    assert out.shape == (2, 7, 12)
    np.testing.assert_allclose(np.asarray(out[0, 4:]), 0.0)


def test_cbhg_output_shape_and_masking():
    cbhg = modules.CBHG(
        out_units=32,
        conv_channels=16,
        max_filter_width=4,
        projection1_out_channels=16,
        projection2_out_channels=8,
        num_highway=2,
        is_training=False,
    )
    xs = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 8))
    lengths = jnp.array([5, 9])
    variables = cbhg.init(jax.random.PRNGKey(0), xs, lengths)
    out = cbhg.apply(variables, xs, lengths)
    assert out.shape == (2, 9, 32)
    np.testing.assert_allclose(np.asarray(out[0, 5:]), 0.0, atol=1e-6)


def test_cbhg_train_mode_updates_batch_stats():
    cbhg = modules.CBHG(
        out_units=16, conv_channels=8, max_filter_width=2,
        projection1_out_channels=8, projection2_out_channels=4,
        num_highway=1, is_training=True,
    )
    xs = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 4))
    lengths = jnp.array([6, 6])
    variables = cbhg.init(jax.random.PRNGKey(0), xs, lengths)
    out, mutated = cbhg.apply(variables, xs, lengths, mutable=["batch_stats"])
    assert out.shape == (2, 6, 16)
    assert "batch_stats" in mutated
