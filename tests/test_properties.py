"""Hypothesis property tests over randomized shapes (SURVEY.md §4 strategy)."""

import hypothesis
import hypothesis.strategies as st
import jax
import jax.numpy as jnp
import numpy as np

from self_attention_tacotron_tpu.models import attention as attn
from self_attention_tacotron_tpu.models import modules

SETTINGS = hypothesis.settings(
    max_examples=10, deadline=None, derandomize=True,
    suppress_health_check=[hypothesis.HealthCheck.too_slow],
)


@hypothesis.given(
    batch=st.integers(1, 4),
    units=st.integers(1, 24),
    in_dim=st.integers(1, 16),
    zc=st.floats(0.0, 1.0),
    zo=st.floats(0.0, 1.0),
)
@SETTINGS
def test_zoneout_lstm_shapes_and_finiteness(batch, units, in_dim, zc, zo):
    cell = modules.ZoneoutLSTMCell(
        num_units=units, zoneout_factor_cell=zc, zoneout_factor_output=zo,
        is_training=True,
    )
    carry = modules.ZoneoutLSTMCell.initial_state(batch, units)
    x = jnp.ones((batch, in_dim))
    rngs = {"params": jax.random.PRNGKey(0), "zoneout": jax.random.PRNGKey(1)}
    params = cell.init(rngs, carry, x)
    (c, h), y = cell.apply(params, carry, x, rngs={"zoneout": jax.random.PRNGKey(2)})
    assert c.shape == h.shape == y.shape == (batch, units)
    assert np.isfinite(np.asarray(y)).all()
    # zoneout keeps state inside the hull of old and new values
    assert np.abs(np.asarray(c)).max() <= 1.0 + 1e-5  # tanh-bounded candidates


@hypothesis.given(
    batch=st.integers(1, 3),
    src=st.integers(2, 12),
    units=st.integers(2, 16),
    mem_dim=st.integers(1, 8),
    mechanism=st.sampled_from(["additive", "location_sensitive", "forward"]),
)
@SETTINGS
def test_attention_is_distribution_any_shape(batch, src, units, mem_dim, mechanism):
    from self_attention_tacotron_tpu.hparams import HParams
    import flax.linen as nn

    mech = attn.attention_factory(mechanism, units, HParams())

    class Net(nn.Module):
        def setup(self):
            self.m = mech

        def __call__(self, q, mem, state):
            keys = self.m.compute_keys(mem)
            return self.m(q, keys, mem, None, state)

    memory = jnp.asarray(np.random.RandomState(0).rand(batch, src, mem_dim), jnp.float32)
    query = jnp.zeros((batch, units))
    state = attn.initial_attention_state(batch, src, initial_alignment=mech.initial_alignment)
    net = Net()
    variables = net.init(jax.random.PRNGKey(0), query, memory, state)
    ctx, probs, new_state = net.apply(variables, query, memory, state)
    p = np.asarray(probs)
    assert p.shape == (batch, src)
    assert (p >= 0).all()
    np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)
    assert ctx.shape == (batch, mem_dim)


@hypothesis.given(
    batch=st.integers(1, 3),
    t=st.integers(1, 10),
    lengths_frac=st.floats(0.3, 1.0),
)
@SETTINGS
def test_reverse_sequence_involution(batch, t, lengths_frac):
    xs = jnp.asarray(np.random.RandomState(1).rand(batch, t, 2), jnp.float32)
    lengths = jnp.asarray(
        np.maximum(1, (np.full((batch,), t) * lengths_frac).astype(np.int64))
    )
    rev = modules.reverse_sequence(xs, lengths)
    back = modules.reverse_sequence(rev, lengths)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xs), atol=1e-6)
