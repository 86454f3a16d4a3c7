import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.hparams import HParams
from self_attention_tacotron_tpu.models import attention as attn
from self_attention_tacotron_tpu.models import self_attention as sa


B, S, E, Q, U = 2, 7, 12, 10, 16


class _Net(nn.Module):
    """Adopt a mechanism in setup so keys+step can run under one apply."""

    mech: nn.Module

    def setup(self):
        self.attention = self.mech

    def __call__(self, query, memory, mask, state, ratio=None):
        keys = self.attention.compute_keys(memory)
        if ratio is not None:
            return self.attention(query, keys, memory, mask, state, ratio=ratio)
        return self.attention(query, keys, memory, mask, state)


def _setup(mech):
    memory = jax.random.normal(jax.random.PRNGKey(0), (B, S, E))
    query = jax.random.normal(jax.random.PRNGKey(1), (B, Q))
    mask = jnp.array([[True] * 5 + [False] * 2, [True] * 7])
    state = attn.initial_attention_state(B, S, initial_alignment=mech.initial_alignment)
    return memory, query, mask, state


@pytest.mark.parametrize(
    "name",
    ["additive", "location_sensitive", "forward", "forward_transition_agent"],
)
def test_mechanisms_produce_normalized_masked_alignments(name):
    hp = HParams()
    mech = attn.attention_factory(name, U, hp)
    memory, query, mask, state = _setup(mech)
    net = _Net(mech=mech)
    variables = net.init(jax.random.PRNGKey(2), query, memory, mask, state)
    context, probs, new_state = net.apply(variables, query, memory, mask, state)
    assert context.shape == (B, E)
    assert probs.shape == (B, S)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    # masked positions get zero probability
    np.testing.assert_allclose(np.asarray(probs[0, 5:]), 0.0, atol=1e-6)
    assert int(new_state.step) == 1
    np.testing.assert_allclose(
        np.asarray(new_state.cumulative), np.asarray(state.cumulative + probs), atol=1e-6
    )


def test_forward_attention_recursion_hand_computed():
    """Check the α update against a hand-evaluated case with known y and u."""
    prev_alpha = np.array([[0.6, 0.3, 0.1, 0.0]], np.float32)
    u = 0.5
    y = np.array([[0.1, 0.2, 0.3, 0.4]], np.float32)
    shifted = np.array([[0.0, 0.6, 0.3, 0.1]], np.float32)
    alpha_hat = ((1 - u) * prev_alpha + u * shifted + 1e-6) * y
    expected = alpha_hat / alpha_hat.sum()

    # the module's α update must match the closed form when softmax(score)==y;
    # verify the exact arithmetic path used by ForwardAttention.__call__
    uj = jnp.asarray([[u]], jnp.float32)
    prev = jnp.asarray(prev_alpha)
    shiftedj = jnp.pad(prev, ((0, 0), (1, 0)))[:, :-1]
    alpha_hatj = ((1 - uj) * prev + uj * shiftedj + 1e-6) * jnp.asarray(y)
    got = alpha_hatj / alpha_hatj.sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)

    # end-to-end: module emits a valid distribution from this state
    mech = attn.ForwardAttention(num_units=U)
    memory = jax.random.normal(jax.random.PRNGKey(0), (1, 4, E))
    state = attn.initial_attention_state(1, 4, initial_alignment="one_hot")
    state = state.replace(alignments=prev, transition=uj)
    net = _Net(mech=mech)
    query = jnp.zeros((1, Q))
    variables = net.init(jax.random.PRNGKey(1), query, memory, None, state)
    ctx, probs, ns = net.apply(variables, query, memory, None, state)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ns.transition), np.asarray(uj))


def test_forward_attention_monotonic_mass_shift():
    """With u=1 the mass must move exactly one step right each call."""
    mech = attn.ForwardAttention(num_units=U)
    memory = jax.random.normal(jax.random.PRNGKey(0), (1, 5, E))
    state = attn.initial_attention_state(1, 5, initial_alignment="one_hot")
    state = state.replace(transition=jnp.ones((1, 1)))
    net = _Net(mech=mech)
    query = jnp.zeros((1, Q))
    variables = net.init(jax.random.PRNGKey(1), query, memory, None, state)
    peaks = []
    for _ in range(3):
        ctx, probs, state = net.apply(variables, query, memory, None, state)
        state = state.replace(transition=jnp.ones((1, 1)))
        peaks.append(int(np.asarray(probs[0]).argmax()))
    assert peaks == [1, 2, 3]


def test_teacher_forcing_attention_diagonal():
    mech = attn.TeacherForcingAttention(num_units=U)
    memory = jax.random.normal(jax.random.PRNGKey(0), (1, 20, E))
    state = attn.initial_attention_state(1, 20, initial_alignment="one_hot")
    net = _Net(mech=mech)
    query = jnp.zeros((1, Q))
    ratio = jnp.array([2.0])  # 2 source positions per decoder step
    variables = net.init(jax.random.PRNGKey(1), query, memory, None, state, ratio)
    peaks = []
    for _ in range(5):
        ctx, probs, state = net.apply(variables, query, memory, None, state, ratio)
        peaks.append(int(np.asarray(probs[0]).argmax()))
    assert peaks == [0, 2, 4, 6, 8]


def test_attention_factory_unknown_raises():
    with pytest.raises(ValueError):
        attn.attention_factory("nope", 8, HParams())


# ------------------------- self-attention ------------------------- #


def test_positional_encoding_values():
    pe = np.asarray(sa.positional_encoding(4, 6))
    assert pe.shape == (4, 6)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)  # cos(0)
    assert abs(pe[1, 0] - np.sin(1.0)) < 1e-6


def test_multi_head_attention_full_and_masked():
    mha = sa.MultiHeadAttention(num_heads=2, num_units=16, is_training=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 5, 16))
    mask = jnp.array([[True, True, True, False, False], [True] * 5])
    variables = mha.init(jax.random.PRNGKey(1), x, mask)
    out, probs = mha.apply(variables, x, mask)
    assert out.shape == (B, 5, 16)
    assert probs.shape == (B, 2, 5, 5)
    np.testing.assert_allclose(np.asarray(probs[0, :, :, 3:]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, atol=1e-5)


def test_multi_head_attention_causal():
    mha = sa.MultiHeadAttention(num_heads=2, num_units=8, is_training=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8))
    variables = mha.init(jax.random.PRNGKey(1), x)
    _, probs = mha.apply(variables, x, None, True)
    p = np.asarray(probs[0, 0])
    assert np.allclose(p[0, 1:], 0.0)
    assert np.allclose(p[2, 3:], 0.0)


def test_incremental_matches_full_causal_attention():
    """KV-cache fused step decoding must equal full causal attention rows."""
    mha = sa.MultiHeadAttention(num_heads=2, num_units=8, is_training=False)
    T = 5
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, 8))
    variables = mha.init(jax.random.PRNGKey(1), x)
    full_out, _ = mha.apply(variables, x, None, True)

    k_cache = jnp.zeros((B, T, 8))
    v_cache = jnp.zeros((B, T, 8))
    for t in range(T):
        step_out, k_cache, v_cache = mha.apply(
            variables, x[:, t], k_cache, v_cache, jnp.int32(t),
            method=sa.MultiHeadAttention.fused_step,
        )
        np.testing.assert_allclose(
            np.asarray(step_out), np.asarray(full_out[:, t]), atol=1e-5
        )


def test_transformer_stack_shapes():
    net = sa.SelfAttentionTransformer(
        num_hop=2, num_heads=2, num_units=16, ffn_units=32, is_training=False
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 6, 10))
    mask = jnp.array([[True] * 4 + [False] * 2, [True] * 6])
    variables = net.init(jax.random.PRNGKey(1), x, mask)
    out, probs = net.apply(variables, x, mask)
    assert out.shape == (B, 6, 16)
    assert len(probs) == 2
    np.testing.assert_allclose(np.asarray(out[0, 4:]), 0.0, atol=1e-6)
