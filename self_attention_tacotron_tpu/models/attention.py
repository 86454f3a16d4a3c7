"""Attention mechanisms: additive, location-sensitive, forward, teacher-forcing.

Capability parity with the companion repo's attention library
(``tacotron2/tacotron/attention/`` per SURVEY.md §2.2 [M] — reconstructed;
reference mount empty) plus the attention factory from
``self-attention-tacotron/models`` (SURVEY.md §2.1).

TPU-first design: every mechanism is a pure step function whose entire
recursion state (previous alignments, cumulative alignments, forward
transition probability, step index) lives in an explicit
:class:`AttentionState` pytree carried through ``lax.scan`` /
``lax.while_loop`` — no Python-side state, no dynamic shapes. Scores are
computed in float32 regardless of compute dtype (softmax stability).

Forward attention follows Zhang & Ling (ICASSP 2018, arXiv:1807.06736):
α̂ᵢ(n) = ((1−u)·αᵢ(n−1) + u·αᵢ₋₁(n−1) + ε) · yᵢ(n), renormalized;
optional DNN transition agent producing u.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

Dtype = Any
_EPS = 1e-6
_NEG_INF = -1e9


@flax.struct.dataclass
class AttentionState:
    """Carry for one attention mechanism inside the decoder loop."""

    alignments: jnp.ndarray        # (B, S) previous alignments
    cumulative: jnp.ndarray        # (B, S) cumulative alignments (location-sensitive)
    transition: jnp.ndarray        # (B, 1) forward-attention transition prob u
    step: jnp.ndarray              # () int32 decoder step (teacher forcing)


def initial_attention_state(
    batch: int, src_len: int, *, initial_alignment: str = "uniform"
) -> AttentionState:
    """Fresh state. Forward attention requires ``one_hot`` (mass at index 0)."""
    if initial_alignment == "one_hot":
        align = jnp.tile(
            jnp.eye(src_len, dtype=jnp.float32)[0][None, :], (batch, 1)
        )
    else:
        align = jnp.full((batch, src_len), 1.0 / src_len, jnp.float32)
    return AttentionState(
        alignments=align,
        cumulative=jnp.zeros((batch, src_len), jnp.float32),
        transition=jnp.full((batch, 1), 0.5, jnp.float32),
        step=jnp.zeros((), jnp.int32),
    )


def _masked_softmax(score: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is not None:
        score = jnp.where(mask, score, _NEG_INF)
    return jax.nn.softmax(score.astype(jnp.float32), axis=-1)


def _context(alignments: jnp.ndarray, memory: jnp.ndarray) -> jnp.ndarray:
    # (B, S) @ (B, S, E) -> (B, E); batched matvec rides the MXU.
    return jnp.einsum("bs,bse->be", alignments.astype(memory.dtype), memory)


class AdditiveAttention(nn.Module):
    """Bahdanau additive attention: score = vᵀ tanh(Wq·q + keys)."""

    num_units: int
    dtype: Dtype = jnp.float32
    initial_alignment: str = "uniform"

    def setup(self):
        self.memory_layer = nn.Dense(
            self.num_units, use_bias=False, dtype=self.dtype, name="memory_layer"
        )
        self.query_layer = nn.Dense(
            self.num_units, use_bias=False, dtype=self.dtype, name="query_layer"
        )
        self.attention_v = self.param(
            "attention_v", nn.initializers.glorot_uniform(), (self.num_units, 1), jnp.float32
        )

    def compute_keys(self, memory: jnp.ndarray) -> jnp.ndarray:
        return self.memory_layer(memory)

    def _score(self, query, keys, state, projected_query=None):
        q = projected_query if projected_query is not None else self.query_layer(query)
        return jnp.einsum(
            "bsu,u->bs",
            jnp.tanh(keys + q[:, None, :]).astype(jnp.float32),
            self.attention_v[:, 0].astype(jnp.float32),
        )

    def __call__(self, query, keys, memory, mask, state: AttentionState,
                 projected_query=None):
        probs = _masked_softmax(
            self._score(query, keys, state, projected_query), mask
        )
        new_state = state.replace(
            alignments=probs,
            cumulative=state.cumulative + probs,
            step=state.step + 1,
        )
        return _context(probs, memory), probs, new_state


class LocationSensitiveAttention(nn.Module):
    """Additive attention + convolutional features of (cumulative) alignments.

    Tacotron-2 style (Shen et al. 2018): score = vᵀ tanh(Wq·q + keys + Wf·f),
    f = Conv1d(previous or cumulative alignments).
    """

    num_units: int
    attention_kernel: int = 31
    attention_filters: int = 32
    cumulative_weights: bool = True
    dtype: Dtype = jnp.float32
    initial_alignment: str = "uniform"

    def setup(self):
        self.memory_layer = nn.Dense(
            self.num_units, use_bias=False, dtype=self.dtype, name="memory_layer"
        )
        self.query_layer = nn.Dense(
            self.num_units, use_bias=False, dtype=self.dtype, name="query_layer"
        )
        self.location_conv = nn.Conv(
            self.attention_filters,
            kernel_size=(self.attention_kernel,),
            padding="SAME",
            dtype=self.dtype,
            name="location_conv",
        )
        self.location_layer = nn.Dense(
            self.num_units, use_bias=False, dtype=self.dtype, name="location_layer"
        )
        self.attention_v = self.param(
            "attention_v", nn.initializers.glorot_uniform(), (self.num_units, 1), jnp.float32
        )
        self.attention_b = self.param(
            "attention_b", nn.initializers.zeros, (self.num_units,), jnp.float32
        )

    def compute_keys(self, memory: jnp.ndarray) -> jnp.ndarray:
        return self.memory_layer(memory)

    def _score(self, query, keys, state, projected_query=None):
        q = projected_query if projected_query is not None else self.query_layer(query)
        prev = state.cumulative if self.cumulative_weights else state.alignments
        f = self.location_conv(prev.astype(self.dtype)[..., None])
        loc = self.location_layer(f)
        return jnp.einsum(
            "bsu,u->bs",
            jnp.tanh(
                keys + q[:, None, :] + loc + self.attention_b.astype(self.dtype)
            ).astype(jnp.float32),
            self.attention_v[:, 0].astype(jnp.float32),
        )

    def __call__(self, query, keys, memory, mask, state: AttentionState,
                 projected_query=None):
        probs = _masked_softmax(
            self._score(query, keys, state, projected_query), mask
        )
        new_state = state.replace(
            alignments=probs,
            cumulative=state.cumulative + probs,
            step=state.step + 1,
        )
        return _context(probs, memory), probs, new_state


class ForwardAttention(nn.Module):
    """Forward attention with optional transition agent (Zhang et al. 2018).

    Enforces monotonic left-to-right alignment motion: probability mass can
    only stay (weight 1−u) or advance one position (weight u) before being
    reweighted by the additive-attention posterior and renormalized. The
    recursion state (previous α, u) is carried in :class:`AttentionState`.
    """

    num_units: int
    use_transition_agent: bool = False
    dtype: Dtype = jnp.float32
    initial_alignment: str = "one_hot"

    def setup(self):
        self.memory_layer = nn.Dense(
            self.num_units, use_bias=False, dtype=self.dtype, name="memory_layer"
        )
        self.query_layer = nn.Dense(
            self.num_units, use_bias=False, dtype=self.dtype, name="query_layer"
        )
        self.attention_v = self.param(
            "attention_v", nn.initializers.glorot_uniform(), (self.num_units, 1), jnp.float32
        )
        if self.use_transition_agent:
            self.transition_factor = nn.Dense(
                1, dtype=self.dtype, name="transition_factor"
            )

    def compute_keys(self, memory: jnp.ndarray) -> jnp.ndarray:
        return self.memory_layer(memory)

    def _score(self, query, keys, state, projected_query=None):
        q = projected_query if projected_query is not None else self.query_layer(query)
        return jnp.einsum(
            "bsu,u->bs",
            jnp.tanh(keys + q[:, None, :]).astype(jnp.float32),
            self.attention_v[:, 0].astype(jnp.float32),
        )

    def __call__(self, query, keys, memory, mask, state: AttentionState,
                 projected_query=None):
        y = _masked_softmax(self._score(query, keys, state, projected_query), mask)
        u = state.transition  # (B, 1)
        prev = state.alignments
        shifted = jnp.pad(prev, ((0, 0), (1, 0)))[:, :-1]  # α_{i-1}(n-1)
        alpha_hat = ((1.0 - u) * prev + u * shifted + _EPS) * y
        probs = alpha_hat / jnp.sum(alpha_hat, axis=-1, keepdims=True)
        context = _context(probs, memory)
        if self.use_transition_agent:
            ta_in = jnp.concatenate(
                [context.astype(self.dtype), query.astype(self.dtype)], axis=-1
            )
            new_u = nn.sigmoid(self.transition_factor(ta_in)).astype(jnp.float32)
        else:
            new_u = u
        new_state = state.replace(
            alignments=probs,
            cumulative=state.cumulative + probs,
            transition=new_u,
            step=state.step + 1,
        )
        return context, probs, new_state


class TeacherForcingAttention(nn.Module):
    """Forced diagonal alignment for ``use_forced_alignment_mode``.

    Reference: teacher-forcing attention variants (SURVEY.md §2.1 attention
    factory [M]). Places a soft Gaussian window at position step·ratio using
    the true source/target length ratio — used to extract
    ground-truth-aligned predictions at synthesis time.
    """

    num_units: int
    window: float = 3.0
    dtype: Dtype = jnp.float32
    initial_alignment: str = "one_hot"

    def setup(self):
        # Keys unused by the forced score; kept for interface parity.
        self.memory_layer = nn.Dense(
            self.num_units, use_bias=False, dtype=self.dtype, name="memory_layer"
        )

    def compute_keys(self, memory: jnp.ndarray) -> jnp.ndarray:
        return self.memory_layer(memory)

    def __call__(self, query, keys, memory, mask, state: AttentionState, *,
                 ratio=None, projected_query=None):
        # ratio: (B,) expected source positions per decoder step (S/T_dec).
        s = memory.shape[1]
        if ratio is None:
            ratio = jnp.ones((memory.shape[0],), jnp.float32)
        center = jnp.minimum(state.step.astype(jnp.float32) * ratio, s - 1.0)
        pos = jnp.arange(s, dtype=jnp.float32)[None, :]
        logit = -((pos - center[:, None]) ** 2) / (2.0 * self.window**2)
        probs = _masked_softmax(logit, mask)
        new_state = state.replace(
            alignments=probs,
            cumulative=state.cumulative + probs,
            step=state.step + 1,
        )
        return _context(probs, memory), probs, new_state


def attention_factory(
    name: str,
    num_units: int,
    hparams,
    dtype: Dtype = jnp.float32,
    module_name: Optional[str] = None,
) -> nn.Module:
    """Map an hparams attention string to a mechanism instance.

    Reference: attention factory keyed on ``hparams.attention`` /
    ``hparams.attention2`` (SURVEY.md §2.1 [M]). Known names: ``additive``,
    ``location_sensitive``, ``forward``, ``forward_transition_agent``,
    ``teacher_forcing_forward``, ``teacher_forcing_additive``.
    """
    kw = dict(num_units=num_units, dtype=dtype)
    if module_name:
        kw["name"] = module_name
    if name == "additive":
        return AdditiveAttention(**kw)
    if name == "location_sensitive":
        return LocationSensitiveAttention(
            attention_kernel=hparams.attention_kernel,
            attention_filters=hparams.attention_filters,
            cumulative_weights=hparams.cumulative_weights,
            **kw,
        )
    if name == "forward":
        return ForwardAttention(
            use_transition_agent=hparams.use_forward_attention_transition_agent, **kw
        )
    if name == "forward_transition_agent":
        return ForwardAttention(use_transition_agent=True, **kw)
    if name in ("teacher_forcing_forward", "teacher_forcing_additive"):
        return TeacherForcingAttention(**kw)
    raise ValueError(f"unknown attention mechanism: {name!r}")
