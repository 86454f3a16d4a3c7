"""Core neural module library (TPU-first rewrite of the companion repo's modules).

Capability parity with ``tacotron2/tacotron/modules.py`` and
``tacotron2/tacotron/rnn_impl.py`` (SURVEY.md §2.2 — reconstructed paths;
reference mount empty): ``Embedding``, ``PreNet`` (dropout active at
inference, a deliberate reference quirk), ``Conv1d``+BatchNorm,
``HighwayNet``, ``CBHG`` (conv bank → max-pool → projections → highway →
BiGRU) and ``ZoneoutLSTMCell``.

TPU-first design notes:

* All recurrences run under ``lax.scan`` (via ``nn.scan``-lifted cells)
  with static shapes; padding is handled by masks, never dynamic shapes.
* LSTM/GRU gates are computed as one fused matmul over ``[x, h]`` so each
  step is a single MXU op instead of eight small ones.
* Everything takes a ``dtype`` for bfloat16 compute with float32 params.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B, max_len) boolean mask, True where index < length."""
    return jnp.arange(max_len)[None, :] < lengths[:, None]


def reverse_sequence(xs: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Flip each row's first ``length`` steps, keeping padding in place.

    xs: (B, T, ...). Replaces tf.reverse_sequence for bidirectional RNNs.
    """
    t = xs.shape[1]
    idx = jnp.arange(t)[None, :]
    rev = lengths[:, None] - 1 - idx
    gather = jnp.where(idx < lengths[:, None], rev, idx)
    return jnp.take_along_axis(
        xs, gather.reshape(gather.shape + (1,) * (xs.ndim - 2)), axis=1
    )


class Embedding(nn.Module):
    """Symbol embedding with optional index offset (accent-type vocab offsets).

    Reference: tacotron2/tacotron/modules.py Embedding [M]; offsets used by
    the accent-type path (SURVEY.md §2.1 "Japanese pitch-accent support").
    """

    num_symbols: int
    embedding_dim: int
    index_offset: int = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.5),
            (self.num_symbols, self.embedding_dim),
            jnp.float32,
        )
        ids = jnp.clip(ids - self.index_offset, 0, self.num_symbols - 1)
        return jnp.take(table, ids, axis=0).astype(self.dtype)


class PreNet(nn.Module):
    """FC → ReLU → Dropout stack. Dropout stays ON at inference.

    The always-on dropout is load-bearing: Tacotron's autoregressive decoder
    relies on prenet dropout at synthesis time for output variation
    (reference PreNet applies dropout unconditionally [M]).

    TPU perf note: sampling a fresh threefry mask inside the AR while-loop
    costs ~100 µs/step on v5e — far more than the prenet matmuls. The AR
    decode driver therefore precomputes per-step masks in ONE rng call and
    passes them via ``dropout_masks`` (same keep/scale semantics as
    ``nn.Dropout``); when absent we fall back to per-call rng draws.
    """

    out_units: Sequence[int]
    drop_rate: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        dropout_masks: Optional[Sequence[jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        keep = 1.0 - self.drop_rate
        for i, units in enumerate(self.out_units):
            x = nn.relu(nn.Dense(units, dtype=self.dtype)(x))
            if dropout_masks is not None:
                mask = dropout_masks[i]
                x = jnp.where(mask, x / keep, jnp.zeros_like(x))
            else:
                x = nn.Dropout(rate=self.drop_rate, deterministic=False)(x)
        return x


class Conv1dBN(nn.Module):
    """1-D convolution + batch norm + optional activation (reference Conv1d)."""

    kernel_size: int
    out_channels: int
    activation: Optional[Callable] = nn.relu
    is_training: bool = True
    use_batch_norm: bool = True
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, C)
        x = nn.Conv(
            self.out_channels,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            use_bias=not self.use_batch_norm,
            dtype=self.dtype,
        )(x)
        if self.use_batch_norm:
            x = nn.BatchNorm(
                use_running_average=not self.is_training,
                momentum=0.99,
                epsilon=1e-3,
                dtype=self.dtype,
            )(x)
        if self.activation is not None:
            x = self.activation(x)
        if self.drop_rate > 0.0:
            x = nn.Dropout(rate=self.drop_rate, deterministic=not self.is_training)(x)
        return x


class HighwayNet(nn.Module):
    """Highway layer: T·H(x) + (1−T)·x with transform-gate bias −1."""

    out_units: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Dense(self.out_units, dtype=self.dtype, name="H")(x))
        t = nn.sigmoid(
            nn.Dense(
                self.out_units,
                dtype=self.dtype,
                bias_init=nn.initializers.constant(-1.0),
                name="T",
            )(x)
        )
        return h * t + x * (1.0 - t)


# --------------------------------------------------------------------------- #
# Recurrent cells
# --------------------------------------------------------------------------- #

LSTMCarry = Tuple[jnp.ndarray, jnp.ndarray]  # (c, h)


class ZoneoutLSTMCell(nn.Module):
    """LSTM cell with zoneout on cell and hidden state.

    Reference: tacotron2/tacotron/rnn_impl.py ZoneoutLSTMCell [M]
    (Krueger et al. 2017). Train: with prob ``z`` keep previous state
    (binary mask per unit); eval: deterministic interpolation
    ``z·prev + (1−z)·new``. Gates fused into one matmul for the MXU.
    """

    num_units: int
    zoneout_factor_cell: float = 0.0
    zoneout_factor_output: float = 0.0
    is_training: bool = True
    forget_bias: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        carry: LSTMCarry,
        x: jnp.ndarray,
        zoneout_masks: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """``zoneout_masks``: optional precomputed (keep_old_c, keep_old_h)
        boolean masks for this step. Sampling threefry bits inside an
        ``nn.scan`` costs ~16 µs/decoder-step on the training path
        (scripts/profile_train_ablate.py); callers that scan this cell
        should draw every step's masks in ONE vectorized call and pass
        them as scanned inputs (same Bernoulli(factor) distribution)."""
        c, h = carry
        zx = nn.Dense(4 * self.num_units, dtype=self.dtype, name="gates")(
            jnp.concatenate([x, h], axis=-1)
        )
        i, g, f, o = jnp.split(zx, 4, axis=-1)
        new_c = nn.sigmoid(f + self.forget_bias) * c + nn.sigmoid(i) * jnp.tanh(g)
        new_h = nn.sigmoid(o) * jnp.tanh(new_c)

        def zoneout(new, old, factor, rng_name, mask):
            if factor <= 0.0:
                return new
            if self.is_training:
                keep_old = (
                    mask
                    if mask is not None
                    else jax.random.bernoulli(
                        self.make_rng(rng_name), factor, new.shape
                    )
                )
                return jnp.where(keep_old, old, new)
            return factor * old + (1.0 - factor) * new

        mc, mh = zoneout_masks if zoneout_masks is not None else (None, None)
        out_c = zoneout(new_c, c, self.zoneout_factor_cell, "zoneout", mc)
        out_h = zoneout(new_h, h, self.zoneout_factor_output, "zoneout", mh)
        return (out_c, out_h), out_h

    @staticmethod
    def initial_state(batch: int, num_units: int, dtype: Dtype = jnp.float32) -> LSTMCarry:
        z = jnp.zeros((batch, num_units), dtype)
        return (z, z)


class GRUCell(nn.Module):
    """GRU cell with fused gate matmuls (CBHG's bidirectional RNN)."""

    num_units: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray, x: jnp.ndarray):
        rz = nn.Dense(2 * self.num_units, dtype=self.dtype, name="gates")(
            jnp.concatenate([x, h], axis=-1)
        )
        r, z = jnp.split(nn.sigmoid(rz), 2, axis=-1)
        n = jnp.tanh(
            nn.Dense(self.num_units, dtype=self.dtype, name="candidate")(
                jnp.concatenate([x, r * h], axis=-1)
            )
        )
        new_h = (1.0 - z) * n + z * h
        return new_h, new_h


def run_rnn(
    cell: nn.Module,
    xs: jnp.ndarray,
    lengths: Optional[jnp.ndarray],
    initial_carry,
    *,
    reverse: bool = False,
    rng_names: Sequence[str] = ("zoneout",),
):
    """Run ``cell`` over time axis 1 of ``xs`` under ``nn.scan``.

    Padded steps neither update the carry nor emit state (masked), so the
    final carry equals the state at each row's true length. ``reverse``
    flips the valid region only (padding stays at the end).
    """
    if reverse:
        assert lengths is not None
        xs = reverse_sequence(xs, lengths)

    t = xs.shape[1]
    steps = jnp.arange(t)

    def step(cell, carry, inp):
        prev, t_idx = carry
        new_carry, y = cell(prev, inp)
        if lengths is not None:
            valid = (t_idx < lengths).reshape((-1,) + (1,) * (y.ndim - 1))
            new_carry = jax.tree.map(
                lambda n, p: jnp.where(valid, n, p), new_carry, prev
            )
            y = jnp.where(valid, y, jnp.zeros_like(y))
        return (new_carry, t_idx + 1), y

    scan = nn.scan(
        step,
        variable_broadcast=["params", "batch_stats"],
        split_rngs={"params": False, **{name: True for name in rng_names}},
        in_axes=1,
        out_axes=1,
    )
    (final_carry, _), ys = scan(cell, (initial_carry, jnp.zeros((), jnp.int32)), xs)
    del steps
    if reverse:
        ys = reverse_sequence(ys, lengths)
    return final_carry, ys


class BiRNN(nn.Module):
    """Bidirectional RNN over padded batches; concatenates both directions.

    ``use_pallas``: on non-CPU backends at eval, GRU cells run as ONE fused
    Pallas kernel (ops/fused_rnn.py) — the sequential scan is dispatch-
    bound under XLA on the serving path (~26 ms vs ~1 ms at (32,128,128)).
    """

    cell_fwd: nn.Module
    cell_bwd: nn.Module
    rng_names: Sequence[str] = ("zoneout",)
    use_pallas: bool = False
    is_training: bool = False

    def __call__(self, xs, lengths, initial_carry_fwd, initial_carry_bwd):
        if (
            self.use_pallas
            and not self.is_initializing()
            and jax.default_backend() != "cpu"
        ):
            if isinstance(self.cell_fwd, GRUCell):
                # bigru_train's primal IS the fused forward kernel, so
                # eval takes the same path; under jax.grad the custom VJP
                # replaces the flax axes_scan backward (~1.1 ms/train
                # step at bench shapes — BASELINE.md r5 attribution). The
                # backward-carry kernel needs H lane-tile aligned for the
                # in-kernel r/z gate slices; unaligned widths keep the
                # XLA scan in training and the eval-only kernel otherwise.
                if self.cell_fwd.num_units % 128 == 0:
                    from self_attention_tacotron_tpu.ops.fused_rnn import (
                        bigru_train,
                    )

                    return bigru_train(
                        xs,
                        lengths,
                        self.cell_fwd.variables["params"],
                        self.cell_bwd.variables["params"],
                        hidden=self.cell_fwd.num_units,
                    )
                if not self.is_training:
                    from self_attention_tacotron_tpu.ops.fused_rnn import (
                        bigru_pallas,
                    )

                    return bigru_pallas(
                        xs,
                        lengths,
                        self.cell_fwd.variables["params"],
                        self.cell_bwd.variables["params"],
                        hidden=self.cell_fwd.num_units,
                    )
            if isinstance(self.cell_fwd, ZoneoutLSTMCell) and not self.cell_fwd.is_training:
                from self_attention_tacotron_tpu.ops.fused_rnn import bilstm_pallas

                return bilstm_pallas(
                    xs,
                    lengths,
                    self.cell_fwd.variables["params"],
                    self.cell_bwd.variables["params"],
                    hidden=self.cell_fwd.num_units,
                    zoneout_cell=self.cell_fwd.zoneout_factor_cell,
                    zoneout_output=self.cell_fwd.zoneout_factor_output,
                )
        _, ys_f = run_rnn(
            self.cell_fwd, xs, lengths, initial_carry_fwd, rng_names=self.rng_names
        )
        _, ys_b = run_rnn(
            self.cell_bwd,
            xs,
            lengths,
            initial_carry_bwd,
            reverse=True,
            rng_names=self.rng_names,
        )
        return jnp.concatenate([ys_f, ys_b], axis=-1)


class CBHG(nn.Module):
    """Conv bank (1..K) → max-pool → conv projections → highway → BiGRU.

    Reference: tacotron2/tacotron/modules.py CBHG [M] (Tacotron v1, Wang et
    al. 2017). ``out_units`` is the total output dim (BiGRU = 2 × half).
    """

    out_units: int
    conv_channels: int = 128
    max_filter_width: int = 16
    projection1_out_channels: int = 128
    projection2_out_channels: int = 128
    num_highway: int = 4
    is_training: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T, C)
        mask = sequence_mask(lengths, x.shape[1])[..., None].astype(x.dtype)
        x = x * mask
        bank = jnp.concatenate(
            [
                Conv1dBN(
                    kernel_size=k,
                    out_channels=self.conv_channels,
                    is_training=self.is_training,
                    dtype=self.dtype,
                    name=f"conv_bank_{k}",
                )(x)
                for k in range(1, self.max_filter_width + 1)
            ],
            axis=-1,
        )
        pooled = nn.max_pool(
            bank, window_shape=(2,), strides=(1,), padding="SAME"
        )
        proj = Conv1dBN(
            kernel_size=3,
            out_channels=self.projection1_out_channels,
            is_training=self.is_training,
            dtype=self.dtype,
            name="proj1",
        )(pooled)
        proj = Conv1dBN(
            kernel_size=3,
            out_channels=self.projection2_out_channels,
            activation=None,
            is_training=self.is_training,
            dtype=self.dtype,
            name="proj2",
        )(proj)
        highway = proj + x  # residual (dims must match: projection2 == input C)
        if highway.shape[-1] != self.out_units // 2:
            highway = nn.Dense(
                self.out_units // 2, dtype=self.dtype, name="highway_in"
            )(highway)
        for i in range(self.num_highway):
            highway = HighwayNet(
                self.out_units // 2, dtype=self.dtype, name=f"highway_{i}"
            )(highway)
        highway = highway * mask
        half = self.out_units // 2
        rnn = BiRNN(
            cell_fwd=GRUCell(half, dtype=self.dtype, name="gru_fwd"),
            cell_bwd=GRUCell(half, dtype=self.dtype, name="gru_bwd"),
            rng_names=(),
            # the GRU cell is deterministic, so the fused kernel is exact
            # in training too (bigru_train carries a custom VJP); BiRNN
            # itself gates the train path on lane alignment
            use_pallas=self.use_pallas,
            is_training=self.is_training,
        )
        init = jnp.zeros((x.shape[0], half), self.dtype)
        return rnn(highway, lengths, init, init)


class Projection(nn.Module):
    """Linear projection to (r × out_dim) frames + optional activation."""

    out_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(self.out_dim, dtype=self.dtype)(x)
