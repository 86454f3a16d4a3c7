"""Encoders: ZoneoutLSTM baseline, CBHG, self-attention dual-stream variants.

Capability parity with ``self-attention-tacotron/modules/encoder*.py``
(SURVEY.md §2.1 [M] — reconstructed; reference mount empty):

* :class:`ZoneoutEncoderV1` — prenet → bidirectional ZoneoutLSTM memory.
* :class:`EncoderV1` — prenet → CBHG memory (Tacotron v1 lineage).
* :class:`SelfAttentionCBHGEncoder` — prenet → CBHG → memory #1, plus a
  stacked multi-head self-attention transformer over the CBHG output
  producing memory #2 for dual-source attention (arXiv:1810.11960 §3).
* ``...WithAccentType`` variants concatenate an accentual-type embedding
  stream to the phoneme embedding (Japanese pitch-accent configs).

All encoders consume already-embedded inputs (B, T, D) plus lengths and
run full-parallel over the source — encoder compute is pure batched
matmul/conv/scan, no AR loop, so XLA tiles it straight onto the MXU.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from self_attention_tacotron_tpu.models.modules import (
    BiRNN,
    CBHG,
    PreNet,
    ZoneoutLSTMCell,
    sequence_mask,
)
from self_attention_tacotron_tpu.models.self_attention import SelfAttentionTransformer

Dtype = Any


class ZoneoutEncoderV1(nn.Module):
    """Prenet → bidirectional ZoneoutLSTM (baseline Tacotron encoder)."""

    out_units: int = 256          # total across both directions
    prenet_out_units: Tuple[int, ...] = (256, 128)
    drop_rate: float = 0.5
    zoneout_factor_cell: float = 0.1
    zoneout_factor_output: float = 0.1
    is_training: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        assert self.out_units % 2 == 0
        self.prenet = PreNet(
            self.prenet_out_units, self.drop_rate, dtype=self.dtype, name="prenet"
        )
        half = self.out_units // 2
        self.birnn = BiRNN(
            cell_fwd=ZoneoutLSTMCell(
                half,
                self.zoneout_factor_cell,
                self.zoneout_factor_output,
                self.is_training,
                dtype=self.dtype,
                name="lstm_fwd",
            ),
            cell_bwd=ZoneoutLSTMCell(
                half,
                self.zoneout_factor_cell,
                self.zoneout_factor_output,
                self.is_training,
                dtype=self.dtype,
                name="lstm_bwd",
            ),
            use_pallas=self.use_pallas and not self.is_training,
        )

    def __call__(self, embedded: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        x = self.prenet(embedded)
        half = self.out_units // 2
        init = ZoneoutLSTMCell.initial_state(x.shape[0], half, self.dtype)
        return self.birnn(x, lengths, init, init)


class EncoderV1(nn.Module):
    """Prenet → CBHG (Tacotron v1 encoder; companion-repo lineage)."""

    cbhg_out_units: int = 256
    conv_channels: int = 128
    max_filter_width: int = 16
    projection1_out_channels: int = 128
    projection2_out_channels: int = 128
    num_highway: int = 4
    prenet_out_units: Tuple[int, ...] = (256, 128)
    drop_rate: float = 0.5
    is_training: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.prenet = PreNet(
            self.prenet_out_units, self.drop_rate, dtype=self.dtype, name="prenet"
        )
        self.cbhg = CBHG(
            out_units=self.cbhg_out_units,
            conv_channels=self.conv_channels,
            max_filter_width=self.max_filter_width,
            projection1_out_channels=self.projection1_out_channels,
            projection2_out_channels=self.projection2_out_channels,
            num_highway=self.num_highway,
            is_training=self.is_training,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="cbhg",
        )

    def __call__(self, embedded: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        return self.cbhg(self.prenet(embedded), lengths)


class SelfAttentionCBHGEncoder(nn.Module):
    """Prenet → CBHG → (memory1); self-attention stack → (memory2).

    Returns ``(lstm_memory, self_attention_memory, sa_alignments)`` — the
    two streams consumed by dual-source attention (arXiv:1810.11960).
    """

    cbhg_out_units: int = 256
    conv_channels: int = 128
    max_filter_width: int = 16
    projection1_out_channels: int = 128
    projection2_out_channels: int = 128
    num_highway: int = 4
    prenet_out_units: Tuple[int, ...] = (256, 128)
    drop_rate: float = 0.5
    self_attention_out_units: int = 256
    self_attention_num_heads: int = 2
    self_attention_num_hop: int = 1
    self_attention_drop_rate: float = 0.05
    self_attention_ffn_units: int = 1024
    is_training: bool = True
    use_pallas: bool = False
    dtype: Dtype = jnp.float32

    def setup(self):
        self.prenet = PreNet(
            self.prenet_out_units, self.drop_rate, dtype=self.dtype, name="prenet"
        )
        self.cbhg = CBHG(
            out_units=self.cbhg_out_units,
            conv_channels=self.conv_channels,
            max_filter_width=self.max_filter_width,
            projection1_out_channels=self.projection1_out_channels,
            projection2_out_channels=self.projection2_out_channels,
            num_highway=self.num_highway,
            is_training=self.is_training,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="cbhg",
        )
        self.transformer = SelfAttentionTransformer(
            num_hop=self.self_attention_num_hop,
            num_heads=self.self_attention_num_heads,
            num_units=self.self_attention_out_units,
            ffn_units=self.self_attention_ffn_units,
            drop_rate=self.self_attention_drop_rate,
            is_training=self.is_training,
            use_pallas=self.use_pallas,
            dtype=self.dtype,
            name="self_attention",
        )

    def __call__(self, embedded: jnp.ndarray, lengths: jnp.ndarray):
        memory1 = self.cbhg(self.prenet(embedded), lengths)
        mask = sequence_mask(lengths, embedded.shape[1])
        memory2, sa_alignments = self.transformer(memory1, mask=mask)
        return memory1, memory2, sa_alignments


def _concat_accent(embedded: jnp.ndarray, accent_embedded: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([embedded, accent_embedded], axis=-1)


class ZoneoutEncoderV1WithAccentType(ZoneoutEncoderV1):
    """Accent-type embedding concatenated to the phoneme embedding stream."""

    def __call__(self, embedded, accent_embedded, lengths):  # type: ignore[override]
        return super().__call__(_concat_accent(embedded, accent_embedded), lengths)


class SelfAttentionCBHGEncoderWithAccentType(SelfAttentionCBHGEncoder):
    """Dual-stream encoder with accentual-type conditioning (ICASSP'19 JP path)."""

    def __call__(self, embedded, accent_embedded, lengths):  # type: ignore[override]
        return super().__call__(_concat_accent(embedded, accent_embedded), lengths)


def encoder_factory(hparams, is_training: bool, dtype: Dtype = jnp.float32) -> nn.Module:
    """Map ``hparams.encoder`` to an encoder instance (reference factory parity)."""
    name = hparams.encoder
    if name in ("ZoneoutEncoderV1", "ZoneoutEncoderV1WithAccentType"):
        cls = (
            ZoneoutEncoderV1WithAccentType
            if name.endswith("WithAccentType")
            else ZoneoutEncoderV1
        )
        return cls(
            out_units=hparams.encoder_out_units,
            prenet_out_units=hparams.encoder_prenet_out_units,
            drop_rate=hparams.encoder_prenet_drop_rate,
            zoneout_factor_cell=hparams.zoneout_factor_cell,
            zoneout_factor_output=hparams.zoneout_factor_output,
            is_training=is_training,
            use_pallas=hparams.use_pallas_kernels,
            dtype=dtype,
            name="encoder",
        )
    if name == "EncoderV1":
        return EncoderV1(
            cbhg_out_units=hparams.cbhg_out_units,
            conv_channels=hparams.conv_channels,
            max_filter_width=hparams.max_filter_width,
            projection1_out_channels=hparams.projection1_out_channels,
            projection2_out_channels=hparams.projection2_out_channels,
            num_highway=hparams.num_highway,
            prenet_out_units=hparams.encoder_prenet_out_units,
            drop_rate=hparams.encoder_prenet_drop_rate,
            is_training=is_training,
            use_pallas=hparams.use_pallas_kernels,
            dtype=dtype,
            name="encoder",
        )
    if name in ("SelfAttentionCBHGEncoder", "SelfAttentionCBHGEncoderWithAccentType"):
        cls = (
            SelfAttentionCBHGEncoderWithAccentType
            if name.endswith("WithAccentType")
            else SelfAttentionCBHGEncoder
        )
        return cls(
            cbhg_out_units=hparams.cbhg_out_units,
            conv_channels=hparams.conv_channels,
            max_filter_width=hparams.max_filter_width,
            projection1_out_channels=hparams.projection1_out_channels,
            projection2_out_channels=hparams.projection2_out_channels,
            num_highway=hparams.num_highway,
            prenet_out_units=hparams.encoder_prenet_out_units,
            drop_rate=hparams.encoder_prenet_drop_rate,
            self_attention_out_units=hparams.self_attention_out_units,
            self_attention_num_heads=hparams.self_attention_num_heads,
            self_attention_num_hop=hparams.self_attention_num_hop,
            self_attention_drop_rate=hparams.self_attention_drop_rate,
            self_attention_ffn_units=hparams.self_attention_transformer_ffn_units,
            is_training=is_training,
            use_pallas=hparams.use_pallas_kernels,
            dtype=dtype,
            name="encoder",
        )
    raise ValueError(f"unknown encoder: {name!r}")
