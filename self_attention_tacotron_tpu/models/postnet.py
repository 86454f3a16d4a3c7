"""Post-nets: conv-residual mel refinement (v2) and CBHG → linear spectrogram.

Capability parity with the reference postnet paths (SURVEY.md §2.1
"Postnet(s)" [M] — reconstructed; mount empty): (a) Tacotron-2-style conv
stack predicting a residual added to the decoder mel output; (b) Tacotron-
1-style post-CBHG mapping mel frames to a linear spectrogram, enabling the
Griffin-Lim vocoder feature path named in BASELINE.json.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from self_attention_tacotron_tpu.models.modules import CBHG, Conv1dBN

Dtype = Any


class PostNetV2(nn.Module):
    """Conv(tanh)×(L−1) → Conv(linear) residual over the decoder output."""

    out_dim: int                     # num_mels
    num_layers: int = 5
    kernel_size: int = 5
    out_channels: int = 512
    drop_rate: float = 0.5
    is_training: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, cond: jnp.ndarray = None) -> jnp.ndarray:
        """``cond``: optional per-utterance conditioning (B, D) — the
        speaker/channel embedding when ``hparams.channel_id_to_postnet``
        is set (reference VCTK knob), broadcast over time and concatenated
        to the input of the conv stack."""
        h = x
        if cond is not None:
            b, t, _ = x.shape
            h = jnp.concatenate(
                [h, jnp.broadcast_to(cond[:, None, :], (b, t, cond.shape[-1]))],
                axis=-1,
            )
        for i in range(self.num_layers - 1):
            h = Conv1dBN(
                kernel_size=self.kernel_size,
                out_channels=self.out_channels,
                activation=jnp.tanh,
                is_training=self.is_training,
                drop_rate=self.drop_rate,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(h)
        h = Conv1dBN(
            kernel_size=self.kernel_size,
            out_channels=self.out_dim,
            activation=None,
            is_training=self.is_training,
            drop_rate=self.drop_rate,
            dtype=self.dtype,
            name=f"conv_{self.num_layers - 1}",
        )(h)
        return x + h


class PostCBHG(nn.Module):
    """CBHG over predicted mel → linear-spectrogram frames (Griffin-Lim path)."""

    out_dim: int                     # num_freq linear bins
    cbhg_out_units: int = 256
    conv_channels: int = 128
    max_filter_width: int = 8
    projection1_out_channels: int = 256
    projection2_out_channels: int = 80
    num_highway: int = 4
    is_training: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        h = CBHG(
            out_units=self.cbhg_out_units,
            conv_channels=self.conv_channels,
            max_filter_width=self.max_filter_width,
            projection1_out_channels=self.projection1_out_channels,
            projection2_out_channels=self.projection2_out_channels,
            num_highway=self.num_highway,
            is_training=self.is_training,
            dtype=self.dtype,
            name="cbhg",
        )(mel, lengths)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="linear")(h)
