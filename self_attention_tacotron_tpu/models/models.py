"""Top-level networks, estimator-style model classes, and the model factory.

Capability parity with ``self-attention-tacotron/models/models.py``
(SURVEY.md §2.1 [M] — reconstructed; mount empty): model classes binding
encoder → decoder → postnet with losses for TRAIN / EVAL / PREDICT, keyed
by ``hparams.tacotron_model`` through :func:`tacotron_model_factory`.

TPU-first structure: :class:`TacotronNetwork` is one flax module holding
embeddings, encoder, decoder, and postnets, with *methods* for each phase
(full teacher-forced ``__call__`` for training; ``encode`` +
``decoder_step`` + ``decoder_post_step`` for the on-device AR while-loop
in ops/decode_loop.py). The estimator-flavored model classes below pin
the reference model names to network configurations and own the loss.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from self_attention_tacotron_tpu.hparams import HParams
from self_attention_tacotron_tpu.models import losses as losses_lib
from self_attention_tacotron_tpu.models.attention import attention_factory
from self_attention_tacotron_tpu.models.decoders import (
    Decoder,
    DecoderConditioning,
    decoder_factory,
)
from self_attention_tacotron_tpu.models.encoders import encoder_factory
from self_attention_tacotron_tpu.models.modules import Embedding, sequence_mask
from self_attention_tacotron_tpu.models.postnet import PostCBHG, PostNetV2

Dtype = Any


@flax.struct.dataclass
class NetworkOutput:
    """Teacher-forced forward outputs (training/eval)."""

    frames: Dict[str, jnp.ndarray]            # head → (B, T, dim) pre-postnet
    postnet_frames: Optional[jnp.ndarray]     # refined mel (PostNetV2) or None
    linear_frames: Optional[jnp.ndarray]      # linear spec (PostCBHG) or None
    stop_logits: jnp.ndarray                  # (B, T)
    alignments: Tuple[jnp.ndarray, ...]       # per source (B, N_steps, S)
    encoder_sa_alignments: Tuple[jnp.ndarray, ...]
    decoder_sa_alignments: Tuple[jnp.ndarray, ...]


def _dtype_of(hparams: HParams):
    return jnp.bfloat16 if hparams.compute_dtype == "bfloat16" else jnp.float32


def _build_attention_mechs(hparams: HParams, dual: bool, is_training: bool, dtype):
    if dual:
        names = (hparams.attention, hparams.attention2)
        units = (hparams.attention1_out_units, hparams.attention2_out_units)
    else:
        names = (hparams.attention,)
        units = (hparams.attention1_out_units,)
    if is_training:
        # forced-alignment mode only applies at prediction time
        names = tuple(n.replace("teacher_forcing_", "") for n in names)
    return tuple(
        attention_factory(n, u, hparams, dtype=dtype, module_name=f"attention_{i}")
        for i, (n, u) in enumerate(zip(names, units))
    )


class TacotronNetwork(nn.Module):
    """Embeddings + encoder + AR decoder + postnets, one flax module."""

    hparams: HParams
    is_training: bool = True

    @property
    def dual_source(self) -> bool:
        return "DualSource" in self.hparams.decoder

    @property
    def dtype(self):
        return _dtype_of(self.hparams)

    def setup(self):
        hp = self.hparams
        dtype = self.dtype
        self.embedding = Embedding(
            hp.num_symbols, hp.embedding_dim, dtype=dtype, name="embedding"
        )
        if hp.use_accent_type:
            self.accent_embedding = Embedding(
                hp.num_accent_type,
                hp.accent_type_embedding_dim,
                index_offset=hp.accent_type_offset,
                dtype=dtype,
                name="accent_embedding",
            )
        if hp.use_speaker_embedding:
            self.speaker_embedding = Embedding(
                hp.num_speakers,
                hp.speaker_embedding_dim,
                index_offset=hp.speaker_embedding_offset,
                dtype=dtype,
                name="speaker_embedding",
            )
        self.encoder = encoder_factory(hp, self.is_training, dtype)
        mechs = _build_attention_mechs(hp, self.dual_source, self.is_training, dtype)
        self.decoder: Decoder = decoder_factory(hp, mechs, self.is_training, dtype)
        if hp.use_postnet_v2:
            self.postnet = PostNetV2(
                out_dim=hp.num_mels,
                num_layers=hp.postnet_v2_num_layers,
                kernel_size=hp.postnet_v2_kernel_size,
                out_channels=hp.postnet_v2_out_channels,
                drop_rate=hp.postnet_v2_drop_rate,
                is_training=self.is_training,
                dtype=dtype,
                name="postnet_v2",
            )
        if hp.use_linear_spectrogram_postnet:
            self.post_cbhg = PostCBHG(
                out_dim=hp.num_freq,
                projection2_out_channels=hp.num_mels,
                is_training=self.is_training,
                dtype=dtype,
                name="post_cbhg",
            )

    # ------------------------------------------------------------------ #
    # Encoding
    # ------------------------------------------------------------------ #

    def encode(
        self,
        source: jnp.ndarray,            # (B, S) int32 symbol ids
        source_lengths: jnp.ndarray,    # (B,)
        accent_type: Optional[jnp.ndarray] = None,
        speaker_id: Optional[jnp.ndarray] = None,
    ):
        """Returns (cond: DecoderConditioning, encoder_sa_alignments)."""
        hp = self.hparams
        embedded = self.embedding(source)
        args = (embedded, source_lengths)
        if hp.use_accent_type:
            if accent_type is None:
                raise ValueError("use_accent_type=True requires accent_type input")
            args = (embedded, self.accent_embedding(accent_type), source_lengths)
        enc_out = self.encoder(*args)

        sa_aligns: Tuple[jnp.ndarray, ...] = ()
        if isinstance(enc_out, tuple) and len(enc_out) == 3:
            memory1, memory2, sa_aligns = enc_out
            memories = (memory1, memory2) if self.dual_source else (memory1,)
            sa_aligns = tuple(sa_aligns)
        else:
            if self.dual_source:
                raise ValueError(
                    f"decoder {hp.decoder!r} needs a dual-stream encoder, "
                    f"got {hp.encoder!r}"
                )
            memories = (enc_out,)

        mask = sequence_mask(source_lengths, source.shape[1])
        masks = tuple(mask for _ in memories)
        speaker_embed = None
        if hp.use_speaker_embedding:
            if speaker_id is None:
                raise ValueError("use_speaker_embedding=True requires speaker_id input")
            speaker_embed = self.speaker_embedding(speaker_id)

        keys = self.decoder.compute_keys(memories)
        cond = DecoderConditioning(
            memories=memories, keys=keys, masks=masks, speaker_embed=speaker_embed
        )
        return cond, sa_aligns

    # ------------------------------------------------------------------ #
    # Teacher-forced forward (TRAIN / EVAL)
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        source: jnp.ndarray,
        source_lengths: jnp.ndarray,
        targets: jnp.ndarray,            # (B, T, out_dim) padded to r multiple
        target_lengths: jnp.ndarray,
        accent_type: Optional[jnp.ndarray] = None,
        speaker_id: Optional[jnp.ndarray] = None,
        teacher_ratio: Optional[jnp.ndarray] = None,
    ) -> NetworkOutput:
        hp = self.hparams
        cond, enc_sa = self.encode(source, source_lengths, accent_type, speaker_id)
        if teacher_ratio is not None:
            cond = cond.replace(teacher_ratio=teacher_ratio)
        frames, stop_logits, aligns, dec_sa = self.decoder(cond, targets)

        postnet_frames = None
        linear_frames = None
        if hp.use_postnet_v2:
            postnet_frames = self.postnet(
                frames["mel"],
                cond=cond.speaker_embed if hp.channel_id_to_postnet else None,
            )
        if hp.use_linear_spectrogram_postnet:
            mel_for_post = postnet_frames if postnet_frames is not None else frames["mel"]
            linear_frames = self.post_cbhg(mel_for_post, target_lengths)

        return NetworkOutput(
            frames=frames,
            postnet_frames=postnet_frames,
            linear_frames=linear_frames,
            stop_logits=stop_logits,
            alignments=tuple(aligns),
            encoder_sa_alignments=tuple(enc_sa),
            decoder_sa_alignments=tuple(dec_sa),
        )

    # ------------------------------------------------------------------ #
    # Incremental decode plumbing (PREDICT) — used by synthesis driver
    # ------------------------------------------------------------------ #

    def decoder_initial_state(self, cond: DecoderConditioning):
        return self.decoder.initial_state(cond)

    def decoder_init_caches(self, batch: int, max_len: int):
        return self.decoder.init_caches(batch, max_len)

    def decoder_go_frame(self, batch: int):
        return self.decoder.go_frame(batch)

    def decoder_step(self, state, feed, cond: DecoderConditioning, prenet_masks=None):
        return self.decoder.step(state, feed, cond, prenet_masks=prenet_masks)

    def decoder_post_step(self, feature, caches, index):
        return self.decoder.post_step(feature, caches, index)

    def postnet_apply(self, mel: jnp.ndarray, lengths: jnp.ndarray, speaker_embed=None):
        """Apply configured postnets to a decoded mel (PREDICT path)."""
        hp = self.hparams
        postnet_frames = (
            self.postnet(
                mel, cond=speaker_embed if hp.channel_id_to_postnet else None
            )
            if hp.use_postnet_v2
            else None
        )
        linear = None
        if hp.use_linear_spectrogram_postnet:
            mel_in = postnet_frames if postnet_frames is not None else mel
            linear = self.post_cbhg(mel_in, lengths)
        return postnet_frames, linear


# --------------------------------------------------------------------------- #
# Estimator-style model classes (reference class names) + factory
# --------------------------------------------------------------------------- #


class TacotronModelBase:
    """Binds a network configuration to its loss (reference model_fn parity)."""

    #: hparams overrides pinned by the named model class
    PINNED: Dict[str, Any] = {}
    #: target heads this model trains on
    HEADS: Tuple[str, ...] = ("mel",)

    def __init__(self, hparams: HParams):
        self.hparams = hparams
        for key, value in self.PINNED.items():
            setattr(hparams, key, value)
        self._validate()

    def _validate(self) -> None:
        pass

    def network(self, is_training: bool) -> TacotronNetwork:
        return TacotronNetwork(hparams=self.hparams, is_training=is_training)

    def head_dims(self) -> Dict[str, int]:
        """Output head dims in decoder head order (feed-back concat order)."""
        hp = self.hparams
        dims = {"mel": hp.num_mels, "mgc": hp.num_mgcs, "lf0": hp.num_lf0s}
        return {h: dims[h] for h in self.HEADS}

    # ----------------------------- loss ----------------------------- #

    def loss(
        self,
        output: NetworkOutput,
        batch: Dict[str, jnp.ndarray],
        params=None,
    ) -> Dict[str, jnp.ndarray]:
        """Total loss + components. ``batch`` uses the data-layer field names."""
        hp = self.hparams
        lengths = batch["target_lengths"]
        parts: Dict[str, jnp.ndarray] = {}
        if "mel" in self.HEADS:
            parts["mel_loss"] = losses_lib.spec_loss(
                output.frames["mel"], batch["mel"], lengths, hp.spec_loss_type
            )
            if output.postnet_frames is not None:
                parts["postnet_loss"] = losses_lib.spec_loss(
                    output.postnet_frames, batch["mel"], lengths, hp.spec_loss_type
                )
            if output.linear_frames is not None and "spec" in batch:
                parts["linear_loss"] = losses_lib.spec_loss(
                    output.linear_frames, batch["spec"], lengths, hp.spec_loss_type
                )
            if hp.binary_divergence_weight > 0.0:
                parts["binary_divergence"] = (
                    hp.binary_divergence_weight
                    * losses_lib.binary_divergence(
                        output.frames["mel"], batch["mel"], lengths
                    )
                )
        if "mgc" in self.HEADS:
            parts["mgc_loss"] = losses_lib.spec_loss(
                output.frames["mgc"], batch["mgc"], lengths, hp.spec_loss_type
            )
            parts["lf0_loss"] = losses_lib.classification_loss(
                output.frames["lf0"], batch["lf0"], lengths
            )
        parts["done_loss"] = losses_lib.stop_token_loss(
            output.stop_logits, batch["done"], lengths
        )
        if hp.use_l2_regularization and params is not None:
            parts["l2_regularization"] = losses_lib.l2_regularization(
                params, hp.l2_regularization_weight
            )
        parts["loss"] = sum(parts.values())
        return parts


class ExtendedTacotronV1Model(TacotronModelBase):
    """Baseline Tacotron: single-source attention, mel target.

    Reference: ExtendedTacotronV1Model (SURVEY.md §2.1 [M]) — EncoderV1/
    ZoneoutEncoderV1 + ExtendedDecoder + forward attention.
    """

    PINNED = {"decoder": "ExtendedDecoder"}

    def _validate(self):
        if "SelfAttention" in self.hparams.encoder:
            raise ValueError(
                "ExtendedTacotronV1Model is single-source; use a single-stream encoder"
            )


class DualSourceSelfAttentionTacotronModel(TacotronModelBase):
    """Self-Attention Tacotron: dual-source attention over LSTM + SA streams."""

    def _validate(self):
        hp = self.hparams
        if "DualSource" not in hp.decoder:
            hp.decoder = "DualSourceSelfAttentionDecoder"
        if "SelfAttention" not in hp.encoder:
            raise ValueError(
                "DualSourceSelfAttentionTacotronModel requires a self-attention "
                f"encoder, got {hp.encoder!r}"
            )


class MgcLf0TacotronModel(TacotronModelBase):
    """WORLD-feature single-source model (mgc + quantized lf0 heads)."""

    HEADS = ("mgc", "lf0")
    PINNED = {"decoder": "MgcLf0ExtendedDecoder"}


class DualSourceSelfAttentionMgcLf0TacotronModel(TacotronModelBase):
    """WORLD-feature dual-source self-attention model."""

    HEADS = ("mgc", "lf0")
    PINNED = {"decoder": "MgcLf0DualSourceSelfAttentionDecoder"}

    def _validate(self):
        if "SelfAttention" not in self.hparams.encoder:
            raise ValueError("requires a self-attention encoder")


_MODELS = {
    "ExtendedTacotronV1Model": ExtendedTacotronV1Model,
    "DualSourceSelfAttentionTacotronModel": DualSourceSelfAttentionTacotronModel,
    "MgcLf0TacotronModel": MgcLf0TacotronModel,
    "DualSourceSelfAttentionMgcLf0TacotronModel": DualSourceSelfAttentionMgcLf0TacotronModel,
}


def tacotron_model_factory(hparams: HParams) -> TacotronModelBase:
    """Reference factory keyed on ``hparams.tacotron_model`` (SURVEY.md §2.1)."""
    try:
        cls = _MODELS[hparams.tacotron_model]
    except KeyError:
        raise ValueError(
            f"unknown tacotron_model {hparams.tacotron_model!r}; "
            f"known: {sorted(_MODELS)}"
        ) from None
    return cls(hparams)
