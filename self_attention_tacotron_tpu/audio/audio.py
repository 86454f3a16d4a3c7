"""Reference-parity ``Audio`` facade over the jnp DSP kernels.

Mirrors the public surface of the companion repo's audio utility
(``tacotron2/util/audio.py`` per SURVEY.md §2.2: ``load_wav``, ``trim``,
``preemphasis``, ``spectrogram``, ``melspectrogram``, ``inv_spectrogram``
— reconstructed, reference mount empty). The heavy transforms JIT to one
fused XLA graph (CPU or TPU); wav file I/O is host-side numpy/scipy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from scipy.io import wavfile

from self_attention_tacotron_tpu.audio import dsp
from self_attention_tacotron_tpu.hparams import HParams


class Audio:
    """Stateless audio transform bundle configured from :class:`HParams`."""

    def __init__(self, hparams: HParams):
        self.hparams = hparams
        avg, std = hparams.average_mel_level_db, hparams.stddev_mel_level_db
        if bool(avg) != bool(std):
            raise ValueError(
                "average_mel_level_db and stddev_mel_level_db must be set together"
            )
        if avg and (len(avg) != hparams.num_mels or len(std) != hparams.num_mels):
            raise ValueError(
                f"per-bin mel stats must have length num_mels={hparams.num_mels}; "
                f"got {len(avg)} / {len(std)}"
            )
        if std and any(s <= 0 for s in std):
            raise ValueError("stddev_mel_level_db entries must be positive")

    @property
    def uses_mel_standardization(self) -> bool:
        """True when per-bin mel mean/std normalization is configured."""
        return bool(self.hparams.average_mel_level_db)

    # --------------------------- file I/O --------------------------- #

    def load_wav(self, path: str) -> np.ndarray:
        sr, data = wavfile.read(path)
        if sr != self.hparams.sample_rate:
            raise ValueError(
                f"{path}: sample rate {sr} != hparams.sample_rate "
                f"{self.hparams.sample_rate} (resampling is not performed)"
            )
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        elif data.dtype == np.int32:
            data = data.astype(np.float32) / 2147483648.0
        elif data.dtype == np.uint8:
            data = (data.astype(np.float32) - 128.0) / 128.0
        else:
            data = data.astype(np.float32)
        if data.ndim > 1:
            data = data.mean(axis=-1)
        return data

    def save_wav(self, wav: np.ndarray, path: str) -> None:
        wav = np.asarray(wav)
        peak = max(0.01, float(np.max(np.abs(wav))))
        wavfile.write(
            path,
            self.hparams.sample_rate,
            (wav / peak * 32767).astype(np.int16),
        )

    # --------------------------- transforms ------------------------- #

    def trim(self, wav: np.ndarray) -> np.ndarray:
        hp = self.hparams
        return dsp.trim_silence(
            wav, hp.trim_top_db, hp.trim_frame_length, hp.trim_hop_length
        )

    @functools.cached_property
    def _mel_fn(self):
        hp = self.hparams
        return jax.jit(
            functools.partial(
                dsp.mel_spectrogram,
                sample_rate=hp.sample_rate,
                n_fft=hp.n_fft,
                hop_length=hp.hop_length,
                win_length=hp.win_length,
                num_mels=hp.num_mels,
                fmin=hp.mel_fmin,
                fmax=hp.fmax,
                preemphasis_coef=hp.preemphasis,
                min_level_db=hp.min_level_db,
                ref_level_db=hp.ref_level_db,
                average_mel_level_db=(
                    np.asarray(hp.average_mel_level_db, np.float32)
                    if self.uses_mel_standardization else None
                ),
                stddev_mel_level_db=(
                    np.asarray(hp.stddev_mel_level_db, np.float32)
                    if self.uses_mel_standardization else None
                ),
            )
        )

    @functools.cached_property
    def _linear_fn(self):
        hp = self.hparams
        return jax.jit(
            functools.partial(
                dsp.linear_spectrogram,
                n_fft=hp.n_fft,
                hop_length=hp.hop_length,
                win_length=hp.win_length,
                preemphasis_coef=hp.preemphasis,
                min_level_db=hp.min_level_db,
                ref_level_db=hp.ref_level_db,
            )
        )

    def melspectrogram(self, wav: np.ndarray) -> np.ndarray:
        """(frames, num_mels) normalized mel spectrogram."""
        return np.asarray(self._mel_fn(jnp.asarray(wav, jnp.float32)))

    def spectrogram(self, wav: np.ndarray) -> np.ndarray:
        """(frames, num_freq) normalized linear spectrogram."""
        return np.asarray(self._linear_fn(jnp.asarray(wav, jnp.float32)))

    def denormalize_mel(self, mel: np.ndarray) -> np.ndarray:
        """Map a normalized mel back to dB scale (inverse of melspectrogram).

        Per-bin standardized features → mean/std destandardization; otherwise
        the min/ref-level [0,1] denormalization.
        """
        hp = self.hparams
        mel = jnp.asarray(mel, jnp.float32)
        if self.uses_mel_standardization:
            out = dsp.destandardize_mel_db(
                mel,
                jnp.asarray(hp.average_mel_level_db, jnp.float32),
                jnp.asarray(hp.stddev_mel_level_db, jnp.float32),
            )
        else:
            out = dsp.denormalize_db(mel, hp.min_level_db, hp.ref_level_db)
        return np.asarray(out)

    def inv_spectrogram(self, spectrogram: np.ndarray) -> np.ndarray:
        """Griffin-Lim waveform reconstruction from a normalized linear spec."""
        hp = self.hparams
        spec = jnp.asarray(spectrogram, jnp.float32)
        amp = dsp.db_to_amp(dsp.denormalize_db(spec, hp.min_level_db, hp.ref_level_db))
        length = spec.shape[0] * hp.hop_length
        wav = dsp.griffin_lim(
            amp**hp.power,
            n_fft=hp.n_fft,
            hop_length=hp.hop_length,
            win_length=hp.win_length,
            n_iters=hp.griffin_lim_iters,
            length=length,
        )
        if hp.preemphasis > 0:
            wav = dsp.inv_preemphasis(wav, hp.preemphasis)
        return np.asarray(wav)
