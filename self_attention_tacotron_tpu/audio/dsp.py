"""Signal processing primitives: STFT, mel filterbank, dB scaling, Griffin-Lim.

Capability parity with the reference audio utility
(``tacotron2/util/audio.py`` per SURVEY.md §2.2 — reference mount empty,
conventions reconstructed), which wrapped librosa. Everything here is
written fresh on jax.numpy so the whole frontend JIT-compiles into one
fused XLA graph and runs on TPU as well as CPU (north-star requirement:
"TFRecord audio frontend ... becomes a fused XLA preprocessing graph").

Conventions match librosa defaults so corpora preprocessed by the
reference are numerically compatible:

* STFT: centered, reflect padding, periodic Hann window, ``win_length``
  padded symmetrically to ``n_fft``.
* Mel filterbank: Slaney mel scale (linear < 1 kHz, log above) with
  Slaney area normalization (``librosa.filters.mel`` defaults).
* dB scale: ``20 * log10(max(x, 1e-5))`` with ref/min-level normalization
  to [0, 1] as in the keithito/NII Tacotron lineage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_AMIN = 1e-5


# --------------------------------------------------------------------------- #
# Windows and filterbanks (host-side constant construction, numpy)
# --------------------------------------------------------------------------- #


def hann_window(win_length: int, n_fft: int) -> np.ndarray:
    """Periodic Hann window of ``win_length``, centered in ``n_fft`` zeros."""
    n = np.arange(win_length)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    lpad = (n_fft - win_length) // 2
    return np.pad(win, (lpad, n_fft - win_length - lpad)).astype(np.float32)


def _hz_to_mel_slaney(freq):
    freq = np.asanyarray(freq, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = freq >= min_log_hz
    mels = np.where(
        log_t, min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep, mels
    )
    return mels


def _mel_to_hz_slaney(mels):
    mels = np.asanyarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sample_rate: int, n_fft: int, num_mels: int, fmin: float = 0.0, fmax: float = 0.0
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (num_mels, n_fft//2+1).

    Matches ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax)`` defaults
    (htk=False, norm='slaney').
    """
    if fmax <= 0:
        fmax = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(_hz_to_mel_slaney(fmin), _hz_to_mel_slaney(fmax), num_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : num_mels + 2] - hz_pts[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# --------------------------------------------------------------------------- #
# jnp transforms (JIT-compilable; the fused on-device frontend)
# --------------------------------------------------------------------------- #


def preemphasis(wav: jnp.ndarray, coef: float) -> jnp.ndarray:
    """y[t] = x[t] - coef * x[t-1] (scipy.signal.lfilter([1,-k],[1],x))."""
    return jnp.concatenate([wav[:1], wav[1:] - coef * wav[:-1]])


def inv_preemphasis(wav: jnp.ndarray, coef: float) -> jnp.ndarray:
    """Inverse of :func:`preemphasis` via a linear-recurrence scan."""

    def step(prev_y, x):
        y = x + coef * prev_y
        return y, y

    _, out = jax.lax.scan(step, jnp.zeros((), wav.dtype), wav)
    return out


def frame_signal(wav: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Center-padded framing: (num_frames, n_fft), librosa centering."""
    pad = n_fft // 2
    padded = jnp.pad(wav, (pad, pad), mode="reflect")
    num_frames = 1 + (padded.shape[0] - n_fft) // hop_length
    idx = (
        jnp.arange(num_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    )
    return padded[idx]


def stft(
    wav: jnp.ndarray, n_fft: int, hop_length: int, win_length: int
) -> jnp.ndarray:
    """Complex STFT, shape (num_frames, n_fft//2 + 1). Centered, Hann."""
    window = jnp.asarray(hann_window(win_length, n_fft))
    frames = frame_signal(wav, n_fft, hop_length) * window[None, :]
    return jnp.fft.rfft(frames, n=n_fft, axis=-1)


def istft(
    spec: jnp.ndarray, n_fft: int, hop_length: int, win_length: int, length: int
) -> jnp.ndarray:
    """Inverse STFT via windowed overlap-add with window-square normalization."""
    window = jnp.asarray(hann_window(win_length, n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window[None, :]
    num_frames = frames.shape[0]
    total = n_fft + hop_length * (num_frames - 1)
    sig = jnp.zeros((total,), frames.dtype)
    winsq = jnp.zeros((total,), frames.dtype)
    idx = jnp.arange(num_frames)[:, None] * hop_length + jnp.arange(n_fft)[None, :]
    sig = sig.at[idx.reshape(-1)].add(frames.reshape(-1))
    winsq = winsq.at[idx.reshape(-1)].add(
        jnp.broadcast_to(window[None, :] ** 2, frames.shape).reshape(-1)
    )
    sig = sig / jnp.maximum(winsq, 1e-10)
    pad = n_fft // 2
    return jax.lax.dynamic_slice(sig, (pad,), (length,))


def amp_to_db(x: jnp.ndarray) -> jnp.ndarray:
    return 20.0 * jnp.log10(jnp.maximum(_AMIN, x))


def db_to_amp(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.power(10.0, x * 0.05)


def normalize_db(db: jnp.ndarray, min_level_db: float, ref_level_db: float) -> jnp.ndarray:
    """(dB - ref) mapped to [0, 1] over the [min_level_db, 0] range."""
    return jnp.clip((db - ref_level_db - min_level_db) / -min_level_db, 0.0, 1.0)


def denormalize_db(x: jnp.ndarray, min_level_db: float, ref_level_db: float) -> jnp.ndarray:
    return jnp.clip(x, 0.0, 1.0) * -min_level_db + min_level_db + ref_level_db


def standardize_mel_db(
    mel_db: jnp.ndarray, average: jnp.ndarray, stddev: jnp.ndarray
) -> jnp.ndarray:
    """Per-bin standardization of a dB-scale mel: (mel - mean) / std.

    Reference capability: ``average_mel_level_db`` / ``stddev_mel_level_db``
    hparams (SURVEY.md §2.1 audio row — per-bin mel normalization statistics;
    mount empty, exact reference formula unverifiable). When these stats are
    configured they REPLACE the min/ref-level [0,1] normalization, so the
    model trains on zero-mean unit-variance features per mel bin.
    """
    return (mel_db - average[None, :]) / stddev[None, :]


def destandardize_mel_db(
    mel: jnp.ndarray, average: jnp.ndarray, stddev: jnp.ndarray
) -> jnp.ndarray:
    """Inverse of :func:`standardize_mel_db` (back to dB scale)."""
    return mel * stddev[None, :] + average[None, :]


def linear_spectrogram(
    wav: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    preemphasis_coef: float,
    min_level_db: float,
    ref_level_db: float,
) -> jnp.ndarray:
    """Normalized linear magnitude spectrogram, (frames, n_fft//2+1)."""
    if preemphasis_coef > 0:
        wav = preemphasis(wav, preemphasis_coef)
    mag = jnp.abs(stft(wav, n_fft, hop_length, win_length))
    return normalize_db(amp_to_db(mag), min_level_db, ref_level_db)


def mel_spectrogram(
    wav: jnp.ndarray,
    *,
    sample_rate: int,
    n_fft: int,
    hop_length: int,
    win_length: int,
    num_mels: int,
    fmin: float,
    fmax: float,
    preemphasis_coef: float,
    min_level_db: float,
    ref_level_db: float,
    average_mel_level_db=None,
    stddev_mel_level_db=None,
) -> jnp.ndarray:
    """Normalized mel spectrogram, (frames, num_mels). Fully jnp → fuses on TPU.

    When per-bin stats are given (``average_mel_level_db`` /
    ``stddev_mel_level_db``, each length ``num_mels``), the dB mel is
    standardized per bin instead of min/ref-level normalized to [0, 1].
    """
    if preemphasis_coef > 0:
        wav = preemphasis(wav, preemphasis_coef)
    mag = jnp.abs(stft(wav, n_fft, hop_length, win_length))
    mel_basis = jnp.asarray(mel_filterbank(sample_rate, n_fft, num_mels, fmin, fmax))
    mel = mag @ mel_basis.T
    mel_db = amp_to_db(mel)
    if average_mel_level_db is not None and stddev_mel_level_db is not None:
        return standardize_mel_db(
            mel_db,
            jnp.asarray(average_mel_level_db, jnp.float32),
            jnp.asarray(stddev_mel_level_db, jnp.float32),
        )
    return normalize_db(mel_db, min_level_db, ref_level_db)


def griffin_lim(
    magnitude: jnp.ndarray,
    *,
    n_fft: int,
    hop_length: int,
    win_length: int,
    n_iters: int,
    length: int,
    seed: int = 0,
) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction from a linear magnitude spectrogram.

    ``magnitude``: (frames, n_fft//2+1) linear amplitudes. Runs as a
    ``fori_loop`` of istft/stft round trips — compiles to one XLA graph.

    Pinned to the CPU backend: phase reconstruction is complex64
    throughout, the axon TPU relay raises UNIMPLEMENTED on complex ops,
    and this is offline waveform post-processing (predict --write-wav,
    eval scoring) — never on the serving hot path.
    """
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        magnitude = jax.device_put(jnp.asarray(magnitude), cpu)
        return _griffin_lim_cpu(
            magnitude, n_fft=n_fft, hop_length=hop_length,
            win_length=win_length, n_iters=n_iters, length=length, seed=seed,
        )


def _griffin_lim_cpu(
    magnitude, *, n_fft, hop_length, win_length, n_iters, length, seed
):
    key = jax.random.PRNGKey(seed)
    angles = jax.random.uniform(key, magnitude.shape, minval=-np.pi, maxval=np.pi)
    spec = magnitude * jnp.exp(1j * angles)

    def body(_, spec):
        wav = istft(spec, n_fft, hop_length, win_length, length)
        rebuilt = stft(wav, n_fft, hop_length, win_length)
        phase = rebuilt / jnp.maximum(jnp.abs(rebuilt), 1e-10)
        return magnitude.astype(jnp.complex64) * phase[: magnitude.shape[0]]

    spec = jax.lax.fori_loop(0, n_iters, body, spec)
    return istft(spec, n_fft, hop_length, win_length, length)


# --------------------------------------------------------------------------- #
# Silence trimming (host-side, numpy; offline preprocessing only)
# --------------------------------------------------------------------------- #


def trim_silence(
    wav: np.ndarray, top_db: float = 60.0, frame_length: int = 2048, hop_length: int = 512
) -> np.ndarray:
    """Trim leading/trailing silence (librosa.effects.trim semantics)."""
    wav = np.asarray(wav)
    if wav.size == 0:
        return wav
    n_frames = max(1, 1 + (max(wav.size - frame_length, 0)) // hop_length)
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    padded = np.pad(wav, (0, max(0, idx.max() + 1 - wav.size)))
    rms = np.sqrt(np.mean(padded[idx] ** 2, axis=-1))
    ref = np.max(rms)
    db = 20.0 * np.log10(np.maximum(rms, 1e-10) / np.maximum(ref, 1e-10))
    non_silent = np.flatnonzero(db > -top_db)
    if non_silent.size == 0:
        return wav[:0]
    start = int(non_silent[0]) * hop_length
    end = min(wav.size, int(non_silent[-1] + 1) * hop_length + frame_length)
    return wav[start:end]
