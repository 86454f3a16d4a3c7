import jax.numpy as jnp
import numpy as np
import pytest

from self_attention_tacotron_tpu.audio import Audio, dsp
from self_attention_tacotron_tpu.hparams import HParams


def _sine(freq, sr, dur):
    t = np.arange(int(sr * dur)) / sr
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


def test_hann_window_matches_scipy():
    from scipy.signal import get_window

    win = dsp.hann_window(1102, 2048)
    ref = get_window("hann", 1102, fftbins=True)
    lpad = (2048 - 1102) // 2
    np.testing.assert_allclose(win[lpad : lpad + 1102], ref, atol=1e-6)
    assert win[:lpad].sum() == 0 and win[lpad + 1102 :].sum() == 0


def test_mel_filterbank_properties():
    fb = dsp.mel_filterbank(22050, 2048, 80)
    assert fb.shape == (80, 1025)
    assert (fb >= 0).all()
    # every filter has support, triangles overlap, slaney norm keeps peaks small
    assert (fb.sum(axis=1) > 0).all()
    assert fb.max() < 0.1
    # center frequencies strictly increase
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) > 0).all()


def test_mel_filterbank_slaney_golden():
    # Golden values computed from the published Slaney mel-scale formulas
    # (independent closed-form check of the piecewise linear/log mapping).
    assert dsp._hz_to_mel_slaney(1000.0) == pytest.approx(15.0)
    assert dsp._mel_to_hz_slaney(15.0) == pytest.approx(1000.0)
    assert dsp._hz_to_mel_slaney(500.0) == pytest.approx(7.5)
    # 1 kHz * 6.4 should land exactly 27 mels above 1 kHz
    assert dsp._hz_to_mel_slaney(6400.0) == pytest.approx(42.0)


def test_stft_shape_and_energy():
    sr = 22050
    wav = _sine(440.0, sr, 0.5)
    spec = np.asarray(dsp.stft(jnp.asarray(wav), 2048, 275, 1102))
    assert spec.shape == (1 + len(wav) // 275, 1025)
    mag = np.abs(spec)
    # peak bin should be at 440 Hz
    peak = mag[5:-5].mean(axis=0).argmax()
    assert abs(peak * sr / 2048 - 440.0) < sr / 2048 * 1.5


def test_istft_roundtrip():
    wav = _sine(220.0, 22050, 0.3)
    spec = dsp.stft(jnp.asarray(wav), 2048, 275, 1102)
    rec = np.asarray(dsp.istft(spec, 2048, 275, 1102, len(wav)))
    # centre part reconstructs (edges lose window coverage)
    np.testing.assert_allclose(rec[2048:-2048], wav[2048:-2048], atol=1e-3)


def test_preemphasis_roundtrip():
    wav = jnp.asarray(_sine(100.0, 22050, 0.1))
    pre = dsp.preemphasis(wav, 0.97)
    rec = dsp.inv_preemphasis(pre, 0.97)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(wav), atol=1e-4)


def test_db_normalize_range_and_inverse():
    db = jnp.linspace(-120.0, 30.0, 64)
    norm = dsp.normalize_db(db, -100.0, 20.0)
    assert float(norm.min()) >= 0.0 and float(norm.max()) <= 1.0
    mid = jnp.linspace(-79.0, 19.0, 32)  # interior, non-clipped region
    rec = dsp.denormalize_db(dsp.normalize_db(mid, -100.0, 20.0), -100.0, 20.0)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(mid), atol=1e-4)


def test_melspectrogram_via_audio_facade():
    hp = HParams()
    audio = Audio(hp)
    wav = _sine(440.0, hp.sample_rate, 0.4)
    mel = audio.melspectrogram(wav)
    assert mel.shape[1] == hp.num_mels
    assert mel.shape[0] == 1 + len(wav) // hp.hop_length
    assert mel.min() >= 0.0 and mel.max() <= 1.0
    assert mel.max() > 0.1  # a tone is not silence


def test_trim_silence():
    sr = 22050
    tone = _sine(440.0, sr, 0.2)
    wav = np.concatenate([np.zeros(sr // 2, np.float32), tone, np.zeros(sr // 2, np.float32)])
    trimmed = dsp.trim_silence(wav, top_db=30.0)
    assert len(trimmed) < len(wav)
    assert len(trimmed) >= len(tone)
    assert np.abs(trimmed).max() == np.abs(wav).max()


def test_griffin_lim_reconstructs_tone():
    hp = HParams(griffin_lim_iters=12)
    audio = Audio(hp)
    wav = _sine(440.0, hp.sample_rate, 0.3)
    spec = audio.spectrogram(wav)
    rec = audio.inv_spectrogram(spec)
    assert rec.shape[0] == spec.shape[0] * hp.hop_length
    # dominant frequency of reconstruction should be ~440 Hz
    mag = np.abs(np.fft.rfft(rec))
    freq = mag.argmax() * hp.sample_rate / len(rec)
    assert abs(freq - 440.0) < 10.0


def test_wav_io_roundtrip(tmp_path):
    hp = HParams()
    audio = Audio(hp)
    wav = _sine(440.0, hp.sample_rate, 0.1) * 0.5
    path = str(tmp_path / "x.wav")
    audio.save_wav(wav, path)
    loaded = audio.load_wav(path)
    assert loaded.dtype == np.float32
    corr = np.corrcoef(loaded, wav)[0, 1]
    assert corr > 0.999


def test_mel_standardization_wired_and_invertible():
    """average/stddev_mel_level_db replace the [0,1] normalization (ADVICE r1)."""
    hp = HParams(num_mels=8)
    wav = _sine(440.0, hp.sample_rate, 0.2)
    plain_db = Audio(hp)  # min/ref-level path
    mel_01 = plain_db.melspectrogram(wav)
    avg = tuple(float(x) for x in np.linspace(-40.0, -20.0, 8))
    std = tuple(float(x) for x in np.linspace(5.0, 10.0, 8))
    hp_std = HParams(num_mels=8, average_mel_level_db=avg, stddev_mel_level_db=std)
    audio = Audio(hp_std)
    assert audio.uses_mel_standardization
    mel = audio.melspectrogram(wav)
    assert mel.shape == mel_01.shape
    # standardized features are NOT clipped to [0,1]
    assert mel.min() < 0.0 or mel.max() > 1.0
    # invertible back to dB, and consistent with the raw dB mel
    mel_db = audio.denormalize_mel(mel)
    expected_db = np.asarray(
        dsp.amp_to_db(
            jnp.abs(
                dsp.stft(
                    dsp.preemphasis(jnp.asarray(wav), hp.preemphasis),
                    hp.n_fft, hp.hop_length, hp.win_length,
                )
            )
            @ jnp.asarray(
                dsp.mel_filterbank(hp.sample_rate, hp.n_fft, 8, hp.mel_fmin, hp.fmax)
            ).T
        )
    )
    np.testing.assert_allclose(mel_db, expected_db, rtol=1e-4, atol=1e-3)


def test_mel_stats_validation():
    with pytest.raises(ValueError):
        Audio(HParams(num_mels=8, average_mel_level_db=(1.0,)))  # missing std
    with pytest.raises(ValueError):
        Audio(HParams(num_mels=8, average_mel_level_db=(1.0, 2.0),
                      stddev_mel_level_db=(1.0, 2.0)))  # wrong length
    with pytest.raises(ValueError):
        Audio(HParams(num_mels=2, average_mel_level_db=(1.0, 2.0),
                      stddev_mel_level_db=(1.0, 0.0)))  # non-positive std
