"""Synthetic corpus generator: tests, smoke training, and benchmarks.

No reference counterpart (the reference assumes real corpora); this is the
framework's hermetic stand-in so the end-to-end path (preprocess → train →
synthesize) runs without downloading data. Generates deterministic
sine-mixture "speech" whose mel content correlates with the "text" so a
small model can actually learn alignments.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from self_attention_tacotron_tpu.data.corpus import CorpusPreprocessor, write_selected_lists
from self_attention_tacotron_tpu.data.dataset import (
    SourceData,
    TargetData,
    write_source_tfrecord,
    write_target_tfrecord,
)
from self_attention_tacotron_tpu.hparams import HParams
from self_attention_tacotron_tpu.text import text_to_sequence


def _synthetic_wav(rng: np.random.RandomState, text_ids: np.ndarray, hp: HParams) -> np.ndarray:
    """Per-symbol tone segments — alignment between text and audio is real."""
    seg = int(0.08 * hp.sample_rate)
    t = np.arange(seg) / hp.sample_rate
    chunks = []
    for sym in text_ids:
        freq = 110.0 * (1.0 + (int(sym) % 24) / 4.0)
        env = np.hanning(seg)
        chunks.append(np.sin(2 * np.pi * freq * t) * env * 0.5)
    return np.concatenate(chunks).astype(np.float32)


def generate_corpus(
    out_dir: str,
    hparams: HParams,
    *,
    num_utterances: int = 32,
    min_symbols: int = 8,
    max_symbols: int = 24,
    num_speakers: int = 1,
    with_accent: bool = False,
    selected_list_dir: Optional[str] = None,
    seed: int = 1234,
) -> List[str]:
    """Write a synthetic TFRecord corpus; returns the utterance ids."""
    rng = np.random.RandomState(seed)
    os.makedirs(out_dir, exist_ok=True)
    from self_attention_tacotron_tpu.audio import Audio

    audio = Audio(hparams)
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    ids = []
    for i in range(num_utterances):
        utt_id = f"synth-{i:04d}"
        n = rng.randint(min_symbols, max_symbols + 1)
        text = "".join(alphabet[rng.randint(len(alphabet))] for _ in range(n))
        source = np.asarray(text_to_sequence(text), np.int64)
        wav = _synthetic_wav(rng, source, hparams)
        mel = audio.melspectrogram(wav)
        spec = (
            audio.spectrogram(wav) if hparams.use_linear_spectrogram_postnet else None
        )
        accent = None
        if with_accent:
            accent = hparams.accent_type_offset + rng.randint(
                0, max(hparams.num_accent_type - 1, 1), size=len(source)
            ).astype(np.int64)
        write_source_tfrecord(
            os.path.join(out_dir, f"{utt_id}.{hparams.source_file_extension}"),
            SourceData(
                id=utt_id,
                text=text,
                source=source,
                source_length=len(source),
                speaker_id=int(rng.randint(num_speakers)),
                accent_type=accent,
            ),
        )
        mgc = lf0 = None
        if "MgcLf0" in hparams.tacotron_model or "MgcLf0" in hparams.decoder:
            mgc = rng.rand(mel.shape[0], hparams.num_mgcs).astype(np.float32)
            lf0 = rng.randint(0, hparams.num_lf0s, size=mel.shape[0]).astype(np.int64)
        write_target_tfrecord(
            os.path.join(out_dir, f"{utt_id}.{hparams.target_file_extension}"),
            TargetData(
                id=utt_id, target_length=mel.shape[0], mel=mel, spec=spec,
                mgc=mgc, lf0=lf0,
            ),
        )
        ids.append(utt_id)
    if selected_list_dir:
        write_selected_lists(selected_list_dir, ids)
    return ids


class SyntheticCorpus(CorpusPreprocessor):
    """Preprocessor-shaped wrapper so the factory/CLI can target 'synthetic'."""

    def list_utterances(self) -> List[dict]:
        return [dict(id=f"synth-{i:04d}", num=i) for i in range(32)]

    def encode_text(self, utterance: dict) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        raise NotImplementedError("SyntheticCorpus generates directly")

    def preprocess(self, num_workers: int = 1) -> List[str]:
        generate_corpus(self.out_dir, self.hparams)
        return []
