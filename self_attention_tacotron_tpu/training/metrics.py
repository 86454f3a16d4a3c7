"""Observability: alignment/mel PNG artifacts + scalar metric writers.

Capability parity with the reference ``MetricsSaverHook`` (SURVEY.md §2.2
[M] — reconstructed; mount empty): at eval/save steps, render attention
alignment matrices (one panel per attention source) and predicted-vs-
target mel comparisons to PNG, and log scalar training metrics. Scalars
go to a JSONL metrics log and, when TensorBoard (via the installed TF) is
available, to event files as well.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def save_alignment_png(
    alignments: Sequence[np.ndarray],   # per source: (dec_steps, src_len)
    path: str,
    *,
    info: str = "",
    source_length: Optional[int] = None,
    decoder_steps: Optional[int] = None,
) -> None:
    n = len(alignments)
    fig, axes = plt.subplots(1, n, figsize=(6 * n, 4), squeeze=False)
    for i, align in enumerate(alignments):
        # float32: matplotlib renders ml_dtypes.bfloat16 arrays as a BLANK
        # panel at these shapes (reproduced 2026-08-17) — every eval-mode
        # output under compute_dtype=bfloat16 hits this
        a = np.asarray(align, np.float32)
        if decoder_steps:
            a = a[:decoder_steps]
        if source_length:
            a = a[:, :source_length]
        im = axes[0][i].imshow(
            a.T, aspect="auto", origin="lower", interpolation="none"
        )
        axes[0][i].set_xlabel("decoder step")
        axes[0][i].set_ylabel("encoder position")
        axes[0][i].set_title(f"source {i}")
        fig.colorbar(im, ax=axes[0][i])
    if info:
        fig.suptitle(info)
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)


def save_mel_comparison_png(
    predicted: np.ndarray,              # (T, num_mels)
    target: Optional[np.ndarray],
    path: str,
    *,
    info: str = "",
    length: Optional[int] = None,
) -> None:
    rows = 2 if target is not None else 1
    fig, axes = plt.subplots(rows, 1, figsize=(10, 3 * rows), squeeze=False)
    # float32 cast: see save_alignment_png (matplotlib + bf16 = blank panel)
    pred = np.asarray(predicted, np.float32)
    if length:
        pred = pred[:length]
    axes[0][0].imshow(pred.T, aspect="auto", origin="lower", interpolation="none")
    axes[0][0].set_title("predicted mel")
    if target is not None:
        tgt = np.asarray(target, np.float32)
        if length:
            tgt = tgt[:length]
        axes[1][0].imshow(tgt.T, aspect="auto", origin="lower", interpolation="none")
        axes[1][0].set_title("target mel")
    if info:
        fig.suptitle(info)
    fig.tight_layout()
    fig.savefig(path, dpi=80)
    plt.close(fig)


class MetricsWriter:
    """JSONL scalar log + optional TensorBoard event files."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # gated: heavyweight, optional

                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float]) -> None:
        record = {"step": int(step), "time": time.time()}
        record.update({k: float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            with self._tb.as_default():
                import tensorflow as tf

                for key, value in scalars.items():
                    tf.summary.scalar(key, float(value), step=int(step))
                self._tb.flush()

    def close(self) -> None:
        self._jsonl.close()
