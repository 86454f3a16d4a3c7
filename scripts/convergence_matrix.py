#!/usr/bin/env python
"""Convergence matrix: every conditioned model family demonstrably LEARNS
its conditioning (VERDICT r3 missing #4; SURVEY.md §4 item 3, §0 capability
surface).

The r3 evidence run proved the flagship mel model learns; this script runs
short TPU training runs for the remaining families and — crucially — shows
each conditioning signal actually SHAPES the output rather than being
ignored by the optimizer:

* ``speaker``  (VCTK config): each synthetic speaker speaks in a distinct
  register (data/synthetic.py _symbol_freq). Evidence: synthesizing the
  SAME text with each speaker id produces mel spectral centroids that
  track the per-speaker training statistics (swap moves the output toward
  the swapped-in speaker's register).
* ``accent``   (ICASSP'19 Japanese pitch-accent config): odd accent types
  double the fundamental. Evidence: the same phoneme sequence synthesized
  with all-low vs all-high accent sequences differs in the conditioned
  direction (higher spectral centroid under the high-accent sequence).
* ``mgclf0``   (WORLD-feature family): mgc is a fixed down-projection of
  the mel, lf0 the active symbol's quantized pitch. Evidence: mgc MSE
  falls, held-out lf0 frame accuracy beats the majority-class baseline,
  and decode self-terminates.
* ``ls``       (location-sensitive attention comparison family): trains
  through the FUSED LS teacher kernel (round-4 extension) in the
  companion-repo pairing LS ships in — the single-source ExtendedDecoder
  (Tacotron-2 style; every named reference config pairs the dual-source
  flagship with *forward* attention, SURVEY.md §2.1/§2.2). Evidence: loss
  falls and a monotonic-diagonal alignment emerges (diagonality score).
  Measured r5 finding: inside the SA flagship, LS collapses (diagonality
  0.21 at full capacity, loss 0.024) — the self-attention decoder fits
  the corpus from AR feedback alone, so nothing *forces* alignment the
  way forward attention's monotonic prior does; that run is kept in
  BASELINE.md §Round 5 as a negative result, not a matrix family.
* ``postnet``  (linear-spectrogram PostCBHG): linear loss falls, held-out
  spec beats a mean-spectrum predictor 2×, Griffin-Lim reconstructs a
  finite waveform.

Artifacts land in --out-dir (default artifacts/convergence_r4): one
matrix.json + one compact PNG per family; no checkpoints are committed.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/convergence_matrix.py \
      [--families speaker,accent,mgclf0,ls] [--steps 1500] [--run-root runs/matrix]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

# --hparams-extra overrides merged LAST into every family's hparams (used
# by run_train AND the in-process scoring model) — e.g. shrunken dims for
# a CPU fallback evidence run during a TPU outage
EXTRA: dict = {}

COMMON = dict(
    dataset="synthetic",
    compute_dtype="bfloat16",
    use_gradient_clipping="true",
    use_cache="true",
    save_summary_steps="50",
    log_step_count_steps="50",
    save_checkpoints_steps="1000",
    alignment_save_steps="500",
    eval_start_delay_secs="999999",   # short runs: skip mid-run eval
    batch_size="32",
)

FLAGSHIP = dict(
    tacotron_model="DualSourceSelfAttentionTacotronModel",
    encoder="SelfAttentionCBHGEncoder",
    decoder="DualSourceSelfAttentionDecoder",
    attention="forward",
    attention2="additive",
)


def hp_obj(overrides: dict):
    from self_attention_tacotron_tpu.hparams import default_hparams

    hp = default_hparams()
    hp.parse(",".join(f"{k}={v}" for k, v in overrides.items()))
    return hp


def run_train(tag: str, run_root: str, overrides: dict, steps: int,
              corpus_kw: dict) -> dict:
    """Generate corpus variant + train via the user-facing CLI; returns
    paths + parsed loss trajectory."""
    import subprocess

    from self_attention_tacotron_tpu.data.synthetic import generate_corpus

    run_dir = os.path.join(run_root, tag)
    data_dir = os.path.join(run_dir, "data")
    list_dir = os.path.join(run_dir, "lists")
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    # short smoke runs (steps < cadence) must still log a loss trajectory
    overrides = dict(
        overrides,
        save_summary_steps=str(min(int(overrides["save_summary_steps"]), steps)),
        log_step_count_steps=str(
            min(int(overrides["log_step_count_steps"]), steps)
        ),
        **EXTRA,
    )
    hp = hp_obj(overrides)
    gen_kw = dict(
        dict(num_utterances=192, min_symbols=17, max_symbols=24),
        **corpus_kw,
    )
    # Corpus provenance guard (mirrors convergence_run): a run dir whose
    # corpus was generated with DIFFERENT parameters is stale — training
    # would silently continue on the old data and checkpoints. Wipe and
    # regenerate rather than reuse.
    meta_path = os.path.join(run_dir, "corpus_meta.json")
    if os.path.exists(os.path.join(list_dir, "train.lst")):
        old = None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                old = json.load(f)
        if old != gen_kw:
            import shutil

            print(f"[matrix] {tag}: corpus params changed "
                  f"({old} -> {gen_kw}); wiping {run_dir}", flush=True)
            shutil.rmtree(run_dir)
    if not os.path.exists(os.path.join(list_dir, "train.lst")):
        generate_corpus(data_dir, hp, **gen_kw, selected_list_dir=list_dir)
        os.makedirs(run_dir, exist_ok=True)
        with open(meta_path, "w") as f:
            json.dump(gen_kw, f)
    # Idempotent re-score: Trainer.train counts --steps RELATIVE to the
    # restored step, so re-invoking after a finished run would train
    # `steps` more. When the checkpoint already covers the request, skip
    # straight to scoring (lets inference-side fixes be re-evaluated
    # against the same trained weights).
    done = 0
    if os.path.isdir(ckpt_dir):
        import orbax.checkpoint as ocp

        done = ocp.CheckpointManager(os.path.abspath(ckpt_dir)).latest_step() or 0
    if done < steps:
        hp_str = ",".join(f"{k}={v}" for k, v in overrides.items())
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        subprocess.run(
            [
                sys.executable, os.path.join(REPO, "train.py"),
                f"--source-data-root={data_dir}",
                f"--checkpoint-dir={ckpt_dir}",
                f"--selected-list-dir={list_dir}",
                "--selected-list-filename=train",
                "--validation-list-filename=validation",
                f"--steps={steps - done}",
                f"--hparams={hp_str}",
            ],
            check=True, env=env, cwd=REPO,
        )
    else:
        print(f"[matrix] {tag}: checkpoint at step {done} >= {steps}; "
              "re-scoring without retraining", flush=True)
    losses = []
    with open(os.path.join(ckpt_dir, "log", "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                losses.append((rec["step"], rec))
    return dict(run_dir=run_dir, data_dir=data_dir, list_dir=list_dir,
                ckpt_dir=ckpt_dir, losses=losses, hp=hp)


def restore_variables(ckpt_dir: str):
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = mngr.latest_step()
    restored = mngr.restore(step)
    out = {}
    for collection in ("params", "batch_stats"):
        tree = (
            restored[collection]
            if isinstance(restored, dict)
            else getattr(restored, collection)
        )
        out[collection] = tree
    return out, int(step)


def load_val_batch(info, n=8, with_accent=False):
    """First n validation utterances as a padded predict feed."""
    from self_attention_tacotron_tpu.data.dataset import (
        parse_source_tfrecord,
        parse_target_tfrecord,
        read_selected_list,
    )

    hp = info["hp"]
    ids = read_selected_list(info["list_dir"], "validation")[:n]
    srcs, tgts = [], []
    for utt in ids:
        srcs.append(parse_source_tfrecord(
            os.path.join(info["data_dir"], f"{utt}.{hp.source_file_extension}")
        ))
        tgts.append(parse_target_tfrecord(
            os.path.join(info["data_dir"], f"{utt}.{hp.target_file_extension}")
        ))
    S = max(len(s.source) for s in srcs)
    B = len(srcs)
    import jax.numpy as jnp

    batch = {
        "source": jnp.asarray(
            np.stack([np.pad(s.source, (0, S - len(s.source))) for s in srcs]),
            jnp.int32,
        ),
        "source_lengths": jnp.asarray([len(s.source) for s in srcs], jnp.int32),
    }
    if getattr(srcs[0], "speaker_id", None) is not None:
        batch["speaker_id"] = jnp.asarray(
            [s.speaker_id for s in srcs], jnp.int32
        )
    if with_accent:
        batch["accent_type"] = jnp.asarray(
            np.stack([
                np.pad(s.accent_type, (0, S - len(s.accent_type)))
                for s in srcs
            ]),
            jnp.int32,
        )
    return ids, srcs, tgts, batch


def provenance(hp) -> dict:
    """Machine-readable run provenance (VERDICT r4 weak #2/#6): which
    platform and decode path actually produced the evidence, at which
    capacity. The fused teacher kernel is gated off on CPU
    (decoders.py _fused_teacher_supported), so decode_path derives from
    the live backend, never from intent."""
    import jax

    platform = jax.default_backend()
    return dict(
        platform=platform,
        decode_path="fused_kernel" if platform != "cpu" else "xla_scan_cpu_fallback",
        dims={
            k: getattr(hp, k)
            for k in (
                "encoder_out_units", "cbhg_out_units", "attention_out_units",
                "attention1_out_units", "attention2_out_units",
                "decoder_out_units", "self_attention_out_units",
                "embedding_dim", "num_mels", "batch_size", "outputs_per_step",
            )
        },
        extra_overrides=dict(EXTRA),
    )


def decode_path_label() -> str:
    """Honest plot-title label for the decode path (VERDICT r4 weak #2)."""
    import jax

    return (
        "fused teacher kernel" if jax.default_backend() != "cpu"
        else "XLA scan, CPU fallback"
    )


def mel_centroid(mel: np.ndarray) -> float:
    """Energy-weighted mean mel-bin index — the register statistic."""
    w = np.maximum(mel - mel.min(), 0.0) ** 2
    bins = np.arange(mel.shape[-1], dtype=np.float64)
    denom = w.sum() + 1e-9
    return float((w * bins[None, :]).sum() / denom)


def save_mel_grid(mels, titles, out_png, suptitle):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(mels)
    fig, axes = plt.subplots(n, 1, figsize=(8, 2.0 * n), squeeze=False)
    for ax, mel, title in zip(axes[:, 0], mels, titles):
        ax.imshow(np.asarray(mel, np.float32).T, origin="lower",
                  aspect="auto", interpolation="nearest")
        ax.set_title(title, fontsize=8)
        ax.set_yticks([])
    fig.suptitle(suptitle, fontsize=10)
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)


def family_speaker(run_root: str, out_dir: str, steps: int) -> dict:
    """Multi-speaker (VCTK config): speaker-swap moves the register."""
    from self_attention_tacotron_tpu.models.models import tacotron_model_factory
    from self_attention_tacotron_tpu.synthesis import make_predict_fn

    import jax
    import jax.numpy as jnp

    overrides = dict(COMMON, **FLAGSHIP,
                     use_speaker_embedding="true", num_speakers="4",
                     speaker_embedding_dim="16")
    info = run_train("speaker", run_root, overrides, steps,
                     corpus_kw=dict(num_speakers=4))
    variables, step = restore_variables(info["ckpt_dir"])
    model = tacotron_model_factory(info["hp"])
    predict = make_predict_fn(model)
    ids, srcs, tgts, batch = load_val_batch(info, n=8)

    # per-speaker TRAINING register statistics (ground truth mels)
    spk_stats = {}
    for s, t in zip(srcs, tgts):
        spk_stats.setdefault(s.speaker_id, []).append(mel_centroid(t.mel))
    true_cent = {k: float(np.mean(v)) for k, v in sorted(spk_stats.items())}

    # synthesize the SAME batch under each speaker id
    pred_cent = {}
    mels_for_png, titles = [], []
    key = jax.random.PRNGKey(0)
    for spk in range(4):
        b = dict(batch, speaker_id=jnp.full_like(batch["speaker_id"], spk))
        out = predict(variables, b, key)
        cents = []
        for i in range(len(ids)):
            n = int(out["lengths"][i])
            if n >= 4:
                cents.append(mel_centroid(np.asarray(out["mel"][i, :n])))
        pred_cent[spk] = float(np.mean(cents)) if cents else float("nan")
        if ids:
            n = int(out["lengths"][0])
            mels_for_png.append(np.asarray(out["mel"][0, : max(n, 4)]))
            titles.append(
                f"speaker {spk}: centroid {pred_cent[spk]:.2f} "
                f"(train stat {true_cent.get(spk, float('nan')):.2f})"
            )
    save_mel_grid(
        mels_for_png, titles, os.path.join(out_dir, "speaker_swap.png"),
        f"same text, four speaker ids (step {step})",
    )
    # the conditioned direction: predicted centroids must be strictly
    # increasing in speaker index (each speaker speaks 1.35× higher) and
    # correlate with the training statistics
    order_ok = all(
        pred_cent[k + 1] > pred_cent[k] for k in range(3)
    )
    # the 8 sampled validation utterances need not cover all 4 speakers:
    # correlate only over speakers with a training statistic (a 2-point
    # correlation is weak evidence, so also require coverage ≥ 3)
    common = [k for k in sorted(pred_cent) if k in true_cent
              and np.isfinite(pred_cent[k])]
    corr = (
        float(np.corrcoef(
            [pred_cent[k] for k in common],
            [true_cent[k] for k in common],
        )[0, 1])
        if len(common) >= 3
        else float("nan")
    )
    first, last = info["losses"][0][1]["loss"], info["losses"][-1][1]["loss"]
    # magnitude criterion (VERDICT r4 weak #4): order + correlation alone
    # can pass with a ~2× compressed register span (conditioning present
    # but under-expressed); require the predicted centroid range to cover
    # >= 60% of the training-statistic range too
    pred_vals = [pred_cent[k] for k in common]
    true_vals = [true_cent[k] for k in common]
    range_ratio = (
        (max(pred_vals) - min(pred_vals)) / (max(true_vals) - min(true_vals))
        if len(common) >= 2 and max(true_vals) > min(true_vals)
        else float("nan")
    )
    return dict(
        family="speaker", steps=steps, checkpoint_step=step,
        provenance=provenance(info["hp"]),
        first_loss=first, final_loss=last,
        predicted_centroid_by_speaker=pred_cent,
        training_centroid_by_speaker=true_cent,
        register_order_monotonic=bool(order_ok),
        centroid_correlation=corr,
        centroid_range_ratio=range_ratio,
        ok=bool(
            order_ok and corr > 0.9 and range_ratio >= 0.6 and last < first
        ),
    )


def family_accent(run_root: str, out_dir: str, steps: int) -> dict:
    """Pitch-accent conditioning: high-accent sequences raise the register."""
    from self_attention_tacotron_tpu.models.models import tacotron_model_factory
    from self_attention_tacotron_tpu.synthesis import make_predict_fn

    import jax
    import jax.numpy as jnp

    overrides = dict(COMMON, **FLAGSHIP)
    overrides.update(
        encoder="SelfAttentionCBHGEncoderWithAccentType",
        use_accent_type="true", num_accent_type="4",
        accent_type_offset="0", accent_type_embedding_dim="8",
    )
    info = run_train("accent", run_root, overrides, steps,
                     corpus_kw=dict(with_accent=True))
    variables, step = restore_variables(info["ckpt_dir"])
    model = tacotron_model_factory(info["hp"])
    predict = make_predict_fn(model)
    ids, srcs, tgts, batch = load_val_batch(info, n=8, with_accent=True)

    key = jax.random.PRNGKey(0)
    # all-LOW (even type 0) vs all-HIGH (odd type 1) accent sequences on
    # the SAME phonemes: the learned convention doubles f0 on odd types
    results = {}
    mels_png, titles = [], []
    for name, acc_val in (("low", 0), ("high", 1)):
        b = dict(batch, accent_type=jnp.full_like(batch["accent_type"], acc_val))
        out = predict(variables, b, key)
        cents = []
        for i in range(len(ids)):
            n = int(out["lengths"][i])
            if n >= 4:
                cents.append(mel_centroid(np.asarray(out["mel"][i, :n])))
        results[name] = float(np.mean(cents))
        n = int(out["lengths"][0])
        mels_png.append(np.asarray(out["mel"][0, : max(n, 4)]))
        titles.append(f"all-{name} accents: centroid {results[name]:.2f}")
    save_mel_grid(
        mels_png, titles, os.path.join(out_dir, "accent_swap.png"),
        f"same phonemes, low vs high pitch-accent sequence (step {step})",
    )
    first, last = info["losses"][0][1]["loss"], info["losses"][-1][1]["loss"]
    return dict(
        family="accent", steps=steps, checkpoint_step=step,
        provenance=provenance(info["hp"]),
        first_loss=first, final_loss=last,
        centroid_all_low=results["low"], centroid_all_high=results["high"],
        high_minus_low=results["high"] - results["low"],
        ok=bool(results["high"] > results["low"] + 0.5 and last < first),
    )


def family_mgclf0(run_root: str, out_dir: str, steps: int) -> dict:
    """WORLD-feature family: mgc regression + lf0 classification learn."""
    from self_attention_tacotron_tpu.models.models import tacotron_model_factory
    from self_attention_tacotron_tpu.synthesis import make_predict_fn

    import jax

    overrides = dict(
        COMMON,
        tacotron_model="MgcLf0TacotronModel",
        encoder="ZoneoutEncoderV1",
        decoder="MgcLf0ExtendedDecoder",
        attention="forward",
    )
    info = run_train("mgclf0", run_root, overrides, steps, corpus_kw={})
    variables, step = restore_variables(info["ckpt_dir"])
    model = tacotron_model_factory(info["hp"])
    predict = make_predict_fn(model)
    ids, srcs, tgts, batch = load_val_batch(info, n=8)
    out = predict(variables, batch, jax.random.PRNGKey(0))

    accs, mses, stopped = [], [], []
    hp = info["hp"]
    for i, t in enumerate(tgts):
        n = min(int(out["lengths"][i]), int(t.target_length))
        if n < 4:
            continue
        pred_lf0 = np.argmax(np.asarray(out["lf0"][i, :n]), axis=-1)
        accs.append(float(np.mean(pred_lf0 == t.lf0[:n])))
        mses.append(float(np.mean(
            (np.asarray(out["mgc"][i, :n]) - t.mgc[:n]) ** 2
        )))
        stopped.append(
            int(out["lengths"][i]) < hp.max_iters * hp.outputs_per_step
        )
    # majority-class baseline for lf0 over the scored frames
    all_true = np.concatenate([
        t.lf0[: min(int(out["lengths"][i]), int(t.target_length))]
        for i, t in enumerate(tgts)
    ])
    majority = float(
        np.max(np.bincount(all_true.astype(np.int64))) / len(all_true)
    )
    loss_steps = [r for _, r in info["losses"]]
    first, last = loss_steps[0], loss_steps[-1]
    acc = float(np.mean(accs))
    result = dict(
        family="mgclf0", steps=steps, checkpoint_step=step,
        provenance=provenance(info["hp"]),
        first_loss=first["loss"], final_loss=last["loss"],
        first_mgc_loss=first.get("mgc_loss"), final_mgc_loss=last.get("mgc_loss"),
        first_lf0_loss=first.get("lf0_loss"), final_lf0_loss=last.get("lf0_loss"),
        heldout_lf0_frame_accuracy=acc,
        lf0_majority_baseline=majority,
        heldout_mgc_mse=float(np.mean(mses)),
        all_stopped=bool(all(stopped)),
        ok=bool(
            acc > majority + 0.1
            and last["mgc_loss"] < first["mgc_loss"]
            and last["lf0_loss"] < first["lf0_loss"]
        ),
    )
    # compact loss-curve PNG
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    for k in ("loss", "mgc_loss", "lf0_loss", "done_loss"):
        pts = [(s, r[k]) for s, r in info["losses"] if k in r]
        if pts:
            ax.plot(*zip(*pts), label=k, lw=1.0)
    ax.set_yscale("log")
    ax.legend()
    ax.set_title(
        f"MgcLf0: lf0 acc {acc:.2f} vs majority {majority:.2f} (step {step})"
    )
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "mgclf0_losses.png"), dpi=110)
    plt.close(fig)
    return result


def diagonality(align: np.ndarray, src_len: int, dec_len: int) -> float:
    """Fraction of alignment mass within ±0.15·S of the monotone diagonal."""
    a = align[:dec_len, :src_len]
    s_pos = np.arange(src_len)[None, :]
    centers = np.linspace(0, src_len - 1, dec_len)[:, None]
    band = np.abs(s_pos - centers) <= max(0.15 * src_len, 2.0)
    return float((a * band).sum() / (a.sum() + 1e-9))


def family_ls(run_root: str, out_dir: str, steps: int) -> dict:
    """Location-sensitive attention trains FUSED; diagonal emerges.

    Single-source ExtendedDecoder — the configuration LS attention ships
    in (companion tacotron2 repo; SURVEY.md §2.2). The dual-source SA
    flagship pairs with forward attention in every named reference config;
    putting LS there collapses (see module docstring / BASELINE.md r5).

    Corpus is DELIBERATELY harder than the other families': LS attention
    has no monotonic prior (unlike forward attention), so alignment only
    emerges when the decoder cannot fit the data without reading the text.
    On the default 192×(17-24 symbol) corpus the decoder identifies the
    training utterance from its first frames and replays it from LSTM
    dynamics — loss hits 0.07 by step 200 with uniformly diffuse attention
    (measured r5, runs/drain_r5/matrix_ls.log: median diagonality 0.378,
    teacher-forced alignments equally flat). 1024 utterances × 48-64
    symbols makes that memorization infeasible and gives the kernel-31
    location conv a sequence long enough to resolve position on."""
    from self_attention_tacotron_tpu.models.models import tacotron_model_factory
    from self_attention_tacotron_tpu.synthesis import make_predict_fn

    import jax

    overrides = dict(
        COMMON,
        tacotron_model="ExtendedTacotronV1Model",
        encoder="ZoneoutEncoderV1",
        decoder="ExtendedDecoder",
        attention="location_sensitive",
    )
    info = run_train(
        "ls", run_root, overrides, steps,
        corpus_kw=dict(num_utterances=1024, min_symbols=48, max_symbols=64),
    )
    variables, step = restore_variables(info["ckpt_dir"])
    model = tacotron_model_factory(info["hp"])
    predict = make_predict_fn(model)
    ids, srcs, tgts, batch = load_val_batch(info, n=8)
    out = predict(variables, batch, jax.random.PRNGKey(0))

    hp = info["hp"]
    diags = []
    for i in range(len(ids)):
        n_dec = max(int(out["lengths"][i]) // hp.outputs_per_step, 1)
        diags.append(diagonality(
            np.asarray(out["alignments"][0][i], np.float32),
            int(batch["source_lengths"][i]), n_dec,
        ))
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(9, 3.5))
    for ax, i in zip(axes, range(2)):
        n_dec = max(int(out["lengths"][i]) // hp.outputs_per_step, 1)
        ax.imshow(
            np.asarray(
                out["alignments"][0][i][:n_dec, : int(batch["source_lengths"][i])],
                np.float32,
            ).T,
            origin="lower", aspect="auto", interpolation="nearest",
        )
        ax.set_title(f"{ids[i]}: diagonality {diags[i]:.2f}", fontsize=8)
    fig.suptitle(
        f"location-sensitive alignments ({decode_path_label()}, step {step})"
    )
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "ls_alignments.png"), dpi=110)
    plt.close(fig)
    first, last = info["losses"][0][1]["loss"], info["losses"][-1][1]["loss"]
    return dict(
        family="ls", steps=steps, checkpoint_step=step,
        provenance=provenance(info["hp"]),
        first_loss=first, final_loss=last,
        median_diagonality=float(np.median(diags)),
        ok=bool(np.median(diags) > 0.8 and last < first),
    )


def family_postnet(run_root: str, out_dir: str, steps: int) -> dict:
    """Linear-spectrogram PostCBHG: linear loss falls, held-out spec
    tracks ground truth, Griffin-Lim reconstructs a finite waveform.

    The postnet config previously had only 4-step loss smokes
    (test_e2e_variants); this run shows the linear head actually LEARNS
    the spectrogram rather than being carried dead weight."""
    from self_attention_tacotron_tpu.audio import Audio
    from self_attention_tacotron_tpu.models.models import tacotron_model_factory
    from self_attention_tacotron_tpu.synthesis import make_predict_fn

    import jax

    overrides = dict(COMMON, **FLAGSHIP)
    # default num_freq=1025 (n_fft 2048): the 50 ms analysis window needs
    # n_fft >= 1102 samples, so the "cheaper" 513-bin option is invalid
    overrides.update(use_linear_spectrogram_postnet="true")
    info = run_train("postnet", run_root, overrides, steps, corpus_kw={})
    variables, step = restore_variables(info["ckpt_dir"])
    model = tacotron_model_factory(info["hp"])
    predict = make_predict_fn(model)
    ids, srcs, tgts, batch = load_val_batch(info, n=8)
    out = predict(variables, batch, jax.random.PRNGKey(0))

    hp = info["hp"]
    spec_mses, true_frames = [], []
    for i, t in enumerate(tgts):
        n = min(int(out["lengths"][i]), int(t.target_length))
        if n < 4 or t.spec is None:
            continue
        pred = np.asarray(out["linear"][i, :n], np.float32)
        true = t.spec[:n]
        spec_mses.append(float(np.mean((pred - true) ** 2)))
        true_frames.append(true)
    # skill floor: a text-blind predictor emitting the GLOBAL mean
    # spectrum of the held-out frames (a per-utterance mean would be an
    # oracle — unfairly strong on stationary per-symbol tones)
    allf = np.concatenate(true_frames) if true_frames else np.zeros((1, 1))
    mean_mse = float(np.mean((allf - allf.mean(0, keepdims=True)) ** 2))
    audio = Audio(hp)
    n0 = max(int(out["lengths"][0]), 4)
    wav = audio.inv_spectrogram(np.asarray(out["linear"][0, :n0], np.float32))
    wav_ok = bool(np.isfinite(wav).all() and float(np.abs(wav).max()) > 1e-4)

    loss_recs = [r for _, r in info["losses"] if "linear_loss" in r]
    first_lin = loss_recs[0]["linear_loss"]
    last_lin = loss_recs[-1]["linear_loss"]
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 1, figsize=(8, 5))
    n = min(int(out["lengths"][0]), int(tgts[0].target_length))
    axes[0].imshow(np.asarray(out["linear"][0, :n], np.float32).T,
                   origin="lower", aspect="auto", interpolation="nearest")
    axes[0].set_title(f"{ids[0]} predicted linear (step {step})", fontsize=8)
    axes[1].imshow(tgts[0].spec[:n].T, origin="lower", aspect="auto",
                   interpolation="nearest")
    axes[1].set_title("ground truth", fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "postnet_linear.png"), dpi=110)
    plt.close(fig)
    first, last = info["losses"][0][1]["loss"], info["losses"][-1][1]["loss"]
    spec_mse = float(np.mean(spec_mses)) if spec_mses else float("nan")
    return dict(
        family="postnet", steps=steps, checkpoint_step=step,
        provenance=provenance(info["hp"]),
        first_loss=first, final_loss=last,
        first_linear_loss=first_lin, final_linear_loss=last_lin,
        heldout_spec_mse=spec_mse,
        mean_predictor_spec_mse=mean_mse,
        griffin_lim_wav_finite=wav_ok,
        ok=bool(
            last_lin < first_lin
            and spec_mse < 0.5 * mean_mse
            and wav_ok
        ),
    )


FAMILIES = dict(
    speaker=family_speaker, accent=family_accent,
    mgclf0=family_mgclf0, ls=family_ls, postnet=family_postnet,
)


def main():
    # honor SATT_PLATFORM=cpu for wiring smokes (the in-process scoring
    # otherwise initializes the axon backend on import-time first touch)
    from self_attention_tacotron_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--families", default="speaker,accent,mgclf0,ls,postnet")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--hparams-extra", default="",
                   help="comma-separated k=v overrides merged last into "
                        "every family (e.g. shrunken dims for a CPU "
                        "fallback evidence run)")
    p.add_argument("--run-root", default=os.path.join(REPO, "runs", "matrix"))
    p.add_argument("--out-dir",
                   default=os.path.join(REPO, "artifacts", "convergence_r4"))
    args = p.parse_args()
    EXTRA.update(
        kv.split("=", 1)
        for kv in args.hparams_extra.split(",")
        if "=" in kv
    )
    os.makedirs(args.out_dir, exist_ok=True)

    matrix_path = os.path.join(args.out_dir, "matrix.json")
    matrix = {}
    if os.path.exists(matrix_path):
        matrix = json.load(open(matrix_path))
    for fam in args.families.split(","):
        fam = fam.strip()
        print(f"[matrix] === family: {fam} ===", flush=True)
        result = FAMILIES[fam](args.run_root, args.out_dir, args.steps)
        matrix[fam] = result
        with open(matrix_path, "w") as f:
            json.dump(matrix, f, indent=2)
        print(f"[matrix] {fam}: ok={result['ok']} "
              + json.dumps({k: v for k, v in result.items()
                            if isinstance(v, (int, float, bool))}),
              flush=True)
    bad = [k for k, v in matrix.items() if not v.get("ok")]
    print(f"[matrix] done; failing families: {bad or 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
