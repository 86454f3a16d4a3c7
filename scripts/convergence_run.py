#!/usr/bin/env python
"""End-to-end convergence run: generate corpus → train → synthesize → verify.

The "does it actually learn?" evidence run (SURVEY.md §4 test-pyramid item
3 / §6 quality north star; VERDICT r2 missing #1): trains the flagship
DualSourceSelfAttentionTacotron on the synthetic corpus (whose per-symbol
tone segments give a REAL learnable text↔audio alignment), then
synthesizes the held-out validation set from the trained checkpoint with
the real stop threshold (0.5) so per-lane early exit runs for real, and
scores:

* loss curve (metrics.jsonl → loss_curve.png),
* alignment diagonality over training (the committed alignment PNGs),
* stop-token behavior: predicted length vs ground-truth mel length per
  held-out utterance (median |Δ| in frames),
* spectral match: mel MSE between prediction and ground truth over the
  overlapping frames (normalized mel domain).

Everything runs through the user-facing CLIs (train.py / predict_mel.py)
so the run exercises the same path a user would. Artifacts land in
``--run-dir`` (checkpoints + logs + predictions + summary.json); the
small evidence files are committed, the checkpoint itself is exported as
a compact params-only ``.npz`` for the synthesis bench.

Usage:
  python scripts/convergence_run.py --run-dir runs/convergence \
      [--steps 8000] [--num-utterances 256] [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGSHIP_OVERRIDES = dict(
    tacotron_model="DualSourceSelfAttentionTacotronModel",
    encoder="SelfAttentionCBHGEncoder",
    decoder="DualSourceSelfAttentionDecoder",
    attention="forward",
    attention2="additive",
    dataset="synthetic",
    compute_dtype="bfloat16",
    use_gradient_clipping="true",
    use_cache="true",
    # cadences tuned for an ~8k-step evidence run
    save_summary_steps="50",
    log_step_count_steps="50",
    save_checkpoints_steps="1000",
    alignment_save_steps="500",
    save_training_time_metrics="true",
    eval_start_delay_secs="60",
    eval_throttle_secs="240",
    num_evaluation_steps="2",
)


def hp_string(extra: dict | None = None) -> str:
    d = dict(FLAGSHIP_OVERRIDES)
    if extra:
        d.update(extra)
    return ",".join(f"{k}={v}" for k, v in d.items())


def generate(data_dir: str, list_dir: str, num_utterances: int,
             min_symbols: int = 17, max_symbols: int = 24) -> None:
    from self_attention_tacotron_tpu.data.synthetic import generate_corpus
    from self_attention_tacotron_tpu.hparams import default_hparams

    hp = default_hparams()
    hp.parse(hp_string())
    ids = generate_corpus(
        data_dir,
        hp,
        num_utterances=num_utterances,
        # default 17–24 symbols keeps every source in the (16, 32] bucket
        # → 2-3 compiled batch shapes total (remote compiles are 10 s–3 min
        # each); the --long evidence run raises this to 94–152 symbols
        # (≈600–1000 mel frames at 6.4 frames/symbol)
        min_symbols=min_symbols,
        max_symbols=max_symbols,
        selected_list_dir=list_dir,
    )
    with open(os.path.join(list_dir, "corpus_meta.json"), "w") as f:
        json.dump(dict(num_utterances=num_utterances,
                       min_symbols=min_symbols, max_symbols=max_symbols), f)
    print(f"[convergence] generated {len(ids)} utterances in {data_dir}")


def check_corpus_matches(list_dir: str, num_utterances: int,
                         min_symbols: int, max_symbols: int) -> None:
    """Refuse to silently reuse a corpus generated with other parameters.

    Generation is skipped whenever train.lst exists, so e.g. ``--long`` in
    a run dir that already holds the 17–24-symbol corpus would otherwise
    train short utterances while reporting itself as the long-utterance
    evidence run."""
    meta_path = os.path.join(list_dir, "corpus_meta.json")
    want = dict(num_utterances=num_utterances,
                min_symbols=min_symbols, max_symbols=max_symbols)
    have = json.load(open(meta_path)) if os.path.exists(meta_path) else None
    if have != want:
        raise SystemExit(
            f"[convergence] existing corpus in {list_dir} was generated "
            f"with {have}, but this invocation wants {want}; use a fresh "
            "--run-dir (or delete the corpus, or pass --skip-generate to "
            "explicitly reuse it) instead of silently training on "
            "mismatched data"
        )


def run_cli(script: str, *cli_args: str) -> None:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, os.path.join(REPO, script), *cli_args]
    print("[convergence] $", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, env=env, cwd=REPO)


def plot_loss_curve(log_dir: str, out_png: str) -> dict:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps, losses, extras = [], [], {}
    eval_steps, eval_losses = [], []
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss" in rec:
                steps.append(rec["step"])
                losses.append(rec["loss"])
                for k in ("mel_loss", "done_loss"):
                    if k in rec:
                        extras.setdefault(k, ([], []))
                        extras[k][0].append(rec["step"])
                        extras[k][1].append(rec[k])
            if "eval_loss" in rec:
                eval_steps.append(rec["step"])
                eval_losses.append(rec["eval_loss"])
    fig, ax = plt.subplots(figsize=(9, 5))
    ax.plot(steps, losses, label="train loss", lw=1.0)
    for k, (s, v) in extras.items():
        ax.plot(s, v, label=k, lw=0.8, alpha=0.7)
    if eval_steps:
        ax.plot(eval_steps, eval_losses, "o-", label="eval loss", ms=3)
    ax.set_yscale("log")
    ax.set_xlabel("step")
    ax.set_ylabel("loss (log scale)")
    ax.legend()
    ax.set_title("flagship convergence on the synthetic corpus")
    fig.tight_layout()
    fig.savefig(out_png, dpi=110)
    plt.close(fig)
    return {
        "first_loss": losses[0] if losses else None,
        "final_loss": losses[-1] if losses else None,
        "min_loss": min(losses) if losses else None,
        "final_eval_loss": eval_losses[-1] if eval_losses else None,
        "logged_points": len(steps),
    }


def export_params_npz(ckpt_dir: str, out_npz: str) -> int:
    """Flatten the latest orbax checkpoint into one compact npz.

    Contains BOTH ``params/...`` and ``batch_stats/...`` keys — the CBHG
    conv-bank BatchNorm needs its running statistics to run in eval mode,
    so params alone cannot drive synthesis.
    """
    import flax
    import numpy as np
    import orbax.checkpoint as ocp

    mngr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = mngr.latest_step()
    restored = mngr.restore(step)
    arrays = {}
    for collection in ("params", "batch_stats"):
        tree = (
            restored[collection]
            if isinstance(restored, dict)
            else getattr(restored, collection)
        )
        flat = flax.traverse_util.flatten_dict(tree, sep="/")
        arrays.update(
            {f"{collection}/{k}": np.asarray(v).astype(np.float32) for k, v in flat.items()}
        )
    np.savez_compressed(out_npz, **arrays)
    size_mb = os.path.getsize(out_npz) / 1e6
    print(f"[convergence] exported step-{step} params → {out_npz} ({size_mb:.1f} MB)")
    return int(step)


def load_variables_npz(npz_path: str):
    """Inverse of export_params_npz → flax variables dict."""
    import flax
    import jax.numpy as jnp
    import numpy as np

    flat = dict(np.load(npz_path))
    variables = {}
    for key, value in flat.items():
        collection, rest = key.split("/", 1)
        variables.setdefault(collection, {})[tuple(rest.split("/"))] = jnp.asarray(value)
    return {
        c: flax.traverse_util.unflatten_dict(leaves)
        for c, leaves in variables.items()
    }


def score_predictions(data_dir: str, list_dir: str, pred_dir: str) -> dict:
    """Predicted-vs-truth lengths + mel MSE for the held-out utterances."""
    import numpy as np

    from self_attention_tacotron_tpu.data.dataset import (
        parse_target_tfrecord,
        read_selected_list,
    )
    from self_attention_tacotron_tpu.hparams import default_hparams

    hp = default_hparams()
    hp.parse(hp_string())
    ids = read_selected_list(list_dir, "validation")
    rows = []
    for utt_id in ids:
        tgt = parse_target_tfrecord(
            os.path.join(data_dir, f"{utt_id}.{hp.target_file_extension}")
        )
        mfbsp = os.path.join(pred_dir, f"{utt_id}.{hp.predicted_mel_extension}")
        if not os.path.exists(mfbsp):
            continue
        pred = np.fromfile(mfbsp, np.float32).reshape(-1, hp.num_mels)
        true_len = int(tgt.target_length)
        n = min(len(pred), true_len)
        mse = float(np.mean((pred[:n] - tgt.mel[:n]) ** 2)) if n else float("nan")
        rows.append(
            dict(
                id=utt_id,
                true_frames=true_len,
                predicted_frames=int(len(pred)),
                length_error=int(len(pred)) - true_len,
                mel_mse=mse,
            )
        )
    errs = np.asarray([abs(r["length_error"]) for r in rows], np.float64)
    mses = np.asarray([r["mel_mse"] for r in rows], np.float64)
    frame_cap = hp.max_iters * hp.outputs_per_step
    return dict(
        utterances=rows,
        n_scored=len(rows),
        median_abs_length_error_frames=float(np.median(errs)) if len(errs) else None,
        max_abs_length_error_frames=float(errs.max()) if len(errs) else None,
        all_stopped_before_cap=bool(
            all(r["predicted_frames"] < frame_cap for r in rows)
        ),
        mean_mel_mse=float(np.nanmean(mses)) if len(mses) else None,
        median_mel_mse=float(np.nanmedian(mses)) if len(mses) else None,
    )


def main():
    # honor SATT_PLATFORM=cpu for wiring smokes (in-process scoring would
    # otherwise initialize the axon backend)
    sys.path.insert(0, REPO)
    from self_attention_tacotron_tpu.utils.platform import apply_platform_override

    apply_platform_override()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run-dir", default=os.path.join(REPO, "runs", "convergence"))
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--num-utterances", type=int, default=256)
    p.add_argument("--skip-train", action="store_true",
                   help="reuse an existing checkpoint; just synthesize + score")
    p.add_argument("--skip-generate", action="store_true")
    p.add_argument("--hparams-extra", default="",
                   help="extra comma-separated overrides (smoke testing)")
    p.add_argument("--long", action="store_true",
                   help="long-utterance evidence run (VERDICT r3 missing "
                        "#5): 94-152-symbol utterances (~600-1000 mel "
                        "frames), so the trained model's early exit, deep "
                        "SA-cache walk and stop accuracy are exercised at "
                        "realistic lengths")
    p.add_argument("--min-symbols", type=int, default=None)
    p.add_argument("--max-symbols", type=int, default=None)
    p.add_argument("--restore-from", default=None,
                   help="warm-start params from another run's checkpoint "
                        "dir (fine-tune, e.g. the short-utterance run)")
    args = p.parse_args()
    if args.long:
        if args.min_symbols is None:
            args.min_symbols = 94
        if args.max_symbols is None:
            args.max_symbols = 152
    args.min_symbols = args.min_symbols or 17
    args.max_symbols = args.max_symbols or 24
    extra = dict(
        kv.split("=", 1) for kv in args.hparams_extra.split(",") if "=" in kv
    )
    FLAGSHIP_OVERRIDES.update(extra)

    run_dir = os.path.abspath(args.run_dir)
    data_dir = os.path.join(run_dir, "data")
    list_dir = os.path.join(run_dir, "lists")
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    pred_dir = os.path.join(run_dir, "predictions")
    os.makedirs(run_dir, exist_ok=True)

    if not args.skip_generate and not os.path.exists(
        os.path.join(list_dir, "train.lst")
    ):
        generate(data_dir, list_dir, args.num_utterances,
                 min_symbols=args.min_symbols, max_symbols=args.max_symbols)
    elif not args.skip_generate:
        check_corpus_matches(list_dir, args.num_utterances,
                             args.min_symbols, args.max_symbols)

    if not args.skip_train:
        os.makedirs(ckpt_dir, exist_ok=True)
        train_args = [
            f"--source-data-root={data_dir}",
            f"--checkpoint-dir={ckpt_dir}",
            f"--selected-list-dir={list_dir}",
            "--selected-list-filename=train",
            "--validation-list-filename=validation",
            f"--steps={args.steps}",
            f"--hparams={hp_string()}",
        ]
        if args.restore_from:
            train_args.append(f"--restore-from={os.path.abspath(args.restore_from)}")
        run_cli("train.py", *train_args)

    # synthesize the validation set from the trained checkpoint with the
    # REAL stop threshold — per-lane early exit must fire (VERDICT weak #5)
    run_cli(
        "predict_mel.py",
        f"--source-data-root={data_dir}",
        f"--checkpoint-dir={ckpt_dir}",
        f"--output-dir={pred_dir}",
        f"--selected-list-dir={list_dir}",
        "--test-list-filename=validation",
        "--batch-size=16",
        f"--hparams={hp_string(dict(stop_token_threshold='0.5'))}",
    )

    summary = dict(steps=args.steps, run_dir=run_dir)
    log_dir = os.path.join(ckpt_dir, "log")
    if os.path.exists(os.path.join(log_dir, "metrics.jsonl")):
        summary["loss"] = plot_loss_curve(
            log_dir, os.path.join(run_dir, "loss_curve.png")
        )
    summary["synthesis"] = score_predictions(data_dir, list_dir, pred_dir)
    summary["checkpoint_step"] = export_params_npz(
        ckpt_dir, os.path.join(run_dir, "trained_params.npz")
    )
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "synthesis"}, indent=2))
    syn = dict(summary["synthesis"])
    syn.pop("utterances", None)
    print("[convergence] synthesis:", json.dumps(syn, indent=2))


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
