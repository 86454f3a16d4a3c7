#!/usr/bin/env python
"""Benchmark: batched autoregressive mel synthesis throughput (north star).

Measures the flagship DualSourceSelfAttentionTacotron model's AR decode
throughput (mel frames/sec/chip) at batch 32 on the available accelerator,
plus batch-1 RTF as a secondary metric (stderr). The stop threshold is set
above 1.0 so every lane decodes the full ``max_iters`` steps — a fixed,
comparable amount of work independent of (untrained) stop-token behavior.

Prints ONE JSON line to stdout:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference publishes no performance numbers and its mount is
empty (BASELINE.md), so the denominator is this framework's own measured
JAX-CPU throughput on the identical config — the stand-in for the
"TF-CPU reference" in the ≥5× north-star target, measured on this image
(see BASELINE.md "measured" table).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

# Stand-in for the TF-CPU reference (north star denominator): measured
# JAX-CPU float32 frames/sec of this exact benchmark config on the build
# image (single vCPU, 2026-08-16, see BASELINE.md). Re-measure with
# --measure-cpu-baseline.
CPU_BASELINE_FRAMES_PER_SEC = 6531.4


def flagship_hparams():
    from self_attention_tacotron_tpu.hparams import HParams

    return HParams(
        tacotron_model="DualSourceSelfAttentionTacotronModel",
        encoder="SelfAttentionCBHGEncoder",
        decoder="DualSourceSelfAttentionDecoder",
        attention="forward",
        attention2="additive",
        num_symbols=256,
        embedding_dim=256,
        cbhg_out_units=256,
        self_attention_out_units=256,
        decoder_out_units=256,
        attention_out_units=256,
        attention1_out_units=224,
        attention2_out_units=32,
        num_mels=80,
        outputs_per_step=2,
        max_iters=500,
        stop_token_threshold=2.0,   # never fires: full fixed-length decode
        compute_dtype="bfloat16",
    )


def run_bench(
    batch_size: int,
    max_iters: int,
    src_len: int,
    repeats: int,
    seed: int = 0,
    compute_dtype: str = "bfloat16",
    profile_dir: str | None = None,
):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from self_attention_tacotron_tpu.models.models import tacotron_model_factory
    from self_attention_tacotron_tpu.synthesis import make_predict_fn

    hp = flagship_hparams()
    hp.max_iters = max_iters
    hp.compute_dtype = compute_dtype
    model = tacotron_model_factory(hp)
    net = model.network(is_training=False)

    rng = np.random.RandomState(seed)
    batch = {
        "source": jnp.asarray(
            rng.randint(2, hp.num_symbols, (batch_size, src_len)), jnp.int32
        ),
        "source_lengths": jnp.full((batch_size,), src_len, jnp.int32),
    }
    rngs = {
        "params": jax.random.PRNGKey(0),
        "dropout": jax.random.PRNGKey(1),
        "zoneout": jax.random.PRNGKey(2),
    }
    frames = max_iters * hp.outputs_per_step
    targets = jnp.zeros((batch_size, hp.outputs_per_step * 2, hp.num_mels))
    variables = net.init(
        rngs, batch["source"], batch["source_lengths"], targets,
        jnp.full((batch_size,), targets.shape[1], jnp.int32),
    )
    predict = make_predict_fn(model)

    key = jax.random.PRNGKey(7)
    t0 = time.perf_counter()
    out = predict(variables, batch, key)
    jax.block_until_ready(out["mel"])
    compile_time = time.perf_counter() - t0
    assert int(out["num_steps"]) == max_iters, "decode must run to the cap"

    # Strict methodology: N back-to-back calls, then a hard host
    # materialization of the last result — immune to async-completion
    # artifacts of the serving transport (block_until_ready alone can
    # under-report on this backend; see memory notes). Reported number is
    # the per-call average of the pipelined steady state.
    n_calls = max(repeats, 3)
    t0 = time.perf_counter()
    for i in range(n_calls):
        out = predict(variables, batch, jax.random.fold_in(key, i))
    mel_np = np.asarray(out["mel"])
    assert np.isfinite(mel_np).all()
    best = (time.perf_counter() - t0) / n_calls

    if profile_dir:
        with jax.profiler.trace(profile_dir):
            out = predict(variables, batch, jax.random.fold_in(key, 99))
            jax.block_until_ready(out["mel"])
        print(f"[bench] wrote jax.profiler trace to {profile_dir}", file=sys.stderr)
    fps = batch_size * frames / best
    return dict(
        frames_per_sec=fps,
        decode_seconds=best,
        compile_seconds=compile_time,
        batch_size=batch_size,
        frames_per_utterance=frames,
        device=str(jax.devices()[0]),
    )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--max-iters", type=int, default=500)
    p.add_argument("--source-length", type=int, default=128)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--skip-rtf", action="store_true")
    p.add_argument(
        "--profile-dir",
        default=None,
        help="capture a jax.profiler trace (xplane) of one timed decode",
    )
    p.add_argument("--measure-cpu-baseline", action="store_true",
                   help="force CPU and report (for updating the baseline constant)")
    args = p.parse_args()

    if args.measure_cpu_baseline:
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        from self_attention_tacotron_tpu.utils.platform import apply_platform_override

        apply_platform_override()

    result = run_bench(
        args.batch_size,
        args.max_iters,
        args.source_length,
        args.repeats,
        # the CPU stand-in baseline runs float32, like the TF-CPU reference would
        compute_dtype="float32" if args.measure_cpu_baseline else "bfloat16",
        profile_dir=args.profile_dir,
    )
    print(
        f"[bench] device={result['device']} batch={result['batch_size']} "
        f"frames/utt={result['frames_per_utterance']} "
        f"decode={result['decode_seconds']:.3f}s compile={result['compile_seconds']:.1f}s",
        file=sys.stderr,
    )

    if not args.skip_rtf and not args.measure_cpu_baseline:
        rtf_res = run_bench(1, args.max_iters, args.source_length, max(args.repeats, 2))
        # real-time mel frame rate of the audio this represents
        hp = flagship_hparams()
        audio_fps = hp.sample_rate / hp.hop_length
        rtf = (rtf_res["frames_per_sec"] / audio_fps)
        print(
            f"[bench] batch-1: {rtf_res['frames_per_sec']:.0f} frames/s "
            f"= {rtf:.1f}x realtime (RTF {1.0 / max(rtf, 1e-9):.4f})",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": "mel_frames_per_sec_per_chip",
                "value": round(result["frames_per_sec"], 1),
                "unit": "frames/sec",
                "vs_baseline": round(
                    result["frames_per_sec"] / CPU_BASELINE_FRAMES_PER_SEC, 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
