#!/usr/bin/env python
"""On-device fused-decode parity check: Pallas kernel vs XLA while-loop.

The CI parity tests (tests/test_fused_decode.py) run the kernel in
interpreter mode on CPU; this script re-verifies the REAL Mosaic-compiled
kernel against the XLA decode path on the attached accelerator, at both
float32 (tight tolerance) and bfloat16 (loose tolerance) compute, for the
flagship config, the transition-agent variant, and the speaker-embedding
(VCTK) variant. Exits non-zero on any mismatch; prints one JSON line.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_parity.py
"""

from __future__ import annotations

import json
import sys

from self_attention_tacotron_tpu.utils.platform import apply_platform_override

apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from self_attention_tacotron_tpu.models.models import tacotron_model_factory
from self_attention_tacotron_tpu.synthesis import make_predict_fn


def _case_hparams(**overrides):
    from self_attention_tacotron_tpu.hparams import HParams

    hp = HParams(
        tacotron_model="DualSourceSelfAttentionTacotronModel",
        encoder="SelfAttentionCBHGEncoder",
        decoder="DualSourceSelfAttentionDecoder",
        attention="forward",
        attention2="additive",
        decoder_prenet_drop_rate=0.0,  # PRNG streams differ by design
        max_iters=24,
        stop_token_threshold=2.0,      # fixed-length: compare full buffers
    )
    for k, v in overrides.items():
        setattr(hp, k, v)
    return hp


def run_case(name: str, hp, batch: int = 8, src: int = 32, seed: int = 0):
    model = tacotron_model_factory(hp)
    net = model.network(is_training=False)
    rng = np.random.RandomState(seed)
    source = jnp.asarray(rng.randint(2, hp.num_symbols, (batch, src)), jnp.int32)
    lengths = jnp.asarray(
        rng.randint(max(2, src // 2), src + 1, (batch,)), jnp.int32
    )
    feed = {"source": source, "source_lengths": lengths}
    init_kwargs = {}
    if hp.use_speaker_embedding:
        feed["speaker_id"] = jnp.asarray(
            rng.randint(0, hp.num_speakers, (batch,)), jnp.int32
        )
        init_kwargs["speaker_id"] = feed["speaker_id"]
    rngs = {
        k: jax.random.PRNGKey(i)
        for i, k in enumerate(["params", "dropout", "zoneout"])
    }
    variables = net.init(
        rngs, source, lengths, jnp.zeros((batch, 4, hp.num_mels)),
        jnp.full((batch,), 4, jnp.int32), **init_kwargs,
    )
    key = jax.random.PRNGKey(99)
    ref = jax.tree.map(
        np.asarray, make_predict_fn(model, use_fused=False)(variables, feed, key)
    )
    got = jax.tree.map(
        np.asarray, make_predict_fn(model, use_fused=True)(variables, feed, key)
    )
    # Tolerance rationale: exact math parity is pinned by the CPU
    # interpret-mode tests (atol 2e-3); this on-device check guards against
    # gross kernel/compile bugs (wrong weight routing, layout errors → O(1)
    # mismatches). On TPU both paths use DEFAULT-precision matmuls (bf16
    # multiply, f32 accumulate) with different op shapes/orders, and the
    # AR feedback loop compounds that per-step rounding over max_iters
    # steps — measured f32 mel drift at 24 steps is ~0.019 (2026-08-16).
    tol = {
        "mel": 0.03 if hp.compute_dtype == "float32" else 0.08,
        "stop": 0.01,
        "align": 0.005,
    }
    errs = {}
    errs["mel"] = float(np.abs(got["mel"] - ref["mel"]).max())
    errs["stop"] = float(np.abs(got["stop_probs"] - ref["stop_probs"]).max())
    for i, (a, b) in enumerate(zip(got["alignments"], ref["alignments"])):
        errs[f"align{i}"] = float(np.abs(a - b).max())
    ok = all(v <= tol[k.rstrip("01")] for k, v in errs.items())
    return {"case": name, "dtype": hp.compute_dtype, "ok": ok, "tol": tol,
            "max_errs": {k: round(v, 6) for k, v in errs.items()}}


def main() -> int:
    backend = jax.default_backend()
    if backend == "cpu":
        print(json.dumps({"skipped": True, "reason": "no accelerator"}))
        return 0
    cases = [
        ("flagship_f32", _case_hparams(compute_dtype="float32")),
        ("flagship_bf16", _case_hparams(compute_dtype="bfloat16")),
        ("transition_agent_f32",
         _case_hparams(attention="forward_transition_agent", compute_dtype="float32")),
        ("speaker_f32",
         _case_hparams(use_speaker_embedding=True, num_speakers=4,
                       speaker_embedding_dim=16, compute_dtype="float32")),
        # BASELINE config 1 path: single source, no decoder SA
        ("extended_decoder_f32",
         _case_hparams(tacotron_model="ExtendedTacotronV1Model",
                       encoder="EncoderV1", decoder="ExtendedDecoder",
                       compute_dtype="float32")),
        # dual source without decoder SA
        ("dual_source_decoder_f32",
         _case_hparams(decoder="DualSourceDecoder", compute_dtype="float32")),
    ]
    results = [run_case(name, hp) for name, hp in cases]
    all_ok = all(r["ok"] for r in results)
    print(json.dumps({"backend": backend, "ok": all_ok, "cases": results}))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
