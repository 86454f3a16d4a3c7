#!/bin/bash
# Round-5 measurement drain (VERDICT r4 "Next round" items 1-4), priority
# order. Every step logs to runs/drain_r5/<step>.log and failures don't
# stop the queue; a summary of exit codes prints at the end. Run it the
# moment the TPU relay answers:
#   bash scripts/drain_r5.sh            # stage 1: gates + benches (~20 min)
#   bash scripts/drain_r5.sh matrix     # stage 2: convergence matrix runs
#   bash scripts/drain_r5.sh long      # stage 3: long-utterance fine-tune
set -u
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
OUT=runs/drain_r5
mkdir -p "$OUT"
SUMMARY="$OUT/summary.txt"

run() {
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%SZ): $*" | tee -a "$SUMMARY"
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc end $(date -u +%H:%M:%SZ)" | tee -a "$SUMMARY"
  tail -2 "$OUT/$name.log"
}

stage=${1:-gates}

case "$stage" in
gates)
  # cheap correctness gates first — do not trust bench numbers from
  # kernels that have never passed on-device parity post-change
  run parity 1200 python scripts/tpu_parity.py
  run parity_train 1800 python scripts/tpu_parity.py --train
  # headline + training bench (device-time xplane capture in-run)
  run bench 1800 python bench.py
  run bench_train 1800 python bench.py --train
  # training ablation rows: LS family + batch-block (64/128) coverage
  run ablate 2400 python scripts/profile_train_ablate.py \
    full,ls,full:b64,full:b128,ls:b64
  ;;
matrix)
  # mgclf0: idempotent re-score of the SAME r4 checkpoint post lf0-fix;
  # ls + postnet: full-size trained runs through the fused kernels;
  # speaker: re-scored under the new range criterion (trains further only
  # if the checkpoint is behind --steps)
  run matrix 14400 python scripts/convergence_matrix.py \
    --families mgclf0,ls,postnet,speaker,accent --steps 2500 \
    --run-root runs/matrix --out-dir artifacts/convergence_r5
  ;;
long)
  # warm start from the COMMITTED r3 flagship npz (the orbax run dirs do
  # not survive between rounds; trainer accepts .npz via _variables_from_npz)
  run long_finetune 7200 python scripts/convergence_run.py --long \
    --restore-from artifacts/convergence_r3/trained_params.npz --steps 2000 \
    --run-dir runs/convergence_long
  ;;
r5b)
  # session-2 remainder, serialized on the one chip: fresh single-source
  # ls run (family rewired in 7052555), speaker extended to 5000 steps
  # (range criterion needs more training), then the long-utterance
  # fine-tune from the committed r3 flagship npz
  run matrix_ls 7200 python scripts/convergence_matrix.py \
    --families ls --steps 2500 \
    --run-root runs/matrix --out-dir artifacts/convergence_r5
  run matrix_speaker 7200 python scripts/convergence_matrix.py \
    --families speaker --steps 5000 \
    --run-root runs/matrix --out-dir artifacts/convergence_r5
  run long_finetune 7200 python scripts/convergence_run.py --long \
    --restore-from artifacts/convergence_r3/trained_params.npz --steps 2000 \
    --run-dir runs/convergence_long
  ;;
r5c)
  # session-3 remainder: LS matrix on the hardened corpus (1024 utts ×
  # 48-64 symbols — the default corpus is memorizable without reading
  # the text; see family_ls docstring), then the long-checkpoint trained
  # bench (real early exit at 610-982 frames, SA cache past chunk 29)
  run matrix_ls3 10800 python scripts/convergence_matrix.py \
    --families ls --steps 2500 \
    --run-root runs/matrix --out-dir artifacts/convergence_r5
  run bench_trained_long 3600 python bench.py \
    --trained-npz artifacts/convergence_long_r5/trained_params.npz \
    --trained-symbols 94,152 --repeats 3
  ;;
*)
  echo "unknown stage: $stage (gates|matrix|long|r5b|r5c)"; exit 2 ;;
esac
echo "--- summary ---"; cat "$SUMMARY"
