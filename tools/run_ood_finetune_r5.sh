#!/usr/bin/env bash
# OOD domain-adaptation fine-tune, end to end (round-4 verdict next #6: recipe-length run).
# Reference recipe: README.md:175-198 + configs/finetune_ood.yaml — light
# adaptation (compression + control only, SD UNet frozen) from a pretrained
# checkpoint. No released RDEIC checkpoint exists in this sandbox, so the
# warm start is the full-width converter-proof npz (random values): the run
# proves the recipe's trainability mask, warm start, checkpointing and the
# before/after eval loop — not RD quality.
#
# Usage: tools/run_ood_finetune_r5.sh [STEPS]   (default 5000 — the
# reference recipe length, README.md:175-198) — after-eval also runs the
# TTA noise-draw selection path (run_ood.py --tta_samples 3).
set -euo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-5000}"
OUT=indicators/ood_finetune_r5
VALID=datalists/ood_satellite_valid_small.list
mkdir -p "$OUT"

echo "== eval BEFORE (pretrained warm-start params) =="
python experiments/run_ood.py --ckpt weights/rdeic_pretrained.npz \
  --input "$VALID" --domain satellite \
  --output "$OUT/eval_before" --steps 2 2>&1 | tee "$OUT/eval_before.log"

echo "== fine-tune $STEPS steps (configs/finetune_ood.yaml) =="
python train.py --config configs/finetune_ood.yaml --max_steps "$STEPS" \
  2>&1 | tee "$OUT/train.log"

CKPT="runs/ood_finetune/checkpoints/step_$STEPS"
echo "== eval AFTER ($CKPT) =="
python experiments/run_ood.py --ckpt "$CKPT" \
  --input "$VALID" --domain satellite --tta_samples 3 \
  --output "$OUT/eval_after" --steps 2 2>&1 | tee "$OUT/eval_after.log"

cp runs/ood_finetune/metrics.jsonl "$OUT/metrics.jsonl"
echo "== done: artifacts in $OUT =="
