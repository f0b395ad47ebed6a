#!/usr/bin/env bash
# Refine-phase remat-granularity sweep (round-4 verdict next #8).
#
# Axes: module remat (dots / none) x sampler-scan per-step remat
# (--scan_remat, new in round 5) x batch (2 / 4). Each cell runs the real
# full-width refine train step (grad through the 2-step sampler + VAE +
# LPIPS) for STEPS steps on the one v5e and reports median ms/step + MFU
# from XLA's own flop count (experiments/train_fullwidth_bench.py).
# OOM cells fail fast and are recorded as such — fitting B=4 at all was
# round 4's win; the sweep asks which remat mix buys the most MFU.
#
# Usage: tools/refine_remat_sweep.sh [STEPS]   (default 30)
set -uo pipefail
cd "$(dirname "$0")/.."

STEPS="${1:-30}"
OUT=/tmp/refine_sweep_r5
mkdir -p "$OUT"

run_cell() {
  local name="$1"; shift
  echo "=== cell: $name ($*) ==="
  if timeout 1500 python experiments/train_fullwidth_bench.py \
      --refine --frozen_bf16 --size 512 --steps "$STEPS" \
      --out "$OUT/$name" "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"; then
    tail -1 "$OUT/$name.json"
  else
    echo "FAILED (rc=$?; likely OOM or timeout) — see $OUT/$name.log"
    tail -3 "$OUT/$name.log"
  fi
}

# B=2: the shipping recipe (dots) vs the new axes
run_cell b2_dots        --batch 2 --remat_policy dots
run_cell b2_none        --batch 2 --no_remat
run_cell b2_dots_scan   --batch 2 --remat_policy dots --scan_remat
run_cell b2_none_scan   --batch 2 --no_remat --scan_remat
# B=4: fits since the VAE-decoder per-block remat (round 4); scan remat
# may buy headroom for the no-module-remat variant
run_cell b4_dots        --batch 4 --remat_policy dots
run_cell b4_none_scan   --batch 4 --no_remat --scan_remat

echo "=== summary ==="
for f in "$OUT"/*.json; do
  [ -s "$f" ] && echo "$(basename "$f" .json): $(tail -1 "$f")"
done
