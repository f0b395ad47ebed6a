#!/usr/bin/env bash
# Waits for the axon tunnel to come back, then banks the round-5 TPU
# queue in order: conv roofline bench -> same-session train-step bench
# (the attribution anchor) -> refine remat sweep -> a bench.py capture.
# Every stage is timeout-bounded so a tunnel flap mid-stage cannot wedge
# the queue; stage results land in /tmp and rc's in the log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_watcher_r5.log
echo "== watcher start $(date) ==" >> "$LOG"

probe() {
  # a REAL conv execute: scalar probes can pass while convs hang
  timeout 240 python - <<'PY' > /dev/null 2>&1
import jax, jax.numpy as jnp, numpy as np
x = jnp.asarray(np.ones((1,32,32,64)), jnp.bfloat16)
k = jnp.asarray(np.ones((3,3,64,64)), jnp.bfloat16)
y = jax.lax.conv_general_dilated(x,k,(1,1),"SAME",
    dimension_numbers=("NHWC","HWIO","NHWC"))
assert float(jnp.sum(y.astype(jnp.float32))) != 0.0
PY
}

until probe; do
  echo "tunnel down $(date)" >> "$LOG"
  sleep 150
done
echo "tunnel UP $(date)" >> "$LOG"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "-- $name start $(date)" >> "$LOG"
  timeout "$tmo" "$@" >> "$LOG" 2>&1
  echo "-- $name rc=$? $(date)" >> "$LOG"
}

run conv_bench 2400 python tools/conv_bench.py --iters 20 \
    --out /tmp/conv_bench_r5d.json
run train_bench 1800 python experiments/train_fullwidth_bench.py \
    --steps 40 --batch 8 --size 512 --no_remat --frozen_bf16 \
    --out /tmp/trainbench_r5
run refine_sweep 7200 bash tools/refine_remat_sweep.sh 30
RDEIC_BENCH_PROBE_S=60 RDEIC_BENCH_PROBE_RETRIES=2 \
  run bench 3000 python bench.py
echo "== watcher done $(date) ==" >> "$LOG"
