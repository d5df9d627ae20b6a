#!/bin/bash
# Head-to-head sweep, phase 3: champion configs.
# Phase-1/2 findings: below hidden~256 the MLP trained kernel's cost is
# dominated by non-net work (905 vs 916 steps/s at h64 vs h256), so width
# is nearly free up to 256 — chase per-step ESS with K=5 and the
# charge-reward loss at the h256 point, then measure the best config on
# the fused-Pallas tier at the throughput batch.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/h2h

while pgrep -f "h2h_sweep2.sh" > /dev/null 2>&1; do sleep 30; done
while pgrep -f "trained_vs_hmc.py" > /dev/null 2>&1; do sleep 30; done
while pgrep -f "train_gauge.py" > /dev/null 2>&1; do sleep 60; done

export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  local name="$1"; shift
  if [ -s "runs/h2h/${name}.json" ]; then
    echo "=== skip ${name} (exists)"; return
  fi
  echo "=== ${name}: $*"
  timeout 1800 python benchmarks/trained_vs_hmc.py --label "${name}" "$@" \
    > "runs/h2h/${name}.json.tmp" 2> "runs/h2h/${name}.log" \
    && mv "runs/h2h/${name}.json.tmp" "runs/h2h/${name}.json"
  tail -c 400 "runs/h2h/${name}.json" 2>/dev/null; echo
}

EVAL="--eval_steps 6000 --eval_chains 1024"

run mlp_h256_K5_mv $EVAL --arch mlp --num_hidden 256 --num_steps 5 --merge_v
run mlp_h256_K5_mv_reward $EVAL --arch mlp --num_hidden 256 --num_steps 5 \
    --merge_v --charge_reward
run mlp_h512_K5_mv $EVAL --arch mlp --num_hidden 512 --num_steps 5 --merge_v
# champion on the fused tier at the throughput batch (2048 chains)
run mlp_h256_K5_mv_fused --eval_steps 6000 --eval_chains 2048 --tier both \
    --arch mlp --num_hidden 256 --num_steps 5 --merge_v

echo "sweep3 done"
