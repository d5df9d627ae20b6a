#!/bin/bash
# Head-to-head phase 3: train the conditioners AROUND HMC's own optimum.
# Phase-2 finding: with trainable eps the ESJD+reciprocal objective is
# acceptance-greedy — the K=5 trained kernel settles at eps=0.057/acc 0.94
# (trajectory length 0.29) while HMC's ESS optimum is eps=0.08/acc 0.845
# (length 0.40); the per-step ESS gap may be pure under-stepping.  Fixing
# eps at 0.08 starts the kernel EXACTLY at HMC's optimum (zero-init S/T/Q
# heads) and lets training add decorrelation on top.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/h2h

while pgrep -f "h2h_sweep2.sh|da_volume_validation.sh" > /dev/null 2>&1; do sleep 30; done
while pgrep -f "trained_vs_hmc.py|train_gauge.py|bench.py" > /dev/null 2>&1; do sleep 30; done

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

BASE="--arch mlp --num_hidden 256 --num_steps 5 --merge_v --eps_init 0.08"

run mlp_h256_K5_eps08fix --eval_steps 6000 --eval_chains 1024 $BASE --eps_fixed
# and on the fused tier at the throughput batch
run mlp_h256_K5_eps08fix_fused --eval_steps 6000 --eval_chains 2048 \
    --tier both $BASE --eps_fixed

echo "sweep3 done"
