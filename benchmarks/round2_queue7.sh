#!/bin/bash
# K3 coarse-step refinement: the 1.038x plaq-ESS/s champion trained only
# 5000 steps from a zero-init start at a BAD plain-HMC point (K3 at
# eps=0.1333 starts near acc~0.5); acceptance 0.776 looks undertrained.
# Cache-warm training costs ~25 s for 12k steps, so buy more.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/h2h

while pgrep -f "trained_vs_hmc.py|train_gauge.py|bench.py" > /dev/null 2>&1; do
  sleep 20
done

export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

run() {
  local name="$1"; shift
  if [ -s "runs/h2h/${name}.json" ]; then
    echo "=== skip ${name} (exists)"; return
  fi
  echo "=== ${name}: $*"
  timeout 1500 python benchmarks/trained_vs_hmc.py --label "${name}" "$@" \
    > "runs/h2h/${name}.json.tmp" 2> "runs/h2h/${name}.log" \
    && mv "runs/h2h/${name}.json.tmp" "runs/h2h/${name}.json"
  tail -c 300 "runs/h2h/${name}.json" 2>/dev/null; echo
}

EVAL="--eval_steps 6000 --eval_chains 2048"
B="--eps_fixed --arch mlp --merge_v --num_hidden 64 --train_steps 12000"

run mlp_h64_K3_eps1333fix_t12k $EVAL $B --num_steps 3 --eps_init 0.1333 \
    --save_npz runs/h2h/mlp_h64_K3_eps1333fix_t12k.npz
run mlp_h64_K3_eps125fix_t12k $EVAL $B --num_steps 3 --eps_init 0.125 \
    --save_npz runs/h2h/mlp_h64_K3_eps125fix_t12k.npz

echo "round2 queue7 done"
