#!/bin/bash
# Last-lever cells: conditioner quality is width-independent (h64 ==
# h256 ESS/step to 3 decimals), so the remaining economics are
# trajectory economics — hold HMC's optimal trajectory length
# eps*K = 0.40 but take FEWER, COARSER steps than plain HMC can afford
# (its acceptance collapses at eps >~ 0.125; the trained conditioners'
# demonstrated skill is exactly acceptance rescue: +0.07 over HMC at
# eps=0.08).  K=3 @ eps=0.1333 cuts per-transition cost ~40%.
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
B="--eps_fixed --arch mlp --merge_v --num_hidden 64"

run mlp_h64_K3_eps1333fix_2048 $EVAL $B --num_steps 3 --eps_init 0.1333 \
    --save_npz runs/h2h/mlp_h64_K3_eps1333fix_2048.npz
run mlp_h64_K4_eps10fix_2048 $EVAL $B --num_steps 4 --eps_init 0.10 \
    --save_npz runs/h2h/mlp_h64_K4_eps10fix_2048.npz

echo "round2 queue6 done"
