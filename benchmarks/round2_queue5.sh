#!/bin/bash
# Round-2 endgame, triaged for chip time after tunnel-compile stalls:
# (1) the width ladder at the production batch — the parity decider
#     (h256 nets are ~100% of the trained kernel's cost gap; h64 cuts
#     them ~4x), then
# (2) the 128x128 full-anneal DA validation.
# bench.py validation runs separately once the champion npz is placed.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/h2h runs/davalid

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
B="--num_steps 5 --eps_init 0.08 --eps_fixed --arch mlp --merge_v"

run mlp_h64_K5_eps08fix_2048 $EVAL $B --num_hidden 64 \
    --save_npz runs/h2h/mlp_h64_K5_eps08fix_2048.npz
run mlp_h128_K5_eps08fix_2048 $EVAL $B --num_hidden 128 \
    --save_npz runs/h2h/mlp_h128_K5_eps08fix_2048.npz

echo "=== 128x128 DA-warmup run"
if [ ! -s runs/davalid/l128.log ] || ! grep -q "eval beta" runs/davalid/l128.log; then
  timeout 2400 python cli/train_gauge.py \
    --time_size 128 --space_size 128 --num_samples 4 --num_hidden 512 \
    --train_steps 1000 --lr_init 2e-5 --eps_warmup_steps 1000 --eps_fixed \
    --eval_init metropolis --run_steps 1500 --logging_steps 50 \
    --log_dir runs/davalid/gauge128 > runs/davalid/l128.log 2>&1
fi
tail -4 runs/davalid/l128.log

echo "round2 queue5 done"
