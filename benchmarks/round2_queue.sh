#!/bin/bash
# Round-2 master queue, priority-ordered: the decisive experiments first,
# the nice-to-have scaling points last.  Skips any config whose JSON
# already exists; waits for whatever is currently on the chip.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/h2h runs/davalid

while pgrep -f "trained_vs_hmc.py|train_gauge.py|bench.py" > /dev/null 2>&1; do
  sleep 30
done

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
B="--arch mlp --num_hidden 256 --num_steps 5 --merge_v"

# 1. decisive: conditioners trained around HMC's own fixed optimum
run mlp_h256_K5_eps08fix $EVAL $B --eps_init 0.08 --eps_fixed
# 2. champion trainable-eps point (may already exist from the prior queue)
run mlp_h256_K5_mv $EVAL $B
# 3. fused-Pallas tier at the throughput batch (validates the trained
#    chain kernel on-chip end to end)
run mlp_h256_K5_eps08fix_fused --eval_steps 6000 --eval_chains 2048 \
    --tier both $B --eps_init 0.08 --eps_fixed

# 4. large-volume DA validation (VERDICT item 8)
echo "=== 64x64 DA-warmup run"
if [ ! -s runs/davalid/l64.log ] || ! grep -q "eval beta" runs/davalid/l64.log; then
  # DA active through the WHOLE anneal: a 500-step warmup freezes eps at
  # its beta=2 value, which collapses acceptance to 0 once beta reaches ~3
  # at this volume (measured: dead-gradient trap at step ~1700).  With
  # eps_warmup_steps == train_steps dual averaging keeps tracking the
  # target acceptance as beta rises — no hand-set eps anywhere.
  timeout 3000 python cli/train_gauge.py \
    --time_size 64 --space_size 64 --num_samples 16 --num_hidden 2048 \
    --train_steps 3000 --eps_warmup_steps 3000 --eps_fixed \
    --eval_init metropolis --run_steps 6000 --logging_steps 100 \
    --log_dir runs/davalid/gauge64 > runs/davalid/l64.log 2>&1
fi
tail -4 runs/davalid/l64.log

echo "=== 128x128 DA-warmup run"
if [ ! -s runs/davalid/l128.log ] || ! grep -q "eval beta" runs/davalid/l128.log; then
  timeout 3000 python cli/train_gauge.py \
    --time_size 128 --space_size 128 --num_samples 4 --num_hidden 512 \
    --train_steps 1000 --lr_init 2e-5 --eps_warmup_steps 1000 --eps_fixed \
    --eval_init metropolis --run_steps 1500 --logging_steps 50 \
    --log_dir runs/davalid/gauge128 > runs/davalid/l128.log 2>&1
fi
tail -4 runs/davalid/l128.log

# 5. bench.py on-chip validation (new trained-fused section must work
#    before round end)
echo "=== bench.py validation"
timeout 1500 python bench.py > runs/davalid/bench_check.json \
  2> runs/davalid/bench_check.log
tail -c 600 runs/davalid/bench_check.json; echo

# 6. nice-to-have scaling points
run mlp_h512_K5_mv $EVAL --arch mlp --num_hidden 512 --num_steps 5 --merge_v
run mlp_h256_K7_mv $EVAL --arch mlp --num_hidden 256 --num_steps 7 --merge_v
run mlp_h64_K2_mv $EVAL --arch mlp --num_hidden 64 --num_steps 2 --merge_v
run conv_f8_K3_reward_w5 $EVAL --charge_reward --charge_weight 5
run conv_f8_K3_parity_w5 $EVAL --charge_weight 5

echo "round2 queue fully done"
