#!/bin/bash
# Large-volume training WITHOUT a hand-set eps (VERDICT round-1 item 8):
# dual-averaging warmup finds the step size, then it stays frozen
# (--eps_fixed: the post-warmup ESJD gradient is the measured runaway mode
# at these volumes).  Waits for the h2h sweep to release the chip.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/davalid

while pgrep -f "trained_vs_hmc.py" > /dev/null 2>&1; do sleep 60; done

echo "=== 64x64 DA-warmup run"
timeout 3000 python cli/train_gauge.py \
  --time_size 64 --space_size 64 --num_samples 16 --num_hidden 2048 \
  --train_steps 3000 --eps_warmup_steps 500 --eps_fixed \
  --eval_init metropolis --run_steps 6000 --logging_steps 100 \
  --log_dir runs/davalid/gauge64 > runs/davalid/l64.log 2>&1
tail -4 runs/davalid/l64.log

echo "=== 128x128 DA-warmup run"
timeout 3000 python cli/train_gauge.py \
  --time_size 128 --space_size 128 --num_samples 4 --num_hidden 512 \
  --train_steps 1000 --lr_init 2e-5 --eps_warmup_steps 300 --eps_fixed \
  --eval_init metropolis --run_steps 1500 --logging_steps 50 \
  --log_dir runs/davalid/gauge128 > runs/davalid/l128.log 2>&1
tail -4 runs/davalid/l128.log
echo "davalid done"

# retry the charge-sign A/B cell that timed out in phase 1 (slow compile)
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache
if [ ! -s runs/h2h/conv_f8_K3_reward_w5.json ]; then
  echo "=== retry conv_f8_K3_reward_w5"
  timeout 2400 python benchmarks/trained_vs_hmc.py \
    --label conv_f8_K3_reward_w5 --eval_steps 6000 --eval_chains 1024 \
    --charge_reward --charge_weight 5 \
    > runs/h2h/conv_f8_K3_reward_w5.json.tmp \
    2> runs/h2h/conv_f8_K3_reward_w5.log \
    && mv runs/h2h/conv_f8_K3_reward_w5.json.tmp \
          runs/h2h/conv_f8_K3_reward_w5.json
fi

echo "=== bench.py validation (new trained-fused section)"
timeout 1200 python bench.py > runs/davalid/bench_check.json \
  2> runs/davalid/bench_check.log
tail -2 runs/davalid/bench_check.json
echo "queue fully done"
