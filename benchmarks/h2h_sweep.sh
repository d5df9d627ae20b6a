#!/bin/bash
# Head-to-head sweep: trained L2HMC vs tuned HMC, cost-normalized (round-2
# campaign for the VERDICT item "make the trained kernel beat plain HMC").
# Each config trains on the real chip and evals both samplers on the shared
# harness; one JSON per config lands in runs/h2h/.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/h2h
run() {
  local name="$1"; shift
  if [ -s "runs/h2h/${name}.json" ]; then
    echo "=== skip ${name} (exists)"; return
  fi
  echo "=== ${name}: $*"
  timeout 1200 python benchmarks/trained_vs_hmc.py --label "${name}" "$@" \
    > "runs/h2h/${name}.json.tmp" 2> "runs/h2h/${name}.log" \
    && mv "runs/h2h/${name}.json.tmp" "runs/h2h/${name}.json"
  tail -c 400 "runs/h2h/${name}.json" 2>/dev/null; echo
}

EVAL="--eval_steps 6000 --eval_chains 1024"

# round-1 parity point (conv, default width, K=3): expect ~0.68x plaq ESS/s
run conv_f8_K3_base $EVAL
# merge_v on the same config (+17% throughput, exact kernel)
run conv_f8_K3_mv $EVAL --merge_v
# cheap conditioners: the 2*x_dim default (hidden 1024) is likely oversized
run mlp_h256_K3_mv $EVAL --arch mlp --num_hidden 256 --merge_v
run mlp_h64_K3_mv $EVAL --arch mlp --num_hidden 64 --merge_v
run mlp_h64_K5_mv $EVAL --arch mlp --num_hidden 64 --num_steps 5 --merge_v
run conv_f4_h256_K5_mv $EVAL --num_filters 4 --num_hidden 256 --num_steps 5 --merge_v
# charge-loss sign A/B (VERDICT item 2) at the canonical config
run conv_f8_K3_reward_w1 $EVAL --charge_reward
run conv_f8_K3_reward_w5 $EVAL --charge_reward --charge_weight 5
run conv_f8_K3_parity_w5 $EVAL --charge_weight 5
echo "sweep done"
