#!/bin/bash
# Round-5 artifact regeneration queue (serial; one TPU chip).
#
# The round-4 -> round-5 handoff proved the working tree is ephemeral:
# every campaign JSON cited by RESULTS.md was lost with it.  This queue
# regenerates the round-5 artifacts in priority order so they can be
# committed to git (see .gitignore: runs/**/*.json is now tracked).
# Each step logs to runs_queue_<name>.log; the queue continues past
# failures so one broken step cannot starve the rest.
set -u
cd "$(dirname "$0")/.."

run() {
  name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  "$@" > "runs_queue_${name}.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S)) ==="
}

# 1. freezing line (RESULTS r5 headline): beta ∝ V, auto-tuned HMC per point
run freeze python benchmarks/freeze_line.py

# 2. PT vs hop at the freezing point (5-rung linear + denser 8-rung)
run pt5 python benchmarks/pt_vs_hop.py --out runs/pt_vs_hop_16_5.json
run pt8 python benchmarks/pt_vs_hop.py --rungs 8 --out runs/pt_vs_hop_geo8.json

# 3. 64x64 in-kernel cost decomposition (fresh-weight probes, no training)
run lk64 python benchmarks/local_kernel_bench.py --nt 50 --out runs/local_kernel_64a.json

# 4. README quick-start, verbatim (product-surface validation)
run qs_train python cli/train_gauge.py --time_size 16 --space_size 16 \
    --num_samples 128 --num_steps 4 --eps 0.079 --eps_fixed \
    --network_arch mlp --num_hidden 64 --merge_v_halves --charge_reward \
    --train_hops --beta_final 5.0 --train_steps 12000 --retrain_acc 0.7 \
    --eval_hops 1 --run_steps 8000 --eval_init metropolis \
    --log_dir runs/quickstart_b5
run qs_hmc python cli/train_gauge.py --time_size 16 --space_size 16 \
    --num_samples 128 --num_steps 4 --eps 0.079 --eps_fixed --hmc \
    --beta_init 5.0 --beta_final 5.0 --train_steps 0 --run_steps 8000 \
    --eval_init metropolis --log_dir runs/quickstart_b5_hmc
run qs_an1 python cli/analyze_run.py runs/quickstart_b5/run_1
run qs_an2 python cli/analyze_run.py runs/quickstart_b5_hmc/run_1

# 5. beta=5 detect-and-retrain 8-seed campaign (tuned cells cached from
#    the autotuner's recorded optimum: trained K=4 eps=0.079, HMC K=4
#    eps=0.079 — RESULTS.md r4/r5)
run b5r python benchmarks/h2h_seeds.py --size 16 --beta 5.0 --seeds 8 \
    --seed0 1000 --train_steps 12000 --eval_steps 12000 \
    --num_steps 4 --eps 0.079 --hmc_num_steps 4 --hmc_eps 0.079 \
    --charge_reward --eval_init metropolis --train_hops \
    --retrain_acc 0.7 --out runs/beta5_retrain_r5.json

echo "=== queue complete ($(date +%H:%M:%S)) ==="
