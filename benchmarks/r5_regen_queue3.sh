#!/bin/bash
# Round-5 artifact regeneration, tier 3: remaining cited artifacts —
# README example run dirs, the r3 conditioner-cost sweep, the flow
# failure curve, the 128x128 recipe, and the r4 64x64 image-path h2h.
set -u
cd "$(dirname "$0")/.."

run() {
  name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  "$@" > "runs_queue_${name}.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S)) ==="
}

# 1. README quick-start example (runs/gauge/run_1 + offline analysis)
run gauge8 python cli/train_gauge.py --space_size 8 --time_size 8 \
    --num_samples 128 --num_steps 3 --eps 0.35 --beta_init 2 \
    --beta_final 4 --train_steps 5000
run gauge8an python cli/analyze_run.py runs/gauge/run_1 --plots --beta 4

# 2. 128x128 dead-gradient-trap recipe (RESULTS "256x the reference volume")
run g128 python cli/train_gauge.py --space_size 128 --time_size 128 \
    --num_samples 4 --num_hidden 512 --eps 0.012 --eps_fixed --lr_init 2e-5 \
    --beta_init 2 --beta_final 4 --train_steps 1000 --run_steps 2000 \
    --eval_init metropolis --log_dir runs/gauge128

# 3. r2/r3 conditioner-cost sweep (populates runs/h2h/, idempotent)
run h2hsweep bash benchmarks/h2h_sweep.sh

# 4. flow continuation-in-beta failure curve (one base training + resumes)
run flow2 python cli/train_flow.py --size 16 --beta 2.0 --train_steps 3000 \
    --log_dir runs/flowcurve
cp runs/flowcurve/run_1/summary.json runs/flowcurve_b2.0.json 2>/dev/null
for B in 2.5 3.0 3.5; do
  run flow$B python cli/train_flow.py --resume runs/flowcurve/run_1 \
      --beta $B --train_steps 2000
  cp runs/flowcurve/run_1/summary.json runs/flowcurve_b$B.json 2>/dev/null
done

# 5. r4 64x64 image-path local-conditioner h2h (superseded by the stencil
#    kernel but still cited; last because it is the most expensive).
#    local c8 L2 k3 = GaugeConfig defaults under --arch local; tuned cells
#    cached from the recorded r4 autotune (trained K=4 eps=0.1001, HMC K=8
#    eps=0.0455).
run vol64 timeout 5400 python benchmarks/h2h_seeds.py --size 64 --seeds 3 \
    --arch local --num_filters 8 --num_steps 4 --eps 0.1001 \
    --hmc_num_steps 8 --hmc_eps 0.0455 --train_steps 12000 \
    --eval_steps 8000 --eval_chains 1024 --eval_init metropolis \
    --charge_reward --out runs/vol64_local_h2h.json

echo "=== queue3 complete ($(date +%H:%M:%S)) ==="
