#!/bin/bash
# Head-to-head sweep, phase 2 (consolidated): the configs that matter after
# phase 1.  Findings so far: HMC's joint optimum (K=5, eps=0.08) is the bar;
# conv conditioners are dominated by the MLP (916 vs 564 steps/s at equal
# ESS); width below h256 is cost-free (cost floor = action gradient + trig);
# K=5 lifts trained per-step ESS to 0.81x of HMC's (h64).  So: scale width
# and trajectory length at the MLP point, test the short-trajectory
# hypothesis once, then measure the champion on the fused-Pallas tier at
# the throughput batch, then run the large-volume DA validation.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/h2h

while pgrep -f "h2h_sweep.sh" > /dev/null 2>&1; do sleep 30; done
while pgrep -f "trained_vs_hmc.py" > /dev/null 2>&1; do sleep 30; done

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
  tail -c 400 "runs/h2h/${name}.json" 2>/dev/null; echo
}

EVAL="--eval_steps 6000 --eval_chains 1024"

run mlp_h256_K5_mv $EVAL --arch mlp --num_hidden 256 --num_steps 5 --merge_v
run mlp_h512_K5_mv $EVAL --arch mlp --num_hidden 512 --num_steps 5 --merge_v
run mlp_h256_K7_mv $EVAL --arch mlp --num_hidden 256 --num_steps 7 --merge_v
run mlp_h64_K2_mv $EVAL --arch mlp --num_hidden 64 --num_steps 2 --merge_v
# champion family on the fused tier at the throughput batch
run mlp_h256_K5_mv_fused --eval_steps 6000 --eval_chains 2048 --tier both \
    --arch mlp --num_hidden 256 --num_steps 5 --merge_v

echo "sweep2 done"
bash benchmarks/da_volume_validation.sh
