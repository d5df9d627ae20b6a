#!/bin/bash
# Head-to-head sweep, phase 2: short-trajectory large-step learned kernels.
# Phase-1 finding: HMC at its joint optimum (K=5, eps=0.08) is ~3.2x better
# cost-normalized than the canonical K=3 CNN trained kernel on BOTH
# observables — beating it with a "decorated HMC" kernel is hopeless.  The
# learned kernel's edge must come from trajectories HMC cannot take: K=1/2
# transitions with a large trained step whose S/T/Q compensation keeps
# acceptance up where plain leapfrog's energy error kills it, at near-zero
# conditioner cost.  Waits for phase 1, then chains the large-volume DA
# validation.
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
  timeout 1200 python benchmarks/trained_vs_hmc.py --label "${name}" "$@" \
    > "runs/h2h/${name}.json.tmp" 2> "runs/h2h/${name}.log" \
    && mv "runs/h2h/${name}.json.tmp" "runs/h2h/${name}.json"
  tail -c 400 "runs/h2h/${name}.json" 2>/dev/null; echo
}

EVAL="--eval_steps 6000 --eval_chains 1024"

# K=1/K=2 with tiny conditioners: the learned kernel takes one big
# compensated step per transition
run mlp_h64_K1_mv $EVAL --arch mlp --num_hidden 64 --num_steps 1 --merge_v
run mlp_h64_K2_mv $EVAL --arch mlp --num_hidden 64 --num_steps 2 --merge_v
run mlp_h256_K2_mv $EVAL --arch mlp --num_hidden 256 --num_steps 2 --merge_v
run conv_f8_K2_mv $EVAL --num_steps 2 --merge_v
# trained at HMC's own optimal trajectory length, full-size net
run conv_f8_K5_mv $EVAL --num_steps 5 --merge_v

echo "sweep2 done"
bash benchmarks/da_volume_validation.sh
