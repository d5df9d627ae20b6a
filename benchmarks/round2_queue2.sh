#!/bin/bash
# Round-2 follow-up queue: push the fixed-eps trained kernel past HMC on
# BOTH cost-normalized metrics.  eps08fix measured 1.27x ESS/step ->
# 1.046x plaq-ESS/s but 0.87x tunneling/s: the remaining lever is
# trajectory length.  At fixed eps*K beyond ~0.5 plain HMC degrades into
# the periodic-orbit resonance (RESULTS.md, joint sweep); the learned
# kernel's S/T/Q maps can detune the resonance, so train AT longer
# trajectories and keep comparing against HMC at ITS optimum (K=5,
# eps=0.08).  Skips cells whose JSON already exists.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs/h2h

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
B="--arch mlp --num_hidden 256 --merge_v --eps_fixed"

# Every cell saves a flat-npz of its trained params so the overall
# champion can be committed and loaded by bench.py's learned-sampler
# headline section.
sv() { echo "--save_npz runs/h2h/$1.npz"; }

# trajectory-length ladder at fixed eps (zero-init starts at plain HMC of
# the same (K, eps); training must detune the resonance to win)
run mlp_h256_K5_eps10fix $EVAL $B --num_steps 5 --eps_init 0.10 \
    $(sv mlp_h256_K5_eps10fix)
run mlp_h256_K6_eps08fix $EVAL $B --num_steps 6 --eps_init 0.08 \
    $(sv mlp_h256_K6_eps08fix)
run mlp_h256_K5_eps12fix $EVAL $B --num_steps 5 --eps_init 0.12 \
    $(sv mlp_h256_K5_eps12fix)

# observable-space ESJD objective at the winning fixed-eps point
run mlp_h256_K5_eps08fix_plaqm $EVAL $B --num_steps 5 --eps_init 0.08 \
    --metric plaq_cos $(sv mlp_h256_K5_eps08fix_plaqm)

# reproduce the current champion (seed is fixed, so this retrains the
# exact measured eps08fix kernel) and save its params for bench.py
run champ_eps08fix $EVAL $B --num_steps 5 --eps_init 0.08 \
    $(sv champ_eps08fix)

echo "round2 queue2 done"
