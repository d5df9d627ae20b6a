#!/bin/bash
# Final-harness re-evaluation of every saved ladder kernel: all cells
# eval-only (--params_from npz; exact Metropolis warm start), all under
# the SAME harness build (on-device 64-chain trace slice + total-wall
# timing), so the cross-config ratio table is finally apples-to-apples.
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
  timeout 1500 python benchmarks/trained_vs_hmc.py --label "${name}" "$@" \
    > "runs/h2h/${name}.json.tmp" 2> "runs/h2h/${name}.log" \
    && mv "runs/h2h/${name}.json.tmp" "runs/h2h/${name}.json"
  tail -c 300 "runs/h2h/${name}.json" 2>/dev/null; echo
}

EVAL="--eval_steps 6000 --eval_chains 1024"
B="--arch mlp --num_hidden 256 --merge_v --eps_fixed"

run final_eps08fix $EVAL $B --num_steps 5 --eps_init 0.08 \
    --params_from runs/h2h/champ_eps08fix.npz
run final_eps10fix $EVAL $B --num_steps 5 --eps_init 0.10 \
    --params_from runs/h2h/mlp_h256_K5_eps10fix.npz
run final_eps12fix $EVAL $B --num_steps 5 --eps_init 0.12 \
    --params_from runs/h2h/mlp_h256_K5_eps12fix.npz
run final_K6_eps08fix $EVAL $B --num_steps 6 --eps_init 0.08 \
    --params_from runs/h2h/mlp_h256_K6_eps08fix.npz
run final_eps08fix_plaqm $EVAL $B --num_steps 5 --eps_init 0.08 \
    --metric plaq_cos --params_from runs/h2h/mlp_h256_K5_eps08fix_plaqm.npz

echo "round2 queue3 done"
