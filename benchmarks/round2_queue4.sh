#!/bin/bash
# Champion hunt at the production batch (2048 chains): under the final
# harness the trained h256 kernel measures 1.27x ESS/step but 0.64x
# throughput -> 0.82x ESS/s.  The step cost is now dominated by the
# S/T/Q matmuls, so the levers are width and bf16 MXU matmuls.  Also
# re-checks HMC's own harness-level (K, eps) optimum so the baseline
# claim stays honest (the round-1 joint sweep optimized the FUSED
# kernel, whose cost model differs from the XLA eval harness).
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
  tail -c 300 "runs/h2h/${name}.json" 2>/dev/null; echo
}

EVAL="--eval_steps 6000 --eval_chains 2048"
B="--num_steps 5 --eps_init 0.08 --eps_fixed --arch mlp --merge_v"

# HMC harness-level optimum check: re-eval the saved champion against
# alternative HMC settings (eval-only, fast)
run hmcchk_K4_eps10 $EVAL $B --num_hidden 256 \
    --params_from runs/h2h/champ_eps08fix.npz --hmc_num_steps 4 --hmc_eps 0.10
run hmcchk_K6_eps07 $EVAL $B --num_hidden 256 \
    --params_from runs/h2h/champ_eps08fix.npz --hmc_num_steps 6 --hmc_eps 0.07

# device-cheap conditioner ladder (trains)
run mlp_h64_K5_eps08fix_2048 $EVAL $B --num_hidden 64 \
    $(echo --save_npz runs/h2h/mlp_h64_K5_eps08fix_2048.npz)
run mlp_h128_K5_eps08fix_2048 $EVAL $B --num_hidden 128 \
    $(echo --save_npz runs/h2h/mlp_h128_K5_eps08fix_2048.npz)

# bf16 MXU matmuls in the nets (train + eval in bf16 compute)
run mlp_h256_K5_eps08fix_bf16_2048 $EVAL $B --num_hidden 256 --use_bf16 \
    $(echo --save_npz runs/h2h/mlp_h256_K5_eps08fix_bf16_2048.npz)

echo "round2 queue4 done"
