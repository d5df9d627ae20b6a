#!/bin/bash
# Round-5 artifact regeneration, tier 2: the r4-era campaign artifacts
# RESULTS.md still cites (lost with the ephemeral working tree).  Cached
# auto-tuned optima recorded in RESULTS.md are passed explicitly so each
# step spends chip time on the measurement, not the (already recorded)
# tuner search.  Runs serially after r5_regen_queue.sh.
set -u
cd "$(dirname "$0")/.."

run() {
  name="$1"; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  "$@" > "runs_queue_${name}.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M:%S)) ==="
}

# stdout-JSON probes (their logs go to stderr)
kdec() { python benchmarks/kernel_decomposition.py > runs/kdec_r4.json; }
vpu()  { python benchmarks/vpu_roofline.py > runs/vpu_r4.json; }

# 1. freezing-regime 16x16 beta=5 (r4: hmc vs hmc+hop, tuned K=4 eps=0.079)
run topob5 python benchmarks/topo_ensemble.py --beta 5.0 --reps 2 \
    --eval_steps 8000 --trace_chains 256 --no_champion \
    --hmc_num_steps 4 --hmc_eps 0.079 --out runs/topo16_b5.json

# 2. 32x32 beta=4 with the inline-trained champion carrier
run topo32 python benchmarks/topo_ensemble.py --size 32 --reps 3 \
    --eval_steps 8000 --trace_chains 256 --hmc_num_steps 6 --hmc_eps 0.063 \
    --train_champion --champ_k 4 --champ_eps 0.095 --out runs/topo32_champ.json

# 3. 64x64 beta=4 volume-trend endpoint (hmc vs hmc+hop)
run topo64 python benchmarks/topo_ensemble.py --size 64 --reps 2 \
    --eval_steps 8000 --eval_chains 1024 --trace_chains 512 --no_champion \
    --hmc_num_steps 8 --hmc_eps 0.0455 --out runs/topo64.json

# 4. fused-kernel hop tau collapse (hop-fused Pallas chains, champion carrier)
run fhop python benchmarks/fused_hop.py --champion --out runs/fused_hop16_champ.json

# 5. kernel decomposition + VPU roofline probes (16x16)
run kdec kdec
run vpu vpu

# 6. local-conditioner cost frontier at 64x64 (weight-independent sweeps)
run lcs python benchmarks/local_cost_sweep.py --out runs/local_cost_sweep.json
run lcs512 python benchmarks/local_cost_sweep.py --chains 512 --out runs/local_cost_sweep_512.json

# 8. beta=3 campaigns (HMC optima cached from the recorded tuner results)
run b163 python benchmarks/beta_campaign.py --size 16 --beta 3.0 \
    --hmc_k 4 --hmc_eps 0.105 --out runs/beta_16_3.0.json
run b83 python benchmarks/beta_campaign.py --size 8 --beta 3.0 \
    --hmc_k 3 --hmc_eps 0.128 --out runs/beta_8_3.0.json

# 9. beta=5 hops campaign without retrain (the 4/8-basin artifact)
run b165 python benchmarks/h2h_seeds.py --size 16 --beta 5.0 --seeds 8 \
    --seed0 1000 --train_steps 12000 --eval_steps 12000 \
    --num_steps 4 --eps 0.079 --hmc_num_steps 4 --hmc_eps 0.079 \
    --charge_reward --eval_init metropolis --train_hops \
    --out runs/beta_16_5.0_hops.json

# 7. 64x64 stencil-kernel campaign: screens then the 3-seed final
run l64sA python benchmarks/local64_h2h.py --seeds 1 --channels 4 --layers 1 \
    --no_xla_tier --out runs/l64_c4L1_screen.json
run l64sB python benchmarks/local64_h2h.py --seeds 1 --channels 8 --layers 1 \
    --no_xla_tier --out runs/l64_c8L1_screen.json
run l64f python benchmarks/local64_h2h.py --seeds 3 --channels 4 --layers 1 \
    --out runs/l64_c4L1_final.json

echo "=== queue2 complete ($(date +%H:%M:%S)) ==="
