"""Benchmark: L2HMC sampling throughput on U(1) 16x16 (BASELINE.json north star).

Prints ONE JSON line:
  {"metric": "leapfrog_steps_per_s_per_chip", "value": N, "unit": "chain-leapfrog-steps/s", "vs_baseline": R}

- value: (transitions * num_leapfrog_steps * num_chains) / wall_s for the
  TPU-native fused-direction kernel (CNN networks, eval/sampling path).
- vs_baseline: speedup vs the *reference dataflow* run on the same chip —
  the compute-both-directions-and-mask transition the TF implementation uses
  (``/root/reference/l2hmc/dynamics/gauge_dynamics.py:195-259``), i.e. an
  apples-to-apples measure of the TPU-first redesign, since the reference
  repo publishes no numbers of its own (BASELINE.md).

Extra context fields are included in the same JSON object (ess diagnostics,
config); the driver reads the four required keys.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp


def bench_transition(cfg, both_directions: bool, iters: int, chunk: int, key):
    from l2hmc_tpu.train import gauge as G
    from l2hmc_tpu.lattice import u1
    import dataclasses

    cfg = dataclasses.replace(cfg, both_directions=both_directions)
    state = G.init_train_state(cfg, key)
    _, dyn, _ = G.build_dynamics(cfg)

    @jax.jit
    def sample_chunk(params, x, key):
        def body(x, k):
            out = dyn["transition"](params, x, 4.0, k)
            return u1.wrap(out.x_out), out.accept_prob
        keys = jax.random.split(key, chunk)
        return jax.lax.scan(body, x, keys)

    x = u1.random_links(key, cfg.num_chains, cfg.shape)
    # warmup + compile
    x_out, probs = sample_chunk(state.params, x, key)
    jax.block_until_ready(x_out)

    t0 = time.perf_counter()
    for i in range(iters):
        key, sub = jax.random.split(key)
        x, probs = sample_chunk(state.params, x, sub)
    jax.block_until_ready(x)
    dt = time.perf_counter() - t0
    transitions = iters * chunk
    lf_steps = transitions * cfg.num_steps * cfg.num_chains
    return lf_steps / dt, float(probs.mean()), dt


def main():
    from l2hmc_tpu.train.gauge import GaugeConfig

    cfg = GaugeConfig(
        time_size=16, space_size=16, num_chains=128, num_steps=3,
        network_arch="conv", num_filters=8,
    )
    key = jax.random.PRNGKey(42)

    fused_rate, acc, dt = bench_transition(cfg, False, iters=5, chunk=100, key=key)
    ref_rate, _, _ = bench_transition(cfg, True, iters=2, chunk=100, key=key)

    result = {
        "metric": "leapfrog_steps_per_s_per_chip",
        "value": round(fused_rate, 1),
        "unit": "chain-leapfrog-steps/s",
        "vs_baseline": round(fused_rate / ref_rate, 3),
        "config": "U(1) 16x16, 128 chains, 3 leapfrog steps, periodic CNN, beta=4",
        "baseline_def": "reference dataflow (compute both directions + mask) on same chip",
        "accept_prob": round(acc, 4),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
