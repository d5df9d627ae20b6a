#!/usr/bin/env python
"""Samples/s scaling-efficiency harness (BASELINE.json north star:
>= 80% efficiency 1 host -> 2+ hosts).

Measures sampling throughput with the chain batch sharded over 1, 2, ..., N
mesh devices, holding per-device chain count fixed (weak scaling — the
regime that matters for ensemble MCMC).  On a real pod slice the mesh spans
chips/hosts over ICI/DCN; without one, run on virtual CPU devices to
validate the mechanism end-to-end:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --chains_per_device 64

Prints one JSON line per device count plus a summary efficiency line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--chains_per_device", type=int, default=64)
    p.add_argument("--time_size", type=int, default=16)
    p.add_argument("--space_size", type=int, default=16)
    p.add_argument("--num_steps", type=int, default=3)
    p.add_argument("--network_arch", default="conv")
    p.add_argument("--chunk", type=int, default=50)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--mode", default="sample", choices=["sample", "train"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from l2hmc_tpu.lattice import u1
    from l2hmc_tpu.parallel.mesh import (
        chain_sharding, get_mesh, replicated, shard_train_state,
        train_state_shardings,
    )
    from l2hmc_tpu.train.gauge import (
        GaugeConfig, build_dynamics, init_train_state, make_train_step,
    )

    n_dev = jax.device_count()
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    results = []
    for nd in counts:
        cfg = GaugeConfig(
            time_size=args.time_size, space_size=args.space_size,
            num_chains=args.chains_per_device * nd, num_steps=args.num_steps,
            network_arch=args.network_arch, eps_init=0.1,
        )
        mesh = get_mesh(num_data=nd, devices=jax.devices()[:nd])
        key = jax.random.PRNGKey(0)
        state = shard_train_state(init_train_state(cfg, key), mesh)

        if args.mode == "train":
            step_fn = make_train_step(cfg)
            shardings = train_state_shardings(state, mesh)

            @jax.jit
            def chunk_fn(state, key):
                def body(s, k):
                    s, m = step_fn(s, k)
                    return s, m["loss"]
                keys = jax.random.split(key, args.chunk)
                state, losses = jax.lax.scan(body, state, keys)
                return state, jnp.sum(losses)

            def run(key):
                s, digest = chunk_fn(state, key)
                float(digest)
                return s
        else:
            _, dyn, _ = build_dynamics(cfg)

            @jax.jit
            def chunk_fn(params, x, key):
                def body(x, k):
                    out = dyn["transition"](params, x, 4.0, k)
                    return u1.wrap(out.x_out), out.accept_prob
                keys = jax.random.split(key, args.chunk)
                x, probs = jax.lax.scan(body, x, keys)
                return x, jnp.sum(probs)

            x0 = jax.device_put(
                u1.random_links(key, cfg.num_chains, cfg.shape),
                chain_sharding(mesh),
            )

            def run(key):
                x, digest = chunk_fn(state.params, x0, key)
                float(digest)
                return x

        run(jax.random.PRNGKey(1))  # compile + warmup
        best = float("inf")
        for i in range(args.repeats):
            t0 = time.perf_counter()
            run(jax.random.PRNGKey(2 + i))
            best = min(best, time.perf_counter() - t0)
        rate = args.chunk * cfg.num_chains / best  # chain-transitions/s
        results.append({"devices": nd, "chains": cfg.num_chains,
                        "transitions_per_s": round(rate, 1)})
        print(json.dumps(results[-1]), flush=True)

    if len(results) > 1:
        base = results[0]["transitions_per_s"]
        eff = {
            r["devices"]: round(
                r["transitions_per_s"] / (base * r["devices"]), 3
            )
            for r in results[1:]
        }
        print(json.dumps({"weak_scaling_efficiency_vs_1dev": eff}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
