"""Fused Pallas leapfrog-chain kernel vs the XLA scan HMC path (on-chip).

Three phases:
1. EXACTNESS on the chip: injected-randomness kernel run vs the pure-JAX
   twin (validates the compiled lane-rotation rolls against jnp.roll
   semantics — the CPU suite only exercises interpret mode).
2. PHYSICS: in-kernel-PRNG chain from cold start vs the exact plaquette
   I1(beta)/I0(beta).
3. THROUGHPUT: transitions/s for the fused kernel vs ``dynamics.hmc
   hmc_chain`` (the XLA scan form) at several chain counts.

Timing uses the drain-a-scalar methodology from bench.py (axon's
block_until_ready does not reliably block).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.lattice import u1
from l2hmc_tpu.dynamics.hmc import hmc_chain
from l2hmc_tpu.ops.leapfrog import hmc_chain_pallas, hmc_chain_reference


def log(msg):
    print(f"[pallas_hmc {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def phase1_exactness(key):
    n, b, lt, lx = 4, 16, 16, 16
    k1, k2, k3, k4 = jax.random.split(key, 4)
    links = jax.random.uniform(k1, (b, lt, lx, 2), minval=-np.pi, maxval=np.pi)
    v0s = jax.random.normal(k2, (n, b, lt * lx))
    v1s = jax.random.normal(k3, (n, b, lt * lx))
    us = jax.random.uniform(k4, (n, b))
    out_k, plaq_k, chg_k, prob_k = jax.jit(
        lambda l: hmc_chain_pallas(l, key, 0.1, 4.0, 3, n, tile_b=b,
                                   rand_arrays=(v0s, v1s, us))
    )(links)
    out_r, plaq_r, chg_r, prob_r = hmc_chain_reference(links, v0s, v1s, us, 0.1, 4.0, 3)
    err = float(jnp.max(jnp.abs(out_k - out_r)))
    perr = float(jnp.max(jnp.abs(prob_k - prob_r)))
    log(f"exactness: max|x-x_ref|={err:.2e} max|p-p_ref|={perr:.2e}")
    assert err < 1e-4 and perr < 1e-4, "compiled kernel diverges from twin"


def phase2_physics(key):
    b, lt, lx = 128, 16, 16
    beta = 4.0
    links = jnp.zeros((b, lt, lx, 2))
    run = jax.jit(lambda l, k: hmc_chain_pallas(l, k, 0.10, beta, 3, 2000))
    links, plaqs, _, probs = run(links, key)
    measured = float(jnp.mean(plaqs[1000:]))
    exact = float(u1.u1_plaq_exact(beta))
    acc = float(jnp.mean(probs[1000:]))
    log(f"physics: plaq {measured:.5f} exact {exact:.5f} acc {acc:.3f}")
    assert abs(measured - exact) < 2e-3, "plaquette off the oracle"


def phase3_throughput(key):
    lt = lx = 16
    K, N = 3, 500
    shape = u1.LatticeShape(lt, lx)
    pot = u1.make_potential_fn(shape)
    rows = []
    for b in (128, 2048):
        links = jnp.zeros((b, lt, lx, 2))
        x_flat = links.reshape(b, -1)

        fused = jax.jit(lambda l, k: hmc_chain_pallas(l, k, 0.10, 4.0, K, N))
        xla = jax.jit(lambda x, k: hmc_chain(
            pot, x, 4.0, k, 0.10, K, N, wrap_fn=u1.wrap))

        def timed(fn, *args):
            out = fn(*args)
            digest = jax.tree.leaves(out)[0]
            float(jnp.sum(digest))  # compile+drain
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                out = fn(*args)
                float(jnp.sum(jax.tree.leaves(out)[0]))
                best = min(best, time.perf_counter() - t0)
            return best

        t_fused = timed(fused, links, key)
        t_xla = timed(xla, x_flat, key)
        r_fused = N * K * b / t_fused
        r_xla = N * K * b / t_xla
        rows.append((b, t_fused / N * 1e6, t_xla / N * 1e6, r_fused, r_xla))
        log(f"b={b}: fused {t_fused/N*1e6:.1f} us/transition "
            f"({r_fused:,.0f} lf-steps/s) vs XLA scan {t_xla/N*1e6:.1f} us "
            f"({r_xla:,.0f} lf-steps/s) -> {t_xla/t_fused:.2f}x")
    return rows


def main():
    log(f"platform: {jax.devices()[0]}")
    key = jax.random.PRNGKey(7)
    phase1_exactness(key)
    phase2_physics(key)
    phase3_throughput(key)
    log("done")


if __name__ == "__main__":
    main()
