#!/usr/bin/env python
"""Fused HMC+instanton-hop chain: throughput + physics on the real chip.

The best-vs-best topological sampler: the Pallas whole-chain HMC kernel
(ops/leapfrog.py, ~36M lf-steps/s at 16x16/2048) with the exact winding
hop fused in at ~zero marginal cost (dS from carried field sums, no
extra plaquette pass).  This benchmark measures, at the HMC joint
optimum config:

- lf-steps/s of the hop kernel vs the plain fused chain (the hop's true
  fused-tier cost),
- tunneling/s and pooled tau_int(Q) for both,
- plaquette and <Q^2> against the analytic anchors (exactness on-chip).

Usage: python benchmarks/fused_hop.py [--size 16] [--beta 4.0]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _trace(msg):
    print(f"[fhop {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=16)
    p.add_argument("--beta", type=float, default=4.0)
    p.add_argument("--chains", type=int, default=2048)
    p.add_argument("--num_steps", type=int, default=5)
    p.add_argument("--eps", type=float, default=0.08)
    p.add_argument("--nt", type=int, default=1500, help="transitions/call")
    p.add_argument("--calls", type=int, default=4, help="timed calls")
    p.add_argument("--therm_sweeps", type=int, default=1500)
    p.add_argument("--champion", action="store_true",
                   help="also run the trained champion chain kernel "
                        "(benchmarks/champion_16x16.npz) plain and with the "
                        "fused hop (ops/l2hmc_kernel.py hop=True) — the "
                        "best-vs-best topological sampler")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    from l2hmc_tpu.analysis import stats
    from l2hmc_tpu.lattice import u1
    from l2hmc_tpu.lattice.metropolis import thermalize
    from l2hmc_tpu.ops.leapfrog import hmc_chain_pallas

    shape = u1.LatticeShape(args.size, args.size)
    key = jax.random.PRNGKey(11)
    _trace(f"devices: {jax.devices()}")
    x0 = u1.random_links(key, args.chains, shape)
    x0 = jax.jit(lambda x, k: thermalize(
        k, x, shape, args.beta, args.therm_sweeps))(
            x0, jax.random.fold_in(key, 3))
    links0 = u1.to_links(x0, shape)
    float(jnp.sum(links0))
    _trace("thermalized")

    res = {}

    def run_variant(tag, run, nt, calls, k_lf):
        links, pl, ch, pr = run(links0, jax.random.fold_in(key, 7))
        float(jnp.sum(pr))                     # compile + therm
        pls, chs, wall = [], [], 0.0
        for i in range(calls):
            t0 = time.perf_counter()
            links, pl, ch, pr = run(links, jax.random.fold_in(key, 100 + i))
            pla = np.asarray(pl)               # drains
            wall += time.perf_counter() - t0
            pls.append(pla[:, :256])
            chs.append(np.asarray(ch)[:, :256])
        pla = np.concatenate(pls)
        cha = np.concatenate(chs)
        nt_total = nt * calls
        lf_rate = nt_total * k_lf * args.chains / wall
        tun = float(np.abs(np.diff(cha, axis=0)).mean())
        tau_q, tau_ok = stats.pooled_integrated_time(cha)
        res[tag] = {
            "lf_steps_per_s": round(lf_rate, 1),
            "us_per_transition": round(wall / nt_total * 1e6, 2),
            "tunneling_per_step": round(tun, 4),
            "tunneling_per_s": round(tun * nt_total / wall, 1),
            "q_tau_pooled": round(tau_q, 2),
            "q_tau_reliable": bool(tau_ok),
            "q_ess_per_s_pooled": round(
                (1.0 / max(tau_q, 1.0)) * nt_total * args.chains / wall, 1),
            "plaq_mean": round(float(pla.mean()), 6),
            "q2_mean": round(float((cha ** 2).mean()), 4),
        }
        _trace(f"{tag}: {res[tag]}")

    for tag, hop in (("plain", False), ("hop", True)):
        run = jax.jit(lambda l, k, h=hop: hmc_chain_pallas(
            l, k, args.eps, args.beta, args.num_steps, args.nt, hop=h))
        run_variant(tag, run, args.nt, args.calls, args.num_steps)

    if args.champion:
        from benchmarks.topo_ensemble import load_champion
        from l2hmc_tpu.dynamics.l2hmc import get_eps
        from l2hmc_tpu.ops.l2hmc_kernel import l2hmc_chain_pallas
        from l2hmc_tpu.train import gauge as G

        champ = load_champion(args.size)
        if champ is None:
            _trace("no champion npz for this size; skipping champion tiers")
        else:
            ccfg, cparams = champ
            dyn_cfg, _, _ = G.build_dynamics(ccfg)
            eps_c = float(get_eps(cparams, dyn_cfg))
            # trained chain is VMEM-bounded to ~500 transitions/call
            nt_c = min(args.nt, 500)
            calls_c = max(1, (args.nt * args.calls) // nt_c)
            for tag, hop in (("champ", False), ("champ_hop", True)):
                run = jax.jit(lambda l, k, h=hop: l2hmc_chain_pallas(
                    l, cparams, k, eps_c, args.beta, ccfg.num_steps, nt_c,
                    hop=h))
                run_variant(tag, run, nt_c, calls_c, ccfg.num_steps)

    result = {
        "benchmark": "fused_hop",
        "config": {"size": args.size, "beta": args.beta,
                   "chains": args.chains,
                   "hmc": f"K={args.num_steps} eps={args.eps}",
                   "transitions": args.nt * args.calls},
        "plaq_exact": round(float(u1.u1_plaq_exact(args.beta)), 6),
        "q2_exact": round(u1.topological_susceptibility_exact(
            args.beta, shape.num_plaquettes), 4),
        "hop_cost_pct": round(
            100.0 * (res["hop"]["us_per_transition"]
                     / res["plain"]["us_per_transition"] - 1.0), 2),
        "tunneling_ratio": round(
            res["hop"]["tunneling_per_s"] / res["plain"]["tunneling_per_s"],
            2),
        "q_ess_ratio_pooled": round(
            res["hop"]["q_ess_per_s_pooled"]
            / max(res["plain"]["q_ess_per_s_pooled"], 1e-9), 2),
        **{f"{k}_{tag}": v for tag, r in res.items() for k, v in r.items()},
    }
    if "champ_hop" in res:
        result["champ_hop_tunneling_vs_hmc"] = round(
            res["champ_hop"]["tunneling_per_s"]
            / max(res["plain"]["tunneling_per_s"], 1e-9), 2)
        result["champ_hop_q_ess_vs_hmc_pooled"] = round(
            res["champ_hop"]["q_ess_per_s_pooled"]
            / max(res["plain"]["q_ess_per_s_pooled"], 1e-9), 2)
        result["champ_hop_cost_pct"] = round(
            100.0 * (res["champ_hop"]["us_per_transition"]
                     / res["champ"]["us_per_transition"] - 1.0), 2)
    out_s = json.dumps(result)
    print(out_s)
    if args.out:
        Path(args.out).write_text(out_s)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
