#!/usr/bin/env python
"""64x64 campaign for the in-kernel stencil conditioner (VERDICT r4 item 1).

Round 4 left the 64x64 per-second channel lost at the equal-implementation
XLA tier (plaq-ESS/s 0.742 +- 0.004, per-step 1.585 +- 0.009) with the fix
scoped to an in-kernel stencil.  This campaign scores that kernel
(``ops/l2hmc_kernel.py l2hmc_local_chain_pallas``) with the h2h protocol:

- N seeds, each its own training of a ``local_flat`` cell (XLA path),
- every sampler advances its own chains from the same Metropolis-warm
  state; timed chunks INTERLEAVED round-robin,
- THREE samplers per seed:
    trained_fused   the stencil kernel (in-kernel PRNG),
    hmc_fused       the fused HMC chain at its tuned (K, eps) — the
                    best-implementation baseline (r5: the sub-tile trace
                    layout made this exist at 64x64, 7x the XLA chunk),
    hmc_xla         the r4 baseline tier (same protocol the 0.742 was
                    measured on),
- jackknife-over-seeds error bars on both ratios.

Both tiers are reported because they answer different questions:
vs hmc_xla = "did the kernel convert the r4 loss?"; vs hmc_fused =
"does the learned sampler win when BOTH sides get their best kernels?"

Usage:
  python benchmarks/local64_h2h.py --seeds 3 --channels 4 --layers 1
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _trace(msg):
    print(f"[l64 {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def jackknife_mean_err(vals):
    vals = np.asarray(vals, dtype=np.float64)
    n = len(vals)
    if n < 2:
        return float(vals.mean()), float("nan")
    loo = np.array([np.delete(vals, i).mean() for i in range(n)])
    err = np.sqrt((n - 1) / n * ((loo - loo.mean()) ** 2).sum())
    return float(vals.mean()), float(err)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--beta", type=float, default=4.0)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--seed0", type=int, default=5000)
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--layers", type=int, default=1)
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--eps", type=float, default=0.10014,
                   help="r4 auto-tuned 64x64 trained-cell eps")
    p.add_argument("--train_steps", type=int, default=12000)
    p.add_argument("--train_chains", type=int, default=128)
    p.add_argument("--lr_init", type=float, default=1e-3)
    p.add_argument("--eval_steps", type=int, default=4000)
    p.add_argument("--eval_chains", type=int, default=512)
    p.add_argument("--chunk", type=int, default=250,
                   help="transitions per timed kernel call")
    p.add_argument("--trace_chains", type=int, default=256)
    p.add_argument("--hmc_k", type=int, default=8)
    p.add_argument("--hmc_eps", type=float, default=0.04552,
                   help="r4 auto-tuned 64x64 HMC optimum")
    p.add_argument("--therm_sweeps", type=int, default=1500)
    p.add_argument("--no_xla_tier", action="store_true")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    from benchmarks.trained_vs_hmc import trace_stats
    from l2hmc_tpu.analysis import stats as _st
    from l2hmc_tpu.dynamics.l2hmc import get_eps
    from l2hmc_tpu.lattice import u1
    from l2hmc_tpu.lattice.metropolis import thermalize
    from l2hmc_tpu.ops.l2hmc_kernel import l2hmc_local_chain_pallas
    from l2hmc_tpu.ops.leapfrog import hmc_chain_pallas
    from l2hmc_tpu.train import gauge as G

    _trace(f"devices: {jax.devices()}")
    shape = u1.LatticeShape(args.size, args.size)
    n_tr = args.trace_chains

    tcfg = G.GaugeConfig(
        time_size=args.size, space_size=args.size,
        num_chains=args.train_chains, num_steps=args.k,
        network_arch="local_flat", num_filters=args.channels,
        local_layers=args.layers, merge_v_halves=True,
        eps_init=args.eps, eps_trainable=False, lr_init=args.lr_init,
        train_steps=args.train_steps, beta_final=args.beta,
        charge_reward=True, charge_weight=1.0)
    dyn_cfg, _, _ = G.build_dynamics(tcfg)

    key = jax.random.PRNGKey(640)
    _trace(f"Metropolis warm start ({args.therm_sweeps} sweeps)...")
    x0 = u1.random_links(key, args.eval_chains, shape)
    x0 = jax.jit(lambda x, k: thermalize(
        k, x, shape, args.beta, args.therm_sweeps))(
            x0, jax.random.fold_in(key, 9))
    links0 = u1.to_links(x0, shape)
    float(jnp.sum(x0))

    # HMC samplers (seed-independent; chains re-warmed per rep by fresh keys)
    @jax.jit
    def run_hf(l, k):
        l, pl, ch, pr = hmc_chain_pallas(
            l, k, args.hmc_eps, args.beta, args.hmc_k, args.chunk)
        return l, pl[:, :n_tr], ch[:, :n_tr], jnp.sum(pr)

    hcfg = G.GaugeConfig(
        time_size=args.size, space_size=args.size,
        num_chains=args.eval_chains, num_steps=args.hmc_k, hmc=True,
        network_arch="zero", eps_init=args.hmc_eps, eps_trainable=False,
        beta_final=args.beta)
    hstate = G.init_train_state(hcfg, key)
    base_hx = G.make_eval_chunk(hcfg, args.chunk)

    @jax.jit
    def run_hx(x, k):
        x, m = base_hx(hstate.params, x, args.beta, k)
        return x, m["plaqs"][:, :n_tr], m["charges"][:, :n_tr], \
            jnp.sum(m["accept_prob"])

    per_seed = []
    for s in range(args.seeds):
        seed = args.seed0 + s
        skey = jax.random.PRNGKey(seed)
        t0 = time.perf_counter()
        state, m, attempts = G.train_to_convergence(tcfg, skey)
        train_s = time.perf_counter() - t0
        acc_end = attempts[-1]["end_accept"]
        _trace(f"seed {seed}: trained {args.train_steps} steps in "
               f"{train_s:.0f}s, end acc={acc_end:.3f}")
        eps_v = float(get_eps(state.params, dyn_cfg))

        @jax.jit
        def run_t(l, k, prm=state.params):
            l, pl, ch, pr = l2hmc_local_chain_pallas(
                l, prm, k, eps_v, args.beta, args.k, args.chunk,
                num_layers=args.layers)
            return l, pl[:, :n_tr], ch[:, :n_tr], jnp.sum(pr)

        samplers = [("trained_fused", run_t, "links"),
                    ("hmc_fused", run_hf, "links")]
        if not args.no_xla_tier:
            samplers.append(("hmc_xla", run_hx, "flat"))

        st8 = {tag: (links0 if kind == "links" else x0)
               for tag, _, kind in samplers}
        acc = {tag: {"pl": [], "q": [], "wall": 0.0, "acc": 0.0}
               for tag, _, _ in samplers}
        # compile + warm, untimed
        for i, (tag, run, _) in enumerate(samplers):
            st8[tag], pl, q, dg = run(st8[tag],
                                      jax.random.fold_in(skey, 99900 + i))
            float(dg)
        n_rounds = args.eval_steps // args.chunk
        kk = jax.random.fold_in(skey, 7)
        for r in range(n_rounds):
            for tag, run, _ in samplers:
                kk, sub = jax.random.split(kk)
                a = acc[tag]
                t0 = time.perf_counter()
                st8[tag], pl, q, dg = run(st8[tag], sub)
                a["acc"] += float(dg)          # drains the chunk
                a["wall"] += time.perf_counter() - t0
                a["pl"].append(np.asarray(pl))
                a["q"].append(np.asarray(q))

        rec = {"seed": seed, "end_accept": acc_end, "eps": eps_v,
               "train_s": round(train_s, 1)}
        for tag, _, _ in samplers:
            a = acc[tag]
            pl = np.concatenate(a["pl"])
            q = np.concatenate(a["q"])
            st = trace_stats(pl, a["wall"], max_chains=n_tr,
                             total_chains=args.eval_chains)
            tau_q, tau_ok = _st.pooled_integrated_time(q)
            tun = float(np.abs(np.diff(q, axis=0)).mean()) * st["steps_per_s"]
            rec[tag] = {
                "plaq": st, "plaq_mean": round(float(pl.mean()), 6),
                "accept": round(a["acc"] / (n_rounds * args.chunk
                                            * args.eval_chains), 4),
                "q_tau_pooled": round(tau_q, 2),
                "q_tau_pooled_reliable": bool(tau_ok),
                "q_ess_per_s_pooled": round(
                    (1.0 / max(tau_q, 1.0)) * q.shape[0]
                    * args.eval_chains / a["wall"], 1),
                "tunneling_per_s": round(tun, 2),
                "us_per_transition": round(
                    a["wall"] / (n_rounds * args.chunk) * 1e6, 1),
            }
        for tier, base in (("vs_xla", "hmc_xla"), ("vs_fused", "hmc_fused")):
            if base not in rec:
                continue
            rec[tier] = {
                "ratio_plaq_ess_per_s": round(
                    rec["trained_fused"]["plaq"]["eff_samples_per_s"]
                    / rec[base]["plaq"]["eff_samples_per_s"], 4),
                "ratio_ess_per_step": round(
                    rec["trained_fused"]["plaq"]["ess_ratio"]
                    / rec[base]["plaq"]["ess_ratio"], 4),
                "ratio_q_ess_per_s_pooled": round(
                    rec["trained_fused"]["q_ess_per_s_pooled"]
                    / max(rec[base]["q_ess_per_s_pooled"], 1e-9), 4),
            }
        per_seed.append(rec)
        msg = " ".join(
            f"{t}={rec[t]['plaq']['eff_samples_per_s']:,.0f}/s"
            for t, _, _ in samplers)
        _trace(f"seed {seed}: {msg}; vs_xla "
               f"{rec.get('vs_xla', {}).get('ratio_plaq_ess_per_s')} "
               f"vs_fused {rec['vs_fused']['ratio_plaq_ess_per_s']} "
               f"(per-step {rec['vs_fused']['ratio_ess_per_step']})")

    summary = {}
    for tier in ("vs_xla", "vs_fused"):
        if tier not in per_seed[0]:
            continue
        summary[tier] = {}
        for k in per_seed[0][tier]:
            mean, err = jackknife_mean_err([r[tier][k] for r in per_seed])
            summary[tier][k] = {"mean": round(mean, 4),
                                "err_jk": round(err, 4)}
    result = {
        "benchmark": "local64_h2h",
        "config": {
            "size": args.size, "beta": args.beta, "seeds": args.seeds,
            "trained": (f"local_flat c{args.channels} L{args.layers} "
                        f"K={args.k} eps={args.eps} fixed merge_v "
                        f"charge_reward, fused kernel"),
            "hmc": f"K={args.hmc_k} eps={args.hmc_eps}",
            "train_steps": args.train_steps,
            "eval_steps": args.eval_steps,
            "eval_chains": args.eval_chains,
        },
        "plaq_exact": round(float(u1.u1_plaq_exact(args.beta)), 6),
        "per_seed": per_seed,
        "summary": summary,
    }
    out_s = json.dumps(result)
    print(out_s)
    if args.out:
        Path(args.out).write_text(out_s)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
