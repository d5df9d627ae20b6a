#!/usr/bin/env python
"""In-kernel 5-point-stencil conditioner: cost frontier at volume (r5).

Round 4 proved both XLA formulations of the local conditioner are dead
ends at 64x64 (image path ~2x HMC cost, all in layout traffic; flat
stencil worse — shifted operands materialized to HBM) and concluded the
stencil must be fused INTO the Pallas chain kernel.  This harness
measures that kernel (``ops/l2hmc_kernel.py l2hmc_local_chain_pallas``):

- us/transition for c x L stencil variants, all state VMEM-resident,
- the nets-ablated kernel (machinery-only) and the fused HMC chain at
  matched K — the in-kernel cost decomposition (conditioner slice =
  full - ablated; machinery slice = ablated - hmc),
- the XLA baselines from the r4 sweep protocol for direct comparison.

Throughput is weight-value-independent, so fresh-init params measure the
trained kernel's speed (the established convention).

Usage:
  python benchmarks/local_kernel_bench.py --size 64 --chains 512 \
      --k 4 --hmc_k 8 --hmc_eps 0.04552
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
    print(f"[lkb {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _time_fn(fn, links, key, reps=3):
    links, dg = fn(links, key)
    float(dg)                      # compile + warm (drain)
    best = float("inf")
    for i in range(reps):
        t0 = time.perf_counter()
        links, dg = fn(links, jax.random.fold_in(key, i))
        float(dg)
        best = min(best, time.perf_counter() - t0)
    return best, links


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--chains", type=int, default=512)
    p.add_argument("--k", type=int, default=4, help="trained leapfrog K")
    p.add_argument("--eps", type=float, default=0.10014)
    p.add_argument("--beta", type=float, default=4.0)
    p.add_argument("--nt", type=int, default=100,
                   help="transitions per kernel call")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--hmc_k", type=int, default=8)
    p.add_argument("--hmc_eps", type=float, default=0.04552)
    p.add_argument("--variants", default="c4L1,c8L1,c8L2",
                   help="comma list of stencil variants cNL{1,2}")
    p.add_argument("--hop", action="store_true",
                   help="also time the hop-fused variants")
    p.add_argument("--xla", action="store_true",
                   help="also time the XLA local_flat eval chunk and XLA "
                        "HMC (the r4 sweep baselines)")
    p.add_argument("--out", default="")
    args = p.parse_args(argv)

    from l2hmc_tpu.dynamics.l2hmc import get_eps
    from l2hmc_tpu.lattice import u1
    from l2hmc_tpu.ops.l2hmc_kernel import l2hmc_local_chain_pallas
    from l2hmc_tpu.ops.leapfrog import hmc_chain_pallas
    from l2hmc_tpu.train import gauge as G

    _trace(f"devices: {jax.devices()}")
    shape = u1.LatticeShape(args.size, args.size)
    key = jax.random.PRNGKey(5)
    links = u1.to_links(u1.random_links(key, args.chains, shape), shape)
    res = {}

    # fused HMC chain at ITS tuned K (best-vs-best denominator) and at
    # the trained K (matched-machinery decomposition reference)
    for tag, k_h in (("hmc_fused", args.hmc_k), ("hmc_fused_kT", args.k)):
        try:
            @jax.jit
            def run_h(l, kk, k_h=k_h):
                l, pl, ch, pr = hmc_chain_pallas(
                    l, kk, args.hmc_eps, args.beta, k_h, args.nt)
                return l, jnp.sum(pr)

            best, links = _time_fn(run_h, links, jax.random.fold_in(key, 1),
                                   args.reps)
            res[tag] = {"us_per_transition": round(best / args.nt * 1e6, 1),
                        "K": k_h}
            _trace(f"{tag}: {res[tag]['us_per_transition']} us/transition")
        except Exception as e:      # noqa: BLE001 — record, keep measuring
            res[tag] = {"error": repr(e)[:200]}
            _trace(f"{tag} failed: {e!r}")

    def variants():
        for v in args.variants.split(","):
            c, nl = v.strip().split("L")
            yield v.strip(), int(c[1:]), int(nl)

    for name, c, nl in variants():
        cfg = G.GaugeConfig(
            time_size=args.size, space_size=args.size,
            num_chains=args.chains, num_steps=args.k,
            network_arch="local_flat", num_filters=c, local_layers=nl,
            merge_v_halves=True, eps_init=args.eps, eps_trainable=False,
            beta_final=args.beta)
        state = G.init_train_state(cfg, key)
        dyn_cfg, _, _ = G.build_dynamics(cfg)
        eps_v = float(get_eps(state.params, dyn_cfg))
        modes = [("", False, False), ("_abl", True, False)]
        if args.hop:
            modes.append(("_hop", False, True))
        for sfx, abl, hop in modes:
            try:
                @jax.jit
                def run_l(l, kk, prm=state.params, nl=nl, abl=abl, hop=hop):
                    l, pl, ch, pr = l2hmc_local_chain_pallas(
                        l, prm, kk, eps_v, args.beta, args.k, args.nt,
                        num_layers=nl, ablate_nets=abl, hop=hop)
                    return l, jnp.sum(pr)

                best, links = _time_fn(
                    run_l, links, jax.random.fold_in(key, 2), args.reps)
                us = best / args.nt * 1e6
                res[name + sfx] = {"us_per_transition": round(us, 1)}
                _trace(f"{name}{sfx}: {us:.1f} us/transition")
            except Exception as e:  # noqa: BLE001
                res[name + sfx] = {"error": repr(e)[:200]}
                _trace(f"{name}{sfx} failed: {e!r}")

    if args.xla:
        import dataclasses

        for tag, cfg_x in (
            ("xla_localflat_c8L2", G.GaugeConfig(
                time_size=args.size, space_size=args.size,
                num_chains=args.chains, num_steps=args.k,
                network_arch="local_flat", num_filters=8, local_layers=2,
                merge_v_halves=True, eps_init=args.eps,
                eps_trainable=False, beta_final=args.beta)),
            ("xla_hmc", G.GaugeConfig(
                time_size=args.size, space_size=args.size,
                num_chains=args.chains, num_steps=args.hmc_k, hmc=True,
                network_arch="zero", eps_init=args.hmc_eps,
                eps_trainable=False, beta_final=args.beta)),
        ):
            try:
                st = G.init_train_state(cfg_x, key)
                base = G.make_eval_chunk(cfg_x, args.nt)

                @jax.jit
                def run_x(l, kk, prm=st.params, base=base):
                    x = l[..., 0].reshape(args.chains, -1)  # unused; keep l
                    return l, jnp.sum(base(prm, st.x, args.beta, kk)[1]
                                      ["plaqs"])

                best, links = _time_fn(
                    run_x, links, jax.random.fold_in(key, 3), args.reps)
                res[tag] = {"us_per_transition": round(
                    best / args.nt * 1e6, 1)}
                _trace(f"{tag}: {res[tag]['us_per_transition']} us")
            except Exception as e:  # noqa: BLE001
                res[tag] = {"error": repr(e)[:200]}
                _trace(f"{tag} failed: {e!r}")

    result = {"benchmark": "local_kernel_bench",
              "config": {"size": args.size, "chains": args.chains,
                         "K": args.k, "nt": args.nt,
                         "hmc": f"K={args.hmc_k} eps={args.hmc_eps}"},
              "variants": res}
    out_s = json.dumps(result)
    print(out_s)
    if args.out:
        Path(args.out).write_text(out_s)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
