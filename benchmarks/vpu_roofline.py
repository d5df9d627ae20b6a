#!/usr/bin/env python
"""VPU roofline for the fused trained-kernel's L2HMC machinery (r3 item 4).

Round 3's ablation (benchmarks/kernel_decomposition.py) measured the
"L2HMC machinery" — circle map + exact log-Jacobian, masked two-stage
x-updates, direction fusion, exp factors, i.e. the ablated kernel minus
the plain fused HMC chain — at ~285 us/transition of the 773 us total.
The verdict's acceptance test for calling the fused-vs-fused gap
*structural* is either dieting that slice to ~200 us or "an op-count x
issue-rate VPU roofline proving the current form is at the bound".

This benchmark produces that roofline with no hand counting:

1. **Exact op counts by jaxpr walk.**  The kernel and its pure-JAX twin
   share one transition-math function (`_l2hmc_transition_math`), so
   tracing it (ablate_nets=True) and the plain-HMC `_transition_math`
   to jaxprs and summing per-primitive output elements gives the exact
   per-transition element counts of each op class; machinery = the
   elementwise difference.  No drift when the kernel changes.
2. **Measured per-class issue rates.**  Dependency-chained fori_loops at
   the kernel's own (chains, d) shape measure the chip's delivered
   elements/s for exp, sin, log, div, floor and the cheap
   mul/add/select class (XLA fuses the chain into one VPU loop; the
   same VPU executes Mosaic's vector ops).  Chain contamination by
   cheap ops is subtracted using the measured cheap rate, keeping every
   class rate an UPPER bound (speed-of-light) so the derived time is a
   genuine LOWER bound.
3. **Bound vs measurement.**  machinery_bound_us = sum_c elems_c /
   rate_c; printed next to the ablation-measured machinery time.  The
   floor claim stands if measured/bound is O(1) (the kernel leaves no
   integer factor on the table); a large ratio would mean schedulable
   headroom and send us back to the diet.

Usage:  python benchmarks/vpu_roofline.py [--chains 2048] [--size 16]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def _trace(msg):
    print(f"[vpu {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


# primitive name -> op class.  Anything not listed is 'cheap' if
# elementwise-ish, 'other' (ignored: copies/reshapes/broadcasts are
# layout, reductions are counted cheap) otherwise.
CLASSES = {
    "exp": "exp",
    "sin": "trig", "cos": "trig",
    "log": "log",
    "div": "div",
    "floor": "floor", "round": "floor",
    "tanh": "exp",          # same VPU transcendental class
    "rsqrt": "div", "sqrt": "div",
}
CHEAP = {
    "add", "sub", "mul", "neg", "abs", "max", "min", "select_n", "sign",
    "and", "or", "xor", "not", "eq", "ne", "ge", "gt", "le", "lt",
    "integer_pow", "square", "convert_element_type", "iota", "pow",
    "reduce_sum", "reduce_max", "reduce_min", "is_finite",
    "shift_right_logical", "shift_left",
}


def _walk(jaxpr, counts):
    for eqn in jaxpr.eqns:
        # recurse into pjit/cond/scan sub-jaxprs
        for v in eqn.params.values():
            for j in (v if isinstance(v, (list, tuple)) else [v]):
                if hasattr(j, "jaxpr"):
                    _walk(j.jaxpr, counts)
                elif hasattr(j, "eqns"):
                    _walk(j, counts)
        name = eqn.primitive.name
        if not eqn.outvars:
            continue
        aval = eqn.outvars[0].aval
        n = int(np.prod(aval.shape)) if aval.shape else 1
        if name in CLASSES:
            counts[CLASSES[name]] = counts.get(CLASSES[name], 0) + n
        elif name in CHEAP:
            counts["cheap"] = counts.get(CHEAP and "cheap", 0) + n


def count_ops(fn, *args):
    counts = {}
    closed = jax.make_jaxpr(fn)(*args)
    _walk(closed.jaxpr, counts)
    return counts


def transition_op_counts(b, lt, lx, K):
    """Per-transition element counts for (a) the ablated trained kernel
    (full L2HMC machinery, zero conditioner) and (b) the plain HMC chain
    transition, from their shared math functions."""
    from types import SimpleNamespace

    from l2hmc_tpu.ops.l2hmc_kernel import (
        WEIGHT_NAMES, _l2hmc_transition_math, pack_weights,
    )
    from l2hmc_tpu.ops.leapfrog import (
        _potential_and_sinp, _transition_math,
    )
    from l2hmc_tpu.train.gauge import GaugeConfig, init_train_state

    d = lt * lx
    cfg = GaugeConfig(time_size=lt, space_size=lx, num_chains=8,
                      num_steps=K, network_arch="mlp", num_hidden=64,
                      merge_v_halves=True, eps_init=0.1,
                      eps_trainable=False)
    params = init_train_state(cfg, jax.random.PRNGKey(0)).params
    W = SimpleNamespace(**dict(zip(
        WEIGHT_NAMES, pack_weights(params, 2 * d))))
    s_col = (jax.lax.broadcasted_iota(jnp.int32, (b, d), 1) % lx)
    roll = functools.partial(jnp.roll, axis=1)

    z = jnp.zeros((b, d), jnp.float32)
    zb = jnp.zeros((b,), jnp.float32)

    def abl(x0, x1, v0, v1, dsg, u, pot, sinp, chg):
        return _l2hmc_transition_math(
            x0, x1, v0, v1, dsg, u, W, 0.1, 4.0, K, lx, s_col, roll, True,
            pot0=pot, sinp=sinp, chg0=chg, ablate_nets=True)

    def hmc(x0, x1, v0, v1, u, pot, sinp, chg):
        return _transition_math(x0, x1, v0, v1, u, 0.1, 4.0, K, lx, s_col,
                                roll, pot0=pot, sinp=sinp, chg0=chg)

    c_abl = count_ops(abl, z, z, z, z, zb, zb, zb, z, zb)
    c_hmc = count_ops(hmc, z, z, z, z, zb, zb, z, zb)
    return c_abl, c_hmc


def measure_rates(b, d, reps=3, m_lo=2048, m_hi=16384):
    """Delivered elements/s per op class via dependency-chained loops.

    On the axon tunnel every dispatch carries ~10 ms of fixed latency that
    dwarfs millisecond-scale compute, so each class is timed at TWO chain
    lengths and the rate taken from the SLOPE (t_hi - t_lo) — fixed
    overhead cancels exactly.  Each chain body is 1 target op + n_extra
    cheap ops; the cheap rate is measured first and its contamination
    subtracted, keeping every class rate an upper bound (speed of light)
    so the derived machinery time is a genuine lower bound.
    """
    x0 = jnp.full((b, d), 0.5, jnp.float32)

    def chain(body, m):
        @jax.jit
        def run(x):
            x = jax.lax.fori_loop(0, m, lambda i, x: body(x), x)
            return jnp.sum(x)
        return run

    def slope_time(body):
        """Seconds per chain step from the two-length slope."""
        ts = {}
        for m in (m_lo, m_hi):
            run = chain(body, m)
            float(run(x0))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(run(x0))
                best = min(best, time.perf_counter() - t0)
            ts[m] = best
        return max(ts[m_hi] - ts[m_lo], 1e-9) / (m_hi - m_lo)

    # (name, body, n_target_ops, n_cheap_ops)
    probes = [
        ("cheap", lambda x: x * 0.9995 + 2e-4, 2, 0),
        ("exp", lambda x: jnp.exp(-x), 1, 1),
        ("trig", lambda x: jnp.sin(x + 0.7), 1, 1),
        ("log", lambda x: jnp.log(x + 1.5), 1, 1),
        ("div", lambda x: 1.7 / (x + 1.2), 1, 1),
        ("floor", lambda x: (x - jnp.floor(x * 0.73)) * 0.9 + 0.05, 1, 4),
    ]
    elems = b * d
    rates = {}
    t_cheap_per_elem = None
    for name, body, n_t, n_c in probes:
        t_step = slope_time(body) / elems      # per element per chain step
        if name == "cheap":
            t_cheap_per_elem = t_step / n_t    # per single cheap op
            rates["cheap"] = 1.0 / t_cheap_per_elem
            _trace(f"cheap: {rates['cheap']/1e9:.1f} Gelem/s")
            continue
        t_corr = max(t_step - n_c * t_cheap_per_elem, 0.2 * t_step)
        rates[name] = 1.0 / t_corr
        _trace(f"{name}: {rates[name]/1e9:.2f} Gelem/s "
               f"(raw {1.0/t_step/1e9:.2f})")
    return rates


def measure_rates_pallas(b, d, reps=3, m_lo=512, m_hi=4096):
    """Per-class issue rates measured INSIDE a Pallas kernel.

    The production kernel is Mosaic, whose transcendental lowerings differ
    from XLA's (measured: XLA sin ~42 Gelem/s vs Mosaic far faster — XLA
    pays a ~20-op range-reduction polynomial), so only Mosaic-measured
    rates bound a Mosaic kernel.  Same dependency-chain + two-length slope
    method as :func:`measure_rates`, with the chain running on a
    VMEM-resident block inside one ``pallas_call`` (the earlier
    per-primitive Pallas microbenches measured tile-serial LATENCY; a long
    chain at the production tile shape measures delivered THROUGHPUT in
    exactly the kernel's execution mode).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = min(b, 256)
    x0 = jnp.full((b, d), 0.5, jnp.float32)
    spec = pl.BlockSpec((tile, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def chain(body, m):
        def kern(x_ref, o_ref):
            o_ref[:] = jax.lax.fori_loop(0, m, lambda i, x: body(x),
                                         x_ref[:])

        @jax.jit
        def run(x):
            y = pl.pallas_call(
                kern, grid=(b // tile,), in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32))(x)
            return jnp.sum(y)

        return run

    def slope_time(body):
        ts = {}
        for m in (m_lo, m_hi):
            run = chain(body, m)
            float(run(x0))
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(run(x0))
                best = min(best, time.perf_counter() - t0)
            ts[m] = best
        return max(ts[m_hi] - ts[m_lo], 1e-9) / (m_hi - m_lo)

    probes = [
        ("cheap", lambda x: x * 0.9995 + 2e-4, 2, 0),
        ("exp", lambda x: jnp.exp(-x), 1, 1),
        ("trig", lambda x: jnp.sin(x + 0.7), 1, 1),
        ("log", lambda x: jnp.log(x + 1.5), 1, 1),
        ("div", lambda x: 1.7 / (x + 1.2), 1, 1),
        ("floor", lambda x: (x - jnp.floor(x * 0.73)) * 0.9 + 0.05, 1, 4),
    ]
    elems = b * d
    rates = {}
    t_cheap = None
    for name, body, n_t, n_c in probes:
        t_step = slope_time(body) / elems
        if name == "cheap":
            t_cheap = t_step / n_t
            rates["cheap"] = 1.0 / t_cheap
            _trace(f"[mosaic] cheap: {rates['cheap']/1e9:.1f} Gelem/s")
            continue
        t_corr = max(t_step - n_c * t_cheap, 0.2 * t_step)
        rates[name] = 1.0 / t_corr
        _trace(f"[mosaic] {name}: {rates[name]/1e9:.2f} Gelem/s "
               f"(raw {1.0/t_step/1e9:.2f})")
    return rates


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=16)
    p.add_argument("--chains", type=int, default=2048)
    p.add_argument("--num_steps", type=int, default=3)
    p.add_argument("--measure_kernel", action="store_true",
                   help="also re-run the kernel_decomposition ablation "
                        "timings (TPU, ~2 min) for the measured machinery "
                        "number next to the bound")
    args = p.parse_args(argv)

    lt = lx = args.size
    b, d, K = args.chains, lt * lx, args.num_steps

    _trace("counting ops by jaxpr walk...")
    c_abl, c_hmc = transition_op_counts(b, lt, lx, K)
    delta = {k: c_abl.get(k, 0) - c_hmc.get(k, 0)
             for k in set(c_abl) | set(c_hmc)}
    _trace(f"ablated counts: {c_abl}")
    _trace(f"hmc counts:     {c_hmc}")
    _trace(f"machinery delta: {delta}")

    rates_xla = measure_rates(b, d)
    on_tpu = jax.devices()[0].platform == "tpu"
    rates = measure_rates_pallas(b, d) if on_tpu else rates_xla

    def bound(counts):
        return sum(counts.get(k, 0) / rates[k] for k in rates
                   if counts.get(k, 0) > 0)

    bound_machinery = bound(delta)
    result = {
        "benchmark": "vpu_roofline",
        "config": {"size": args.size, "chains": b, "K": K},
        "counts_ablated": c_abl,
        "counts_hmc": c_hmc,
        "counts_machinery_delta": delta,
        "rates_gelem_per_s_mosaic": {
            k: round(v / 1e9, 2) for k, v in rates.items()},
        "rates_gelem_per_s_xla": {
            k: round(v / 1e9, 2) for k, v in rates_xla.items()},
        "bound_machinery_us": round(bound_machinery * 1e6, 1),
        "bound_ablated_us": round(bound(c_abl) * 1e6, 1),
        "bound_hmc_us": round(bound(c_hmc) * 1e6, 1),
    }

    if args.measure_kernel:
        import dataclasses

        from l2hmc_tpu.lattice import u1 as u1m
        from l2hmc_tpu.ops.l2hmc_kernel import l2hmc_chain_pallas
        from l2hmc_tpu.ops.leapfrog import hmc_chain_pallas
        from l2hmc_tpu.train.gauge import GaugeConfig, init_train_state

        cfg = GaugeConfig(time_size=lt, space_size=lx, num_chains=b,
                          num_steps=K, network_arch="mlp", num_hidden=64,
                          merge_v_halves=True, eps_init=0.125,
                          eps_trainable=False)
        state = init_train_state(cfg, jax.random.PRNGKey(1))
        links = u1m.to_links(state.x, cfg.shape)
        NT = 500
        runs = {
            "ablated": jax.jit(lambda l, k: l2hmc_chain_pallas(
                l, state.params, k, 0.125, 4.0, K, NT, ablate_nets=True)),
            "full": jax.jit(lambda l, k: l2hmc_chain_pallas(
                l, state.params, k, 0.125, 4.0, K, NT)),
            "hmc": jax.jit(lambda l, k: hmc_chain_pallas(
                l, k, 0.125, 4.0, K, 3 * NT)),
        }
        meas = {}
        for name, run in runs.items():
            nt = NT if name != "hmc" else 3 * NT
            out = run(links, jax.random.PRNGKey(2))
            float(jnp.sum(out[-1]))
            best = float("inf")
            for i in range(4):
                t0 = time.perf_counter()
                out = run(links, jax.random.fold_in(jax.random.PRNGKey(2), i))
                float(jnp.sum(out[-1]))
                best = min(best, time.perf_counter() - t0)
            meas[name] = best / nt
            _trace(f"{name}: {meas[name]*1e6:.0f} us/transition")
        machinery_meas = meas["ablated"] - meas["hmc"]
        result.update(
            measured_full_us=round(meas["full"] * 1e6, 1),
            measured_ablated_us=round(meas["ablated"] * 1e6, 1),
            measured_hmc_us=round(meas["hmc"] * 1e6, 1),
            measured_machinery_us=round(machinery_meas * 1e6, 1),
            machinery_measured_over_bound=round(
                machinery_meas / max(bound_machinery, 1e-9), 2),
        )

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
