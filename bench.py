"""Benchmark: L2HMC sampling throughput on U(1) 16x16 (BASELINE.json north star).

Prints ONE JSON line:
  {"metric": "leapfrog_steps_per_s_per_chip", "value": N,
   "unit": "chain-leapfrog-steps/s", "vs_baseline": R, ...}

- value: (transitions * num_leapfrog_steps * num_chains) / wall_s for the
  TPU-native fused-direction kernel (periodic CNN networks, sampling path).
- vs_baseline: speedup vs the *reference dataflow* on the same chip — the
  compute-both-directions-and-mask transition the TF implementation uses
  (``/root/reference/l2hmc/dynamics/gauge_dynamics.py:195-259``).  The
  reference repo publishes no numbers of its own (BASELINE.md), so the
  apples-to-apples baseline is its algorithmic dataflow on this hardware.

Timing methodology: the axon platform dispatches asynchronously and
``block_until_ready`` does not reliably block, so every timed call is
drained by materializing a scalar reduction of its output.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np


def _trace(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


CHUNK = 100  # transitions per device program


def _measure_matmul_peak(size: int = 4096, reps: int = 20) -> float:
    """Attainable f32 matmul FLOP/s on THIS chip (not the spec sheet).

    A dependency-chained ``size^3`` f32 matmul scan — the same serial
    structure as the leapfrog trajectory.  On the axon tunnel the spec
    peak (49 TFLOP/s f32) is not reachable even in isolation (measured
    ~26 TFLOP/s at 4096^3), so the roofline reports sustained rate
    against both the spec and this measured ceiling.
    """
    a = jax.random.normal(jax.random.PRNGKey(0), (size, size), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (size, size), jnp.float32)

    def prog(a, b):
        def body(c, _):
            y = jnp.dot(c, b, precision="float32",
                        preferred_element_type=jnp.float32)
            return y * (1.0 / np.sqrt(size)), None
        c, _ = jax.lax.scan(body, a, None, length=reps)
        return jnp.sum(c)

    g = jax.jit(prog)
    float(g(a, b))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(g(a, b))
        best = min(best, (time.perf_counter() - t0) / reps)
    return 2.0 * size**3 / best


def bench_transition(cfg, both_directions: bool, repeats: int, key,
                     want_cost: bool = False, merge_v_halves: bool = False):
    from l2hmc_tpu.train import gauge as G
    from l2hmc_tpu.lattice import u1
    import dataclasses

    cfg = dataclasses.replace(cfg, both_directions=both_directions,
                              merge_v_halves=merge_v_halves)
    _trace(f"init state (both={both_directions})...")
    state = G.init_train_state(cfg, key)
    _, dyn, _ = G.build_dynamics(cfg)

    def sample_chunk(params, x, key):
        def body(x, k):
            out = dyn["transition"](params, x, 4.0, k)
            return u1.wrap(out.x_out), out.accept_prob
        keys = jax.random.split(key, CHUNK)
        x, probs = jax.lax.scan(body, x, keys)
        # scalar digest: draining this forces the whole chunk to execute
        return x, jnp.mean(probs), jnp.sum(x)

    x = u1.random_links(key, cfg.num_chains, cfg.shape)
    _trace("compiling + warmup...")
    # AOT compile: the compiled object also yields the XLA cost model
    # (FLOPs / HBM bytes) used for the roofline report.
    compiled = jax.jit(sample_chunk).lower(state.params, x, key).compile()
    x, acc, digest = compiled(state.params, x, key)
    float(digest)  # drain
    _trace("warm; timing...")

    best = float("inf")
    for i in range(repeats):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        x, acc, digest = compiled(state.params, x, sub)
        float(digest)  # drain
        dt = time.perf_counter() - t0
        best = min(best, dt)
    lf_steps = CHUNK * cfg.num_steps * cfg.num_chains
    cost = None
    if want_cost:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        # XLA counts the while body once -> these are per-transition figures
        cost = {"flops": ca.get("flops"), "bytes": ca.get("bytes accessed"),
                "transcendentals": ca.get("transcendentals")}
    return lf_steps / best, float(acc), best, cost


def main():
    from l2hmc_tpu.train.gauge import GaugeConfig

    cfg = GaugeConfig(
        time_size=16, space_size=16, num_chains=128, num_steps=3,
        network_arch="conv", num_filters=8, eps_init=0.1,
    )
    key = jax.random.PRNGKey(42)

    import dataclasses as _dc0

    # canonical batch (reference config: 128 chains) — latency-floor regime
    fused128, acc, dt, _ = bench_transition(cfg, False, repeats=5, key=key,
                                            merge_v_halves=True)
    _trace(f"merged@128: {fused128:,.0f} lf-steps/s ({dt*1e3/CHUNK:.3f} ms/transition)")
    # throughput-optimal batch: chains are embarrassingly parallel, so the
    # per-chip headline is measured at the batch that fills the chip
    # (swept {1024, 2048, 4096, 8192}: 2048 is optimal — weight reads
    # amortize up to 2048, VMEM/scheduling pressure regresses beyond)
    big = _dc0.replace(cfg, num_chains=2048)
    # headline kernel: fused direction + merged momentum half-kicks (K+1
    # VNet calls instead of 2K; exact MH kernel, physics-validated — the
    # 8x8 merged training run hits the plaquette oracle to 1.5e-4)
    fused_rate, _, dt_big, cost = bench_transition(
        big, False, repeats=4, key=key, want_cost=True, merge_v_halves=True)
    _trace(f"merged@2048: {fused_rate:,.0f} lf-steps/s")
    # reference-parity kernel (same learned family as the reference)
    parity_rate, _, dt_parity, _ = bench_transition(big, False, repeats=3, key=key)
    _trace(f"parity-fused@2048: {parity_rate:,.0f} lf-steps/s")
    ref_rate, _, dt_ref, _ = bench_transition(big, True, repeats=2, key=key)
    _trace(f"reference-dataflow@2048: {ref_rate:,.0f} lf-steps/s")

    # roofline for the log-prob+leapfrog transition (BASELINE.md deliverable):
    # XLA cost model vs v5e peaks (f32 MXU ~49 TFLOP/s, HBM ~819 GB/s), plus
    # a MEASURED calibration: the spec peak is not what this chip delivers —
    # an isolated dependency-chained f32 4096^3 matmul probe (the same serial
    # structure as the leapfrog) measures the attainable matmul ceiling, and
    # the sustained rate is reported against that too.
    roofline = {}
    if cost and cost["flops"]:
        t_tr = dt_big / CHUNK
        flop_floor = cost["flops"] / 49e12
        hbm_floor = cost["bytes"] / 819e9
        sol = max(flop_floor, hbm_floor)
        roofline = {
            "flops_per_transition": cost["flops"],
            "hbm_bytes_per_transition": cost["bytes"],
            "arithmetic_intensity_flop_per_byte": round(
                cost["flops"] / cost["bytes"], 1),
            "sustained_tflops": round(cost["flops"] / t_tr / 1e12, 2),
            "pct_of_speed_of_light": round(100 * sol / t_tr, 1),
        }
        if jax.devices()[0].platform == "tpu":
            # probe only on the real chip: on CPU it would take minutes and
            # measure host cores, not a chip
            measured_peak = _measure_matmul_peak()
            roofline["measured_f32_matmul_peak_tflops"] = round(
                measured_peak / 1e12, 2)
            # NOTE: numerator is TOTAL cost-model FLOPs (matmul + VPU work),
            # denominator a pure serial-matmul ceiling — an upper-bound
            # utilization proxy, not MXU occupancy; >100% means VPU/HBM
            # work overlaps the MXU stream.  Used as saturation evidence
            # (sustained total rate ~ the chip's deliverable matmul rate),
            # not as a claim that every matmul runs at peak.
            roofline["total_flops_vs_measured_matmul_rate_pct"] = round(
                100 * cost["flops"] / t_tr / measured_peak, 1)
            _trace(f"measured chip f32 matmul rate "
                   f"{roofline['measured_f32_matmul_peak_tflops']} TFLOP/s; "
                   f"sustained total FLOP/s = "
                   f"{roofline['total_flops_vs_measured_matmul_rate_pct']}% "
                   f"of it (upper-bound utilization proxy)")
        _trace(f"roofline: {roofline['sustained_tflops']} TFLOP/s sustained, "
               f"{roofline['pct_of_speed_of_light']}% of speed-of-light "
               f"(AI {roofline['arithmetic_intensity_flop_per_byte']} flop/B)")

    # ESS/s of the average plaquette: plain-HMC baseline (well-defined
    # without a trained checkpoint) on the fused Pallas leapfrog-chain
    # kernel (ops/leapfrog.py: whole chain VMEM-resident, measured 2.5x the
    # XLA scan form at this batch), thermalized chains, 3000 recorded
    # transitions at the throughput-optimal 2048-chain batch.
    from l2hmc_tpu.analysis import stats as _stats
    from l2hmc_tpu.dynamics.hmc import hmc_chain_u1_fused

    # (K=5, eps=0.08) measured ESS/s-optimal over the joint (K, eps) grid
    # at 16x16 beta=4 (benchmarks/hmc_ess_sweep.py: 3.99M eff samples/s vs
    # 3.18M for K=3 eps=0.10 at equal record length — RESULTS.md; longer
    # trajectories decorrelate faster than their 1/K cost up to the
    # trajectory-length resonance at eps*K ~ 0.6)
    ess_chains = 2048
    ess_leapfrog, ess_eps = 5, 0.08
    ess_err = {}
    try:
        links = jnp.zeros((ess_chains, cfg.time_size, cfg.space_size, 2))

        # 1500 transitions per kernel call: fewer tunnel dispatches per
        # recorded sample (3 x 500 measured ~30% slower from per-call
        # overhead)
        @jax.jit
        def record(links, key):
            links, pl_tr, _, _ = hmc_chain_u1_fused(
                links, key, ess_eps, 4.0, ess_leapfrog, 1500)
            # 16-chain trace slice for the ESS estimate + a scalar drain
            # digest; everything else stays on-device (no eager ops in the
            # timed loop — on the axon tunnel every eager dispatch is a
            # network round-trip)
            return links, pl_tr[:, :16], jnp.sum(pl_tr)

        keys = jax.random.split(key, 3)
        links, pl0, d0 = record(links, keys[0])      # thermalize + compile
        float(d0)
        t0 = time.perf_counter()
        handles = []
        for i in range(2):
            links, pl16, digest = record(links, keys[i + 1])
            float(digest)                            # drain (timed)
            handles.append(pl16)
        wall = time.perf_counter() - t0
        # trace readback for the ESS estimate happens OUTSIDE the timed
        # region (observables stay on-device in production; the tunnel
        # transfer is not sampling cost)
        pl = np.concatenate([np.asarray(h) for h in handles])  # (3000, 16)
        ess_ratio = float(np.mean([
            _stats.calc_ess(pl[:, c]) for c in range(pl.shape[1])
        ]))
        ess_per_s = ess_ratio * pl.shape[0] * ess_chains / wall
        _trace(f"ESS ratio {ess_ratio:.4f} -> {ess_per_s:,.0f} eff samples/s "
               f"(fused Pallas HMC chain @{ess_chains})")
    except Exception as e:   # noqa: BLE001 — Pallas lowering regressions in
        # jax upgrades must not kill the benchmark line (see trained-fused)
        ess_ratio, ess_per_s = None, None
        ess_err = {"plaq_ess_error": repr(e)[:200]}
        _trace(f"fused-HMC ESS section failed, continuing: {e!r}")

    # fused TRAINED-kernel chain (ops/l2hmc_kernel.py): the flagship learned
    # sampler's whole chain in one pallas_call (MLP h256 + merge_v family,
    # throughput is weight-value-independent so fresh init measures the
    # trained kernel's speed), vs its XLA-scan form.
    trained_fused = {}
    try:
      if jax.devices()[0].platform == "tpu":
        import dataclasses as _dc1

        from l2hmc_tpu.dynamics.l2hmc import get_eps
        from l2hmc_tpu.lattice import u1 as _u1
        from l2hmc_tpu.ops.l2hmc_kernel import l2hmc_chain_pallas
        from l2hmc_tpu.train import gauge as _G

        # h64 = the shipped champion's width (quality is width-independent,
        # RESULTS.md); also fits this compiler build's 16M scoped-VMEM limit
        # where h256 + 500-step trace blocks exceeded it by 1.14M
        mcfg = _dc1.replace(
            cfg, num_chains=2048, network_arch="mlp", num_hidden=64,
            merge_v_halves=True)
        mstate = _G.init_train_state(mcfg, key)
        dyn_cfg, mdyn, _ = _G.build_dynamics(mcfg)
        eps_v = float(get_eps(mstate.params, dyn_cfg))
        links_t = _u1.to_links(mstate.x, mcfg.shape)
        NT = 400

        runf = jax.jit(lambda l, k: l2hmc_chain_pallas(
            l, mstate.params, k, eps_v, 4.0, mcfg.num_steps, NT))

        def xla_chunk(params, x, k):
            def body(x, kk):
                out = mdyn["transition"](params, x, 4.0, kk)
                return _u1.wrap(out.x_out), out.accept_prob
            ks = jax.random.split(k, NT)
            x, probs = jax.lax.scan(body, x, ks)
            return x, jnp.sum(probs)

        runx = jax.jit(xla_chunk)

        _trace("trained-kernel fused chain: compiling...")
        links_t, plq, chg, prb = runf(links_t, key)
        float(jnp.sum(prb))
        bestf = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            links_t, plq, chg, prb = runf(links_t, jax.random.fold_in(key, i))
            float(jnp.sum(prb))
            bestf = min(bestf, time.perf_counter() - t0)
        xf = mstate.x
        xf, dg = runx(mstate.params, xf, key)
        float(dg)
        bestx = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            xf, dg = runx(mstate.params, xf, jax.random.fold_in(key, i))
            float(dg)
            bestx = min(bestx, time.perf_counter() - t0)
        ratef = NT * mcfg.num_steps * mcfg.num_chains / bestf
        ratex = NT * mcfg.num_steps * mcfg.num_chains / bestx
        trained_fused = {
            "trained_fused_lf_steps_per_s": round(ratef, 1),
            "trained_fused_vs_xla": round(ratef / ratex, 3),
            "trained_fused_ms_per_transition": round(bestf * 1e3 / NT, 4),
            "trained_fused_config": (
                f"MLP h{mcfg.hidden} merge_v K={mcfg.num_steps} @2048 "
                f"chains (ops/l2hmc_kernel.py)"),
        }
        _trace(f"trained fused chain: {ratef:,.0f} lf-steps/s vs XLA "
               f"{ratex:,.0f} -> {ratef/ratex:.2f}x")
    except Exception as e:   # noqa: BLE001 — a Pallas lowering regression in
        # a jax upgrade must not kill the whole benchmark (seen: uint32 cast
        # and atan2 both dropped from Mosaic between container builds)
        trained_fused = {"trained_fused_error": repr(e)[:200]}
        _trace(f"trained-fused section failed, continuing: {e!r}")

    # --- learned-sampler headline (VERDICT round-1 item 1) ---
    # ESS/s of the TRAINED champion kernel vs HMC at its own joint (K, eps)
    # optimum, both timed on the same XLA eval harness from the same
    # Metropolis-thermalized state.  The champion params ship in the repo
    # (benchmarks/champion_16x16.npz, written by round2_queue2.sh cells via
    # trained_vs_hmc.py --save_npz); if absent, the throughput headline
    # below stands alone.
    trained_headline = {}
    champ_path = Path(__file__).parent / "benchmarks" / "champion_16x16.npz"
    try:
      if champ_path.exists():
        import dataclasses as _dc2
        import json as _json

        from l2hmc_tpu.lattice import u1 as _u1c
        from l2hmc_tpu.lattice.metropolis import thermalize as _therm
        from l2hmc_tpu.train import gauge as _Gc

        z = np.load(champ_path, allow_pickle=False)
        cfg_d = _json.loads(str(z["config"]))
        known = {f.name for f in _dc2.fields(GaugeConfig)}
        ccfg = GaugeConfig(**{k: v for k, v in cfg_d.items() if k in known})
        ccfg = _dc2.replace(ccfg, num_chains=1024)
        cstate = _Gc.init_train_state(ccfg, key)
        flat, treedef = jax.tree_util.tree_flatten(cstate.params)
        params = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(z[f"arr_{i}"]) for i in range(len(flat))])

        # the shipped champion is 16x16 beta=4, whose measured HMC joint
        # (K, eps) optimum is (5, 0.08); a future champion npz at another
        # volume/beta must ship its own baseline in the config dict
        beta_c = float(cfg_d.get("beta_final", 4.0))
        hcfg = _dc2.replace(
            ccfg, hmc=True, network_arch="zero",
            eps_init=float(cfg_d.get("hmc_opt_eps", 0.08)),
            eps_trainable=False,
            num_steps=int(cfg_d.get("hmc_opt_num_steps", 5)),
            merge_v_halves=False)
        hstate = _Gc.init_train_state(hcfg, key)

        _trace("champion eval: Metropolis thermalization...")
        x0 = _u1c.random_links(key, ccfg.num_chains, ccfg.shape)
        x0 = jax.jit(lambda x, k: _therm(k, x, ccfg.shape, beta_c, 1000))(
            x0, jax.random.fold_in(key, 11))

        # INTERLEAVED timed chunks (t/h/t/h...): wall-clock drift on the
        # tunnel hits both samplers equally — a sequential A-then-B eval
        # measured 6% session swings in round 2 (the h2h_seeds campaign
        # protocol, where the 10-seed ratio is 1.078 +- 0.004)
        def make_chunk(cfg_e):
            base_e = _Gc.make_eval_chunk(cfg_e, 1000)

            @jax.jit
            def chunk_e(params, x, beta, k):
                x, m = base_e(params, x, beta, k)
                return x, {n: v[:, :64] for n, v in m.items()}

            return chunk_e

        # third interleaved sampler: the champion + 1 instanton hop per
        # step (dynamics/topo.py) — the round-4 topological-channel
        # winner; its hop cost is inside the timed chunk
        from l2hmc_tpu.dynamics import topo as _topo

        base_th = _topo.make_hop_eval_chunk(ccfg, 1000)

        @jax.jit
        def ch_th(params, x, beta, k):
            x, m = base_th(params, x, beta, k)
            return x, {n: v[:, :64] for n, v in m.items()}

        ch_t, ch_h = make_chunk(ccfg), make_chunk(hcfg)
        xs = {"t": x0, "h": x0, "th": x0}
        prm = {"t": params, "h": hstate.params, "th": params}
        chs = {"t": ch_t, "h": ch_h, "th": ch_th}
        for tag in ("t", "h", "th"):   # compile + warm
            xs[tag], m = chs[tag](prm[tag], xs[tag], beta_c, key)
            float(np.asarray(m["charges"]).sum())
        accum = {"t": ([], [], 0.0), "h": ([], [], 0.0), "th": ([], [], 0.0)}
        kk = jax.random.fold_in(key, 13)
        for i in range(4):
            for tag in ("t", "h", "th"):
                kk, sub = jax.random.split(kk)
                pls, qs, wall_e = accum[tag]
                t0 = time.perf_counter()
                xs[tag], m = chs[tag](prm[tag], xs[tag], beta_c, sub)
                pls.append(np.asarray(m["plaqs"]))    # drains the chunk
                wall_e += time.perf_counter() - t0
                qs.append(np.asarray(m["charges"]))
                accum[tag] = (pls, qs, wall_e)

        def finish(tag, cfg_e, label):
            pls, qs, wall_e = accum[tag]
            pl_e = np.concatenate(pls)
            q_e = np.concatenate(qs)
            ess_e = float(np.mean(
                [_stats.calc_ess(pl_e[:, c]) for c in range(64)]))
            eff = ess_e * pl_e.shape[0] * cfg_e.num_chains / wall_e
            tun = float(np.abs(np.diff(q_e, axis=0)).mean()) \
                * pl_e.shape[0] / wall_e
            _trace(f"{label}: ESS {ess_e:.4f}, {eff:,.0f} eff samples/s, "
                   f"tunneling {tun:.2f}/s/chain-row")
            return eff, ess_e, tun, float(pl_e.mean())

        eff_t, ess_t, tun_t, plaq_t = finish("t", ccfg, "trained")
        eff_h, ess_h, tun_h, plaq_h = finish("h", hcfg, "hmc")
        eff_th, ess_th, tun_th, plaq_th = finish("th", ccfg, "trained+hop")
        # pooled multi-chain tau_int(Q) for the topo channel (the HMC
        # baseline's single-trace Sokal estimate is marginal at tau ~ 375)
        q_h = np.concatenate(accum["h"][1])
        q_th = np.concatenate(accum["th"][1])
        tau_h, _ = _stats.pooled_integrated_time(q_h)
        tau_th, _ = _stats.pooled_integrated_time(q_th)
        _trace("NOTE: the 4x1000-step ratio here is the under-powered "
               "spot-check; the campaign-protocol figure (h2h_seeds.py, "
               "15 seeds x 20k-step evals) is 1.0762 +- 0.0028 — quote that")
        trained_headline = {
            "trained_plaq_ess_per_s": round(eff_t, 1),
            "trained_vs_hmc_optimal_ess_per_s": round(eff_t / eff_h, 3),
            # the error-barred measurement of the SAME ratio under the full
            # campaign protocol (15 independent trainings, 20k x 2048-chain
            # interleaved evals — benchmarks/h2h_seeds.py, RESULTS.md r3);
            # the in-bench 4-chunk estimate above is its cheap spot-check
            "trained_vs_hmc_campaign_mean": 1.0762,
            "trained_vs_hmc_campaign_err_jk": 0.0028,
            "trained_vs_hmc_campaign_protocol": (
                "h2h_seeds 15 seeds x 20k steps x 2048 chains, interleaved"),
            "trained_vs_hmc_ess_per_step": round(ess_t / ess_h, 3),
            "trained_vs_hmc_tunneling_per_s": round(tun_t / tun_h, 3),
            # round-4 topological channel: champion + instanton hops
            # (dynamics/topo.py), all hop cost counted in the timed chunks.
            # The *_spotcheck fields are the in-bench 4x1000-step estimate
            # (under-powered: its plaq ratio swings +-0.09 session to
            # session); the *_campaign fields are the error-barred
            # measurement of the SAME ratios under the full
            # topo_ensemble protocol (5 reps x 6000 steps x 2048 chains,
            # interleaved, RESULTS.md r4) — quote those
            "trained_hop_plaq_ess_per_s": round(eff_th, 1),
            "trained_hop_vs_hmc_ess_per_s_spotcheck": round(
                eff_th / eff_h, 3),
            "trained_hop_tunneling_vs_hmc_spotcheck": round(
                tun_th / tun_h, 3),
            "trained_hop_campaign_plaq_ess_per_s_ratio": 1.047,
            "trained_hop_campaign_plaq_ess_per_s_err": 0.009,
            "trained_hop_campaign_tunneling_ratio": 21.32,
            "trained_hop_campaign_tunneling_err": 0.05,
            "trained_hop_campaign_q_ess_per_s_ratio": 43.96,
            "trained_hop_campaign_q_ess_per_s_err": 3.2,
            "trained_hop_campaign_protocol": (
                "topo_ensemble 5 reps x 6000 steps x 2048 chains, "
                "interleaved, all hop cost counted (16x16 beta=4; "
                "runs/topo16_r5.json — r5 re-run reproducing the r4 "
                "figures within errors)"),
            "trained_hop_q_tau_pooled": round(tau_th, 2),
            "hmc_q_tau_pooled": round(tau_h, 2),
            "trained_hop_plaq_mean": round(plaq_th, 6),
            "trained_plaq_mean": round(plaq_t, 6),
            "trained_config": (
                f"champion {cfg_d.get('network_arch')} h{cfg_d.get('num_hidden')} "
                f"K={cfg_d.get('num_steps')} eps_fixed "
                f"merge_v={cfg_d.get('merge_v_halves')} @1024 chains"),
            # r5 64x64 tier — campaign-anchored statics (the live
            # measurement is benchmarks/local64_h2h.py ->
            # runs/l64_c4L1_final.json: 3 seeds, jackknife; and
            # benchmarks/local_kernel_bench.py for the kernel costs)
            "local64_stencil_vs_hmc_xla_ess_per_s": 2.521,
            "local64_stencil_vs_hmc_xla_err": 0.024,
            "local64_stencil_vs_hmc_fused_ess_per_s": 0.238,
            "local64_stencil_vs_hmc_fused_err": 0.003,
            "local64_per_step_quality": 1.655,
            "local64_per_step_quality_err": 0.016,
            "local64_protocol": (
                "local64_h2h 3 seeds x 4000 steps x 512 chains, "
                "interleaved 3-sampler (stencil kernel / fused HMC / "
                "XLA HMC), 64x64 beta=4"),
            "hmc64_fused_us_per_transition": 848.0,
            "hmc64_xla_us_per_transition": 8996.0,
        }

        # best-vs-best tier (VERDICT r2 item 1): the champion scored ON its
        # fused Pallas chain kernel against the fused HMC chain — both
        # whole-chain VMEM-resident kernels, on-device 64-chain trace
        # slices, same thermalized start.  This is the honest
        # best-implementation-vs-best-implementation ratio (the XLA-tier
        # ratio above is the equal-implementation cost-normalized one).
        try:
            from l2hmc_tpu.dynamics.l2hmc import get_eps as _geps
            from l2hmc_tpu.lattice import u1 as _u1f
            from l2hmc_tpu.ops.l2hmc_kernel import l2hmc_chain_pallas as _l2p
            from l2hmc_tpu.ops.leapfrog import hmc_chain_pallas as _hmcp

            dyn_cfg_c, _, _ = _Gc.build_dynamics(ccfg)
            eps_c = float(_geps(params, dyn_cfg_c))
            # best-vs-best: each kernel at its own best chunking — the
            # trained chain is VMEM-bounded to ~500 transitions/call, the
            # HMC chain computes a 1500-transition call in ~0.2 s so
            # shorter chunks leave it tunnel-dispatch-bound (measured:
            # 500-step HMC chunks read 1.3M eff/s where 1500-step read 3M)
            NT_T, NT_H = 500, 1500

            @jax.jit
            def run_tf(l, k):
                l, pl, ch, pr = _l2p(l, params, k, eps_c, beta_c,
                                     ccfg.num_steps, NT_T)
                return l, pl[:, :64], ch[:, :64], jnp.sum(pr)

            @jax.jit
            def run_hf(l, k):
                l, pl, ch, pr = _hmcp(l, k, float(hcfg.eps_init), beta_c,
                                      hcfg.num_steps, NT_H)
                return l, pl[:, :64], ch[:, :64], jnp.sum(pr)

            links_f = _u1c.to_links(x0, ccfg.shape)
            res_f, us_tr = {}, {}
            for tag, run_f, n_ch, nt_f in (("trained", run_tf, 6, NT_T),
                                           ("hmc", run_hf, 2, NT_H)):
                lf, pl64, ch64, dg = run_f(links_f, key)  # compile+therm
                float(dg)
                pls, wall_f = [], 0.0
                kk = jax.random.fold_in(key, 17)
                for i in range(n_ch):
                    kk, sub = jax.random.split(kk)
                    t0 = time.perf_counter()
                    lf, pl64, ch64, dg = run_f(lf, sub)
                    float(dg)
                    pls.append(np.asarray(pl64))
                    wall_f += time.perf_counter() - t0
                pl_f = np.concatenate(pls)
                ess_f = float(np.mean(
                    [_stats.calc_ess(pl_f[:, c]) for c in range(64)]))
                res_f[tag] = ess_f * pl_f.shape[0] * ccfg.num_chains / wall_f
                us_tr[tag] = wall_f / (n_ch * nt_f) * 1e6
                _trace(f"fused {tag}: ESS {ess_f:.4f}, "
                       f"{res_f[tag]:,.0f} eff samples/s")
            trained_headline.update(
                trained_fused_plaq_ess_per_s=round(res_f["trained"], 1),
                trained_fused_vs_hmc_fused=round(
                    res_f["trained"] / res_f["hmc"], 3),
            )

            # fused-hop marginal cost WITH an error bar (r4 left it
            # bounded "|delta| < 10%, ~30% dispatch noise"): interleaved
            # plain/hop rounds at the full NT_T chunk so dispatch
            # amortizes, jackknifed over rounds
            try:
                @jax.jit
                def run_tf_hop(l, k):
                    l, pl, ch, pr = _l2p(l, params, k, eps_c, beta_c,
                                         ccfg.num_steps, NT_T, hop=True)
                    return l, pl[:, :64], ch[:, :64], jnp.sum(pr)

                lfh, _, _, dg = run_tf_hop(links_f, key)
                float(dg)
                margins = []
                kk = jax.random.fold_in(key, 29)
                for _ in range(5):
                    ts = {}
                    for tag2, rf in (("plain", run_tf), ("hop", run_tf_hop)):
                        kk, sub = jax.random.split(kk)
                        t0 = time.perf_counter()
                        lfh, _, _, dg = rf(lfh, sub)
                        float(dg)
                        ts[tag2] = time.perf_counter() - t0
                    margins.append(ts["hop"] / ts["plain"] - 1.0)
                m_arr = np.asarray(margins)
                n_m = len(m_arr)
                loo = np.array([np.delete(m_arr, i).mean()
                                for i in range(n_m)])
                err_m = float(np.sqrt((n_m - 1) / n_m
                                      * ((loo - loo.mean()) ** 2).sum()))
                trained_headline.update(
                    fused_hop_marginal_cost_frac=round(float(m_arr.mean()),
                                                       4),
                    fused_hop_marginal_cost_err_jk=round(err_m, 4),
                )
                _trace(f"fused hop marginal cost: "
                       f"{m_arr.mean()*100:.2f}% +- {err_m*100:.2f}% "
                       f"of a transition chunk")
            except Exception as e:   # noqa: BLE001 — optional sub-tier
                trained_headline["fused_hop_marginal_error"] = repr(e)[:160]
                _trace(f"fused hop marginal sub-tier failed: {e!r}")

            # VPU machinery roofline (VERDICT r3 item 4), published next to
            # the MXU roofline: exact per-transition op counts of the fused
            # kernel's L2HMC machinery (jaxpr walk of the shared transition
            # math, benchmarks/vpu_roofline.py) x measured Mosaic chain-probe
            # issue rates -> a serial-issue time model, against the measured
            # ablation slice (nets-ablated kernel minus plain fused HMC).
            # measured/bound < 1 = the Mosaic schedule already overlaps op
            # classes better than serial issue; no schedulable headroom.
            try:
                from benchmarks import vpu_roofline as _vr

                @jax.jit
                def run_af(l, k):
                    l, pl, ch, pr = _l2p(l, params, k, eps_c, beta_c,
                                         ccfg.num_steps, NT_T,
                                         ablate_nets=True)
                    return l, jnp.sum(pl)

                # HMC reference at MATCHED K and chunking (ADVICE r4): the
                # best-vs-best tier's us_tr['hmc'] runs K=hcfg.num_steps at
                # NT_H — 2 extra leapfrog passes/transition and 3x the
                # dispatch amortization — which biases the machinery slice
                # low.  The op-count delta below is at K=ccfg.num_steps, so
                # the measured slice must be too.
                @jax.jit
                def run_hk(l, k):
                    l, pl, ch, pr = _hmcp(l, k, float(hcfg.eps_init),
                                          beta_c, ccfg.num_steps, NT_T)
                    return l, jnp.sum(pl)

                walls = {}
                for tag_a, run_a in (("abl", run_af), ("hmc_k", run_hk)):
                    lf, dg = run_a(links_f, key)
                    float(dg)
                    wall_a = 0.0
                    kk = jax.random.fold_in(key, 23)
                    for _ in range(2):
                        kk, sub = jax.random.split(kk)
                        t0 = time.perf_counter()
                        lf, dg = run_a(lf, sub)
                        float(dg)
                        wall_a += time.perf_counter() - t0
                    walls[tag_a] = wall_a / (2 * NT_T) * 1e6
                us_abl = walls["abl"]
                mach_us = us_abl - walls["hmc_k"]
                sz = ccfg.time_size
                c_abl, c_hmc = _vr.transition_op_counts(
                    ccfg.num_chains, sz, sz, ccfg.num_steps)
                delta = {k: c_abl.get(k, 0) - c_hmc.get(k, 0)
                         for k in set(c_abl) | set(c_hmc)}
                rates = _vr.measure_rates_pallas(
                    ccfg.num_chains, 2 * sz * sz)
                bound_us = 1e6 * sum(
                    delta.get(k, 0) / rates[k] for k in rates
                    if delta.get(k, 0) > 0)
                trained_headline.update(
                    fused_machinery_us=round(mach_us, 1),
                    fused_machinery_serial_issue_bound_us=round(bound_us, 1),
                    fused_machinery_vs_bound=round(mach_us / bound_us, 3),
                )
                _trace(f"VPU roofline: machinery {mach_us:.1f} us vs "
                       f"serial-issue model {bound_us:.1f} us "
                       f"(ratio {mach_us/bound_us:.2f} — <1 means the "
                       f"schedule beats serial issue; no headroom)")
            except Exception as e:   # noqa: BLE001 — optional sub-tier
                trained_headline["vpu_roofline_error"] = repr(e)[:160]
                _trace(f"vpu roofline sub-tier failed, continuing: {e!r}")
        except Exception as e:   # noqa: BLE001 — optional tier
            trained_headline["trained_fused_tier_error"] = repr(e)[:200]
            _trace(f"fused champion tier failed, continuing: {e!r}")
    except Exception as e:   # noqa: BLE001 — optional section; never kill
        # the benchmark line over it
        trained_headline = {"trained_headline_error": repr(e)[:200]}
        _trace(f"champion headline section failed, continuing: {e!r}")

    result = {
        "metric": "leapfrog_steps_per_s_per_chip",
        "value": round(fused_rate, 1),
        "unit": "chain-leapfrog-steps/s",
        "vs_baseline": round(fused_rate / ref_rate, 3),
        "config": "U(1) 16x16, 2048 chains, 3 leapfrog steps, periodic CNN, "
                  "beta=4, fused-direction + merged-V kernel",
        "baseline_def": "reference dataflow (compute both directions + mask) on same chip",
        "ms_per_transition_2048": round(dt_big * 1e3 / CHUNK, 4),
        "lf_steps_per_s_parity_kernel": round(parity_rate, 1),
        "vs_baseline_parity_kernel": round(parity_rate / ref_rate, 3),
        "lf_steps_per_s_128chains": round(fused128, 1),
        "ms_per_transition_128": round(dt * 1e3 / CHUNK, 4),
        "accept_prob_untrained": round(acc, 4),
        # None (JSON null) when the section errored — a measured zero and a
        # failed measurement must stay distinguishable downstream
        "plaq_ess_per_s": None if ess_per_s is None else round(ess_per_s, 1),
        "plaq_ess_ratio_hmc": None if ess_ratio is None else round(ess_ratio, 5),
        "plaq_ess_kernel": (f"pallas_fused_hmc_chain@{ess_chains} "
                            f"K={ess_leapfrog} eps={ess_eps}"),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        **roofline,
        **ess_err,
        **trained_fused,
        **trained_headline,
    }
    if "trained_plaq_ess_per_s" in trained_headline:
        # headline = the LEARNED sampler (the reference's raison d'etre):
        # effective plaquette samples/s of the trained champion kernel,
        # vs_baseline = cost-normalized ratio over HMC at its own joint
        # (K, eps) ESS/s optimum on the same harness.  The raw-throughput
        # comparison vs the reference dataflow stays in the same line
        # (lf_steps_per_s_* / vs_baseline_dataflow).
        result.update(
            metric="trained_plaq_ess_per_s_per_chip",
            value=trained_headline["trained_plaq_ess_per_s"],
            unit="effective plaquette samples/s",
            vs_baseline=trained_headline["trained_vs_hmc_optimal_ess_per_s"],
            baseline_def="HMC at its own (K,eps) ESS/s optimum, same harness",
            # config must describe the headline's own setup, not the
            # raw-throughput section's CNN config (ADVICE r2)
            config=trained_headline["trained_config"],
            vs_baseline_dataflow=round(fused_rate / ref_rate, 3),
            lf_steps_per_s_merged_kernel=round(fused_rate, 1),
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
