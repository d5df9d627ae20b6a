"""Fused Pallas TRAINED-L2HMC chain kernel (ops/l2hmc_kernel.py) tests.

Two equivalence layers:
  1. the pure-JAX twin reproduces ``make_dynamics``'s transition (the
     production XLA path) under the same randomness,
  2. the Pallas kernel (interpret mode here) matches the twin bit-for-bit
     with injected randomness.
Together: kernel == trained XLA semantics, so trained checkpoints drop in.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.dynamics.l2hmc import (
    DynamicsConfig, get_eps, init_dynamics_params, make_dynamics,
)
from l2hmc_tpu.lattice import u1
from l2hmc_tpu.networks.nets import MLPNetSpec, make_mlp_net
from l2hmc_tpu.ops.l2hmc_kernel import (
    l2hmc_chain_pallas, l2hmc_chain_reference,
)
from l2hmc_tpu.ops.wilson import make_potential_fn


def _build(key, lt, lx, K, hidden, eps=0.12):
    """A small trained-family MLP/u1/merge_v dynamics with non-trivial
    weights (inits give near-zero S/T/Q; perturb so the nets matter)."""
    x_dim = 2 * lt * lx
    cfg = DynamicsConfig(x_dim=x_dim, num_steps=K, group="u1",
                         merge_v_halves=True)
    xi, xa = make_mlp_net(MLPNetSpec(x_dim, hidden, factor=2.0,
                                     bounded_q=True, x_in_dim=2 * x_dim))
    vi, va = make_mlp_net(MLPNetSpec(x_dim, hidden, factor=1.0,
                                     bounded_q=True, v_in_dim=2 * x_dim))
    params = init_dynamics_params(key, cfg, xi, vi, eps)

    def bump(tree, k, scale):
        leaves, treedef = jax.tree.flatten(tree)
        ks = jax.random.split(k, len(leaves))
        return treedef.unflatten([
            l + scale * jax.random.normal(kk, l.shape)
            for l, kk in zip(leaves, ks)
        ])

    k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
    params = params._replace(xnet=bump(params.xnet, k1, 0.02),
                             vnet=bump(params.vnet, k2, 0.02))
    dyn = make_dynamics(cfg, make_potential_fn(u1.LatticeShape(lt, lx)),
                        xa, va)
    return cfg, params, dyn


def _split_rand(key, n, b, x_dim):
    """Reproduce _transition_fused's randomness for n sequential calls."""
    vs, ds, us = [], [], []
    for i in range(n):
        key, sub = jax.random.split(key)
        kv, kd, ka = jax.random.split(sub, 3)
        v = jax.random.normal(kv, (b, x_dim))
        d = jnp.where(jax.random.uniform(kd, (b,)) > 0.5, 1.0, -1.0)
        u = jax.random.uniform(ka, (b,))
        vs.append(v)
        ds.append(d)
        us.append(u)
    return jnp.stack(vs), jnp.stack(ds), jnp.stack(us)


def test_twin_matches_make_dynamics(key):
    """Layer 1: the twin == the production XLA transition, same randomness."""
    lt, lx, K, b = 4, 4, 3, 8
    cfg, params, dyn = _build(key, lt, lx, K, hidden=32)
    x = u1.random_links(jax.random.fold_in(key, 2), b, u1.LatticeShape(lt, lx))

    n = 3
    chain_key = jax.random.fold_in(key, 3)
    vs, ds, us = _split_rand(chain_key, n, b, cfg.x_dim)

    # production path: n sequential transitions with the same key schedule
    xs = x
    probs_dyn = []
    k = chain_key
    for i in range(n):
        k, sub = jax.random.split(k)
        out = dyn["transition"](params, xs, 4.0, sub)
        xs = u1.wrap(out.x_out)
        probs_dyn.append(out.accept_prob)

    # twin with the extracted randomness (interleaved -> per-direction)
    links = u1.to_links(x, u1.LatticeShape(lt, lx))
    v0s, v1s = vs[..., 0::2], vs[..., 1::2]
    out_t, plaq_t, chg_t, prob_t = l2hmc_chain_reference(
        links, params, v0s, v1s, ds, us, eps=float(get_eps(params, cfg)),
        beta=4.0, num_leapfrog=K)

    np.testing.assert_allclose(
        np.asarray(prob_t), np.asarray(jnp.stack(probs_dyn)), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_t.reshape(b, -1)), np.asarray(xs), atol=2e-4)
    # the twin's carried plaquette trace equals the direct observable
    np.testing.assert_allclose(
        float(plaq_t[-1].mean()),
        float(u1.avg_plaquette(u1.to_links(xs, u1.LatticeShape(lt, lx))).mean()),
        atol=1e-5)


def test_kernel_matches_twin(key):
    """Layer 2: Pallas kernel (interpret) == twin, bit-level tolerance."""
    lt, lx, K, b, n = 4, 4, 3, 8, 3
    cfg, params, dyn = _build(key, lt, lx, K, hidden=32)
    shape = u1.LatticeShape(lt, lx)
    links = u1.to_links(
        u1.random_links(jax.random.fold_in(key, 2), b, shape), shape)

    d = lt * lx
    k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(key, 3), 4)
    v0s = jax.random.normal(k1, (n, b, d))
    v1s = jax.random.normal(k2, (n, b, d))
    ds = jnp.where(jax.random.uniform(k3, (n, b)) > 0.5, 1.0, -1.0)
    us = jax.random.uniform(k4, (n, b))

    eps = float(get_eps(params, cfg))
    out_k, plaq_k, chg_k, prob_k = l2hmc_chain_pallas(
        links, params, key, eps=eps, beta=3.0, num_leapfrog=K,
        num_transitions=n, tile_b=4, interpret=True,
        rand_arrays=(v0s, v1s, ds, us))
    out_r, plaq_r, chg_r, prob_r = l2hmc_chain_reference(
        links, params, v0s, v1s, ds, us, eps=eps, beta=3.0, num_leapfrog=K)
    np.testing.assert_allclose(out_k, out_r, atol=1e-5)
    np.testing.assert_allclose(plaq_k, plaq_r, atol=1e-5)
    np.testing.assert_allclose(chg_k, chg_r, atol=1e-5)
    np.testing.assert_allclose(prob_k, prob_r, atol=1e-5)


def test_hop_kernel_matches_twin(key):
    """Trained chain + fused instanton hop: kernel (interpret) == twin,
    and the hop actually moves Q sectors under this randomness."""
    lt, lx, K, b, n = 4, 4, 3, 8, 4
    cfg, params, dyn = _build(key, lt, lx, K, hidden=32)
    shape = u1.LatticeShape(lt, lx)
    links = u1.to_links(
        u1.random_links(jax.random.fold_in(key, 2), b, shape), shape)

    d = lt * lx
    ks = jax.random.split(jax.random.fold_in(key, 3), 6)
    v0s = jax.random.normal(ks[0], (n, b, d))
    v1s = jax.random.normal(ks[1], (n, b, d))
    ds = jnp.where(jax.random.uniform(ks[2], (n, b)) > 0.5, 1.0, -1.0)
    us = jax.random.uniform(ks[3], (n, b))
    nus = jax.random.rademacher(ks[4], (n, b)).astype(jnp.float32)
    uhs = jax.random.uniform(ks[5], (n, b))

    eps = float(get_eps(params, cfg))
    out_k, plaq_k, chg_k, prob_k = l2hmc_chain_pallas(
        links, params, key, eps=eps, beta=2.0, num_leapfrog=K,
        num_transitions=n, tile_b=4, interpret=True,
        rand_arrays=(v0s, v1s, ds, us, nus, uhs), hop=True)
    out_r, plaq_r, chg_r, prob_r = l2hmc_chain_reference(
        links, params, v0s, v1s, ds, us, eps=eps, beta=2.0, num_leapfrog=K,
        hop_arrays=(nus, uhs))
    np.testing.assert_allclose(out_k, out_r, atol=1e-5)
    np.testing.assert_allclose(plaq_k, plaq_r, atol=1e-5)
    np.testing.assert_allclose(chg_k, chg_r, atol=1e-5)
    np.testing.assert_allclose(prob_k, prob_r, atol=1e-5)
    # at 4x4 beta=2 the hop accepts ~50%: the trace must leave Q=0
    assert float(jnp.abs(chg_r).max()) >= 1.0
    # hop chain's carried fields stay consistent: final charges equal a
    # fresh evaluation on the output links
    chg_fresh = u1.topological_charge(out_r)
    np.testing.assert_allclose(chg_k[-1], chg_fresh, atol=1e-4)


def test_kernel_matches_twin_bf16(key):
    """precision='bf16' (bf16 MXU weights, f32 accumulation): kernel ==
    twin under the same precision, and the map stays close to f32 (the
    bf16 kernel is a different-but-valid exact MH sampler)."""
    lt, lx, K, b, n = 4, 4, 2, 8, 2
    cfg, params, dyn = _build(key, lt, lx, K, hidden=32)
    shape = u1.LatticeShape(lt, lx)
    links = u1.to_links(
        u1.random_links(jax.random.fold_in(key, 2), b, shape), shape)

    d = lt * lx
    k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(key, 3), 4)
    v0s = jax.random.normal(k1, (n, b, d))
    v1s = jax.random.normal(k2, (n, b, d))
    ds = jnp.where(jax.random.uniform(k3, (n, b)) > 0.5, 1.0, -1.0)
    us = jax.random.uniform(k4, (n, b))

    eps = float(get_eps(params, cfg))
    out_k, _, _, prob_k = l2hmc_chain_pallas(
        links, params, key, eps=eps, beta=3.0, num_leapfrog=K,
        num_transitions=n, tile_b=4, interpret=True,
        rand_arrays=(v0s, v1s, ds, us), precision="bf16")
    out_r, _, _, prob_r = l2hmc_chain_reference(
        links, params, v0s, v1s, ds, us, eps=eps, beta=3.0, num_leapfrog=K,
        precision="bf16")
    np.testing.assert_allclose(out_k, out_r, atol=1e-5)
    np.testing.assert_allclose(prob_k, prob_r, atol=1e-5)
    # near-init conditioners: the bf16 rounding of the S/T/Q maps moves
    # accept probs only slightly off the f32 kernel
    _, _, _, prob_f32 = l2hmc_chain_reference(
        links, params, v0s, v1s, ds, us, eps=eps, beta=3.0, num_leapfrog=K)
    np.testing.assert_allclose(prob_r, prob_f32, atol=0.05)


def test_ablate_nets_equals_zero_params(key):
    """ablate_nets=True (decomposition mode) must equal the zero-params
    kernel bit-for-bit: S/T/Q are skipped, not just zeroed, but the
    machinery output is identical."""
    lt, lx, K, b, n = 4, 4, 2, 8, 2
    cfg, params, dyn = _build(key, lt, lx, K, hidden=16)
    zero_params = params._replace(
        xnet=jax.tree.map(jnp.zeros_like, params.xnet),
        vnet=jax.tree.map(jnp.zeros_like, params.vnet))
    shape = u1.LatticeShape(lt, lx)
    links = u1.to_links(
        u1.random_links(jax.random.fold_in(key, 2), b, shape), shape)
    d = lt * lx
    k1, k2, k3, k4 = jax.random.split(jax.random.fold_in(key, 3), 4)
    rand = (jax.random.normal(k1, (n, b, d)), jax.random.normal(k2, (n, b, d)),
            jnp.where(jax.random.uniform(k3, (n, b)) > 0.5, 1.0, -1.0),
            jax.random.uniform(k4, (n, b)))
    eps = float(get_eps(params, cfg))
    out_a, _, _, prob_a = l2hmc_chain_pallas(
        links, params, key, eps=eps, beta=2.0, num_leapfrog=K,
        num_transitions=n, tile_b=4, interpret=True, rand_arrays=rand,
        ablate_nets=True)
    out_z, _, _, prob_z = l2hmc_chain_pallas(
        links, zero_params, key, eps=eps, beta=2.0, num_leapfrog=K,
        num_transitions=n, tile_b=4, interpret=True, rand_arrays=rand)
    np.testing.assert_allclose(out_a, out_z, atol=1e-6)
    np.testing.assert_allclose(prob_a, prob_z, atol=1e-6)


def test_kernel_hmc_degeneration_matches_plain(key):
    """With zero nets the trained kernel must equal plain leapfrog HMC:
    run the twin with zeroed conditioners against ops/leapfrog's twin.

    Note eps semantics match because with S=T=Q=0 the merged V kicks
    reduce to the standard half/full kicks and the X update to x + eps*v.
    """
    from l2hmc_tpu.ops.leapfrog import hmc_chain_reference

    lt, lx, K, b, n = 4, 6, 3, 4, 2
    cfg, params, dyn = _build(key, lt, lx, K, hidden=16)
    # zero the nets: S/T/Q == 0 exactly
    params = params._replace(
        xnet=jax.tree.map(jnp.zeros_like, params.xnet),
        vnet=jax.tree.map(jnp.zeros_like, params.vnet))
    shape = u1.LatticeShape(lt, lx)
    links = u1.to_links(
        u1.random_links(jax.random.fold_in(key, 2), b, shape), shape)

    d = lt * lx
    k1, k2, k3 = jax.random.split(jax.random.fold_in(key, 3), 3)
    v0s = jax.random.normal(k1, (n, b, d))
    v1s = jax.random.normal(k2, (n, b, d))
    us = jax.random.uniform(k3, (n, b))
    ds = jnp.ones((n, b))  # forward only: plain HMC has no direction

    eps, beta = 0.1, 2.0
    out_l2, plaq_l2, chg_l2, prob_l2 = l2hmc_chain_reference(
        links, params, v0s, v1s, ds, us, eps=eps, beta=beta, num_leapfrog=K)
    out_h, plaq_h, chg_h, prob_h = hmc_chain_reference(
        links, v0s, v1s, us, eps=eps, beta=beta, num_leapfrog=K)
    np.testing.assert_allclose(out_l2, out_h, atol=1e-5)
    np.testing.assert_allclose(prob_l2, prob_h, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_seed has no CPU lowering; the "
                           "in-kernel PRNG path is validated on-chip by "
                           "benchmarks/trained_vs_hmc.py --fused")
def test_prng_mode_runs_tpu(key):
    lt, lx, K, b = 8, 8, 3, 128
    cfg, params, dyn = _build(key, lt, lx, K, hidden=32)
    shape = u1.LatticeShape(lt, lx)
    links = u1.to_links(u1.random_links(key, b, shape), shape)
    out, plaqs, chgs, probs = l2hmc_chain_pallas(
        links, params, key, eps=float(get_eps(params, cfg)), beta=2.0,
        num_leapfrog=K, num_transitions=100)
    assert bool(jnp.all(jnp.isfinite(out)))
    assert 0.0 < float(probs.mean()) <= 1.0
