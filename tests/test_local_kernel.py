"""Fused LOCAL-stencil chain kernel (ops/l2hmc_kernel.py, r5) tests.

Same two equivalence layers as tests/test_l2hmc_kernel.py, for the
5-point-stencil conditioner family (``make_local_flat_net``,
``network_arch='local_flat'``):
  1. the pure-JAX twin reproduces ``make_dynamics``'s transition under the
     same randomness,
  2. the Pallas local kernel (interpret mode) matches the twin bit-level.
Together: the 64x64 kernel == the trained XLA semantics, so local_flat
checkpoints drop in.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.dynamics.l2hmc import (
    DynamicsConfig, get_eps, init_dynamics_params, make_dynamics,
)
from l2hmc_tpu.lattice import u1
from l2hmc_tpu.networks.nets import LocalNetSpec, make_local_flat_net
from l2hmc_tpu.ops.l2hmc_kernel import (
    l2hmc_chain_reference, l2hmc_local_chain_pallas,
)
from l2hmc_tpu.ops.wilson import make_potential_fn


def _build(key, lt, lx, K, channels=4, num_layers=2, eps=0.12):
    """Small trained-family local_flat/u1/merge_v dynamics with bumped
    weights (the init head factor 0.001 makes S/T/Q near zero)."""
    x_dim = 2 * lt * lx
    cfg = DynamicsConfig(x_dim=x_dim, num_steps=K, group="u1",
                         merge_v_halves=True)
    xi, xa = make_local_flat_net(LocalNetSpec(
        lt, lx, channels=channels, num_layers=num_layers, factor=2.0,
        bounded_q=True, x_channels=4))
    vi, va = make_local_flat_net(LocalNetSpec(
        lt, lx, channels=channels, num_layers=num_layers, factor=1.0,
        bounded_q=True, v_channels=4))
    params = init_dynamics_params(key, cfg, xi, vi, eps)

    def bump(tree, k, scale):
        leaves, treedef = jax.tree.flatten(tree)
        ks = jax.random.split(k, len(leaves))
        return treedef.unflatten([
            l + scale * jax.random.normal(kk, l.shape)
            for l, kk in zip(leaves, ks)
        ])

    k1, k2 = jax.random.split(jax.random.fold_in(key, 1))
    params = params._replace(xnet=bump(params.xnet, k1, 0.05),
                             vnet=bump(params.vnet, k2, 0.05))
    dyn = make_dynamics(cfg, make_potential_fn(u1.LatticeShape(lt, lx)),
                        xa, va)
    return cfg, params, dyn


def _rand(key, n, b, d, hop=False):
    ks = jax.random.split(key, 6)
    out = [jax.random.normal(ks[0], (n, b, d)),
           jax.random.normal(ks[1], (n, b, d)),
           jnp.where(jax.random.uniform(ks[2], (n, b)) > 0.5, 1.0, -1.0),
           jax.random.uniform(ks[3], (n, b))]
    if hop:
        out += [jax.random.rademacher(ks[4], (n, b)).astype(jnp.float32),
                jax.random.uniform(ks[5], (n, b))]
    return tuple(out)


def test_local_twin_matches_make_dynamics(key):
    """Layer 1: the shared-math twin == the production local_flat XLA
    transition under extracted randomness."""
    lt, lx, K, b, n = 4, 4, 3, 8, 3
    cfg, params, dyn = _build(key, lt, lx, K)
    x = u1.random_links(jax.random.fold_in(key, 2), b,
                        u1.LatticeShape(lt, lx))

    chain_key = jax.random.fold_in(key, 3)
    vs, ds, us = [], [], []
    k = chain_key
    for _ in range(n):
        k, sub = jax.random.split(k)
        kv, kd, ka = jax.random.split(sub, 3)
        vs.append(jax.random.normal(kv, (b, cfg.x_dim)))
        ds.append(jnp.where(jax.random.uniform(kd, (b,)) > 0.5, 1.0, -1.0))
        us.append(jax.random.uniform(ka, (b,)))
    vs, ds, us = jnp.stack(vs), jnp.stack(ds), jnp.stack(us)

    xs = x
    probs_dyn = []
    k = chain_key
    for _ in range(n):
        k, sub = jax.random.split(k)
        out = dyn["transition"](params, xs, 4.0, sub)
        xs = u1.wrap(out.x_out)
        probs_dyn.append(out.accept_prob)

    links = u1.to_links(x, u1.LatticeShape(lt, lx))
    out_t, plaq_t, chg_t, prob_t = l2hmc_chain_reference(
        links, params, vs[..., 0::2], vs[..., 1::2], ds, us,
        eps=float(get_eps(params, cfg)), beta=4.0, num_leapfrog=K,
        local_layers=2)
    np.testing.assert_allclose(
        np.asarray(prob_t), np.asarray(jnp.stack(probs_dyn)), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(out_t.reshape(b, -1)), np.asarray(xs), atol=2e-4)


@pytest.mark.parametrize("num_layers", [1, 2])
def test_local_kernel_matches_twin(key, num_layers):
    """Layer 2: Pallas local kernel (interpret) == twin, both stencil
    depths, incl. the transposed small-tile trace layout (tile_b=4)."""
    lt, lx, K, b, n = 4, 6, 3, 8, 3
    cfg, params, dyn = _build(key, lt, lx, K, num_layers=num_layers)
    shape = u1.LatticeShape(lt, lx)
    links = u1.to_links(
        u1.random_links(jax.random.fold_in(key, 2), b, shape), shape)
    rand = _rand(jax.random.fold_in(key, 3), n, b, lt * lx)

    eps = float(get_eps(params, cfg))
    out_k, plaq_k, chg_k, prob_k = l2hmc_local_chain_pallas(
        links, params, key, eps=eps, beta=3.0, num_leapfrog=K,
        num_transitions=n, num_layers=num_layers, tile_b=4, interpret=True,
        rand_arrays=rand)
    out_r, plaq_r, chg_r, prob_r = l2hmc_chain_reference(
        links, params, *rand, eps=eps, beta=3.0, num_leapfrog=K,
        local_layers=num_layers)
    np.testing.assert_allclose(out_k, out_r, atol=1e-5)
    np.testing.assert_allclose(plaq_k, plaq_r, atol=1e-5)
    np.testing.assert_allclose(chg_k, chg_r, atol=1e-5)
    # accept probs see exp(dH) of ~1e3-term scalar-FMA sums: XLA's FMA
    # contraction differs between the pallas-interpret graph and the scan
    # graph at the last few ulps of dH
    np.testing.assert_allclose(prob_k, prob_r, atol=5e-5)


def test_local_hop_kernel_matches_twin(key):
    """Local kernel + fused instanton hop == twin, and the hop moves Q."""
    lt, lx, K, b, n = 4, 4, 2, 8, 4
    cfg, params, dyn = _build(key, lt, lx, K)
    shape = u1.LatticeShape(lt, lx)
    links = u1.to_links(
        u1.random_links(jax.random.fold_in(key, 2), b, shape), shape)
    rand = _rand(jax.random.fold_in(key, 3), n, b, lt * lx, hop=True)

    eps = float(get_eps(params, cfg))
    out_k, plaq_k, chg_k, prob_k = l2hmc_local_chain_pallas(
        links, params, key, eps=eps, beta=2.0, num_leapfrog=K,
        num_transitions=n, num_layers=2, tile_b=4, interpret=True,
        rand_arrays=rand, hop=True)
    out_r, plaq_r, chg_r, prob_r = l2hmc_chain_reference(
        links, params, *rand[:4], eps=eps, beta=2.0, num_leapfrog=K,
        local_layers=2, hop_arrays=rand[4:])
    np.testing.assert_allclose(out_k, out_r, atol=1e-5)
    np.testing.assert_allclose(plaq_k, plaq_r, atol=1e-5)
    np.testing.assert_allclose(chg_k, chg_r, atol=1e-5)
    # accept probs see exp(dH) of ~1e3-term scalar-FMA sums: XLA's FMA
    # contraction differs between the pallas-interpret graph and the scan
    # graph at the last few ulps of dH
    np.testing.assert_allclose(prob_k, prob_r, atol=5e-5)
    assert float(jnp.abs(chg_r).max()) >= 1.0
    chg_fresh = u1.topological_charge(out_r)
    np.testing.assert_allclose(chg_k[-1], chg_fresh, atol=1e-4)


def test_local_ablate_equals_zero_params(key):
    """ablate_nets=True == zero-stencil params bit-level (the cost-
    decomposition mode the 64x64 floor proof uses)."""
    lt, lx, K, b, n = 4, 4, 2, 8, 2
    cfg, params, dyn = _build(key, lt, lx, K)
    zero_params = params._replace(
        xnet=jax.tree.map(jnp.zeros_like, params.xnet),
        vnet=jax.tree.map(jnp.zeros_like, params.vnet))
    shape = u1.LatticeShape(lt, lx)
    links = u1.to_links(
        u1.random_links(jax.random.fold_in(key, 2), b, shape), shape)
    rand = _rand(jax.random.fold_in(key, 3), n, b, lt * lx)
    eps = float(get_eps(params, cfg))
    out_a, _, _, prob_a = l2hmc_local_chain_pallas(
        links, params, key, eps=eps, beta=2.0, num_leapfrog=K,
        num_transitions=n, num_layers=2, tile_b=4, interpret=True,
        rand_arrays=rand, ablate_nets=True)
    out_z, _, _, prob_z = l2hmc_local_chain_pallas(
        links, zero_params, key, eps=eps, beta=2.0, num_leapfrog=K,
        num_transitions=n, num_layers=2, tile_b=4, interpret=True,
        rand_arrays=rand)
    np.testing.assert_allclose(out_a, out_z, atol=1e-6)
    np.testing.assert_allclose(prob_a, prob_z, atol=1e-6)
