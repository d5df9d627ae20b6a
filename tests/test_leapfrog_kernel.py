"""Fused Pallas leapfrog-chain kernel (ops/leapfrog.py) exactness tests.

The kernel runs in interpreter mode here (CPU suite); the injected-randomness
mode makes it comparable bit-for-bit (to f32 tolerance) against the pure-JAX
twin and against an independent plain-leapfrog implementation built on
``lattice.u1.wilson_action``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.lattice import u1
from l2hmc_tpu.ops.leapfrog import hmc_chain_pallas, hmc_chain_reference


def _rand_inputs(key, n, b, lt, lx):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    links = jax.random.uniform(k1, (b, lt, lx, 2), minval=-np.pi,
                               maxval=np.pi)
    v0s = jax.random.normal(k2, (n, b, lt * lx))
    v1s = jax.random.normal(k3, (n, b, lt * lx))
    us = jax.random.uniform(k4, (n, b))
    return links, v0s, v1s, us


def test_kernel_matches_reference_twin(key):
    n, b, lt, lx = 3, 8, 4, 4
    links, v0s, v1s, us = _rand_inputs(key, n, b, lt, lx)
    out_k, plaq_k, chg_k, prob_k = hmc_chain_pallas(
        links, key, eps=0.1, beta=2.0, num_leapfrog=3, num_transitions=n,
        tile_b=4, interpret=True, rand_arrays=(v0s, v1s, us))
    out_r, plaq_r, chg_r, prob_r = hmc_chain_reference(
        links, v0s, v1s, us, eps=0.1, beta=2.0, num_leapfrog=3)
    np.testing.assert_allclose(out_k, out_r, atol=1e-5)
    np.testing.assert_allclose(plaq_k, plaq_r, atol=1e-5)
    np.testing.assert_allclose(chg_k, chg_r, atol=1e-5)
    np.testing.assert_allclose(prob_k, prob_r, atol=1e-5)


def test_reference_twin_matches_independent_leapfrog(key):
    """The twin's flat-lane plaquette/gradient formulas against an
    independent leapfrog built on ``u1.wilson_action`` + autodiff."""
    n, b, lt, lx = 2, 4, 4, 6
    links, v0s, v1s, us = _rand_inputs(key, n, b, lt, lx)
    eps, beta, K = 0.08, 1.7, 4

    shape = u1.LatticeShape(lt, lx)
    pot = u1.make_potential_fn(shape)
    grad = jax.grad(lambda x: jnp.sum(beta * pot(x)))

    x = links.reshape(b, -1)

    def flat_v(v0, v1):
        return jnp.stack(
            [v0.reshape(b, lt, lx), v1.reshape(b, lt, lx)], axis=-1
        ).reshape(b, -1)

    plaqs_exp, probs_exp = [], []
    for i in range(n):
        v = flat_v(v0s[i], v1s[i])
        h0 = beta * pot(x) + 0.5 * jnp.sum(v * v, axis=1)
        y, w = x, v - 0.5 * eps * grad(x)
        for k in range(K):
            y = u1.wrap(y + eps * w)
            c = eps if k < K - 1 else 0.5 * eps
            w = w - c * grad(y)
        h1 = beta * pot(y) + 0.5 * jnp.sum(w * w, axis=1)
        prob = jnp.exp(jnp.minimum(h0 - h1, 0.0))
        acc = (us[i] < prob)[:, None]
        x = jnp.where(acc, y, x)
        probs_exp.append(prob)
        plaqs_exp.append(u1.avg_plaquette(x.reshape(b, lt, lx, 2)))

    out_r, plaq_r, chg_r, prob_r = hmc_chain_reference(
        links, v0s, v1s, us, eps=eps, beta=beta, num_leapfrog=K)
    np.testing.assert_allclose(out_r.reshape(b, -1), x, atol=1e-4)
    np.testing.assert_allclose(prob_r, jnp.stack(probs_exp), atol=1e-4)
    np.testing.assert_allclose(plaq_r, jnp.stack(plaqs_exp), atol=1e-4)


def test_kernel_output_wrapped_and_finite(key):
    n, b, lt, lx = 4, 8, 4, 4
    links, v0s, v1s, us = _rand_inputs(key, n, b, lt, lx)
    out_k, plaq_k, chg_k, prob_k = hmc_chain_pallas(
        links, key, eps=0.15, beta=3.0, num_leapfrog=2, num_transitions=n,
        tile_b=8, interpret=True, rand_arrays=(v0s, v1s, us))
    assert bool(jnp.all(jnp.isfinite(out_k)))
    assert bool(jnp.all(jnp.abs(out_k) <= np.pi + 1e-5))
    assert bool(jnp.all((prob_k >= 0) & (prob_k <= 1)))


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="pltpu.prng_seed has no CPU lowering; the "
                           "in-kernel PRNG path is validated on-chip by "
                           "benchmarks/pallas_hmc.py")
def test_prng_mode_physics_tpu(key):
    """In-kernel PRNG path reaches the exact plaquette on a small lattice
    (statistical, coarse tolerance)."""
    b, lt, lx = 64, 4, 4
    beta = 2.0
    links = jnp.zeros((b, lt, lx, 2))
    out, plaqs, chgs, probs = hmc_chain_pallas(
        links, key, eps=0.3, beta=beta, num_leapfrog=4, num_transitions=200,
        tile_b=32)
    measured = float(jnp.mean(plaqs[100:]))
    exact = float(u1.u1_plaq_exact(beta))
    assert abs(measured - exact) < 0.03, (measured, exact)
    assert float(jnp.mean(probs)) > 0.5


def test_hop_kernel_matches_reference_twin(key):
    """Fused HMC+instanton-hop chain: kernel vs twin, bit-level."""
    n, b, lt, lx = 4, 8, 4, 4
    links, v0s, v1s, us = _rand_inputs(key, n, b, lt, lx)
    k5, k6 = jax.random.split(jax.random.fold_in(key, 5))
    nus = jax.random.rademacher(k5, (n, b)).astype(jnp.float32)
    uhs = jax.random.uniform(k6, (n, b))
    out_k, plaq_k, chg_k, prob_k = hmc_chain_pallas(
        links, key, eps=0.1, beta=2.0, num_leapfrog=3, num_transitions=n,
        tile_b=4, interpret=True, rand_arrays=(v0s, v1s, us, nus, uhs),
        hop=True)
    out_r, plaq_r, chg_r, prob_r = hmc_chain_reference(
        links, v0s, v1s, us, eps=0.1, beta=2.0, num_leapfrog=3,
        hop_arrays=(nus, uhs))
    np.testing.assert_allclose(out_k, out_r, atol=1e-5)
    np.testing.assert_allclose(plaq_k, plaq_r, atol=1e-5)
    np.testing.assert_allclose(chg_k, chg_r, atol=1e-5)
    np.testing.assert_allclose(prob_k, prob_r, atol=1e-5)


def test_hop_twin_carried_fields_match_recomputation(key):
    """The hop's closed-form field rotations (sin'/cos'/pot'/chg') must
    equal a fresh plaquette-field evaluation of the shifted state —
    otherwise subsequent transitions run on a corrupted carry."""
    from l2hmc_tpu.ops.leapfrog import (
        _hop_math, _potential_fields, _winding_flat,
    )
    import functools

    b, lt, lx = 8, 4, 6
    d = lt * lx
    links = jax.random.uniform(key, (b, lt, lx, 2), minval=-np.pi,
                               maxval=np.pi)
    x0 = links[..., 0].reshape(b, d)
    x1 = links[..., 1].reshape(b, d)
    s_col = (jax.lax.broadcasted_iota(jnp.int32, (b, d), 1) % lx)
    roll = functools.partial(jnp.roll, axis=1)
    pot, sinp, cosp, chg = _potential_fields(x0, x1, lx, s_col, roll)
    nu = jnp.array([1.0, -1.0] * 4)
    uh = jnp.zeros((b,))            # force accept
    w0f, w1f = _winding_flat(b, d, lt, lx)
    x0n, x1n, prob, potn, sinpn, cospn, chgn = _hop_math(
        x0, x1, pot, sinp, cosp, chg, nu, uh, 0.0, w0f, w1f)
    pot2, sinp2, cosp2, chg2 = _potential_fields(x0n, x1n, lx, s_col, roll)
    np.testing.assert_allclose(potn, pot2, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(sinpn, sinp2, atol=1e-5)
    np.testing.assert_allclose(cospn, cosp2, atol=1e-5)
    np.testing.assert_allclose(chgn, chg2, atol=1e-3)


def test_winding_flat_matches_topo_module():
    from l2hmc_tpu.dynamics import topo
    from l2hmc_tpu.ops.leapfrog import _winding_flat

    lt, lx = 6, 4
    shape = u1.LatticeShape(lt, lx)
    w = np.asarray(topo.winding_field(shape, 1)).reshape(lt, lx, 2)
    w0f, w1f = _winding_flat(1, lt * lx, lt, lx)
    np.testing.assert_allclose(np.asarray(w0f).reshape(lt, lx), w[..., 0],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(w1f).reshape(lt, lx), w[..., 1],
                               atol=1e-6)
