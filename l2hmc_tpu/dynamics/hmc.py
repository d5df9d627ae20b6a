"""Plain Hamiltonian Monte Carlo baseline.

Rebuild of ``HMC/hmc.py:6-150`` (numpy/TF hybrid) as a pure jitted JAX
kernel: standard leapfrog + MH accept, same potential/kinetic/hamiltonian
conventions as the learned sampler so ESS comparisons are apples-to-apples.
Also the building block for AIS (``utils/ais.py``) and SMC transitions.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

PotentialFn = Callable[[jax.Array], jax.Array]


class HMCOut(NamedTuple):
    x_out: jax.Array
    accept_prob: jax.Array
    accept_mask: jax.Array


def leapfrog(potential_fn: PotentialFn, x, v, beta, eps, num_steps: int):
    """Standard leapfrog: half-kick, K-1 full (drift,kick), drift, half-kick.

    Matches ``HMC/hmc.py:80-98``; vectorized over the chain batch.
    """
    grad = jax.grad(lambda x: jnp.sum(beta * potential_fn(x)))

    v = v - 0.5 * eps * grad(x)

    def body(carry, _):
        x, v = carry
        x = x + eps * v
        v = v - eps * grad(x)
        return (x, v), None

    (x, v), _ = jax.lax.scan(body, (x, v), None, length=num_steps - 1)
    x = x + eps * v
    v = v - 0.5 * eps * grad(x)
    return x, v


def hmc_transition(
    potential_fn: PotentialFn,
    x: jax.Array,
    beta,
    key: jax.Array,
    eps,
    num_steps: int,
) -> HMCOut:
    """One HMC transition for a batch of chains (``HMC/hmc.py:50-78``)."""
    kv, ka = jax.random.split(key)
    v = jax.random.normal(kv, x.shape, x.dtype)

    def hamiltonian(x, v):
        return beta * potential_fn(x) + 0.5 * jnp.sum(jnp.square(v), axis=-1)

    xp, vp = leapfrog(potential_fn, x, v, beta, eps, num_steps)
    dh = hamiltonian(x, v) - hamiltonian(xp, vp)
    prob = jnp.exp(jnp.minimum(dh, 0.0))
    prob = jnp.where(jnp.isfinite(prob), prob, jnp.zeros_like(prob))
    accept = (jax.random.uniform(ka, prob.shape) < prob).astype(x.dtype)
    x_out = accept[:, None] * xp + (1.0 - accept[:, None]) * x
    return HMCOut(x_out=x_out, accept_prob=prob, accept_mask=accept)


def hmc_chain_u1_fused(
    links: jax.Array,
    key: jax.Array,
    eps: float,
    beta: float,
    num_leapfrog: int,
    num_samples: int,
    hop: bool = False,
):
    """U(1) HMC chain on the fused Pallas leapfrog kernel (TPU hot path).

    ``links (B, Lt, Lx, 2)`` angles.  Returns ``(links_out, plaq_trace
    (T, B), charge_trace (T, B), accept_probs (T, B))`` — the whole chain
    runs inside ONE kernel with the state VMEM-resident
    (``ops/leapfrog.py``; measured 2.5x the XLA scan form at 2048 chains on
    the v5e).  ``hop=True`` appends one exact instanton hop per transition
    (``dynamics/topo.py`` semantics; near-free in-kernel — the winning
    topological-channel sampler at its fastest implementation tier).
    Falls back to the XLA scan off-TPU.
    """
    from l2hmc_tpu.dynamics import topo
    from l2hmc_tpu.lattice import u1
    from l2hmc_tpu.ops.leapfrog import hmc_chain_pallas

    if jax.default_backend() == "tpu":
        try:
            return hmc_chain_pallas(
                links, key, eps, beta, num_leapfrog, num_samples, hop=hop)
        except ValueError:
            pass  # chain state too large for VMEM -> XLA scan below
    b, lt, lx, _ = links.shape
    shape = u1.LatticeShape(lt, lx)
    pot = u1.make_potential_fn(shape)
    if not hop:
        xs, probs = hmc_chain(pot, links.reshape(b, -1), beta, key, eps,
                              num_leapfrog, num_samples, wrap_fn=u1.wrap)
        states = xs.reshape(num_samples * b, lt, lx, 2)
        plaqs = u1.avg_plaquette(states)
        charges = jnp.round(u1.topological_charge(states))
        return (xs[-1].reshape(b, lt, lx, 2),
                plaqs.reshape(num_samples, b),
                charges.reshape(num_samples, b), probs)

    def body(x, k):
        k1, k2 = jax.random.split(k)
        out = hmc_transition(pot, x, beta, k1, eps, num_leapfrog)
        h = topo.instanton_hop(u1.wrap(out.x_out), beta, k2, shape)
        st = u1.to_links(h.x_out, shape)
        return h.x_out, (u1.avg_plaquette(st),
                         jnp.round(u1.topological_charge(st)),
                         out.accept_prob)

    x_last, (plaqs, charges, probs) = jax.lax.scan(
        body, links.reshape(b, -1), jax.random.split(key, num_samples))
    return (x_last.reshape(b, lt, lx, 2), plaqs, charges, probs)


def hmc_chain(
    potential_fn: PotentialFn,
    x0: jax.Array,
    beta,
    key: jax.Array,
    eps,
    num_leapfrog: int,
    num_samples: int,
    wrap_fn: Callable[[jax.Array], jax.Array] | None = None,
):
    """Run ``num_samples`` HMC transitions under one ``lax.scan``.

    Returns ``(samples (T, batch, d), accept_probs (T, batch))``.  The whole
    chain stays on device; nothing crosses the host boundary per step
    (unlike the reference's per-step ``sess.run``, ``gauge_model.py:1379``).
    """

    def body(x, k):
        out = hmc_transition(potential_fn, x, beta, k, eps, num_leapfrog)
        x = out.x_out if wrap_fn is None else wrap_fn(out.x_out)
        return x, (x, out.accept_prob)

    keys = jax.random.split(key, num_samples)
    _, (xs, probs) = jax.lax.scan(body, x0, keys)
    return xs, probs
