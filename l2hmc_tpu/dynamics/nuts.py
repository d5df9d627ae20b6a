"""Multinomial HMC with randomized trajectory placement — the NUTS-class
baseline.

The reference's second baseline wraps an external library
(``HMC/tfp_hmc.py:28-125`` around tfp.mcmc).  A literal recursive NUTS is
hostile to XLA (dynamic tree shapes); naive "integrate until u-turn and pick
a state" is *not* reversible and measurably biases variances.  We use the
exactly-valid static scheme (Betancourt 2017, §A.3): per transition

1. draw a uniform split ``f ~ U{0..L}`` and integrate ``f`` leapfrog steps
   forward and ``L-f`` backward from the start point (one fixed-length
   trajectory containing the start at a uniformly-random offset),
2. select the next state from all ``L+1`` trajectory states with
   probability ``prop to exp(-H)`` (progressive multinomial under a scan).

Fixed shapes, one `lax.scan`, exact detailed balance.  Dual-averaging
step-size adaptation targets the mean Metropolis statistic.  The u-turn
fraction is reported as a diagnostic for choosing ``L``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

PotentialFn = Callable[[jax.Array], jax.Array]


class MultinomialHMCOut(NamedTuple):
    x_out: jax.Array
    accept_stat: jax.Array    # mean min(1, exp(H0-H)) over trajectory
    uturn_frac: jax.Array     # fraction of chains whose trajectory u-turned


def multinomial_hmc_transition(
    potential_fn: PotentialFn,
    x: jax.Array,
    beta,
    key: jax.Array,
    eps,
    num_steps: int = 16,
) -> MultinomialHMCOut:
    """One multinomial-HMC transition for a batch of chains."""
    kv, kf, ks = jax.random.split(key, 3)
    v0 = jax.random.normal(kv, x.shape, x.dtype)
    grad = jax.grad(lambda y: jnp.sum(beta * potential_fn(y)))

    def hamiltonian(x_, v_):
        return beta * potential_fn(x_) + 0.5 * jnp.sum(v_ * v_, axis=-1)

    batch = x.shape[0]
    h0 = hamiltonian(x, v0)
    # per-chain split point f in {0..L}: first f steps go forward (+eps),
    # remaining L-f steps continue backward (-eps) from the start state.
    f = jax.random.randint(kf, (batch,), 0, num_steps + 1)

    def leapfrog_step(x_, v_, direction):
        e = direction[:, None] * eps
        vh = v_ - 0.5 * e * grad(x_)
        xn = x_ + e * vh
        vn = vh - 0.5 * e * grad(xn)
        return xn, vn

    def body(carry, t):
        xc, vc, xb, vb, log_sum_w, x_sel, acc_sum, dot_min = carry
        forward = t < f  # (batch,) this step extends the forward branch
        direction = jnp.where(forward, 1.0, -1.0)
        # the backward branch starts from the initial state with flipped v
        x_in = jnp.where(forward[:, None], xc, xb)
        v_in = jnp.where(forward[:, None], vc, vb)
        xn, vn = leapfrog_step(x_in, v_in, direction)
        xc = jnp.where(forward[:, None], xn, xc)
        vc = jnp.where(forward[:, None], vn, vc)
        xb = jnp.where(forward[:, None], xb, xn)
        vb = jnp.where(forward[:, None], vb, vn)

        h = hamiltonian(xn, vn)
        log_w = h0 - h
        log_w = jnp.where(jnp.isfinite(log_w), log_w, -jnp.inf)
        new_log_sum = jnp.logaddexp(log_sum_w, log_w)
        take = (jax.random.uniform(jax.random.fold_in(ks, t), (batch,))
                < jnp.exp(log_w - new_log_sum))[:, None]
        x_sel = jnp.where(take, xn, x_sel)

        acc_sum = acc_sum + jnp.minimum(jnp.exp(h0 - h), 1.0)
        # u-turn diagnostic across the full span
        dot_min = jnp.minimum(dot_min, jnp.sum((xc - xb) * vn, axis=-1))
        return (xc, vc, xb, vb, new_log_sum, x_sel, acc_sum, dot_min), None

    init = (
        x, v0, x, -v0, jnp.zeros(batch), x, jnp.zeros(batch),
        jnp.full((batch,), jnp.inf),
    )
    (xc, vc, xb, vb, log_sum_w, x_sel, acc_sum, dot_min), _ = jax.lax.scan(
        body, init, jnp.arange(num_steps)
    )
    return MultinomialHMCOut(
        x_out=x_sel,
        accept_stat=acc_sum / num_steps,
        uturn_frac=jnp.mean((dot_min < 0).astype(jnp.float32)),
    )


# Back-compat aliases: this is the framework's "NUTS" baseline entry point.
nuts_transition = multinomial_hmc_transition
NUTSOut = MultinomialHMCOut


class DualAveragingState(NamedTuple):
    log_eps: jax.Array
    log_eps_avg: jax.Array
    h_bar: jax.Array
    t: jax.Array


def dual_averaging_init(eps0: float) -> DualAveragingState:
    return DualAveragingState(
        log_eps=jnp.log(jnp.asarray(eps0)),
        log_eps_avg=jnp.log(jnp.asarray(eps0)),
        h_bar=jnp.asarray(0.0),
        t=jnp.asarray(0.0),
    )


def dual_averaging_update(
    state: DualAveragingState,
    accept_stat: jax.Array,
    target: float = 0.7,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> DualAveragingState:
    """Nesterov dual averaging on log eps (Hoffman & Gelman 2014, Alg. 5)."""
    t = state.t + 1.0
    eta_h = 1.0 / (t + t0)
    h_bar = (1.0 - eta_h) * state.h_bar + eta_h * (target - jnp.mean(accept_stat))
    log_eps = state.log_eps_avg - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_eps_avg = eta * log_eps + (1.0 - eta) * state.log_eps_avg
    return DualAveragingState(log_eps=log_eps, log_eps_avg=log_eps_avg, h_bar=h_bar, t=t)


def nuts_chain(
    potential_fn: PotentialFn,
    x0: jax.Array,
    beta,
    key: jax.Array,
    num_samples: int,
    eps0: float = 0.1,
    max_steps: int = 16,
    adapt_steps: int = 0,
):
    """Multinomial-HMC chain with optional dual-averaging warmup.

    Returns ``(samples (T, batch, d), accept_stats (T, batch),
    uturn_fracs (T,))``.
    """

    def body(carry, inp):
        x, da = carry
        i, k = inp
        eps = jnp.exp(jnp.where(i < adapt_steps, da.log_eps, da.log_eps_avg))
        out = multinomial_hmc_transition(potential_fn, x, beta, k, eps, max_steps)
        da_new = dual_averaging_update(da, out.accept_stat)
        da = jax.tree.map(
            lambda a, b: jnp.where(i < adapt_steps, a, b), da_new, da
        )
        return (out.x_out, da), (out.x_out, out.accept_stat, out.uturn_frac)

    keys = jax.random.split(key, num_samples)
    (xf, da), (xs, acc, uturn) = jax.lax.scan(
        body, (x0, dual_averaging_init(eps0)), (jnp.arange(num_samples), keys)
    )
    return xs, acc, uturn
