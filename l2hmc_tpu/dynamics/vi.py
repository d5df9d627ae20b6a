"""Variational-inference baselines.

Not in the reference code, but required by the validation matrix
(BASELINE.json: "baseline HMC/NUTS/VI/SMC for validation"):

- :func:`fit_meanfield` — ADVI: diagonal-Gaussian q(x) trained by
  reparameterized ELBO ascent.  Gives a cheap moment/log-Z-lower-bound
  cross-check for any target energy.
- :func:`fit_fullrank` — full-rank Gaussian q via a Cholesky parameterization
  (exact for Gaussian targets like the SCG — recovers the covariance, which
  makes it an *oracle* check for that family).

Pure optax loops under one jitted scan; ELBO uses the standard entropy form
``E_q[-E(x)] + H[q]`` (the target need not be normalized; the learned ELBO
then lower-bounds ``log Z``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

EnergyFn = Callable[[jax.Array], jax.Array]


class MeanFieldParams(NamedTuple):
    mu: jax.Array
    log_sigma: jax.Array


class FullRankParams(NamedTuple):
    mu: jax.Array
    chol_raw: jax.Array  # lower triangle; diagonal passed through softplus


def _entropy_diag(log_sigma):
    d = log_sigma.shape[-1]
    return 0.5 * d * (1.0 + jnp.log(2 * jnp.pi)) + jnp.sum(log_sigma)


def fit_meanfield(
    energy_fn: EnergyFn,
    dim: int,
    key: jax.Array,
    num_steps: int = 2000,
    num_samples: int = 64,
    lr: float = 1e-2,
) -> Tuple[MeanFieldParams, jax.Array]:
    """ADVI with a diagonal Gaussian.  Returns (params, elbo_trace)."""
    params = MeanFieldParams(mu=jnp.zeros(dim), log_sigma=jnp.zeros(dim))
    tx = optax.adam(lr)

    def neg_elbo(p: MeanFieldParams, k):
        z = jax.random.normal(k, (num_samples, dim))
        x = p.mu + jnp.exp(p.log_sigma) * z
        return jnp.mean(energy_fn(x)) - _entropy_diag(p.log_sigma)

    def step(carry, k):
        p, opt = carry
        loss, g = jax.value_and_grad(neg_elbo)(p, k)
        updates, opt = tx.update(g, opt, p)
        return (optax.apply_updates(p, updates), opt), -loss

    (params, _), elbos = jax.lax.scan(
        step, (params, tx.init(params)), jax.random.split(key, num_steps)
    )
    return params, elbos


def _chol_from_raw(raw: jax.Array) -> jax.Array:
    tril = jnp.tril(raw, k=-1)
    diag = jax.nn.softplus(jnp.diagonal(raw)) + 1e-6
    return tril + jnp.diag(diag)


def fit_fullrank(
    energy_fn: EnergyFn,
    dim: int,
    key: jax.Array,
    num_steps: int = 3000,
    num_samples: int = 64,
    lr: float = 1e-2,
) -> Tuple[FullRankParams, jax.Array]:
    """Full-rank Gaussian VI.  Returns (params, elbo_trace)."""
    params = FullRankParams(mu=jnp.zeros(dim), chol_raw=jnp.eye(dim))
    tx = optax.adam(lr)

    def neg_elbo(p: FullRankParams, k):
        chol = _chol_from_raw(p.chol_raw)
        z = jax.random.normal(k, (num_samples, dim))
        x = p.mu + z @ chol.T
        entropy = (
            0.5 * dim * (1.0 + jnp.log(2 * jnp.pi))
            + jnp.sum(jnp.log(jnp.diagonal(chol)))
        )
        return jnp.mean(energy_fn(x)) - entropy

    def step(carry, k):
        p, opt = carry
        loss, g = jax.value_and_grad(neg_elbo)(p, k)
        updates, opt = tx.update(g, opt, p)
        return (optax.apply_updates(p, updates), opt), -loss

    (params, _), elbos = jax.lax.scan(
        step, (params, tx.init(params)), jax.random.split(key, num_steps)
    )
    return params, elbos


def meanfield_sample(params: MeanFieldParams, key, n: int) -> jax.Array:
    z = jax.random.normal(key, (n, params.mu.shape[-1]))
    return params.mu + jnp.exp(params.log_sigma) * z


def fullrank_sample(params: FullRankParams, key, n: int) -> jax.Array:
    chol = _chol_from_raw(params.chol_raw)
    z = jax.random.normal(key, (n, params.mu.shape[-1]))
    return params.mu + z @ chol.T


def fullrank_covariance(params: FullRankParams) -> jax.Array:
    chol = _chol_from_raw(params.chol_raw)
    return chol @ chol.T
