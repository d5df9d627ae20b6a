"""2-D Ising model with checkerboard Metropolis MCMC.

Rebuild of ``lattice/ising_lattice.py:6-169`` (site-flip Metropolis +
energy-function API), vectorized: the reference flips one random site per
step in python; here a full checkerboard half-sweep updates every same-color
site at once (exact, since the Ising interaction is nearest-neighbor).

Also exposes the continuous-relaxation energy on {-1,+1}-valued tensors so
the L2HMC dynamics can target it like any other energy function (the
reference only uses the Ising lattice from a notebook).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def ising_energy(spins: jax.Array, j: float = 1.0) -> jax.Array:
    """Total energy ``-J sum_<ij> s_i s_j`` on a periodic square lattice.

    ``spins (..., L, L)``; returns ``(...,)``.
    """
    right = jnp.roll(spins, -1, axis=-1)
    down = jnp.roll(spins, -1, axis=-2)
    return -j * jnp.sum(spins * (right + down), axis=(-2, -1))


def magnetization(spins: jax.Array) -> jax.Array:
    return jnp.mean(spins, axis=(-2, -1))


def make_energy_fn(l: int, j: float = 1.0):
    """Flat-state energy for the dynamics: ``x (batch, L*L) -> (batch,)``
    (API parity with ``ising_lattice.py:73-76``).  Accepts continuous x,
    interpreting it as soft spins."""

    def energy(x: jax.Array) -> jax.Array:
        return ising_energy(x.reshape(*x.shape[:-1], l, l), j)

    return energy


def metropolis_half_sweep(
    spins: jax.Array, beta, key: jax.Array, color: int
) -> jax.Array:
    """Update all sites of one checkerboard color simultaneously."""
    l1, l2 = spins.shape[-2], spins.shape[-1]
    ii = jax.lax.broadcasted_iota(jnp.int32, (l1, l2), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (l1, l2), 1)
    mask = (ii + jj) % 2 == color
    # local field = sum of 4 neighbors
    nb = (
        jnp.roll(spins, 1, axis=-1)
        + jnp.roll(spins, -1, axis=-1)
        + jnp.roll(spins, 1, axis=-2)
        + jnp.roll(spins, -1, axis=-2)
    )
    delta_e = 2.0 * spins * nb  # energy change of flipping s -> -s (J=1)
    u = jax.random.uniform(key, spins.shape)
    accept = (u < jnp.exp(jnp.minimum(-beta * delta_e, 0.0))) & mask
    return jnp.where(accept, -spins, spins)


def metropolis_sweep(spins: jax.Array, beta, key: jax.Array) -> jax.Array:
    k0, k1 = jax.random.split(key)
    spins = metropolis_half_sweep(spins, beta, k0, 0)
    spins = metropolis_half_sweep(spins, beta, k1, 1)
    return spins


def ising_chain(
    key: jax.Array, l: int, beta, num_sweeps: int, batch: int = 1
) -> Tuple[jax.Array, jax.Array]:
    """Scan-resident chain; returns (energy, |magnetization|) traces."""
    k0, key = jax.random.split(key)
    spins = jnp.where(
        jax.random.uniform(k0, (batch, l, l)) > 0.5, 1.0, -1.0
    )

    def body(spins, k):
        spins = metropolis_sweep(spins, beta, k)
        return spins, (ising_energy(spins), jnp.abs(magnetization(spins)))

    keys = jax.random.split(key, num_sweeps)
    _, (e, m) = jax.lax.scan(body, spins, keys)
    return e, m
