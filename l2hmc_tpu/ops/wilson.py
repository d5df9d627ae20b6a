"""Fused Wilson action + analytic gradient.

The hot inner loop of the gauge dynamics evaluates ``S(x)`` and ``dS/dx``
twice per leapfrog step (``dynamics/gauge_dynamics.py:698-709`` does it with
``tf.gradients``).  Autodiff of the roll/cos composition materializes a
transpose chain of rolls; but the gradient of the Wilson action is analytic
and *shares the plaquette computation with the forward pass*::

    P(t,x)        = u0 - u1 - roll(u0,-1,x) + roll(u1,-1,t)
    S             = sum(1 - cos P)
    dS/du0(t,x)   =  sin P(t,x) - sin P(t,x-1)
    dS/du1(t,x)   = -sin P(t,x) + sin P(t-1,x)

Two implementations behind one ``custom_vjp`` API:

- :func:`wilson_action` — pure-JAX forward with the analytic VJP (saves the
  ``sin P`` residual; backward is two rolls and two subtractions).  Default.
- :func:`wilson_action_pallas` — Pallas TPU kernel fusing plaq-sum, cos
  reduction, and the ``sin P`` residual in one VMEM pass over a batch block;
  backward kernel forms the gradient from the residual.  Wins once the
  lattice no longer fits neatly into fused XLA elementwise ops (large L).

Both are validated against each other and against autodiff in
``tests/test_ops.py``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _plaq_sums(u0: jax.Array, u1: jax.Array) -> jax.Array:
    return u0 - u1 - jnp.roll(u0, -1, axis=-1) + jnp.roll(u1, -1, axis=-2)


def _action_fwd_math(links: jax.Array):
    u0 = links[..., 0]
    u1 = links[..., 1]
    p = _plaq_sums(u0, u1)
    action = jnp.sum(1.0 - jnp.cos(p), axis=(-2, -1))
    return action, jnp.sin(p)


def _grad_from_sinp(sinp: jax.Array) -> jax.Array:
    """Analytic dS/dlinks from the sin-plaquette residual."""
    g0 = sinp - jnp.roll(sinp, 1, axis=-1)   # sin P(t,x) - sin P(t,x-1)
    g1 = -sinp + jnp.roll(sinp, 1, axis=-2)  # -sin P(t,x) + sin P(t-1,x)
    return jnp.stack([g0, g1], axis=-1)


@jax.custom_vjp
def wilson_action(links: jax.Array) -> jax.Array:
    """Total Wilson action per sample with analytic VJP.

    ``links (..., Lt, Lx, 2) -> (...,)``.  Drop-in for
    :func:`l2hmc_tpu.lattice.u1.wilson_action` on the training/sampling hot
    path.
    """
    action, _ = _action_fwd_math(links)
    return action


def _wilson_fwd(links):
    action, sinp = _action_fwd_math(links)
    return action, sinp


def _wilson_bwd(sinp, g):
    return (g[..., None, None, None] * _grad_from_sinp(sinp),)


wilson_action.defvjp(_wilson_fwd, _wilson_bwd)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _build_pallas_kernels(lt: int, lx: int, block_b: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def fwd_kernel(u0_ref, u1_ref, action_ref, sinp_ref):
        u0 = u0_ref[:]          # (block_b, lt, lx)
        u1 = u1_ref[:]
        # pltpu.roll requires non-negative shifts: -1 == size-1 (mod size)
        p = (
            u0
            - u1
            - pltpu.roll(u0, shift=lx - 1, axis=2)
            + pltpu.roll(u1, shift=lt - 1, axis=1)
        )
        sinp_ref[:] = jnp.sin(p)
        # per-sample action as a rank-2 (block_b, 1) block (rank-1 blocked
        # outputs are not supported by the TPU lowering)
        action_ref[:] = jnp.sum(1.0 - jnp.cos(p), axis=(1, 2))[:, None]

    def bwd_kernel(sinp_ref, g_ref, g0_ref, g1_ref):
        sinp = sinp_ref[:]
        g = g_ref[:]            # (block_b, 1) cotangent per sample
        gcol = g[:, :, None]
        g0_ref[:] = gcol * (sinp - pltpu.roll(sinp, shift=1, axis=2))
        g1_ref[:] = gcol * (-sinp + pltpu.roll(sinp, shift=1, axis=1))

    def fwd(u0, u1):
        b = u0.shape[0]
        grid = (b // block_b,)
        spec3 = pl.BlockSpec(
            (block_b, lt, lx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        spec2 = pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        action, sinp = pl.pallas_call(
            fwd_kernel,
            grid=grid,
            in_specs=[spec3, spec3],
            out_specs=(spec2, spec3),
            out_shape=(
                jax.ShapeDtypeStruct((b, 1), u0.dtype),
                jax.ShapeDtypeStruct(u0.shape, u0.dtype),
            ),
        )(u0, u1)
        return action[:, 0], sinp

    def bwd(sinp, g):
        b = sinp.shape[0]
        grid = (b // block_b,)
        spec3 = pl.BlockSpec(
            (block_b, lt, lx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        spec2 = pl.BlockSpec((block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            bwd_kernel,
            grid=grid,
            in_specs=[spec3, spec2],
            out_specs=(spec3, spec3),
            out_shape=(
                jax.ShapeDtypeStruct(sinp.shape, sinp.dtype),
                jax.ShapeDtypeStruct(sinp.shape, sinp.dtype),
            ),
        )(sinp, g.reshape(b, 1))

    return fwd, bwd


@functools.lru_cache(maxsize=None)
def _pallas_action_for(lt: int, lx: int, block_b: int):
    fwd_call, bwd_call = _build_pallas_kernels(lt, lx, block_b)

    @jax.custom_vjp
    def action(links):
        a, _ = _fwd(links)
        return a

    def _fwd(links):
        u0 = links[..., 0]
        u1 = links[..., 1]
        a, sinp = fwd_call(u0, u1)
        return a, sinp

    def _bwd(sinp, g):
        g0, g1 = bwd_call(sinp, g)
        return (jnp.stack([g0, g1], axis=-1),)

    action.defvjp(_fwd, _bwd)
    return action


def wilson_action_pallas(links: jax.Array, block_b: int = 8) -> jax.Array:
    """Pallas-fused Wilson action (TPU only); same contract as
    :func:`wilson_action`.  ``links (B, Lt, Lx, 2)`` with ``B % block_b == 0``.
    """
    b, lt, lx, _ = links.shape
    if b % block_b != 0:
        block_b = 1
    return _pallas_action_for(lt, lx, block_b)(links)


def make_potential_fn(shape, use_pallas: bool = False):
    """Flat-state potential ``U(x) -> per-sample S`` on the analytic-VJP path
    (drop-in for ``lattice.u1.make_potential_fn`` on the hot path)."""

    def potential(x: jax.Array) -> jax.Array:
        links = x.reshape(*x.shape[:-1], *shape.links_shape)
        if use_pallas:
            return wilson_action_pallas(links)
        return wilson_action(links)

    return potential
