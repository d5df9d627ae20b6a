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


def _build_pallas_kernels(lt: int, lx: int, block_b: int, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _shift_m1(a, axis):
        """roll(a, -1, axis) via static slice+concat (Mosaic's roll op
        SIGABRTs on 3-D blocks; slices lower cleanly)."""
        n = a.shape[axis]
        hi = jax.lax.slice_in_dim(a, 1, n, axis=axis)
        lo = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        return jnp.concatenate([hi, lo], axis=axis)

    def _shift_p1(a, axis):
        n = a.shape[axis]
        hi = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
        lo = jax.lax.slice_in_dim(a, 0, n - 1, axis=axis)
        return jnp.concatenate([hi, lo], axis=axis)

    def fwd_kernel(u0_ref, u1_ref, action_ref, sinp_ref):
        u0 = u0_ref[:]          # (block_b, lt, lx)
        u1 = u1_ref[:]
        p = u0 - u1 - _shift_m1(u0, 2) + _shift_m1(u1, 1)
        sinp_ref[:] = jnp.sin(p)
        # reduce over the time axis only: full-rank (block_b, lx) output
        # (the Mosaic compiler aborts on (b, 1)-shaped reduce outputs); the
        # final lane reduction happens outside the kernel.
        action_ref[:] = jnp.sum(1.0 - jnp.cos(p), axis=1)

    def bwd_kernel(sinp_ref, g_ref, g0_ref, g1_ref):
        sinp = sinp_ref[:]
        g = g_ref[:]            # (block_b, lx) lane-broadcast cotangent
        # slice (not gather): Mosaic rejects integer-index gathers here
        gcol = jax.lax.slice_in_dim(g, 0, 1, axis=1)[:, :, None]
        g0_ref[:] = gcol * (sinp - _shift_p1(sinp, 2))
        g1_ref[:] = gcol * (-sinp + _shift_p1(sinp, 1))

    def fwd(u0, u1):
        b = u0.shape[0]
        grid = (b // block_b,)
        spec3 = pl.BlockSpec(
            (block_b, lt, lx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        spec2 = pl.BlockSpec((block_b, lx), lambda i: (i, 0), memory_space=pltpu.VMEM)
        row_action, sinp = pl.pallas_call(
            fwd_kernel,
            interpret=interpret,
            grid=grid,
            in_specs=[spec3, spec3],
            out_specs=(spec2, spec3),
            out_shape=(
                jax.ShapeDtypeStruct((b, lx), u0.dtype),
                jax.ShapeDtypeStruct(u0.shape, u0.dtype),
            ),
        )(u0, u1)
        return jnp.sum(row_action, axis=-1), sinp

    def bwd(sinp, g):
        b = sinp.shape[0]
        grid = (b // block_b,)
        spec3 = pl.BlockSpec(
            (block_b, lt, lx), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        spec2 = pl.BlockSpec((block_b, lx), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            bwd_kernel,
            interpret=interpret,
            grid=grid,
            in_specs=[spec3, spec2],
            out_specs=(spec3, spec3),
            out_shape=(
                jax.ShapeDtypeStruct(sinp.shape, sinp.dtype),
                jax.ShapeDtypeStruct(sinp.shape, sinp.dtype),
            ),
        )(sinp, jnp.broadcast_to(g[:, None], (b, lx)))

    return fwd, bwd


@functools.lru_cache(maxsize=None)
def _pallas_action_for(lt: int, lx: int, block_b: int, interpret: bool = False):
    fwd_call, bwd_call = _build_pallas_kernels(lt, lx, block_b, interpret)

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


def wilson_action_pallas(
    links: jax.Array, block_b: int = 0, interpret: bool = False
) -> jax.Array:
    """Pallas-fused Wilson action; same contract as :func:`wilson_action`.
    ``links (B, Lt, Lx, 2)``.

    ``block_b=0`` auto-sizes the batch block to keep each VMEM buffer
    around 1 MB (the kernel holds ~6 live (block_b, Lt, Lx) buffers).
    ``interpret=True`` runs the kernel in the Pallas interpreter (any
    backend) — used by the test suite.

    STATUS: compiles and matches on TPU (the slice-based shift and
    full-rank-output patterns avoid the Mosaic lowering crashes hit by
    roll/narrow-reduce forms).  Measured scan-resident at (1024, 16, 16, 2):
    141 us per value+grad for the analytic-VJP XLA form vs 255 us for this
    kernel — XLA's fusion of the rolls/trig with neighboring scan-body ops
    beats a standalone hand kernel at these sizes, so the XLA form stays
    the production hot path and this kernel is kept as the large-L
    fallback and as executable documentation of the fusion pattern.
    """
    b, lt, lx, _ = links.shape
    if block_b <= 0:
        block_b = max(1, min(8, (1 << 20) // (lt * lx * 4)))
    while b % block_b != 0 and block_b > 1:
        block_b -= 1
    return _pallas_action_for(lt, lx, block_b, interpret)(links)


def make_potential_fn(shape, use_pallas: bool = False):
    """Flat-state potential ``U(x) -> per-sample S`` on the analytic-VJP path
    (drop-in for ``lattice.u1.make_potential_fn`` on the hot path)."""

    def potential(x: jax.Array) -> jax.Array:
        links = x.reshape(*x.shape[:-1], *shape.links_shape)
        if use_pallas:
            return wilson_action_pallas(links)
        return wilson_action(links)

    return potential
