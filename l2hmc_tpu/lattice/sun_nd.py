"""d-dimensional SU(N) lattice gauge fields (working 4-D SU(3) path).

The reference carries 4-D SU(3) *scaffolding* — random group elements and
Wilson/rectangle staple sums in ``lattice/gauge_generators.py:83-152`` (the
file truncates mid-function) and loop-based 4-D lattices in
``lattice/lattice_old.py:5-118`` with an incomplete ``hmc_update`` — but no
runnable d>2 path.  This module is the working generalization: link fields
``(B, L1, ..., Ld, d, N, N)`` over any dimension d, vectorized Wilson and
tree-level-Symanzik (rectangle-improved) actions, gauge transforms, and a
Lie-group HMC sampler, all batched and ``lax.scan``-resident.

Anchors:
- d=2 reduces exactly to :mod:`l2hmc_tpu.lattice.sun` (tested), where the
  Weyl-quadrature oracle ``sun_plaq_exact`` applies.
- any d, small beta: the strong-coupling expansion
  ``<Re tr P / N> = beta/4 + O(beta^3)`` for SU(2),
  ``beta/(2 N^2) + O(beta^2)`` for SU(N>=3)
  (leading order is dimension-independent; corrections are per-mille at
  beta <= 0.5).
- gauge invariance of every action term (exact by construction).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.lattice.sun import generators, random_sun


def _dag(m: jax.Array) -> jax.Array:
    return jnp.conjugate(jnp.swapaxes(m, -1, -2))


def _shift(a: jax.Array, mu: int, d: int, trailing: int, steps: int = 1) -> jax.Array:
    """Field value at ``n + steps * e_mu`` (periodic).

    ``trailing`` = number of non-spatial trailing axes (2 for matrix fields
    ``(..., N, N)``, 3 for link fields ``(..., d, N, N)``).
    """
    return jnp.roll(a, shift=-steps, axis=mu - d - trailing)


def num_dims(links: jax.Array) -> int:
    """Spacetime dimension d, read off the direction axis."""
    return links.shape[-3]


def random_links_nd(
    key: jax.Array, n: int, batch: int, dims: Sequence[int], scale: float = 0.5
) -> jax.Array:
    """Random near-identity SU(N) link field ``(batch, *dims, d, N, N)``."""
    return random_sun(key, n, (batch, *dims, len(dims)), scale=scale)


def plaq_field_nd(links: jax.Array, mu: int, nu: int) -> jax.Array:
    """Plaquette field in the (mu, nu) plane.

    ``P(n) = U_mu(n) U_nu(n+mu) U_mu(n+nu)^+ U_nu(n)^+`` — the matrix form
    of the staple products in ``gauge_generators.py:83-118``.
    Input ``(..., dims, d, N, N)``; output ``(..., dims, N, N)``.
    """
    d = num_dims(links)
    umu = links[..., mu, :, :]
    unu = links[..., nu, :, :]
    return (
        umu
        @ _shift(unu, mu, d, 2)
        @ _dag(_shift(umu, nu, d, 2))
        @ _dag(unu)
    )


def rect_field_nd(links: jax.Array, mu: int, nu: int) -> jax.Array:
    """2x1 rectangle field, long side along mu.

    ``R(n) = U_mu(n) U_mu(n+mu) U_nu(n+2mu) U_mu(n+mu+nu)^+ U_mu(n+nu)^+
    U_nu(n)^+`` — the loop the reference's rectangle-improved staples
    (``gauge_generators.py:119-152``) open up.
    """
    d = num_dims(links)
    umu = links[..., mu, :, :]
    unu = links[..., nu, :, :]
    umu_nu = _shift(umu, nu, d, 2)            # U_mu(n+nu)
    return (
        umu
        @ _shift(umu, mu, d, 2)
        @ _shift(unu, mu, d, 2, steps=2)
        @ _dag(_shift(umu_nu, mu, d, 2))
        @ _dag(umu_nu)
        @ _dag(unu)
    )


def _retr_over_n(p: jax.Array) -> jax.Array:
    n = p.shape[-1]
    return jnp.trace(p, axis1=-2, axis2=-1).real / n


def _site_sum(a: jax.Array, d: int) -> jax.Array:
    """Sum a per-site scalar field ``(B, *dims)`` over its d site axes."""
    return jnp.sum(a, axis=tuple(range(a.ndim - d, a.ndim)))


def wilson_action_nd(links: jax.Array, beta) -> jax.Array:
    """Wilson action ``beta sum_{mu<nu} sum_n (1 - Re tr P / N)`` per sample.

    Input ``(B, *dims, d, N, N)``; output ``(B,)``.
    """
    d = num_dims(links)
    s = 0.0
    for mu in range(d):
        for nu in range(mu + 1, d):
            s = s + _site_sum(1.0 - _retr_over_n(plaq_field_nd(links, mu, nu)), d)
    return beta * s


def improved_action_nd(links: jax.Array, beta, c1: float = -1.0 / 12.0) -> jax.Array:
    """Tree-level Symanzik-improved action, ``c0 = 1 - 8 c1``.

    Rectangle sum runs over ordered pairs (mu != nu): long-side-mu and
    long-side-nu rectangles are distinct loops.  ``c1 = 0`` reduces exactly
    to :func:`wilson_action_nd`.
    """
    c0 = 1.0 - 8.0 * c1
    d = num_dims(links)
    s = 0.0
    for mu in range(d):
        for nu in range(d):
            if nu <= mu:
                continue
            s = s + c0 * _site_sum(
                1.0 - _retr_over_n(plaq_field_nd(links, mu, nu)), d
            )
    if c1 != 0.0:
        for mu in range(d):
            for nu in range(d):
                if nu == mu:
                    continue
                s = s + c1 * _site_sum(
                    1.0 - _retr_over_n(rect_field_nd(links, mu, nu)), d
                )
    return beta * s


def avg_plaq_nd(links: jax.Array) -> jax.Array:
    """``<Re tr P / N>`` averaged over sites and planes, per sample."""
    d = num_dims(links)
    acc, cnt = 0.0, 0
    for mu in range(d):
        for nu in range(mu + 1, d):
            a = _retr_over_n(plaq_field_nd(links, mu, nu))
            acc = acc + jnp.mean(a, axis=tuple(range(a.ndim - d, a.ndim)))
            cnt += 1
    return acc / cnt


def gauge_transform_nd(links: jax.Array, g: jax.Array) -> jax.Array:
    """Local gauge transform ``U_mu(n) -> g(n) U_mu(n) g(n+mu)^+``.

    ``g``: ``(B, *dims, N, N)``.  Every closed-loop action is exactly
    invariant — the correctness tripwire for all loop code here.
    """
    d = num_dims(links)
    out = [
        g @ links[..., mu, :, :] @ _dag(_shift(g, mu, d, 2))
        for mu in range(d)
    ]
    return jnp.stack(out, axis=-3)


def sun_plaq_strong_coupling(n: int, beta: float) -> float:
    """Leading-order small-beta plaquette (any dimension).

    ``<Re tr P/N> = beta <(Re tr U)^2>_Haar / N^2`` with
    ``<(Re tr U)^2> = 1`` for SU(2) (tr U real; fund x fund contains one
    singlet) and ``1/2`` for SU(N>=3).
    """
    return beta / (n * n) if n == 2 else beta / (2.0 * n * n)


# ---------------------------------------------------------------------------
# Lie-group HMC in d dimensions (generalizes dynamics/sun_hmc.py)
# ---------------------------------------------------------------------------


def _algebra_to_matrix(theta: jax.Array, gens: jax.Array) -> jax.Array:
    return jnp.einsum("...k,kij->...ij", theta.astype(jnp.complex64), gens)


def _left_translate(links: jax.Array, theta: jax.Array, gens: jax.Array) -> jax.Array:
    # matmul-only exponential: generic expm's LU solve pads every tiny
    # N x N matrix to TPU tile size (measured 24 GB HBM for a 9 MB SU(3)
    # 8^4 field) — see ops/su_matrix.py
    from l2hmc_tpu.ops.su_matrix import expm_ih

    return expm_ih(_algebra_to_matrix(theta, gens)) @ links


def _reunitarize(u: jax.Array) -> jax.Array:
    from l2hmc_tpu.ops.su_matrix import polar_reunitarize

    return polar_reunitarize(u)


class SUNndHMCOut(NamedTuple):
    links: jax.Array
    accept_prob: jax.Array


def sun_nd_hmc_transition(
    links: jax.Array,
    key: jax.Array,
    eps,
    num_steps: int,
    action_fn: Callable[[jax.Array], jax.Array],
) -> SUNndHMCOut:
    """One HMC transition for ``(B, *dims, d, N, N)`` link fields.

    ``action_fn(links) -> (B,)`` is any gauge action (Wilson or improved);
    the force is the autodiff gradient with respect to left-translation
    coordinates at the identity — exact for any differentiable action, no
    hand-derived staples needed.
    """
    n = links.shape[-1]
    gens = generators(n)
    k = gens.shape[0]
    kv, ka = jax.random.split(key)
    pi = jax.random.normal(kv, links.shape[:-2] + (k,), jnp.float32)

    def kinetic(p):
        return 0.5 * jnp.sum(p * p, axis=tuple(range(1, p.ndim)))

    def force(u):
        def s_of_theta(theta):
            return jnp.sum(action_fn(_left_translate(u, theta, gens)))

        zero = jnp.zeros(u.shape[:-2] + (k,), jnp.float32)
        return jax.grad(s_of_theta)(zero)

    h0 = action_fn(links) + kinetic(pi)

    def leapfrog(carry, _):
        u, p = carry
        p = p - 0.5 * eps * force(u)
        u = _reunitarize(_left_translate(u, eps * p, gens))
        p = p - 0.5 * eps * force(u)
        return (u, p), None

    (u_new, pi_new), _ = jax.lax.scan(leapfrog, (links, pi), None, length=num_steps)

    h1 = action_fn(u_new) + kinetic(pi_new)
    prob = jnp.exp(jnp.minimum(h0 - h1, 0.0))
    prob = jnp.where(jnp.isfinite(prob), prob, jnp.zeros_like(prob))
    accept = jax.random.uniform(ka, prob.shape) < prob
    acc = accept.reshape(accept.shape + (1,) * (links.ndim - 1))
    return SUNndHMCOut(links=jnp.where(acc, u_new, links), accept_prob=prob)


# ---------------------------------------------------------------------------
# Real-pair forms: links as float32 (..., d, 2, N, N).  The TPU runtime in
# use rejects complex dtypes at execution time (even complex64 add), so the
# on-device representation is an explicit (re, im) channel pair — see
# ops/cmat.py.  These mirror the complex forms above one-for-one and are
# pinned equal by tests.
# ---------------------------------------------------------------------------


def random_links_nd_pairs(
    key: jax.Array, n: int, batch: int, dims: Sequence[int], scale: float = 0.5
) -> jax.Array:
    """Random near-identity pair link field ``(batch, *dims, d, 2, N, N)``.

    Complex-free init (``random_links_nd`` goes through the complex expm,
    which the TPU runtime rejects)."""
    from l2hmc_tpu.ops import cmat

    gp = cmat.gens_pair(n)
    k = gp.shape[0]
    theta = scale * jax.random.normal(key, (batch, *dims, len(dims), k))
    return cmat.cexpm(jnp.einsum("...k,kcij->...cij", theta, gp))


def plaq_field_nd_pairs(links: jax.Array, mu: int, nu: int) -> jax.Array:
    """Pair form of :func:`plaq_field_nd`; links ``(..., d, 2, N, N)``."""
    from l2hmc_tpu.ops import cmat

    d = links.shape[-4]
    umu = links[..., mu, :, :, :]
    unu = links[..., nu, :, :, :]
    return cmat.cmatmul(
        cmat.cmatmul(umu, _shift(unu, mu, d, 3)),
        cmat.cmatmul(cmat.cdag(_shift(umu, nu, d, 3)), cmat.cdag(unu)),
    )


def rect_field_nd_pairs(links: jax.Array, mu: int, nu: int) -> jax.Array:
    """Pair form of :func:`rect_field_nd`."""
    from l2hmc_tpu.ops import cmat

    d = links.shape[-4]
    umu = links[..., mu, :, :, :]
    unu = links[..., nu, :, :, :]
    umu_nu = _shift(umu, nu, d, 3)
    left = cmat.cmatmul(
        cmat.cmatmul(umu, _shift(umu, mu, d, 3)), _shift(unu, mu, d, 3, steps=2)
    )
    right = cmat.cmatmul(
        cmat.cmatmul(cmat.cdag(_shift(umu_nu, mu, d, 3)), cmat.cdag(umu_nu)),
        cmat.cdag(unu),
    )
    return cmat.cmatmul(left, right)


def wilson_action_nd_pairs(links: jax.Array, beta) -> jax.Array:
    """Pair form of :func:`wilson_action_nd`; links ``(B, *dims, d, 2, N, N)``."""
    from l2hmc_tpu.ops import cmat

    d = links.shape[-4]
    s = 0.0
    for mu in range(d):
        for nu in range(mu + 1, d):
            s = s + _site_sum(
                1.0 - cmat.retrace_over_n(plaq_field_nd_pairs(links, mu, nu)), d
            )
    return beta * s


def improved_action_nd_pairs(links: jax.Array, beta, c1: float = -1.0 / 12.0) -> jax.Array:
    """Pair form of :func:`improved_action_nd`."""
    from l2hmc_tpu.ops import cmat

    c0 = 1.0 - 8.0 * c1
    d = links.shape[-4]
    s = 0.0
    for mu in range(d):
        for nu in range(mu + 1, d):
            s = s + c0 * _site_sum(
                1.0 - cmat.retrace_over_n(plaq_field_nd_pairs(links, mu, nu)), d
            )
    if c1 != 0.0:
        for mu in range(d):
            for nu in range(d):
                if nu == mu:
                    continue
                s = s + c1 * _site_sum(
                    1.0 - cmat.retrace_over_n(rect_field_nd_pairs(links, mu, nu)), d
                )
    return beta * s


def avg_plaq_nd_pairs(links: jax.Array) -> jax.Array:
    """Pair form of :func:`avg_plaq_nd`."""
    from l2hmc_tpu.ops import cmat

    d = links.shape[-4]
    acc, cnt = 0.0, 0
    for mu in range(d):
        for nu in range(mu + 1, d):
            a = cmat.retrace_over_n(plaq_field_nd_pairs(links, mu, nu))
            acc = acc + jnp.mean(a, axis=tuple(range(a.ndim - d, a.ndim)))
            cnt += 1
    return acc / cnt


def _left_translate_pairs(links: jax.Array, theta: jax.Array, gens_pair: jax.Array) -> jax.Array:
    from l2hmc_tpu.ops import cmat

    h = jnp.einsum("...k,kcij->...cij", theta, gens_pair)
    return cmat.cmatmul(cmat.cexpm(h), links)


def sun_nd_hmc_transition_pairs(
    links: jax.Array,
    key: jax.Array,
    eps,
    num_steps: int,
    action_fn: Callable[[jax.Array], jax.Array],
) -> SUNndHMCOut:
    """Pair form of :func:`sun_nd_hmc_transition`; links ``(B, ..., d, 2, N, N)``."""
    from l2hmc_tpu.ops import cmat

    n = links.shape[-1]
    gp = cmat.gens_pair(n)
    k = gp.shape[0]
    kv, ka = jax.random.split(key)
    pi = jax.random.normal(kv, links.shape[:-3] + (k,), jnp.float32)

    def kinetic(p):
        return 0.5 * jnp.sum(p * p, axis=tuple(range(1, p.ndim)))

    def force(u):
        def s_of_theta(theta):
            return jnp.sum(action_fn(_left_translate_pairs(u, theta, gp)))

        zero = jnp.zeros(u.shape[:-3] + (k,), jnp.float32)
        return jax.grad(s_of_theta)(zero)

    h0 = action_fn(links) + kinetic(pi)

    def leapfrog(carry, _):
        u, p = carry
        p = p - 0.5 * eps * force(u)
        u = cmat.polar_reunitarize(_left_translate_pairs(u, eps * p, gp))
        p = p - 0.5 * eps * force(u)
        return (u, p), None

    (u_new, pi_new), _ = jax.lax.scan(leapfrog, (links, pi), None, length=num_steps)

    h1 = action_fn(u_new) + kinetic(pi_new)
    prob = jnp.exp(jnp.minimum(h0 - h1, 0.0))
    prob = jnp.where(jnp.isfinite(prob), prob, jnp.zeros_like(prob))
    accept = jax.random.uniform(ka, prob.shape) < prob
    acc = accept.reshape(accept.shape + (1,) * (links.ndim - 1))
    return SUNndHMCOut(links=jnp.where(acc, u_new, links), accept_prob=prob)


def sun_nd_hmc_chain(
    key: jax.Array,
    n: int,
    dims: Sequence[int],
    beta,
    num_samples: int,
    batch: int = 8,
    eps: float = 0.1,
    num_steps: int = 5,
    c1: float = 0.0,
    real_pairs: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Scan-resident d-dimensional SU(N) HMC chain.

    Returns ``(plaq_trace (num_samples, batch), accept_probs)``.
    ``c1 != 0`` samples the rectangle-improved action.  ``real_pairs=True``
    runs the float32 (re, im) pair representation — required on TPU
    runtimes without complex-dtype support, and pinned statistically equal
    to the complex form by tests.
    """
    from l2hmc_tpu.ops import cmat

    k0, key = jax.random.split(key)
    if real_pairs:
        links = random_links_nd_pairs(k0, n, batch, dims, scale=0.5)
        if c1 != 0.0:
            action_fn = lambda u: improved_action_nd_pairs(u, beta, c1)
        else:
            action_fn = lambda u: wilson_action_nd_pairs(u, beta)
        transition, avg_plaq = sun_nd_hmc_transition_pairs, avg_plaq_nd_pairs
    else:
        links = random_links_nd(k0, n, batch, dims, scale=0.5)
        if c1 != 0.0:
            action_fn = lambda u: improved_action_nd(u, beta, c1)
        else:
            action_fn = lambda u: wilson_action_nd(u, beta)
        transition, avg_plaq = sun_nd_hmc_transition, avg_plaq_nd

    def body(u, kk):
        out = transition(u, kk, eps, num_steps, action_fn)
        return out.links, (avg_plaq(out.links), out.accept_prob)

    keys = jax.random.split(key, num_samples)
    _, (plaqs, probs) = jax.lax.scan(body, links, keys)
    return plaqs, probs
