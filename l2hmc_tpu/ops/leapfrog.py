"""Fused Pallas leapfrog-trajectory kernel for U(1) HMC.

The BASELINE north star asks for "the dynamics as fused Pallas leapfrog
kernels".  The first Pallas attempt (``ops/wilson.py``) fused only the
action/gradient and measured *slower* than XLA — a standalone kernel cannot
beat XLA's fusion of the same ops into the surrounding scan body, and its
``(b, 16, 16)`` blocks drive the 8x128 VPU at 16/128 lane occupancy.

This kernel attacks the real cost instead: the whole sampling *chain*.  One
``pallas_call`` runs ``num_transitions`` complete HMC transitions — each
K leapfrog steps of the Wilson-action gradient flow (analytic gradient, the
same formulas as ``ops/wilson.py``), the mod-2pi wrap, the Hamiltonian
bookkeeping, and the MH accept — with the chain state resident in VMEM
throughout.  HBM sees the initial state once, the final state once, and one
(num_transitions, chains) observable row per transition.  The XLA form
(``dynamics/hmc.py hmc_chain``) round-trips the carry through HBM and
launches several fusions per transition; at 16x16 that path is
launch-latency-bound, which is exactly what a monolithic kernel removes.

TPU-first layout: links are flat ``(chains, Lt*Lx)`` per direction — full
128-lane occupancy (vs 16/128 for the naive ``(b, Lt, Lx)`` blocks).  The
lattice ``roll``s become lane rotations: a time-roll is an exact global
rotation by ``Lx`` (row-major flattening makes the t-wrap coincide with the
array wrap) and a space-roll is a rotation by 1 corrected at the ``s``-row
boundary with a second rotation and a column-mask select.

Randomness: momenta and accept uniforms are generated in-kernel
(``pltpu.prng_random_bits`` + Box-Muller), seeded per call and per grid
program.  For exactness tests the kernel also takes a ``rand="input"`` mode
where all randomness is passed in as arrays; the pure-JAX twin
:func:`hmc_chain_reference` consumes the same arrays, so the kernel is
testable bit-for-bit (to float tolerance) on CPU via ``interpret=True``.

Reference semantics covered: plain-HMC transition = ``HMC/hmc.py:50-98``
(also the ``hmc=True`` degeneration of ``dynamics/gauge_dynamics.py``, whose
zero-net leapfrog reduces to exactly this integrator); Wilson action =
``lattice/lattice.py:300-313``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TWO_PI = 2.0 * np.pi


# ---------------------------------------------------------------------------
# Shared math on flat (batch, Lt*Lx) link arrays.
#
# Row-major flat index i = t * Lx + s.  ``roll`` is any function with
# jnp.roll(a, k, axis=1) semantics; the kernel passes a Mosaic-friendly
# implementation, the reference twin passes jnp.roll itself.
# ---------------------------------------------------------------------------


def _roll_t(a, k, lx, roll):
    """roll(links, k, axis=time): exact global lane rotation by k*Lx."""
    return roll(a, k * lx)


def _roll_s(a, k, lx, s_col, roll):
    """roll(links, k, axis=space) for k in {-1, +1}: lane rotation by k,
    corrected at the s-row boundary (the global wrap crosses into the
    neighboring t-row there)."""
    if k == -1:
        fix = roll(a, lx - 1)
        return jnp.where(s_col == lx - 1, fix, roll(a, -1))
    if k == 1:
        fix = roll(a, -(lx - 1))
        return jnp.where(s_col == 0, fix, roll(a, 1))
    raise ValueError(k)


def _plaq_flat(u0, u1, lx, s_col, roll):
    """P = u0 - u1 - roll(u0,-1,s) + roll(u1,-1,t)  (ops/wilson.py:37-38)."""
    return u0 - u1 - _roll_s(u0, -1, lx, s_col, roll) + _roll_t(u1, -1, lx, roll)


def _grad_flat(sinp, lx, s_col, roll):
    """dS/du0 = sinP - roll(sinP,+1,s); dS/du1 = -sinP + roll(sinP,+1,t)."""
    g0 = sinp - _roll_s(sinp, 1, lx, s_col, roll)
    g1 = -sinp + _roll_t(sinp, 1, lx, roll)
    return g0, g1


def _wrap(x):
    return x - _TWO_PI * jnp.floor((x + np.pi) / _TWO_PI)


def _potential_fields(y0, y1, lx, s_col, roll):
    """Plaquette-field stats in one pass: potential, sine AND cosine
    fields, and the (unrounded) topological charge ``Q = sum(wrap(P)) /
    2pi`` (``lattice/u1.py topological_charge``).  The cosine field is
    the hop-chain carry (see :func:`_hop_math`); plain chains drop it."""
    p = _plaq_flat(y0, y1, lx, s_col, roll)
    chg = jnp.sum(_wrap(p), axis=1) * (1.0 / _TWO_PI)
    cosp = jnp.cos(p)
    return jnp.sum(1.0 - cosp, axis=1), jnp.sin(p), cosp, chg


def _potential_and_sinp(y0, y1, lx, s_col, roll):
    """Back-compat 3-tuple form of :func:`_potential_fields`."""
    pot, sinp, _, chg = _potential_fields(y0, y1, lx, s_col, roll)
    return pot, sinp, chg


def _winding_flat(rows, d, lt, lx):
    """Flat winding-1 field halves ``(rows, d)`` (dynamics/topo.py
    winding_field, lane layout): ``w1 = delta * t``; ``w0`` nonzero only
    on the seam row ``t = lt-1`` where it is ``-delta * lt * s``.  Pure
    iota arithmetic — computable inside the kernel, f32-exact (integer
    values < 2^24)."""
    delta0 = _TWO_PI / d
    # int32 iota + convert: Mosaic lowers no f32 tpu.iota
    i_f = jax.lax.broadcasted_iota(jnp.int32, (rows, d), 1).astype(jnp.float32)
    s_f = i_f - lx * jnp.floor(i_f * (1.0 / lx))
    t_f = (i_f - s_f) * (1.0 / lx)
    w1 = delta0 * t_f
    w0 = jnp.where(t_f == float(lt - 1), -delta0 * lt * s_f,
                   jnp.zeros_like(s_f))
    return w0, w1


def _hop_math(x0, x1, pot, sinp, cosp, chg, nu, u_h, beta, w0f, w1f):
    """One exact instanton hop on carried plaquette fields — NO plaquette
    pass (dynamics/topo.py semantics, fused form).

    Everything the Metropolis test needs is already in hand: with the
    uniform shift ``delta = 2 pi nu / d`` (mod 2 pi at the seam corner),
    ``dS = (1 - cos d0)(d - pot) + nu sin d0 sum(sinp)``.  On accept the
    links shift by ``nu w`` and the carried fields rotate in closed form:
    ``sin' = sin cos d + cos sin d``, ``cos' = cos cos d - sin sin d``,
    ``pot' = pot + dS``, and the charge updates by ``nu`` minus the exact
    count of plaquettes pushed across the +-pi branch cut
    (``cos P < -cos d0`` on the ``nu``-side half-plane).
    """
    d = x0.shape[1]
    cd = float(np.cos(_TWO_PI / d))
    sd = float(np.sin(_TWO_PI / d))
    ds = (1.0 - cd) * (d - pot) + nu * sd * jnp.sum(sinp, axis=1)
    prob = jnp.exp(jnp.minimum(-beta * ds, 0.0))
    prob = jnp.where(jnp.isfinite(prob), prob, jnp.zeros_like(prob))
    acc = (u_h < prob).astype(x0.dtype)
    an = acc * nu                                # signed accepted winding
    an_col = an[:, None]
    x0 = _wrap(x0 + an_col * w0f)
    x1 = _wrap(x1 + an_col * w1f)
    cda = 1.0 + acc * (cd - 1.0)                 # cos(delta*|an|)
    sda = an * sd                                # sin(delta*an)
    sinp_new = sinp * cda[:, None] + cosp * sda[:, None]
    cosp_new = cosp * cda[:, None] - sinp * sda[:, None]
    pot_new = pot + acc * ds
    n_b = jnp.sum(
        ((cosp < -cd) & (nu[:, None] * sinp >= 0.0)).astype(x0.dtype),
        axis=1)
    chg_new = chg + an * (1.0 - n_b)
    return x0, x1, prob, pot_new, sinp_new, cosp_new, chg_new


def _transition_math(x0, x1, v0, v1, u, eps, beta, num_leapfrog, lx,
                     s_col, roll, pot0=None, sinp=None, chg0=None,
                     cosp=None):
    """One full HMC transition on flat link arrays; pure function of its
    inputs, usable inside the kernel and in the pure-JAX reference twin.

    ``pot0``/``sinp``/``chg0`` optionally inject the potential,
    plaquette-sine field, and charge of the INPUT state (all are in hand at
    the end of the previous transition's accept step — carrying them saves
    one of the K+1 plaquette+trig evaluations per transition; the carried
    values are bit-identical to recomputation, they were produced by the
    same ops at the same point).  ``cosp`` additionally carries the cosine
    field for hop chains (:func:`_hop_math`); when given the return tuple
    grows by ``cosp_out``.

    Returns ``(x0', x1', accept_prob, avg_plaq_of_output, pot_out,
    sinp_out, chg_out[, cosp_out])``.
    """
    n_plaq = x0.shape[1]
    track_cosp = cosp is not None

    if pot0 is None:
        pot0, sinp, cosp0, chg0 = _potential_fields(x0, x1, lx, s_col, roll)
        if track_cosp:
            cosp = cosp0
    ke0 = 0.5 * (jnp.sum(v0 * v0, axis=1) + jnp.sum(v1 * v1, axis=1))

    g0, g1 = _grad_flat(sinp, lx, s_col, roll)
    w0 = v0 - 0.5 * eps * beta * g0
    w1 = v1 - 0.5 * eps * beta * g1
    y0, y1 = x0, x1
    pot1, sinp1, cosp1, chg1 = pot0, sinp, cosp, chg0  # overwritten in loop
    for k in range(num_leapfrog):
        y0 = _wrap(y0 + eps * w0)
        y1 = _wrap(y1 + eps * w1)
        pot1, sinp1, cosp1, chg1 = _potential_fields(y0, y1, lx, s_col, roll)
        g0, g1 = _grad_flat(sinp1, lx, s_col, roll)
        c = eps if k < num_leapfrog - 1 else 0.5 * eps
        w0 = w0 - c * beta * g0
        w1 = w1 - c * beta * g1
    ke1 = 0.5 * (jnp.sum(w0 * w0, axis=1) + jnp.sum(w1 * w1, axis=1))

    dh = (beta * pot0 + ke0) - (beta * pot1 + ke1)
    prob = jnp.exp(jnp.minimum(dh, 0.0))
    prob = jnp.where(jnp.isfinite(prob), prob, jnp.zeros_like(prob))
    # arithmetic 0/1 blend: Mosaic cannot minor-dim-broadcast i1 vectors
    acc = (u < prob).astype(x0.dtype)
    acc_col = acc[:, None]
    x0 = acc_col * y0 + (1.0 - acc_col) * x0
    x1 = acc_col * y1 + (1.0 - acc_col) * x1
    # output state's potential / sine field / charge: all already in hand
    pot_out = acc * pot1 + (1.0 - acc) * pot0
    sinp_out = acc_col * sinp1 + (1.0 - acc_col) * sinp
    chg_out = acc * chg1 + (1.0 - acc) * chg0
    avg_plaq = 1.0 - pot_out / n_plaq
    if track_cosp:
        cosp_out = acc_col * cosp1 + (1.0 - acc_col) * cosp
        return x0, x1, prob, avg_plaq, pot_out, sinp_out, chg_out, cosp_out
    return x0, x1, prob, avg_plaq, pot_out, sinp_out, chg_out


# ---------------------------------------------------------------------------
# Pure-JAX reference twin (tests): same math, explicit randomness.
# ---------------------------------------------------------------------------


def hmc_chain_reference(links, v0s, v1s, us, eps, beta, num_leapfrog,
                        hop_arrays=None):
    """Run ``N = v0s.shape[0]`` transitions with injected randomness.

    ``links (B, Lt, Lx, 2)``; ``v0s/v1s (N, B, Lt*Lx)``; ``us (N, B)``.
    ``hop_arrays=(nus, uhs)`` (each ``(N, B)``, nus in {+1,-1}) appends one
    exact instanton hop (:func:`_hop_math`) after every transition.
    Returns ``(links_out, plaq_trace (N, B), charge_trace (N, B),
    prob_trace (N, B))``; charges are rounded to integer sectors.
    """
    b, lt, lx, _ = links.shape
    d = lt * lx
    s_col = (jax.lax.broadcasted_iota(jnp.int32, (b, d), 1) % lx)
    roll = functools.partial(jnp.roll, axis=1)
    x0 = links[..., 0].reshape(b, d)
    x1 = links[..., 1].reshape(b, d)

    pot, sinp, cosp, chg = _potential_fields(x0, x1, lx, s_col, roll)

    if hop_arrays is None:
        def body(carry, rand):
            x0, x1, pot, sinp, chg = carry
            v0, v1, u = rand
            x0, x1, prob, plaq, pot, sinp, chg = _transition_math(
                x0, x1, v0, v1, u, eps, beta, num_leapfrog, lx, s_col, roll,
                pot0=pot, sinp=sinp, chg0=chg)
            return (x0, x1, pot, sinp, chg), (plaq, chg, prob)

        (x0, x1, _, _, _), (plaqs, chgs, probs) = jax.lax.scan(
            body, (x0, x1, pot, sinp, chg), (v0s, v1s, us))
    else:
        nus, uhs = hop_arrays
        w0f, w1f = _winding_flat(b, d, lt, lx)

        def body(carry, rand):
            x0, x1, pot, sinp, cosp, chg = carry
            v0, v1, u, nu, uh = rand
            x0, x1, prob, plaq, pot, sinp, chg, cosp = _transition_math(
                x0, x1, v0, v1, u, eps, beta, num_leapfrog, lx, s_col, roll,
                pot0=pot, sinp=sinp, chg0=chg, cosp=cosp)
            x0, x1, _, pot, sinp, cosp, chg = _hop_math(
                x0, x1, pot, sinp, cosp, chg, nu, uh, beta, w0f, w1f)
            plaq = 1.0 - pot / d
            return (x0, x1, pot, sinp, cosp, chg), (plaq, chg, prob)

        (x0, x1, _, _, _, _), (plaqs, chgs, probs) = jax.lax.scan(
            body, (x0, x1, pot, sinp, cosp, chg), (v0s, v1s, us, nus, uhs))
    out = jnp.stack([x0.reshape(b, lt, lx), x1.reshape(b, lt, lx)], axis=-1)
    return out, plaqs, jnp.round(chgs), probs


# ---------------------------------------------------------------------------
# The fused kernel.
# ---------------------------------------------------------------------------


def _uniform_from_bits(bits):
    """uint32 -> float32 uniform in (0, 1): 24-bit mantissa, never 0.

    The shifted value fits in 24 bits, so the int32 round-trip is exact
    (Mosaic has no uint32->f32 cast).
    """
    i24 = (bits >> 8).astype(jnp.int32)
    return i24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _normal_pair(shape):
    """Box-Muller normals from the in-kernel PRNG: one uniform pair yields
    TWO exactly independent standard-normal arrays (cos and sin halves)."""
    from jax.experimental.pallas import tpu as pltpu

    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = _uniform_from_bits(b1)
    u2 = _uniform_from_bits(b2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2), r * jnp.sin(_TWO_PI * u2)


def _build_chain_kernel(lt, lx, num_leapfrog, num_transitions, tile_b,
                        rand, interpret, hop=False, sub_layout=False):
    """``sub_layout=True`` stores traces as ``(G, N, tile_b)`` blocks —
    tile_b is then the FULL minor extent, so small sublane tiles
    (multiples of 8) are legal where the default ``(N, tile_b)`` layout
    needs 128-lane alignment.  This is what makes the fused chain fit
    VMEM at large volume (64x64: d=4096 at tile_b=128 is ~28 MB; at
    tile_b=16 it is ~4 MB)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = lt * lx

    if interpret:
        roll = functools.partial(jnp.roll, axis=1)
    else:
        def roll(a, k):
            return pltpu.roll(a, k % d, axis=1)

    def _tr_read(ref, t):
        return ref[0, t] if sub_layout else ref[t]

    def _tr_store(ref, t, val):
        if sub_layout:
            ref[0, t, :] = val
        else:
            ref[t, :] = val

    def _body(seed_ref, scal_ref, x0_ref, x1_ref, rand_refs,
              x0_out, x1_out, plaq_ref, chg_ref, prob_ref):
        if rand == "prng":
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        eps = scal_ref[0]
        beta = scal_ref[1]
        s_col = (jax.lax.broadcasted_iota(jnp.int32, (tile_b, d), 1) % lx)
        if hop:
            w0f, w1f = _winding_flat(tile_b, d, lt, lx)

        def step(t, carry):
            # pot/chg are carried as (tile_b, 1): Mosaic cannot lay out
            # rank-1 arrays in a fori_loop carry (layout_rank check failure)
            x0, x1, pot2, sinp, cosp, chg2 = carry
            if rand == "prng":
                # Box-Muller cos/sin halves of ONE pair are exactly
                # independent standard normals — one pair serves both
                # momentum arrays
                v0, v1 = _normal_pair((tile_b, d))
                ubits = pltpu.bitcast(
                    pltpu.prng_random_bits((tile_b, d)), jnp.uint32)
                u = _uniform_from_bits(ubits)[:, 0]
                if hop:
                    hbits = pltpu.bitcast(
                        pltpu.prng_random_bits((tile_b, d)), jnp.uint32)
                    nu = ((hbits[:, 0] & 1).astype(jnp.int32) * 2
                          ).astype(jnp.float32) - 1.0
                    uh = _uniform_from_bits(hbits)[:, 1]
            else:
                if hop:
                    v0s_ref, v1s_ref, us_ref, nus_ref, uhs_ref = rand_refs
                    nu = _tr_read(nus_ref, t)
                    uh = _tr_read(uhs_ref, t)
                else:
                    v0s_ref, v1s_ref, us_ref = rand_refs
                v0 = v0s_ref[t]
                v1 = v1s_ref[t]
                u = _tr_read(us_ref, t)
            if hop:
                x0, x1, prob, plaq, pot, sinp, chg, cosp = _transition_math(
                    x0, x1, v0, v1, u, eps, beta, num_leapfrog, lx, s_col,
                    roll, pot0=pot2[:, 0], sinp=sinp, chg0=chg2[:, 0],
                    cosp=cosp)
                x0, x1, _, pot, sinp, cosp, chg = _hop_math(
                    x0, x1, pot, sinp, cosp, chg, nu, uh, beta, w0f, w1f)
                plaq = 1.0 - pot / d
            else:
                x0, x1, prob, plaq, pot, sinp, chg = _transition_math(
                    x0, x1, v0, v1, u, eps, beta, num_leapfrog, lx, s_col,
                    roll, pot0=pot2[:, 0], sinp=sinp, chg0=chg2[:, 0])
            _tr_store(plaq_ref, t, plaq)
            _tr_store(chg_ref, t, chg)
            _tr_store(prob_ref, t, prob)
            return (x0, x1, pot[:, None], sinp, cosp, chg[:, None])

        pot0, sinp0, cosp0, chg0 = _potential_fields(
            x0_ref[:], x1_ref[:], lx, s_col, roll)
        if not hop:
            # cosp rides the carry only for hop chains; a (tile_b, 1)
            # placeholder keeps one carry structure for both modes
            cosp0 = jnp.zeros((tile_b, 1), jnp.float32)
        x0, x1, _, _, _, _ = jax.lax.fori_loop(
            0, num_transitions, step,
            (x0_ref[:], x1_ref[:], pot0[:, None], sinp0, cosp0,
             chg0[:, None]))
        x0_out[:] = x0
        x1_out[:] = x1

    if rand == "prng":
        def kernel(seed_ref, scal_ref, x0_ref, x1_ref,
                   x0_out, x1_out, plaq_ref, chg_ref, prob_ref):
            _body(seed_ref, scal_ref, x0_ref, x1_ref, None,
                  x0_out, x1_out, plaq_ref, chg_ref, prob_ref)
    elif hop:
        def kernel(seed_ref, scal_ref, x0_ref, x1_ref, v0s_ref, v1s_ref,
                   us_ref, nus_ref, uhs_ref,
                   x0_out, x1_out, plaq_ref, chg_ref, prob_ref):
            _body(seed_ref, scal_ref, x0_ref, x1_ref,
                  (v0s_ref, v1s_ref, us_ref, nus_ref, uhs_ref),
                  x0_out, x1_out, plaq_ref, chg_ref, prob_ref)
    else:
        def kernel(seed_ref, scal_ref, x0_ref, x1_ref, v0s_ref, v1s_ref,
                   us_ref, x0_out, x1_out, plaq_ref, chg_ref, prob_ref):
            _body(seed_ref, scal_ref, x0_ref, x1_ref,
                  (v0s_ref, v1s_ref, us_ref),
                  x0_out, x1_out, plaq_ref, chg_ref, prob_ref)

    state_spec = pl.BlockSpec((tile_b, d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    if sub_layout:
        trace_spec = pl.BlockSpec((1, num_transitions, tile_b),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    else:
        trace_spec = pl.BlockSpec((num_transitions, tile_b),
                                  lambda i: (0, i),
                                  memory_space=pltpu.VMEM)
    smem_seed = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [smem_seed, smem_seed, state_spec, state_spec]
    if rand == "input":
        rand_state = pl.BlockSpec((num_transitions, tile_b, d),
                                  lambda i: (0, i, 0),
                                  memory_space=pltpu.VMEM)
        in_specs += [rand_state, rand_state, trace_spec]
        if hop:
            in_specs += [trace_spec, trace_spec]

    def call(b, x0, x1, seed, scal, *rand_arrays):
        tr_shape = ((b // tile_b, num_transitions, tile_b) if sub_layout
                    else (num_transitions, b))
        return pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(b // tile_b,),
            in_specs=in_specs,
            out_specs=(state_spec, state_spec, trace_spec, trace_spec,
                       trace_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, d), jnp.float32),
                jax.ShapeDtypeStruct((b, d), jnp.float32),
                jax.ShapeDtypeStruct(tr_shape, jnp.float32),
                jax.ShapeDtypeStruct(tr_shape, jnp.float32),
                jax.ShapeDtypeStruct(tr_shape, jnp.float32),
            ),
            # donate the chain state: in-place update saves HBM traffic and
            # keeps XLA from allocating separate (promoted-to-VMEM) outputs
            input_output_aliases={2: 0, 3: 1},
        )(seed, scal, x0, x1, *rand_arrays)

    return call


@functools.lru_cache(maxsize=None)
def _chain_kernel_for(lt, lx, num_leapfrog, num_transitions, tile_b,
                      rand, interpret, hop=False, sub_layout=False):
    return _build_chain_kernel(lt, lx, num_leapfrog, num_transitions,
                               tile_b, rand, interpret, hop, sub_layout)


def hmc_chain_pallas(
    links: jax.Array,
    key: jax.Array,
    eps: float,
    beta: float,
    num_leapfrog: int,
    num_transitions: int,
    tile_b: int = 0,
    interpret: bool = False,
    rand_arrays=None,
    hop: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run ``num_transitions`` fused U(1) HMC transitions on-chip.

    ``links (B, Lt, Lx, 2)`` float32 angles.  Returns
    ``(links_out, plaq_trace (N, B), charge_trace (N, B), prob_trace
    (N, B))`` where the plaquette/charge traces are per-chain observables of
    each transition's OUTPUT state (free: the accept step already holds
    them); charges are rounded to integer sectors.

    ``hop=True`` appends one exact instanton hop (dynamics/topo.py, fused
    :func:`_hop_math` form) after every transition — near-free inside the
    kernel: the Metropolis dS comes from the carried potential/sine sums
    and the accepted shift updates the carried fields in closed form, so
    the topological channel unfreezes at ~5% of the transition's cost.

    ``rand_arrays=(v0s, v1s, us[, nus, uhs])`` switches to injected
    randomness (exactness tests vs :func:`hmc_chain_reference`); default
    draws everything with the in-kernel PRNG seeded from ``key``.
    """
    b, lt, lx, _ = links.shape
    d = lt * lx
    rows = 20 if hop else 17   # hop carries cosp + the winding halves
    sub_layout = False
    if tile_b <= 0:
        # VMEM residents per tile_b row: ~9 temporaries (incl. the carried
        # sine field) + 2 in + 2 out (tile_b, d) state buffers (I/O
        # double-buffered: x2) and the two (N, tile_b) trace blocks (also
        # double-buffered).  Budget ~12 MB of the 16 MB VMEM.  The default
        # trace blocks make tile_b a lane dim (multiple of 128); when the
        # VMEM budget cannot afford 128 rows (large d), switch to the
        # transposed (G, N, tile_b) trace layout where any multiple of 8
        # is legal — this is what lets the fused chain run at 64x64.
        per_row = 4 * (rows * d + (8 if hop else 6) * num_transitions)
        tile_b = max(8, min(b, (8 << 20) // per_row))
        if tile_b < b:
            if tile_b >= 128:
                tile_b = (tile_b // 128) * 128
            else:
                sub_layout = True
                tile_b = (tile_b // 8) * 8
    while b % tile_b != 0 and tile_b > 1:
        tile_b -= 1
    if tile_b < 128 and tile_b < b:
        sub_layout = True
    est = tile_b * 4 * (rows * d + (8 if hop else 6) * num_transitions)
    if est > (14 << 20):
        raise ValueError(
            f"fused leapfrog chain would need ~{est >> 20} MB of VMEM "
            f"(tile_b={tile_b}, d={d}, N={num_transitions}); shrink "
            f"num_transitions per call or use the XLA path")

    rand = "input" if rand_arrays is not None else "prng"
    call = _chain_kernel_for(lt, lx, num_leapfrog, num_transitions, tile_b,
                             rand, interpret, hop, sub_layout)

    g = b // tile_b
    x0 = links[..., 0].reshape(b, d).astype(jnp.float32)
    x1 = links[..., 1].reshape(b, d).astype(jnp.float32)
    seed = jnp.asarray(
        jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max), jnp.int32)
    scal = jnp.asarray([eps, beta], jnp.float32)
    extra = ()
    if rand == "input":
        extra = tuple(a.astype(jnp.float32) for a in rand_arrays)
        if hop and len(extra) != 5:
            raise ValueError("hop=True with injected randomness needs "
                             "(v0s, v1s, us, nus, uhs)")
        if sub_layout:
            # (N, b) scalar streams -> (G, N, tile_b), chain c = i*tb + j
            extra = extra[:2] + tuple(
                a.reshape(num_transitions, g, tile_b).transpose(1, 0, 2)
                for a in extra[2:])
    x0, x1, plaqs, chgs, probs = call(b, x0, x1, seed, scal, *extra)
    if sub_layout:
        plaqs, chgs, probs = (
            jnp.moveaxis(o, 0, 1).reshape(num_transitions, b)
            for o in (plaqs, chgs, probs))
    out = jnp.stack([x0.reshape(b, lt, lx), x1.reshape(b, lt, lx)], axis=-1)
    return out, plaqs, jnp.round(chgs), probs
