"""Fused Pallas chain kernel for the TRAINED L2HMC transition (MLP, U(1)).

``ops/leapfrog.py`` fused the plain-HMC chain and measured 2.48x the XLA
scan at 2048 chains — but the framework's flagship is the *learned* kernel,
whose XLA form pays the same per-transition dispatch/fusion overheads plus
the S/T/Q conditioner calls.  This kernel runs ``num_transitions`` complete
trained-L2HMC transitions inside ONE ``pallas_call``: per leapfrog step the
Wilson gradient (lane-rotation rolls, same formulas as ``ops/leapfrog.py``),
the VNet/XNet MLP matmuls (MXU, weights VMEM-resident), the circle-scaling
position update with exact log-Jacobian, and per-chain-direction fused
integration; then the MH accept with the carried potential/sine field.

Covered dynamics family (exactly :func:`l2hmc_tpu.dynamics.l2hmc
.make_dynamics` semantics, ``merge_v_halves`` integrator):

- MLP conditioners (``networks/nets.py make_mlp_net``) with ``bounded_q``,
- ``group='u1'`` (periodic cos/sin features + circle diffeomorphism),
- per-chain random direction, fused single-direction integration,
- K+1 merged momentum kicks / 2K position half-updates per trajectory.

Exactness strategy (two layers, mirroring ``tests/test_leapfrog_kernel.py``):
the kernel and the pure-JAX twin :func:`l2hmc_chain_reference` share ONE
transition-math function (bit-identical under injected randomness), and the
twin is separately checked against ``make_dynamics``'s transition to float
tolerance in ``tests/test_l2hmc_kernel.py``.

Weight layout: the flat link state interleaves directions
(``index = (t*Lx + s)*2 + mu``), while the kernel keeps the two directions
as separate ``(chains, Lt*Lx)`` lane-major arrays (full 128-lane occupancy,
rolls as lane rotations).  :func:`pack_weights` de-interleaves the trained
``DynamicsParams`` rows/columns once at call time.
"""

from __future__ import annotations

import functools
from types import SimpleNamespace
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from l2hmc_tpu.ops.leapfrog import (
    _grad_flat,
    _hop_math,
    _potential_and_sinp,
    _potential_fields,
    _roll_s,
    _roll_t,
    _uniform_from_bits,
    _normal_pair,
    _winding_flat,
    _wrap,
)

_TWO_PI = 2.0 * np.pi

# ordered weight-array names (the kernel receives them positionally).
# Input blocks and heads are MERGED across feature slots / directions into
# single matmul operands (xin (6d, h), xhead (h, 6d)): one deep-K MXU
# matmul replaces six shallow accumulating ones and one wide head matmul
# replaces two — the same dataflow as the production net's single ``in_w``
# matmul (networks/nets.py make_mlp_net).
WEIGHT_NAMES = (
    # XNet: merged input block, time rows, trunk, merged heads, coeffs
    "xin", "xt", "xb",
    "xh_w", "xh_b", "xhead", "xheadb0", "xheadb1",
    "xcs0", "xcs1", "xct0", "xct1",
    # VNet
    "vin", "vt", "vb",
    "vh_w", "vh_b", "vhead", "vheadb0", "vheadb1",
    "vcs0", "vcs1", "vct0", "vct1",
    # per-step hold masks, per direction (K, d)
    "mask0", "mask1",
)

# weight arrays that feed the MXU: stored bf16 under precision='bf16'
# (VMEM-resident for the whole chain, so the cast happens once per call,
# not per step — the round-2 finding that bf16 loses in the XLA path came
# from per-step weight/activation casts, which this kernel does not pay)
_MATMUL_WEIGHTS = ("xin", "xh_w", "xhead", "vin", "vh_w", "vhead")


def _deinterleave_rows(w, x_dim):
    """(x_dim, h) rows in interleaved mu order -> two (d, h) blocks."""
    assert w.shape[0] == x_dim
    return w[0::2], w[1::2]


def _deinterleave_cols(w, x_dim):
    """(h, 3*x_dim) head columns [S | T | Q] -> two (h, 3d) blocks with the
    same [S | T | Q] order per direction."""
    h = w.shape[0]
    w3 = w.reshape(h, 3, x_dim // 2, 2)
    return w3[..., 0].reshape(h, -1), w3[..., 1].reshape(h, -1)


def pack_weights(params, x_dim: int,
                 precision: str = "f32") -> Tuple[jax.Array, ...]:
    """De-interleave trained MLP ``DynamicsParams`` into kernel blocks.

    XNet ``in_w`` rows are ``[v (x_dim) | cos-feats (x_dim) |
    sin-feats (x_dim) | t (2)]`` (``make_mlp_net``: v slot, then the
    doubled periodic position slot, then time); VNet rows are
    ``[cos (x_dim) | sin (x_dim) | grad (x_dim) | t (2)]``.

    The six per-direction input blocks stack into one ``(6d, h)`` operand
    (row order must match the feature concat in the transition math) and
    the two head blocks into one ``(h, 6d)`` operand ``[dir0 | dir1]``.

    ``precision='bf16'`` stores the matmul operands (:data:`_MATMUL_WEIGHTS`)
    as bfloat16; activations are cast at the dot and accumulation stays
    f32 (``preferred_element_type``).  The MH accept remains exact either
    way — the S/T/Q values used by the forward map and by the log-Jacobian
    are the same array, so detailed balance holds for the bf16-rounded
    kernel exactly as for the f32 one (it is a different, equally valid,
    deterministic map).
    """
    d2 = x_dim
    xn, vn = params.xnet, params.vnet

    xv = xn["in_w"][:d2]
    xc = xn["in_w"][d2:2 * d2]
    xs = xn["in_w"][2 * d2:3 * d2]
    xt = xn["in_w"][3 * d2:3 * d2 + 2]
    xv0, xv1 = _deinterleave_rows(xv, d2)
    xc0, xc1 = _deinterleave_rows(xc, d2)
    xs0, xs1 = _deinterleave_rows(xs, d2)
    xhead0, xhead1 = _deinterleave_cols(xn["head_w"], d2)
    xhb = xn["head_b"].reshape(3, d2 // 2, 2)
    xcs = xn["coeff_scale"].reshape(d2 // 2, 2)
    xct = xn["coeff_transformation"].reshape(d2 // 2, 2)

    vc = vn["in_w"][:d2]
    vs = vn["in_w"][d2:2 * d2]
    vg = vn["in_w"][2 * d2:3 * d2]
    vt = vn["in_w"][3 * d2:3 * d2 + 2]
    vc0, vc1 = _deinterleave_rows(vc, d2)
    vs0, vs1 = _deinterleave_rows(vs, d2)
    vg0, vg1 = _deinterleave_rows(vg, d2)
    vhead0, vhead1 = _deinterleave_cols(vn["head_w"], d2)
    vhb = vn["head_b"].reshape(3, d2 // 2, 2)
    vcs = vn["coeff_scale"].reshape(d2 // 2, 2)
    vct = vn["coeff_transformation"].reshape(d2 // 2, 2)

    m = params.masks.reshape(params.masks.shape[0], d2 // 2, 2)

    vals = dict(
        # row order == xnet feature concat: [w0 | w1 | m0 cos y0 | m1 cos y1
        # | m0 sin y0 | m1 sin y1]
        xin=jnp.concatenate([xv0, xv1, xc0, xc1, xs0, xs1], axis=0),
        xt=xt, xb=xn["in_b"][None, :],
        xh_w=xn["h_layer"]["w"], xh_b=xn["h_layer"]["b"][None, :],
        xhead=jnp.concatenate([xhead0, xhead1], axis=1),
        xheadb0=xhb[..., 0].reshape(1, -1), xheadb1=xhb[..., 1].reshape(1, -1),
        xcs0=xcs[:, 0][None, :], xcs1=xcs[:, 1][None, :],
        xct0=xct[:, 0][None, :], xct1=xct[:, 1][None, :],
        # row order == vnet feature concat: [cos y0 | cos y1 | sin y0 |
        # sin y1 | g0 | g1]
        vin=jnp.concatenate([vc0, vc1, vs0, vs1, vg0, vg1], axis=0),
        vt=vt, vb=vn["in_b"][None, :],
        vh_w=vn["h_layer"]["w"], vh_b=vn["h_layer"]["b"][None, :],
        vhead=jnp.concatenate([vhead0, vhead1], axis=1),
        vheadb0=vhb[..., 0].reshape(1, -1), vheadb1=vhb[..., 1].reshape(1, -1),
        vcs0=vcs[:, 0][None, :], vcs1=vcs[:, 1][None, :],
        vct0=vct[:, 0][None, :], vct1=vct[:, 1][None, :],
        mask0=m[..., 0], mask1=m[..., 1],
    )
    if precision not in ("f32", "bf16"):
        raise ValueError(f"precision must be 'f32' or 'bf16': {precision}")
    mm_dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    return tuple(
        jnp.asarray(vals[n], mm_dtype if n in _MATMUL_WEIGHTS else jnp.float32)
        for n in WEIGHT_NAMES)


def local_weight_names(num_layers: int) -> Tuple[str, ...]:
    """Ordered weight names for the LOCAL (5-point stencil) conditioner
    family (``networks/nets.py make_local_flat_net``), kernel edition.

    All stencil weights are scalar-indexed in the kernel (SMEM); only the
    per-step hold masks are VMEM vectors."""
    names = []
    for n in ("x", "v"):
        names += [n + "s0w", n + "s0t", n + "s0b"]
        for i in range(1, num_layers):
            names += [f"{n}s{i}w", f"{n}s{i}b"]
        names += [n + "hw", n + "hb", n + "cs", n + "ct"]
    names += ["mask0", "mask1"]
    return tuple(names)


def pack_local_weights(params, x_dim: int,
                       num_layers: int) -> Tuple[jax.Array, ...]:
    """``make_local_flat_net`` DynamicsParams -> ordered kernel arrays.

    The stencil family is already flat-layout and direction-split by
    construction (its channels ARE the dir-halves), so unlike
    :func:`pack_weights` there is nothing to de-interleave except the
    per-step masks."""
    vals = {}
    for n, net in (("x", params.xnet), ("v", params.vnet)):
        s0 = net["stencil_0"]
        vals[n + "s0w"] = s0["w"]            # (5, cin, c)
        vals[n + "s0t"] = s0["wt"]           # (2, c)
        vals[n + "s0b"] = s0["b"]            # (c,)
        for i in range(1, num_layers):
            si = net[f"stencil_{i}"]
            vals[f"{n}s{i}w"] = si["w"]      # (5, c, c)
            vals[f"{n}s{i}b"] = si["b"]
        vals[n + "hw"] = net["head"]["w"]    # (c, 6): [S0 S1 T0 T1 Q0 Q1]
        vals[n + "hb"] = net["head"]["b"]
        vals[n + "cs"] = net["coeff_scale"]            # (2,) per direction
        vals[n + "ct"] = net["coeff_transformation"]   # (2,)
    m = params.masks.reshape(params.masks.shape[0], x_dim // 2, 2)
    vals["mask0"] = m[..., 0]
    vals["mask1"] = m[..., 1]
    return tuple(jnp.asarray(vals[k], jnp.float32)
                 for k in local_weight_names(num_layers))


# ---------------------------------------------------------------------------
# Shared transition math (kernel + pure-JAX twin)
# ---------------------------------------------------------------------------


def _mm(a, w):
    # bf16 weights (precision='bf16' packing): cast the activation, keep
    # f32 accumulation on the MXU
    if w.dtype == jnp.bfloat16:
        a = a.astype(jnp.bfloat16)
    return jax.lax.dot_general(
        a, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _heads(hh, W, net, bounded_q):
    """Trunk output -> per-direction (S, T, Q) with the tanh/exp head
    combines (``make_mlp_net.apply``); one merged ``(h, 6d)`` matmul for
    both directions."""
    hm = _mm(hh, getattr(W, net + "head"))
    d3 = hm.shape[1] // 2
    h0 = hm[:, :d3] + getattr(W, net + "headb0")
    h1 = hm[:, d3:] + getattr(W, net + "headb1")
    d = d3 // 3
    out = []
    for hi, sfx in ((h0, "0"), (h1, "1")):
        s_raw, t_raw, q_raw = hi[:, :d], hi[:, d:2 * d], hi[:, 2 * d:]
        s = jnp.tanh(s_raw) * jnp.exp(getattr(W, net + "cs" + sfx))
        if bounded_q:
            q_raw = jnp.tanh(q_raw)
        q = q_raw * jnp.exp(getattr(W, net + "ct" + sfx))
        out.append((s, t_raw, q))
    return out  # [(s0, t0, q0), (s1, t1, q1)]


def _trunk(pre, W, net):
    hh = jax.nn.relu(pre)
    hh = jax.nn.relu(_mm(hh, getattr(W, net + "h_w")) + getattr(W, net + "h_b"))
    return hh


def _tau_term(tau, Wt):
    """(b, 2) time encoding x (2, h) rows without a degenerate matmul."""
    return tau[:, 0:1] * Wt[0][None, :] + tau[:, 1:2] * Wt[1][None, :]


def _time_enc(idx, K):
    ang = _TWO_PI * idx / K
    return jnp.stack([jnp.cos(ang), jnp.sin(ang)], axis=-1)


_TAN_3PI_8 = 2.414213562373095   # tan(3*pi/8)
_TAN_PI_8 = 0.4142135623730950   # tan(pi/8)


def _atan_f32(x):
    """Elementwise arctan via Cephes-style range reduction + minimax poly.

    Mosaic lowers no atan/atan2 primitive (checked against the lowering
    registry), so the kernel carries its own: ~2-ulp f32 accuracy, the
    same class as a libm atanf.  Handles +-inf (-> +-pi/2) so the caller
    may divide by a cosine that underflows to 0.
    """
    sgn = jnp.where(x < 0.0, -1.0, 1.0)
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = ax > _TAN_PI_8
    # reduced argument z in [-tan(pi/8), tan(pi/8)]
    z = jnp.where(big, -1.0 / jnp.maximum(ax, 1e-30),
                  jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    base = jnp.where(big, np.pi / 2, jnp.where(mid, np.pi / 4, 0.0))
    zz = z * z
    p = ((8.05374449538e-2 * zz - 1.38776856032e-1) * zz
         + 1.99777106478e-1) * zz - 3.33329491539e-1
    r = base + (z + z * zz * p)
    # inf -> z = -0, r = pi/2 exactly; propagate NaN untouched
    return sgn * r


def _circle_scale(x, a):
    """2 atan(exp(a) tan(x/2)) with exact log-Jacobian (l2hmc.py
    circle_scale).

    The caller always passes wrapped angles (|x| <= pi), so
    cos(x/2) >= 0 and the two-argument atan2 reduces to the one-argument
    atan of the ratio (+-inf at the +-pi endpoint is handled by
    :func:`_atan_f32`).
    """
    s2, c2 = jnp.sin(0.5 * x), jnp.cos(0.5 * x)
    ea = jnp.exp(a)
    y = 2.0 * _atan_f32(ea * s2 / jnp.maximum(c2, 1e-38))
    logdet = a - jnp.log(c2 * c2 + ea * ea * s2 * s2)
    return y, logdet


def _select_mask(masks, idx, K):
    """Per-chain row gather masks[idx] as a K-way select (K is tiny).

    Kept for reference; the transition math now uses the cheaper 2-way
    form — per unrolled step the only possible rows are the STATIC
    ``masks[step]`` (forward) and ``masks[K-1-step]`` (backward), so one
    direction select replaces the K-way scan (2K^2 -> 2K elementwise
    passes per transition; bit-identical, the K-way select resolved to
    exactly these rows)."""
    out = jnp.zeros((idx.shape[0], masks.shape[1]), jnp.float32)
    for k in range(K):
        out = out + (idx == k).astype(jnp.float32)[:, None] * masks[k][None, :]
    return out


_STENCIL_OFF = ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1))


def _make_stencil_nets(W, lx, s_col, roll, bounded_q, local_layers):
    """vnet/xnet closures for the LOCAL 5-point-stencil conditioner —
    exact ``make_local_flat_net`` math on the kernel's dir-split halves.

    Every weight access is a SCALAR read (``w[oi, ci, j]``), so inside
    the Pallas kernel ``W`` holds SMEM refs and the channel mix lowers to
    scalar-times-vector FMAs on VMEM-resident ``(b, d)`` rows; the 5-point
    cross is the Wilson gradient's lane-roll pattern.  No flat->NHWC
    round trips, no HBM-materialized shifted operands — the two costs
    that made both XLA formulations lose (RESULTS.md r4, the measured
    dead ends this kernel exists to escape)."""

    def shift(a, off):
        dt, ds_ = off
        if dt:
            a = _roll_t(a, dt, lx, roll)
        if ds_:
            a = _roll_s(a, ds_, lx, s_col, roll)
        return a

    def layer(ins, w, bias, t_vec=None, t_w=None):
        cout = w.shape[2]
        acc = []
        for j in range(cout):
            base = jnp.zeros_like(ins[0]) + bias[j]
            if t_vec is not None:
                # broadcast time encoding == a conv over constant channels
                base = base + (t_vec[:, 0:1] * t_w[0, j]
                               + t_vec[:, 1:2] * t_w[1, j])
            acc.append(base)
        # (ci, oi) outer so ONE shifted operand is live at a time: the
        # accumulators (cout rows) + inputs dominate VMEM, not shifts
        for ci, a in enumerate(ins):
            for oi, off in enumerate(_STENCIL_OFF):
                sh = shift(a, off)
                for j in range(cout):
                    acc[j] = acc[j] + w[oi, ci, j] * sh
        return [jax.nn.relu(a) for a in acc]

    def apply_net(prefix, chans, tau):
        y = layer(chans, getattr(W, prefix + "s0w"),
                  getattr(W, prefix + "s0b"), tau,
                  getattr(W, prefix + "s0t"))
        for i in range(1, local_layers):
            y = layer(y, getattr(W, f"{prefix}s{i}w"),
                      getattr(W, f"{prefix}s{i}b"))
        hw = getattr(W, prefix + "hw")
        hb = getattr(W, prefix + "hb")
        c = len(y)
        head = []
        for k in range(6):      # [S0 S1 T0 T1 Q0 Q1] (1x1 head conv)
            h = jnp.zeros_like(y[0]) + hb[k]
            for ci in range(c):
                h = h + hw[ci, k] * y[ci]
            head.append(h)
        cs = getattr(W, prefix + "cs")
        ct = getattr(W, prefix + "ct")
        out = []
        for dirn in (0, 1):
            s = jnp.tanh(head[0 + dirn]) * jnp.exp(cs[dirn])
            q = head[4 + dirn]
            if bounded_q:
                q = jnp.tanh(q)
            q = q * jnp.exp(ct[dirn])
            out.append((s, head[2 + dirn], q))
        return out

    def vnet(trig, gg0, gg1, tau):
        # channel order == make_local_flat_net's split_dir concat for the
        # VNet call (v slot = cos/sin position features, x slot = grad)
        cy0, cy1, sy0, sy1 = trig
        return apply_net("v", [cy0, cy1, sy0, sy1, gg0, gg1], tau)

    def xnet(ww0, ww1, trig, m0, m1, tau):
        # XNet: v slot = momentum halves, x slot = MASKED cos/sin features
        cy0, cy1, sy0, sy1 = trig
        return apply_net("x", [ww0, ww1, m0 * cy0, m1 * cy1,
                               m0 * sy0, m1 * sy1], tau)

    return vnet, xnet


def _l2hmc_transition_math(
    x0, x1, v0, v1, dsign, u, W, eps, beta, K, lx, s_col, roll, bounded_q,
    pot0=None, sinp=None, chg0=None, ablate_nets=False, cosp=None,
    local_layers=0,
):
    """One trained-L2HMC transition (merge_v_halves, u1) on flat halves.

    Pure function of its inputs — used verbatim by the Pallas kernel and by
    the pure-JAX twin.  ``dsign (b,)`` in {+1,-1}; ``u (b,)`` accept
    uniforms; ``W`` a namespace of :data:`WEIGHT_NAMES` arrays.

    ``cosp`` additionally carries the plaquette-cosine field for hop
    chains (ops/leapfrog.py :func:`_hop_math`); it is free — the cosine is
    computed inside every potential evaluation anyway — and when given the
    return tuple grows by ``cosp_out``.

    Returns ``(x0', x1', prob, avg_plaq_out, pot_out, sinp_out,
    chg_out[, cosp_out])``.
    """
    n_plaq = x0.shape[1]
    d_col = dsign[:, None]
    track_cosp = cosp is not None

    if pot0 is None:
        pot0, sinp, cosp0, chg0 = _potential_fields(x0, x1, lx, s_col, roll)
        if track_cosp:
            cosp = cosp0
    ke0 = 0.5 * (jnp.sum(v0 * v0, axis=1) + jnp.sum(v1 * v1, axis=1))
    h_init = beta * pot0 + ke0

    g0, g1 = _grad_flat(sinp, lx, s_col, roll)
    g0, g1 = beta * g0, beta * g1
    y0, y1, w0, w1 = x0, x1, v0, v1
    sumlogdet = jnp.zeros(x0.shape[0], jnp.float32)
    pot1, sinp1, cosp1, chg1 = pot0, sinp, cosp, chg0

    if ablate_nets:
        # cost-decomposition mode (benchmarks/kernel_decomposition.py):
        # S/T/Q are zero WITHOUT computing features/matmuls/heads, but the
        # full L2HMC update machinery (circle map, masks, direction fusion,
        # exp factors) still runs — the delta to the full kernel is the
        # conditioner cost, the delta to the plain HMC chain is the
        # algorithm-machinery cost
        def _zeros(*_a, **_k):
            z = jnp.zeros_like(x0)
            return [(z, z, z), (z, z, z)]

        vnet = xnet = lambda *a: _zeros()

        def link_trig(yy0, yy1):
            return None
    elif local_layers > 0:
        vnet, xnet = _make_stencil_nets(W, lx, s_col, roll, bounded_q,
                                        local_layers)

        def link_trig(yy0, yy1):
            # same shared-quartet dedup as the MLP branch below
            return jnp.cos(yy0), jnp.cos(yy1), jnp.sin(yy0), jnp.sin(yy1)
    else:
        def link_trig(yy0, yy1):
            """Per-link cos/sin feature quartet.  Per step the VNet kick
            and the FIRST XNet half-update see the same (y0, y1) — kick
            moves only momenta — so one evaluation serves both (4 of 12
            d-wide feature trig per step saved; bit-identical: identical
            ops on identical inputs, just deduplicated)."""
            return jnp.cos(yy0), jnp.cos(yy1), jnp.sin(yy0), jnp.sin(yy1)

        def vnet(trig, gg0, gg1, tau):
            # one (b, 6d) @ (6d, h) deep-K matmul (order matches
            # pack_weights)
            cy0, cy1, sy0, sy1 = trig
            feats = jnp.concatenate([cy0, cy1, sy0, sy1, gg0, gg1], axis=1)
            pre = _mm(feats, W.vin) + _tau_term(tau, W.vt) + W.vb
            return _heads(_trunk(pre, W, "v"), W, "v", bounded_q)

        def xnet(ww0, ww1, trig, m0, m1, tau):
            cy0, cy1, sy0, sy1 = trig
            feats = jnp.concatenate(
                [ww0, ww1, m0 * cy0, m1 * cy1, m0 * sy0, m1 * sy1], axis=1)
            pre = _mm(feats, W.xin) + _tau_term(tau, W.xt) + W.xb
            return _heads(_trunk(pre, W, "x"), W, "x", bounded_q)

    def kick(trig, w0_, w1_, g0_, g1_, tau, factor, ld):
        """Merged momentum kick, direction-fused (l2hmc.py update_v)."""
        (s0, t0, q0), (s1, t1, q1) = vnet(trig, g0_, g1_, tau)
        out = []
        for (w_, s_, t_, q_, g_) in ((w0_, s0, t0, q0, g0_),
                                     (w1_, s1, t1, q1, g1_)):
            hs = factor * eps * s_
            a = factor * eps * (jnp.exp(eps * q_) * g_ - t_)
            e = jnp.exp(d_col * hs)
            out.append(jnp.where(d_col > 0, w_ * e - a, (w_ + a) * e))
            ld = ld + dsign * jnp.sum(hs, axis=1)
        return out[0], out[1], ld

    def xhalf(y0_, y1_, w0_, w1_, hold0, hold1, tau, ld, trig=None):
        """One masked position half-update on the torus (l2hmc.py
        update_x, 'u1' branch).  ``trig``: precomputed link cos/sin at
        (y0_, y1_) when the caller already has them (the first half-update
        of each step shares the kick's evaluation)."""
        if trig is None:
            trig = link_trig(y0_, y1_)
        (s0, t0, q0), (s1, t1, q1) = xnet(w0_, w1_, trig, hold0, hold1,
                                          tau)
        outs = []
        for (y_, w_, s_, t_, q_, hold) in (
                (y0_, w0_, s0, t0, q0, hold0), (y1_, w1_, s1, t1, q1, hold1)):
            es = eps * s_
            b = eps * (jnp.exp(eps * q_) * w_ + t_)
            # u_in stays in [-pi, pi) by construction: the forward branch
            # feeds y_ (an output of _wrap/_circle_scale), the backward one
            # wraps explicitly — _circle_scale's |x| <= pi precondition holds
            u_in = jnp.where(d_col > 0, y_, _wrap(y_ - b))
            y2, ld_e = _circle_scale(u_in, d_col * es)
            upd = jnp.where(d_col > 0, _wrap(y2 + b), y2)
            outs.append(hold * y_ + (1.0 - hold) * upd)
            ld = ld + jnp.sum((1.0 - hold) * ld_e, axis=1)
        return outs[0], outs[1], ld

    for step in range(K):
        # boundary momentum kick (leapfrog_step_merged); its link trig is
        # shared with the first x half-update below (same y0/y1 — the kick
        # moves only momenta)
        factor = 0.5 if step == 0 else 1.0
        t_fwd = 0.0 if step == 0 else step - 0.5
        t_bwd = float(K - 1) if step == 0 else K - 0.5 - step
        tau_v = _time_enc(jnp.where(dsign > 0, t_fwd, t_bwd), K)
        trig = link_trig(y0, y1)
        w0, w1, sumlogdet = kick(trig, w0, w1, g0, g1, tau_v, factor,
                                 sumlogdet)

        # step index is `step` forward / `K-1-step` backward — both STATIC
        # in this unrolled loop, so the per-chain mask/time gathers reduce
        # to one direction select of two fixed rows (see _select_mask)
        tau_x = _time_enc(jnp.where(dsign > 0, float(step),
                                    float(K - 1 - step)), K)
        hold1_0 = jnp.where(d_col > 0, W.mask0[step][None, :],
                            1.0 - W.mask0[K - 1 - step][None, :])
        hold1_1 = jnp.where(d_col > 0, W.mask1[step][None, :],
                            1.0 - W.mask1[K - 1 - step][None, :])
        y0, y1, sumlogdet = xhalf(y0, y1, w0, w1, hold1_0, hold1_1, tau_x,
                                  sumlogdet, trig=trig)
        y0, y1, sumlogdet = xhalf(y0, y1, w0, w1, 1.0 - hold1_0, 1.0 - hold1_1,
                                  tau_x, sumlogdet)

        pot1, sinp1, cosp1, chg1 = _potential_fields(y0, y1, lx, s_col, roll)
        g0, g1 = _grad_flat(sinp1, lx, s_col, roll)
        g0, g1 = beta * g0, beta * g1

    # closing half kick at trajectory time K-1 (fwd) / 0 (bwd)
    tau_v = _time_enc(jnp.where(dsign > 0, float(K - 1), 0.0), K)
    w0, w1, sumlogdet = kick(link_trig(y0, y1), w0, w1, g0, g1, tau_v, 0.5,
                             sumlogdet)

    ke1 = 0.5 * (jnp.sum(w0 * w0, axis=1) + jnp.sum(w1 * w1, axis=1))
    dh = h_init - (beta * pot1 + ke1) + sumlogdet
    prob = jnp.exp(jnp.minimum(dh, 0.0))
    prob = jnp.where(jnp.isfinite(prob), prob, jnp.zeros_like(prob))
    # reject non-finite proposals outright (l2hmc.py _sanitize)
    finite = (
        jnp.sum(jnp.abs(y0), axis=1) + jnp.sum(jnp.abs(y1), axis=1)
        + jnp.sum(jnp.abs(w0), axis=1) + jnp.sum(jnp.abs(w1), axis=1)
    )
    prob = jnp.where(jnp.isfinite(finite), prob, jnp.zeros_like(prob))

    acc = (u < prob).astype(x0.dtype)
    acc_col = acc[:, None]
    x0 = acc_col * y0 + (1.0 - acc_col) * x0
    x1 = acc_col * y1 + (1.0 - acc_col) * x1
    pot_out = acc * pot1 + (1.0 - acc) * pot0
    sinp_out = acc_col * sinp1 + (1.0 - acc_col) * sinp
    chg_out = acc * chg1 + (1.0 - acc) * chg0
    avg_plaq = 1.0 - pot_out / n_plaq
    if track_cosp:
        cosp_out = acc_col * cosp1 + (1.0 - acc_col) * cosp
        return x0, x1, prob, avg_plaq, pot_out, sinp_out, chg_out, cosp_out
    return x0, x1, prob, avg_plaq, pot_out, sinp_out, chg_out


# ---------------------------------------------------------------------------
# Pure-JAX twin (exactness tests + CPU fallback)
# ---------------------------------------------------------------------------


def l2hmc_chain_reference(links, params, v0s, v1s, ds, us, eps, beta,
                          num_leapfrog, bounded_q=True, precision="f32",
                          hop_arrays=None, local_layers=0):
    """Run ``N`` trained transitions with injected randomness.

    ``links (B, Lt, Lx, 2)``; ``v0s/v1s (N, B, Lt*Lx)``; ``ds/us (N, B)``.
    Same math function as the kernel, jnp.roll edition.
    ``hop_arrays=(nus, uhs)`` (each ``(N, B)``, nus in {+1,-1}) appends one
    exact instanton hop (ops/leapfrog.py :func:`_hop_math`) after every
    transition — the trained-kernel edition of the HMC hop chain.
    ``local_layers > 0`` switches the conditioner family from the MLP to
    the LOCAL 5-point stencil (``make_local_flat_net`` params of that
    depth; ``precision`` is ignored — the stencil is VPU-scalar work).
    Returns ``(links_out, plaq_trace, charge_trace, prob_trace)``.
    """
    b, lt, lx, _ = links.shape
    d = lt * lx
    if local_layers > 0:
        W = SimpleNamespace(**dict(zip(
            local_weight_names(local_layers),
            pack_local_weights(params, 2 * d, local_layers))))
    else:
        W = SimpleNamespace(**dict(zip(
            WEIGHT_NAMES, pack_weights(params, 2 * d, precision))))
    s_col = (jax.lax.broadcasted_iota(jnp.int32, (b, d), 1) % lx)
    roll = functools.partial(jnp.roll, axis=1)
    x0 = links[..., 0].reshape(b, d)
    x1 = links[..., 1].reshape(b, d)
    pot, sinp, cosp, chg = _potential_fields(x0, x1, lx, s_col, roll)

    if hop_arrays is None:
        def body(carry, rand):
            x0, x1, pot, sinp, chg = carry
            v0, v1, dsg, u = rand
            x0, x1, prob, plaq, pot, sinp, chg = _l2hmc_transition_math(
                x0, x1, v0, v1, dsg, u, W, eps, beta, num_leapfrog, lx,
                s_col, roll, bounded_q, pot0=pot, sinp=sinp, chg0=chg,
                local_layers=local_layers)
            return (x0, x1, pot, sinp, chg), (plaq, chg, prob)

        (x0, x1, _, _, _), (plaqs, chgs, probs) = jax.lax.scan(
            body, (x0, x1, pot, sinp, chg), (v0s, v1s, ds, us))
    else:
        nus, uhs = hop_arrays
        w0f, w1f = _winding_flat(b, d, lt, lx)

        def body(carry, rand):
            x0, x1, pot, sinp, cosp, chg = carry
            v0, v1, dsg, u, nu, uh = rand
            (x0, x1, prob, plaq, pot, sinp, chg,
             cosp) = _l2hmc_transition_math(
                x0, x1, v0, v1, dsg, u, W, eps, beta, num_leapfrog, lx,
                s_col, roll, bounded_q, pot0=pot, sinp=sinp, chg0=chg,
                cosp=cosp, local_layers=local_layers)
            x0, x1, _, pot, sinp, cosp, chg = _hop_math(
                x0, x1, pot, sinp, cosp, chg, nu, uh, beta, w0f, w1f)
            plaq = 1.0 - pot / d
            return (x0, x1, pot, sinp, cosp, chg), (plaq, chg, prob)

        (x0, x1, _, _, _, _), (plaqs, chgs, probs) = jax.lax.scan(
            body, (x0, x1, pot, sinp, cosp, chg), (v0s, v1s, ds, us,
                                                   nus, uhs))
    out = jnp.stack([x0.reshape(b, lt, lx), x1.reshape(b, lt, lx)], axis=-1)
    return out, plaqs, jnp.round(chgs), probs


# ---------------------------------------------------------------------------
# The fused kernel
# ---------------------------------------------------------------------------


def _build_kernel(lt, lx, K, num_transitions, tile_b, bounded_q, rand,
                  interpret, ablate_nets=False, hop=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = lt * lx

    if interpret:
        roll = functools.partial(jnp.roll, axis=1)
    else:
        def roll(a, k):
            return pltpu.roll(a, k % d, axis=1)

    n_w = len(WEIGHT_NAMES)

    def _body(seed_ref, scal_ref, x0_ref, x1_ref, w_refs, rand_refs,
              x0_out, x1_out, plaq_ref, chg_ref, prob_ref):
        if rand == "prng":
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        eps = scal_ref[0]
        beta = scal_ref[1]
        s_col = (jax.lax.broadcasted_iota(jnp.int32, (tile_b, d), 1) % lx)
        W = SimpleNamespace(**{n: r[:] for n, r in zip(WEIGHT_NAMES, w_refs)})
        if hop:
            w0f, w1f = _winding_flat(tile_b, d, lt, lx)

        def step(t, carry):
            x0, x1, pot2, sinp, cosp, chg2 = carry
            if rand == "prng":
                v0, v1 = _normal_pair((tile_b, d))
                dbits = pltpu.bitcast(
                    pltpu.prng_random_bits((tile_b, d)), jnp.uint32)
                # via int32: Mosaic has no uint32->f32 cast (cf. leapfrog's
                # _uniform_from_bits)
                dsg = ((dbits[:, 0] & 1).astype(jnp.int32) * 2
                       ).astype(jnp.float32) - 1.0
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
                    (v0s_ref, v1s_ref, ds_ref, us_ref, nus_ref,
                     uhs_ref) = rand_refs
                    nu = nus_ref[t]
                    uh = uhs_ref[t]
                else:
                    v0s_ref, v1s_ref, ds_ref, us_ref = rand_refs
                v0, v1 = v0s_ref[t], v1s_ref[t]
                dsg, u = ds_ref[t], us_ref[t]
            if hop:
                (x0, x1, prob, plaq, pot, sinp, chg,
                 cosp) = _l2hmc_transition_math(
                    x0, x1, v0, v1, dsg, u, W, eps, beta, K, lx, s_col,
                    roll, bounded_q, pot0=pot2[:, 0], sinp=sinp,
                    chg0=chg2[:, 0], ablate_nets=ablate_nets, cosp=cosp)
                x0, x1, _, pot, sinp, cosp, chg = _hop_math(
                    x0, x1, pot, sinp, cosp, chg, nu, uh, beta, w0f, w1f)
                plaq = 1.0 - pot / d
            else:
                x0, x1, prob, plaq, pot, sinp, chg = _l2hmc_transition_math(
                    x0, x1, v0, v1, dsg, u, W, eps, beta, K, lx, s_col, roll,
                    bounded_q, pot0=pot2[:, 0], sinp=sinp, chg0=chg2[:, 0],
                    ablate_nets=ablate_nets)
            plaq_ref[t, :] = plaq
            chg_ref[t, :] = chg
            prob_ref[t, :] = prob
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
        def kernel(seed_ref, scal_ref, x0_ref, x1_ref, *rest):
            w_refs = rest[:n_w]
            x0_out, x1_out, plaq_ref, chg_ref, prob_ref = rest[n_w:]
            _body(seed_ref, scal_ref, x0_ref, x1_ref, w_refs, None,
                  x0_out, x1_out, plaq_ref, chg_ref, prob_ref)
    elif hop:
        def kernel(seed_ref, scal_ref, x0_ref, x1_ref, *rest):
            w_refs = rest[:n_w]
            rand_refs = rest[n_w:n_w + 6]
            x0_out, x1_out, plaq_ref, chg_ref, prob_ref = rest[n_w + 6:]
            _body(seed_ref, scal_ref, x0_ref, x1_ref, w_refs, rand_refs,
                  x0_out, x1_out, plaq_ref, chg_ref, prob_ref)
    else:
        def kernel(seed_ref, scal_ref, x0_ref, x1_ref, *rest):
            w_refs = rest[:n_w]
            v0s_ref, v1s_ref, ds_ref, us_ref = rest[n_w:n_w + 4]
            x0_out, x1_out, plaq_ref, chg_ref, prob_ref = rest[n_w + 4:]
            _body(seed_ref, scal_ref, x0_ref, x1_ref, w_refs,
                  (v0s_ref, v1s_ref, ds_ref, us_ref),
                  x0_out, x1_out, plaq_ref, chg_ref, prob_ref)

    state_spec = pl.BlockSpec((tile_b, d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    trace_spec = pl.BlockSpec((num_transitions, tile_b), lambda i: (0, i),
                              memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def w_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    def call(b, x0, x1, seed, scal, weights, *rand_arrays):
        in_specs = [smem, smem, state_spec, state_spec]
        in_specs += [w_spec(w.shape) for w in weights]
        if rand == "input":
            rand_state = pl.BlockSpec((num_transitions, tile_b, d),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
            in_specs += [rand_state, rand_state, trace_spec, trace_spec]
            if hop:
                in_specs += [trace_spec, trace_spec]
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
                jax.ShapeDtypeStruct((num_transitions, b), jnp.float32),
                jax.ShapeDtypeStruct((num_transitions, b), jnp.float32),
                jax.ShapeDtypeStruct((num_transitions, b), jnp.float32),
            ),
            input_output_aliases={2: 0, 3: 1},
        )(seed, scal, x0, x1, *weights, *rand_arrays)

    return call


@functools.lru_cache(maxsize=None)
def _kernel_for(lt, lx, K, num_transitions, tile_b, bounded_q, rand,
                interpret, ablate_nets=False, hop=False):
    return _build_kernel(lt, lx, K, num_transitions, tile_b, bounded_q,
                         rand, interpret, ablate_nets, hop)


def l2hmc_chain_pallas(
    links: jax.Array,
    params,
    key: jax.Array,
    eps,
    beta: float,
    num_leapfrog: int,
    num_transitions: int,
    bounded_q: bool = True,
    tile_b: int = 0,
    interpret: bool = False,
    rand_arrays=None,
    precision: str = "f32",
    ablate_nets: bool = False,
    hop: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Run ``num_transitions`` fused TRAINED L2HMC transitions on-chip.

    ``links (B, Lt, Lx, 2)`` f32 angles; ``params`` a trained MLP/u1
    ``DynamicsParams`` (``merge_v_halves`` family).  Returns
    ``(links_out, plaq_trace (N, B), charge_trace (N, B), prob_trace
    (N, B))``; charges are rounded to integer sectors.

    ``rand_arrays=(v0s, v1s, ds, us[, nus, uhs])`` switches to injected
    randomness for exactness tests against :func:`l2hmc_chain_reference`.

    ``hop=True`` appends one exact instanton hop (dynamics/topo.py,
    ops/leapfrog.py fused :func:`_hop_math` form) after every transition —
    the champion+hop topological sampler at fused-kernel speed.  dS comes
    from the carried plaquette fields, so the hop costs no extra
    plaquette pass.

    ``precision='bf16'`` stores the conditioner matmul weights bf16 in
    VMEM and runs the MXU in bf16 with f32 accumulation (see
    :func:`pack_weights` — the kernel stays an exact MH sampler).
    """
    b, lt, lx, _ = links.shape
    d = lt * lx
    weights = pack_weights(params, 2 * d, precision)
    h = weights[0].shape[1]

    def _wbytes():
        return sum(int(np.prod(w.shape)) * w.dtype.itemsize for w in weights)

    # state+temporaries ~26 (tile_b, d) rows + trace blocks; hop chains
    # carry cosp + the two winding halves (~3 more rows).  Weights are
    # tile-independent.  Budget ~10 MB for the tiled part.
    rows = 29 if hop else 26
    if tile_b <= 0:
        per_row = 4 * (rows * d + 6 * h + 6 * num_transitions)
        tile_b = max(8, min(b, ((10 << 20) - _wbytes()) // per_row))
        if tile_b < b:
            tile_b = max(128, (tile_b // 128) * 128)
    while b % tile_b != 0 and tile_b > 1:
        tile_b -= 1
    w_bytes = _wbytes()
    est = w_bytes + tile_b * 4 * (rows * d + 6 * h + 6 * num_transitions)
    if est > (14 << 20):
        raise ValueError(
            f"fused trained chain would need ~{est >> 20} MB VMEM "
            f"(tile_b={tile_b}, d={d}, h={h}, N={num_transitions}); "
            "shrink num_transitions per call or use the XLA path")

    rand = "input" if rand_arrays is not None else "prng"
    call = _kernel_for(lt, lx, num_leapfrog, num_transitions, tile_b,
                       bounded_q, rand, interpret, ablate_nets, hop)

    x0 = links[..., 0].reshape(b, d).astype(jnp.float32)
    x1 = links[..., 1].reshape(b, d).astype(jnp.float32)
    seed = jnp.asarray(
        jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max), jnp.int32)
    scal = jnp.stack([jnp.asarray(eps, jnp.float32),
                      jnp.asarray(beta, jnp.float32)])
    extra = ()
    if rand == "input":
        extra = tuple(a.astype(jnp.float32) for a in rand_arrays)
        if hop and len(extra) != 6:
            raise ValueError("hop=True with injected randomness needs "
                             "rand_arrays=(v0s, v1s, ds, us, nus, uhs)")
    x0, x1, plaqs, chgs, probs = call(b, x0, x1, seed, scal, weights, *extra)
    out = jnp.stack([x0.reshape(b, lt, lx), x1.reshape(b, lt, lx)], axis=-1)
    return out, plaqs, jnp.round(chgs), probs


# ---------------------------------------------------------------------------
# LOCAL (5-point stencil) conditioner chain kernel — the 64x64 kernel
# ---------------------------------------------------------------------------
# The dense-trunk kernel above cannot run at large volume: its traces are
# (N, tile_b) blocks with tile_b on LANES, forcing tile_b >= 128, and
# 128 x (d = 4096) x ~26 rows blows VMEM.  The local kernel flips the
# trace layout to (G, N, tile_b) blocks — tile_b is the FULL minor extent,
# so any multiple of 8 is legal — which makes tile_b = 8..16 feasible at
# 64x64 with everything VMEM-resident.  Stencil weights are scalars in
# SMEM (a few hundred), read lazily by the shared math's scalar indexing.


def _build_local_kernel(lt, lx, K, num_layers, num_transitions, tile_b,
                        bounded_q, rand, interpret, ablate_nets=False,
                        hop=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = lt * lx
    names = local_weight_names(num_layers)
    n_w = len(names)

    if interpret:
        roll = functools.partial(jnp.roll, axis=1)
    else:
        def roll(a, k):
            return pltpu.roll(a, k % d, axis=1)

    def _body(seed_ref, scal_ref, x0_ref, x1_ref, w_refs, rand_refs,
              x0_out, x1_out, plaq_ref, chg_ref, prob_ref):
        if rand == "prng":
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        eps = scal_ref[0]
        beta = scal_ref[1]
        s_col = (jax.lax.broadcasted_iota(jnp.int32, (tile_b, d), 1) % lx)
        # refs, not loads: stencil weights are scalar-indexed from SMEM
        # inside the shared math; masks row-indexed from VMEM
        W = SimpleNamespace(**dict(zip(names, w_refs)))
        if hop:
            w0f, w1f = _winding_flat(tile_b, d, lt, lx)

        def step(t, carry):
            x0, x1, pot2, sinp, cosp, chg2 = carry
            if rand == "prng":
                v0, v1 = _normal_pair((tile_b, d))
                dbits = pltpu.bitcast(
                    pltpu.prng_random_bits((tile_b, d)), jnp.uint32)
                dsg = ((dbits[:, 0] & 1).astype(jnp.int32) * 2
                       ).astype(jnp.float32) - 1.0
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
                    (v0s_ref, v1s_ref, ds_ref, us_ref, nus_ref,
                     uhs_ref) = rand_refs
                    nu = nus_ref[0, t]
                    uh = uhs_ref[0, t]
                else:
                    v0s_ref, v1s_ref, ds_ref, us_ref = rand_refs
                v0, v1 = v0s_ref[t], v1s_ref[t]
                dsg, u = ds_ref[0, t], us_ref[0, t]
            if hop:
                (x0, x1, prob, plaq, pot, sinp, chg,
                 cosp) = _l2hmc_transition_math(
                    x0, x1, v0, v1, dsg, u, W, eps, beta, K, lx, s_col,
                    roll, bounded_q, pot0=pot2[:, 0], sinp=sinp,
                    chg0=chg2[:, 0], ablate_nets=ablate_nets, cosp=cosp,
                    local_layers=num_layers)
                x0, x1, _, pot, sinp, cosp, chg = _hop_math(
                    x0, x1, pot, sinp, cosp, chg, nu, uh, beta, w0f, w1f)
                plaq = 1.0 - pot / d
            else:
                x0, x1, prob, plaq, pot, sinp, chg = _l2hmc_transition_math(
                    x0, x1, v0, v1, dsg, u, W, eps, beta, K, lx, s_col,
                    roll, bounded_q, pot0=pot2[:, 0], sinp=sinp,
                    chg0=chg2[:, 0], ablate_nets=ablate_nets,
                    local_layers=num_layers)
            plaq_ref[0, t, :] = plaq
            chg_ref[0, t, :] = chg
            prob_ref[0, t, :] = prob
            return (x0, x1, pot[:, None], sinp, cosp, chg[:, None])

        pot0, sinp0, cosp0, chg0 = _potential_fields(
            x0_ref[:], x1_ref[:], lx, s_col, roll)
        if not hop:
            cosp0 = jnp.zeros((tile_b, 1), jnp.float32)
        x0, x1, _, _, _, _ = jax.lax.fori_loop(
            0, num_transitions, step,
            (x0_ref[:], x1_ref[:], pot0[:, None], sinp0, cosp0,
             chg0[:, None]))
        x0_out[:] = x0
        x1_out[:] = x1

    n_rand = 0 if rand == "prng" else (6 if hop else 4)

    def kernel(seed_ref, scal_ref, x0_ref, x1_ref, *rest):
        w_refs = rest[:n_w]
        rand_refs = rest[n_w:n_w + n_rand] if n_rand else None
        x0_out, x1_out, plaq_ref, chg_ref, prob_ref = rest[n_w + n_rand:]
        _body(seed_ref, scal_ref, x0_ref, x1_ref, w_refs, rand_refs,
              x0_out, x1_out, plaq_ref, chg_ref, prob_ref)

    state_spec = pl.BlockSpec((tile_b, d), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)
    # (G, N, tile_b) trace blocks: tile_b is the full minor extent, so it
    # needs no 128-lane alignment (the dense kernel's constraint)
    trace_spec = pl.BlockSpec((1, num_transitions, tile_b),
                              lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def w_spec(name, w):
        if name in ("mask0", "mask1"):
            nd = len(w.shape)
            return pl.BlockSpec(w.shape, (lambda i: (0,) * nd),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    def call(b, x0, x1, seed, scal, weights, *rand_arrays):
        in_specs = [smem, smem, state_spec, state_spec]
        in_specs += [w_spec(n, w) for n, w in zip(names, weights)]
        if rand == "input":
            rand_state = pl.BlockSpec((num_transitions, tile_b, d),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
            in_specs += [rand_state, rand_state, trace_spec, trace_spec]
            if hop:
                in_specs += [trace_spec, trace_spec]
        g = b // tile_b
        return pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(g,),
            in_specs=in_specs,
            out_specs=(state_spec, state_spec, trace_spec, trace_spec,
                       trace_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, d), jnp.float32),
                jax.ShapeDtypeStruct((b, d), jnp.float32),
                jax.ShapeDtypeStruct((g, num_transitions, tile_b),
                                     jnp.float32),
                jax.ShapeDtypeStruct((g, num_transitions, tile_b),
                                     jnp.float32),
                jax.ShapeDtypeStruct((g, num_transitions, tile_b),
                                     jnp.float32),
            ),
            input_output_aliases={2: 0, 3: 1},
        )(seed, scal, x0, x1, *weights, *rand_arrays)

    return call


@functools.lru_cache(maxsize=None)
def _local_kernel_for(lt, lx, K, num_layers, num_transitions, tile_b,
                      bounded_q, rand, interpret, ablate_nets=False,
                      hop=False):
    return _build_local_kernel(lt, lx, K, num_layers, num_transitions,
                               tile_b, bounded_q, rand, interpret,
                               ablate_nets, hop)


def l2hmc_local_chain_pallas(
    links: jax.Array,
    params,
    key: jax.Array,
    eps,
    beta: float,
    num_leapfrog: int,
    num_transitions: int,
    num_layers: int,
    bounded_q: bool = True,
    tile_b: int = 0,
    interpret: bool = False,
    rand_arrays=None,
    ablate_nets: bool = False,
    hop: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused chain of trained LOCAL-stencil L2HMC transitions (VERDICT r4
    item 1: the in-kernel 5-point stencil conditioner).

    Same contract as :func:`l2hmc_chain_pallas` but ``params`` are
    ``make_local_flat_net`` DynamicsParams of depth ``num_layers``
    (``network_arch='local_flat'``).  Designed for LARGE volume: small
    sublane tiles (multiples of 8, not 128) via the transposed trace
    layout, stencil weights scalar-resident in SMEM, shifted reads as
    VMEM lane rolls.  ``hop=True`` fuses one instanton hop per
    transition (the champion+hop topological sampler).
    """
    b, lt, lx, _ = links.shape
    d = lt * lx
    weights = pack_local_weights(params, 2 * d, num_layers)
    channels = weights[0].shape[2]

    # live (tile_b, d) rows: carry/state/trig ~20 + stencil accumulators
    # and layer outputs ~2c + head temps; masks + lane-padded traces are
    # tile-independent extras
    rows = 28 + 2 * channels + (3 if hop else 0)
    fixed = 2 * num_leapfrog * d * 4 + 6 * num_transitions * 128 * 4
    if tile_b <= 0:
        budget = (11 << 20) - fixed
        tile_b = max(8, min(b, (budget // (4 * rows * d) // 8) * 8))
    while b % tile_b != 0 and tile_b > 1:
        tile_b -= 1
    est = fixed + tile_b * 4 * rows * d
    if est > (14 << 20):
        raise ValueError(
            f"fused local chain would need ~{est >> 20} MB VMEM "
            f"(tile_b={tile_b}, d={d}, c={channels}, N={num_transitions}); "
            "shrink num_transitions per call or use the XLA path")

    rand = "input" if rand_arrays is not None else "prng"
    call = _local_kernel_for(lt, lx, num_leapfrog, num_layers,
                             num_transitions, tile_b, bounded_q, rand,
                             interpret, ablate_nets, hop)

    g = b // tile_b
    x0 = links[..., 0].reshape(b, d).astype(jnp.float32)
    x1 = links[..., 1].reshape(b, d).astype(jnp.float32)
    seed = jnp.asarray(
        jax.random.randint(key, (1,), 0, np.iinfo(np.int32).max), jnp.int32)
    scal = jnp.stack([jnp.asarray(eps, jnp.float32),
                      jnp.asarray(beta, jnp.float32)])
    extra = ()
    if rand == "input":
        if hop and len(rand_arrays) != 6:
            raise ValueError("hop=True with injected randomness needs "
                             "rand_arrays=(v0s, v1s, ds, us, nus, uhs)")

        def chainwise(a):   # (N, b) -> (G, N, tile_b), chain c = i*tb + j
            a = jnp.asarray(a, jnp.float32)
            return a.reshape(num_transitions, g, tile_b).transpose(1, 0, 2)

        v0s, v1s = (jnp.asarray(a, jnp.float32) for a in rand_arrays[:2])
        extra = (v0s, v1s) + tuple(chainwise(a) for a in rand_arrays[2:])
    x0, x1, plaqs, chgs, probs = call(b, x0, x1, seed, scal, weights, *extra)

    def fix(o):             # (G, N, tile_b) -> (N, b)
        return jnp.moveaxis(o, 0, 1).reshape(num_transitions, b)

    out = jnp.stack([x0.reshape(b, lt, lx), x1.reshape(b, lt, lx)], axis=-1)
    return out, fix(plaqs), jnp.round(fix(chgs)), fix(probs)
