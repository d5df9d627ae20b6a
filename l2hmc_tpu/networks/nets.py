"""Scale/translation/transformation (S, T, Q) networks.

Rebuild of the reference's network layer (L2 of SURVEY §1):

- :func:`make_mlp_net` — GenericNet parity (``network/generic_net.py:20-161``):
  per-input dense embeddings with factor-scaled variance-scaling init, summed,
  ReLU, hidden dense, ReLU, then three heads:
  ``scale = tanh(dense) * exp(coeff_scale)``, ``translation = dense``,
  ``transformation = dense * exp(coeff_transformation)`` (note: the reference
  applies **no** tanh to the transformation head despite its docstring —
  ``generic_net.py:141-146``, ``conv_net.py:270-276``; we reproduce the code,
  not the docstring).

- :func:`make_conv_net` — TPU-native redesign of ConvNet3D
  (``network/conv_net.py:57-310``).  The reference reshapes the ``(L, L, 2)``
  link field to a depth-2 3-D volume with one channel and runs Conv3D with
  zero 'same' padding (its periodic-padding helper is broken and never called,
  ``conv_net.py:22-53``).  Here the two link directions are **channels** of a
  2-D field — the natural mapping onto XLA:TPU's conv-as-matmul lowering — and
  padding is **correctly periodic** (toroidal), matching the lattice geometry.

All networks are pure ``init``/``apply`` pairs over plain dict pytrees: no
framework state, trivially shardable, friendly to `jax.checkpoint`.

Call contract (L2->L3, SURVEY §1): ``apply(params, a, b, t) -> (S, T, Q)``
with ``a, b`` of shape ``(batch, x_dim)`` and ``t`` of shape ``(batch, 2)``.
For the position net ("XNet"): ``a = momentum``, ``b = masked position``.
For the momentum net ("VNet"): ``a = position``, ``b = potential gradient``.
(Reference argument order ``net([v, x, t])`` — ``generic_net.py:130-136``.)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]
NetApply = Callable[..., Tuple[jax.Array, jax.Array, jax.Array]]


def _variance_scaling(key, shape, factor: float, dtype=jnp.float32):
    """Truncated-normal variance scaling, fan-in mode.

    Parity with TF1 ``variance_scaling_initializer(factor=2*f, FAN_IN,
    uniform=False)`` used by ``_custom_dense`` (``generic_net.py:149-161``):
    stddev = sqrt(1.3 * 2*f / fan_in) accounting for truncation at 2 sigma.
    """
    fan_in = shape[0]
    stddev = np.sqrt(1.3 * 2.0 * factor / fan_in)
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def _dense_init(key, in_dim: int, out_dim: int, factor: float) -> Params:
    return {
        "w": _variance_scaling(key, (in_dim, out_dim), factor),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def _dense(p: Params, x: jax.Array, compute_dtype=None) -> jax.Array:
    """Dense layer; optionally bfloat16 matmul with f32 accumulation (MXU)."""
    w = p["w"]
    if compute_dtype is not None and compute_dtype != jnp.float32:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


@dataclasses.dataclass(frozen=True)
class MLPNetSpec:
    """Static architecture spec for the GenericNet-parity MLP.

    ``bounded_q=False`` reproduces the gauge fork's GenericNet
    (``generic_net.py:141-146``: transformation head has NO tanh);
    ``bounded_q=True`` reproduces the original brain-research network used
    on the MoG/SCG/VAE paths (``utils/network.py:89-114``: ScaleTanh on both
    the S and Q heads), which also keeps ``exp(eps*q)`` in the integrator
    bounded — the unbounded variant can blow up at aggressive learning rates.
    """

    x_dim: int
    num_hidden: int
    factor: float = 1.0  # 2.0 for XNet, 1.0 for VNet (gauge_dynamics.py:169-187)
    use_bf16: bool = False
    bounded_q: bool = False
    aux_dim: int = 0  # conditioning input (VAE data batch, utils/dynamics.py:120-170)


def make_mlp_net(spec: MLPNetSpec):
    """Build (init, apply) for the GenericNet-parity MLP."""

    compute_dtype = jnp.bfloat16 if spec.use_bf16 else None

    def init(key: jax.Array) -> Params:
        ks = jax.random.split(key, 7)
        h, d = spec.num_hidden, spec.x_dim
        params = {
            # factor conventions: x-embed factor/3, v-embed 1/3, t-embed 1/3,
            # hidden 1.0, heads 0.001 (generic_net.py:37-90).
            "x_layer": _dense_init(ks[0], d, h, spec.factor / 3.0),
            "v_layer": _dense_init(ks[1], d, h, 1.0 / 3.0),
            "t_layer": _dense_init(ks[2], 2, h, 1.0 / 3.0),
            "h_layer": _dense_init(ks[3], h, h, 1.0),
            "scale_layer": _dense_init(ks[4], h, d, 0.001),
            "translation_layer": _dense_init(ks[5], h, d, 0.001),
            "transformation_layer": _dense_init(
                jax.random.fold_in(ks[5], 1), h, d, 0.001
            ),
            "coeff_scale": jnp.zeros((1, d), jnp.float32),
            "coeff_transformation": jnp.zeros((1, d), jnp.float32),
        }
        if spec.aux_dim > 0:
            params["aux_layer"] = _dense_init(ks[6], spec.aux_dim, h, 1.0 / 3.0)
        return params

    def apply(params: Params, v: jax.Array, x: jax.Array, t: jax.Array, aux=None):
        # reference call order: net([v, x, t]) (generic_net.py:130-136);
        # optional aux conditioning is summed into the embedding like the
        # other inputs (utils/dynamics.py:120-170 semantics).
        h = (
            _dense(params["v_layer"], v, compute_dtype)
            + _dense(params["x_layer"], x, compute_dtype)
            + _dense(params["t_layer"], t, compute_dtype)
        )
        if aux is not None and "aux_layer" in params:
            h = h + _dense(params["aux_layer"], aux, compute_dtype)
        h = jax.nn.relu(h)
        h = jax.nn.relu(_dense(params["h_layer"], h, compute_dtype))
        scale = jnp.tanh(_dense(params["scale_layer"], h, compute_dtype)) * jnp.exp(
            params["coeff_scale"]
        )
        translation = _dense(params["translation_layer"], h, compute_dtype)
        q_raw = _dense(params["transformation_layer"], h, compute_dtype)
        if spec.bounded_q:
            q_raw = jnp.tanh(q_raw)
        transformation = q_raw * jnp.exp(params["coeff_transformation"])
        return scale, translation, transformation

    return init, apply


# ---------------------------------------------------------------------------
# Periodic (toroidal) CNN — TPU-native ConvNet3D equivalent
# ---------------------------------------------------------------------------


def periodic_pad_2d(x: jax.Array, kernel: int) -> jax.Array:
    """Wrap-pad the two spatial axes of an NHWC tensor for a ``kernel``-wide
    conv: total pad ``kernel - 1`` split (k-1)//2 left, k//2 right, so a
    VALID conv yields exactly L (stride 1) or ceil(L/s) (stride s) outputs.

    Correct toroidal geometry — what ``conv_net.py:22-53`` intended but never
    shipped (it is buggy and unused; the reference silently zero-pads).
    """
    pl, pr = (kernel - 1) // 2, kernel // 2
    if pl == 0 and pr == 0:
        return x
    def cat(a, axis):
        parts = []
        if pl:
            parts.append(jax.lax.slice_in_dim(a, a.shape[axis] - pl, a.shape[axis], axis=axis))
        parts.append(a)
        if pr:
            parts.append(jax.lax.slice_in_dim(a, 0, pr, axis=axis))
        return jnp.concatenate(parts, axis=axis)
    return cat(cat(x, 1), 2)


def _conv_init(key, kh: int, kw: int, cin: int, cout: int) -> Params:
    # He-normal (matches the Conv3D default-ish glorot closely enough; conv
    # feeds ReLU so He scaling is the right choice).
    fan_in = kh * kw * cin
    w = jax.random.normal(key, (kh, kw, cin, cout)) * np.sqrt(2.0 / fan_in)
    return {"w": w, "b": jnp.zeros((cout,), jnp.float32)}


def _conv2d_periodic(p: Params, x: jax.Array, compute_dtype=None) -> jax.Array:
    """3x3 (or kxk) conv, periodic padding, NHWC, f32 accumulation."""
    k = p["w"].shape[0]
    x = periodic_pad_2d(x, k)
    w = p["w"]
    if compute_dtype is not None and compute_dtype != jnp.float32:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


@dataclasses.dataclass(frozen=True)
class ConvNetSpec:
    """Static spec for the periodic-CNN S/T/Q network.

    Redesign of ConvNet3D (``conv_net.py:57-310``): the reference's
    (conv3d -> maxpool3d) x2 stacks become (periodic conv2d -> relu) x2 with
    stride-2 spatial reduction on the second conv.  Pooling-by-strided-conv
    keeps the MXU busy instead of bouncing through a bandwidth-bound pool op,
    and the link direction lives on the channel axis where TPUs want it.
    """

    time_size: int
    space_size: int
    num_filters: int = 8
    filter_size1: int = 3
    filter_size2: int = 2
    num_hidden: int = 256
    factor: float = 1.0
    use_bf16: bool = False

    @property
    def x_dim(self) -> int:
        return self.time_size * self.space_size * 2


def make_conv_net(spec: ConvNetSpec):
    """Build (init, apply) for the periodic-CNN S/T/Q network."""

    compute_dtype = jnp.bfloat16 if spec.use_bf16 else None
    lt, lx = spec.time_size, spec.space_size
    f1, f2 = spec.num_filters, 2 * spec.num_filters
    # After one stride-2 stage (on the second conv) the spatial field is
    # ceil(L/2) x ceil(L/2) with 2*num_filters channels.
    lt2, lx2 = (lt + 1) // 2, (lx + 1) // 2
    conv_out_dim = lt2 * lx2 * f2
    d = spec.x_dim
    h = spec.num_hidden

    def init(key: jax.Array) -> Params:
        ks = jax.random.split(key, 11)
        return {
            "conv_x1": _conv_init(ks[0], spec.filter_size1, spec.filter_size1, 2, f1),
            "conv_x2": _conv_init(ks[1], spec.filter_size2, spec.filter_size2, f1, f2),
            "conv_v1": _conv_init(ks[2], spec.filter_size1, spec.filter_size1, 2, f1),
            "conv_v2": _conv_init(ks[3], spec.filter_size2, spec.filter_size2, f1, f2),
            "x_layer": _dense_init(ks[4], conv_out_dim, h, spec.factor / 3.0),
            "v_layer": _dense_init(ks[5], conv_out_dim, h, 1.0 / 3.0),
            "t_layer": _dense_init(ks[6], 2, h, 1.0 / 3.0),
            "h_layer": _dense_init(ks[7], h, h, 1.0),
            "scale_layer": _dense_init(ks[8], h, d, 0.001),
            "translation_layer": _dense_init(ks[9], h, d, 0.001),
            "transformation_layer": _dense_init(ks[10], h, d, 0.001),
            "coeff_scale": jnp.zeros((1, d), jnp.float32),
            "coeff_transformation": jnp.zeros((1, d), jnp.float32),
        }

    def conv_stack(p1: Params, p2: Params, flat: jax.Array) -> jax.Array:
        img = flat.reshape(-1, lt, lx, 2)
        y = jax.nn.relu(_conv2d_periodic(p1, img, compute_dtype))
        # stride-2 reduction fused into the second conv
        k = p2["w"].shape[0]
        y = periodic_pad_2d(y, k)
        w = p2["w"]
        if compute_dtype is not None:
            y = y.astype(compute_dtype)
            w = w.astype(compute_dtype)
        y = jax.lax.conv_general_dilated(
            y, w, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + p2["b"]
        y = jax.nn.relu(y)
        return y.reshape(flat.shape[0], -1)

    def apply(params: Params, v: jax.Array, x: jax.Array, t: jax.Array, aux=None):
        xc = conv_stack(params["conv_x1"], params["conv_x2"], x)
        vc = conv_stack(params["conv_v1"], params["conv_v2"], v)
        hh = (
            _dense(params["v_layer"], vc, compute_dtype)
            + _dense(params["x_layer"], xc, compute_dtype)
            + _dense(params["t_layer"], t, compute_dtype)
        )
        hh = jax.nn.relu(hh)
        hh = jax.nn.relu(_dense(params["h_layer"], hh, compute_dtype))
        scale = jnp.tanh(_dense(params["scale_layer"], hh, compute_dtype)) * jnp.exp(
            params["coeff_scale"]
        )
        translation = _dense(params["translation_layer"], hh, compute_dtype)
        transformation = _dense(
            params["transformation_layer"], hh, compute_dtype
        ) * jnp.exp(params["coeff_transformation"])
        return scale, translation, transformation

    return init, apply


def make_zero_net(x_dim: int):
    """HMC-degenerate network: S = T = Q = 0.

    Reference: ``dynamics/gauge_dynamics.py:102-108`` and
    ``utils/dynamics.py:75-78`` — with zero nets the augmented leapfrog
    reduces exactly to plain leapfrog.
    """

    def init(key: jax.Array) -> Params:
        return {}

    def apply(params: Params, v: jax.Array, x: jax.Array, t: jax.Array, aux=None):
        z = jnp.zeros_like(v)
        return z, z, z

    return init, apply
