"""U(1) lattice gauge L2HMC trainer — the ``GaugeModel`` equivalent.

Rebuild of the main trainer (``gauge_model.py:185-2033``) as pure jitted
functions around a single :class:`TrainState` pytree:

- loss graph: dynamics on ``x`` and on auxiliary ``z ~ N(0,1)``, squared-jump
  ESS loss + Fourier-surrogate topological-charge loss
  (``gauge_model.py:728-797``),
- Adam with exponential lr decay and global-norm clipping
  (``gauge_model.py:799-832,929-945``),
- beta annealed linearly in 1/beta (``gauge_model.py:1039-1046``),
- the mod-2pi rewrap kept on-device inside the step (the reference does it
  on host every step, ``gauge_model.py:1180``),
- training chunked into ``lax.scan`` blocks so the host sees one dispatch
  per logging period instead of one ``sess.run`` per step
  (``gauge_model.py:1163-1177``).

Distribution: chain batch is sharded over the mesh 'data' axis by
``l2hmc_tpu.parallel``; the gradient mean over chains is a single global
reduction XLA lowers to a psum over ICI — no Horovod-style optimizer wrapper
(SURVEY §5.8).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from l2hmc_tpu.dynamics.l2hmc import (
    DynamicsConfig,
    DynamicsParams,
    get_eps,
    init_dynamics_params,
    make_dynamics,
)
from l2hmc_tpu.lattice import u1
from l2hmc_tpu.networks.nets import (
    ConvNetSpec,
    MLPNetSpec,
    make_conv_net,
    make_mlp_net,
)
from l2hmc_tpu.train import losses, schedules


@dataclasses.dataclass(frozen=True)
class GaugeConfig:
    """Static configuration (reference PARAMS, ``globals.py:17-62`` +
    ``gauge_model_args.txt``)."""

    time_size: int = 8
    space_size: int = 8
    num_chains: int = 128            # reference num_samples
    num_steps: int = 3               # leapfrog steps (args.txt: 3)
    eps_init: float = 0.35
    eps_cap: float = 0.0             # see DynamicsConfig.eps_cap
    eps_trainable: bool = True
    hmc: bool = False
    network_arch: str = "conv"   # 'conv'|'mlp'|'local'|'local_flat'|'zero'
    num_hidden: int = 0              # 0 -> 2 * x_dim (gauge_dynamics.py:129)
    num_filters: int = 8             # conv stack width; 'local' channel count
    local_kernel: int = 3            # 'local' conditioner conv kernel size
    local_layers: int = 2            # 'local' conditioner conv depth
    use_bf16: bool = False
    # tanh-bound the transformation head.  The fork's GenericNet/ConvNet3D
    # leave Q unbounded (generic_net.py:141-146); exp(eps*q) then explodes a
    # few hundred steps into training (log-det inflates, acceptance admits
    # garbage, gradients go NaN).  Bounded is the original paper's design
    # and the stable default; set False for literal fork parity.
    bounded_q: bool = True
    # kernel state-space group: 'u1' (exact torus kernel: periodic net
    # features + circle-scaling update; detailed balance holds exactly under
    # the mod-2pi fold) or 'r1' (the fork's literal flat kernel + wrap,
    # which we measured to bias the 8x8 beta=4 plaquette by ~0.027).
    group: str = "u1"
    # loss
    metric: str = "cos_diff"
    loss_scale: float = 0.1
    std_weight: float = 1.0
    aux_weight: float = 1.0
    charge_weight: float = 1.0
    # flip the charge term to reward accepted charge movement
    # (loss -= charge_weight * px * dq) instead of the reference's literal
    # penalizing sign (gauge_model.py:783-795) — see losses.charge_loss
    charge_reward: bool = False
    # literal reference z-term dataflow: the reference computes BOTH the
    # z std-loss and the z charge term against the X-chain proposal
    # (metric_fn(z, x_) at gauge_model.py:776 and diff(z, x_) at :788),
    # almost certainly a typo for the z-chain proposal.  Default False uses
    # the z proposal (the paper's auxiliary-term semantics); True reproduces
    # the reference bit-for-bit for differential studies.
    ref_z_term: bool = False
    # optimization
    lr_init: float = 1e-3
    lr_decay_steps: int = 1000
    lr_decay_rate: float = 0.96
    lr_warmup_steps: int = 200   # see schedules.make_lr_schedule
    # Width-scaled learning rate (muP-style): Adam moves every parameter by
    # ~lr, so the network-output jump per step grows linearly with the
    # hidden fan-in; the reference lr (1e-3) is tuned for hidden ~512 (8x8).
    # Effective lr = lr_init * min(1, lr_width_ref / hidden).  At 32x32
    # (hidden 4096) the unscaled lr drives eps and the heads past the
    # kernel's stability region inside the warmup.
    lr_width_ref: int = 512
    clip_value: float = 1.0          # 0 -> no clipping
    train_steps: int = 5000
    # annealing
    beta_init: float = 2.0
    beta_final: float = 4.0
    # both_directions debug parity mode
    both_directions: bool = False
    # merge adjacent momentum half-steps across leapfrog steps (K+1 VNet
    # calls instead of 2K; see DynamicsConfig.merge_v_halves).  Exact kernel,
    # different learned family; off by default for reference parity.
    merge_v_halves: bool = False
    # gauge action: 'wilson' (analytic-VJP hot path) or 'improved'
    # (tree-level Symanzik, u1.improved_action).  Note the exact-plaquette
    # oracle I1/I0(beta) applies to the Wilson action only.
    action: str = "wilson"
    rect_c1: float = -1.0 / 12.0     # rectangle coefficient for 'improved'
    # > 0: for the first N steps, drive eps by Nesterov dual averaging on
    # the mean acceptance (dynamics/nuts.py dual_averaging_update) instead
    # of the ESJD gradient; at handoff raw_eps is set to the smoothed
    # exp(log_eps_avg) and gradient training takes over.  This replaces the
    # hand-found large-volume recipes (e.g. the 128x128 fixed eps=0.012):
    # the acceptance cliff tightens with volume and a wrong eps_init lands
    # in the zero-acceptance dead-gradient trap before the ESJD gradient
    # can correct it.  Don't combine with eps_cap (the cap starves the
    # feedback loop once acceptance saturates above target).
    eps_warmup_steps: int = 0
    eps_target_accept: float = 0.7
    # interleave one exact instanton hop (dynamics/topo.py) into the
    # training chain after every step.  At beta >= 5 the annealed training
    # chains are topologically FROZEN (tau_int(Q) ~ 1200 at 16x16), so the
    # conditioners never see the equilibrium Q-sector spread and misfire on
    # equilibrated states (measured: probe-eval acc 0.88 from training
    # chains vs 0.46 from a Metropolis-warm start, beta=5).  The hop keeps
    # the training distribution sector-complete at ~zero cost; the chain
    # stays exactly stationary for the annealed target (both moves are
    # beta-stationary).
    train_hops: bool = False
    # per-variable parameter AND gradient summaries (mean/std/min/max/l2)
    # computed on-device inside the train step and returned in the metrics
    # dict under 'params/...' / 'grads/...' keys, so they land in the JSONL
    # record every logging chunk — the reference attaches tf.summary
    # mean/std/min/max/histogram to every trainable variable and its
    # gradient (gauge_model.py:853-886, utils/tf_logging.py:74-86)
    grad_summaries: bool = False

    @property
    def shape(self) -> u1.LatticeShape:
        return u1.LatticeShape(self.time_size, self.space_size)

    @property
    def x_dim(self) -> int:
        return self.shape.x_dim

    @property
    def hidden(self) -> int:
        return self.num_hidden if self.num_hidden > 0 else 2 * self.x_dim


class TrainState(NamedTuple):
    """Everything that evolves during training — one checkpointable pytree
    (SURVEY §5.4: single source of truth, vs the reference's three
    overlapping mechanisms)."""

    params: DynamicsParams
    opt_state: Any
    x: jax.Array          # (num_chains, x_dim) current chain state
    step: jax.Array       # int32
    # dual-averaging warmup state for eps (4 scalars; active only while
    # step < cfg.eps_warmup_steps — see GaugeConfig.eps_warmup_steps)
    da: Any = None


def build_networks(cfg: GaugeConfig):
    """XNet (position, factor=2) and VNet (momentum, factor=1) —
    ``gauge_dynamics.py:121-187``."""
    # periodic (cos,sin) position features double the position input slot
    pos_dim = 2 * cfg.x_dim if cfg.group == "u1" else 0
    pos_ch = 4 if cfg.group == "u1" else 2
    if cfg.network_arch == "mlp":
        xi, xa = make_mlp_net(
            MLPNetSpec(cfg.x_dim, cfg.hidden, factor=2.0, use_bf16=cfg.use_bf16,
                       bounded_q=cfg.bounded_q, x_in_dim=pos_dim)
        )
        vi, va = make_mlp_net(
            MLPNetSpec(cfg.x_dim, cfg.hidden, factor=1.0, use_bf16=cfg.use_bf16,
                       bounded_q=cfg.bounded_q, v_in_dim=pos_dim)
        )
    elif cfg.network_arch == "conv":
        xi, xa = make_conv_net(ConvNetSpec(
            cfg.time_size, cfg.space_size, num_filters=cfg.num_filters,
            num_hidden=cfg.hidden, factor=2.0, use_bf16=cfg.use_bf16,
            bounded_q=cfg.bounded_q, x_channels=pos_ch,
        ))
        vi, va = make_conv_net(ConvNetSpec(
            cfg.time_size, cfg.space_size, num_filters=cfg.num_filters,
            num_hidden=cfg.hidden, factor=1.0, use_bf16=cfg.use_bf16,
            bounded_q=cfg.bounded_q, v_channels=pos_ch,
        ))
    elif cfg.network_arch == "local":
        # weight-shared per-link conditioner: O(V) cost with a tiny
        # constant — the volume-scalable family (VERDICT r3 item 2)
        from l2hmc_tpu.networks.nets import LocalNetSpec, make_local_net

        xi, xa = make_local_net(LocalNetSpec(
            cfg.time_size, cfg.space_size, channels=cfg.num_filters,
            kernel_size=cfg.local_kernel, num_layers=cfg.local_layers,
            factor=2.0, use_bf16=cfg.use_bf16, bounded_q=cfg.bounded_q,
            x_channels=pos_ch,
        ))
        vi, va = make_local_net(LocalNetSpec(
            cfg.time_size, cfg.space_size, channels=cfg.num_filters,
            kernel_size=cfg.local_kernel, num_layers=cfg.local_layers,
            factor=1.0, use_bf16=cfg.use_bf16, bounded_q=cfg.bounded_q,
            v_channels=pos_ch,
        ))
    elif cfg.network_arch == "local_flat":
        # flat-layout stencil edition of 'local' (r4): same family, no
        # image round-trips; see nets.make_local_flat_net
        from l2hmc_tpu.networks.nets import LocalNetSpec, make_local_flat_net

        xi, xa = make_local_flat_net(LocalNetSpec(
            cfg.time_size, cfg.space_size, channels=cfg.num_filters,
            kernel_size=cfg.local_kernel, num_layers=cfg.local_layers,
            factor=2.0, use_bf16=cfg.use_bf16, bounded_q=cfg.bounded_q,
            x_channels=pos_ch,
        ))
        vi, va = make_local_flat_net(LocalNetSpec(
            cfg.time_size, cfg.space_size, channels=cfg.num_filters,
            kernel_size=cfg.local_kernel, num_layers=cfg.local_layers,
            factor=1.0, use_bf16=cfg.use_bf16, bounded_q=cfg.bounded_q,
            v_channels=pos_ch,
        ))
    elif cfg.network_arch == "zero":
        from l2hmc_tpu.networks.nets import make_zero_net

        xi, xa = make_zero_net(cfg.x_dim)
        vi, va = make_zero_net(cfg.x_dim)
    else:
        raise ValueError(f"network_arch={cfg.network_arch!r}")
    return (xi, xa), (vi, va)


def build_dynamics(cfg: GaugeConfig):
    dyn_cfg = DynamicsConfig(
        x_dim=cfg.x_dim,
        num_steps=cfg.num_steps,
        eps_trainable=cfg.eps_trainable,
        hmc=cfg.hmc,
        both_directions=cfg.both_directions,
        group=cfg.group,
        eps_cap=cfg.eps_cap,
        merge_v_halves=cfg.merge_v_halves,
    )
    (xi, xa), (vi, va) = build_networks(cfg)
    if cfg.action == "improved":
        potential = u1.make_improved_potential_fn(cfg.shape, cfg.rect_c1)
    elif cfg.action == "wilson":
        # analytic-VJP Wilson action (ops/wilson.py): shares the plaquette
        # computation between S and dS/dx, keeps the backward to two rolls.
        from l2hmc_tpu.ops.wilson import make_potential_fn as make_fast_potential

        potential = make_fast_potential(cfg.shape)
    else:
        raise ValueError(f"action={cfg.action!r}")
    dyn = make_dynamics(dyn_cfg, potential, xa, va)
    return dyn_cfg, dyn, (xi, vi)


def _effective_lr(cfg: GaugeConfig) -> float:
    if cfg.network_arch in ("local", "local_flat"):
        # the local conditioners' head fan-in is k^2 * channels (weight
        # shared, volume-independent) — the width-scaling rationale (output
        # jump per Adam step grows with fan-in) does not apply; without
        # this branch local_flat silently trained at lr/32 at 64x64
        # (cfg.hidden defaults to 2*x_dim it never allocates)
        return cfg.lr_init
    return cfg.lr_init * min(1.0, cfg.lr_width_ref / max(cfg.hidden, 1))


def make_optimizer(cfg: GaugeConfig):
    lr = schedules.make_lr_schedule(
        _effective_lr(cfg), cfg.lr_decay_steps, cfg.lr_decay_rate,
        cfg.lr_warmup_steps
    )
    # zero_nans: one non-finite grad step must not poison params (the
    # reference's check_numerics would abort instead).
    chain = [optax.zero_nans()]
    if cfg.clip_value > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_value))
    chain.append(optax.adam(lr))
    tx = optax.chain(*chain)
    if not cfg.eps_trainable:
        # freeze raw_eps: mask it out of the optimizer update
        def mask(params):
            return params._replace(
                xnet=jax.tree.map(lambda _: True, params.xnet),
                vnet=jax.tree.map(lambda _: True, params.vnet),
                raw_eps=False,
                masks=False,
            )
        tx = optax.masked(tx, mask)
    return tx


def init_train_state(cfg: GaugeConfig, key: jax.Array) -> TrainState:
    from l2hmc_tpu.dynamics.nuts import dual_averaging_init

    kp, kx = jax.random.split(key)
    dyn_cfg, dyn, (xnet_init, vnet_init) = build_dynamics(cfg)
    params = init_dynamics_params(kp, dyn_cfg, xnet_init, vnet_init, cfg.eps_init)
    tx = make_optimizer(cfg)
    opt_state = tx.init(_trainable(params))
    x = u1.random_links(kx, cfg.num_chains, cfg.shape)
    return TrainState(params=params, opt_state=opt_state, x=x,
                      step=jnp.asarray(0, jnp.int32),
                      da=dual_averaging_init(cfg.eps_init))


def _trainable(params: DynamicsParams) -> DynamicsParams:
    """The masks are fixed buffers, not trainable; keep them out of optax
    by zero-ing their gradient instead of restructuring the pytree."""
    return params


def make_loss_fn(cfg: GaugeConfig, dyn):
    shape = cfg.shape
    if cfg.metric in ("plaq_cos", "plaq_cos2"):
        # Observable-space ESJD: measure the jump in the plaquette field
        # cos(P) — the space the eval ESS is scored in — instead of link
        # space (the reference zoo, gauge_model.py:631-657, is link-space
        # only).  Same (batch, n) -> summed-over-axis(-1) contract as the
        # link metrics, so esjd_loss is unchanged.
        sq = cfg.metric == "plaq_cos2"

        def metric_fn(x1, x2):
            p1 = u1.plaq_sums(u1.to_links(x1, shape))
            p2 = u1.plaq_sums(u1.to_links(x2, shape))
            d = jnp.cos(p1) - jnp.cos(p2)
            d = jnp.square(d) if sq else jnp.abs(d)
            return d.reshape(*d.shape[:-2], -1)
    else:
        metric_fn = losses.get_metric_fn(cfg.metric)

    def loss_fn(params: DynamicsParams, x: jax.Array, beta, key: jax.Array):
        kx, kz, kzi = jax.random.split(key, 3)
        out_x = dyn["transition"](params, x, beta, kx)
        z = jax.random.normal(kzi, x.shape, x.dtype)
        out_z = dyn["transition"](params, z, beta, kz)

        # ref_z_term: literal reference dataflow computes the z-terms
        # against the X-chain proposal (gauge_model.py:776,788); default
        # uses the z-chain proposal.  See GaugeConfig.ref_z_term.
        z_prop = out_x.x_proposed if cfg.ref_z_term else out_z.x_proposed

        loss = losses.esjd_loss(
            x, out_x.x_proposed, out_x.accept_prob,
            z, z_prop, out_z.accept_prob,
            metric_fn=metric_fn, loss_scale=cfg.loss_scale,
            aux_weight=cfg.aux_weight, std_weight=cfg.std_weight,
        )
        if cfg.charge_weight > 0:
            dq_x = u1.charge_diff_approx(x, out_x.x_proposed, shape)
            dq_z = u1.charge_diff_approx(z, z_prop, shape)
            loss = loss + losses.charge_loss(
                dq_x, out_x.accept_prob, dq_z, out_z.accept_prob,
                charge_weight=cfg.charge_weight, aux_weight=cfg.aux_weight,
                reward=cfg.charge_reward,
            )

        aux = {
            "x_out": out_x.x_out,
            "accept_prob": jnp.mean(out_x.accept_prob),
            "dq": jnp.mean(u1.charge_diff(x, out_x.x_out, shape)),
        }
        return loss, aux

    return loss_fn


def tree_summaries(tree, prefix: str):
    """Device-side per-leaf mean/std/min/max/l2 stats (traceable version of
    ``utils/io.variable_summaries``; reference ``tf_logging.py:74-86``)."""
    from l2hmc_tpu.utils.io import _path_str

    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        name = f"{prefix}/{_path_str(path)}"
        leaf = jnp.asarray(leaf)
        out[f"{name}/mean"] = jnp.mean(leaf)
        out[f"{name}/stddev"] = jnp.std(leaf)
        out[f"{name}/min"] = jnp.min(leaf)
        out[f"{name}/max"] = jnp.max(leaf)
        out[f"{name}/l2"] = jnp.sqrt(jnp.sum(jnp.square(leaf)))
    return out


def make_train_step(cfg: GaugeConfig):
    """Build the jitted single-step update ``(state, key) -> (state, metrics)``."""
    dyn_cfg, dyn, _ = build_dynamics(cfg)
    loss_fn = make_loss_fn(cfg, dyn)
    tx = make_optimizer(cfg)
    lr_sched = schedules.make_lr_schedule(
        _effective_lr(cfg), cfg.lr_decay_steps, cfg.lr_decay_rate,
        cfg.lr_warmup_steps
    )

    def train_step(state: TrainState, key: jax.Array):
        from l2hmc_tpu.dynamics.nuts import dual_averaging_update

        beta = schedules.beta_schedule(
            state.step, cfg.train_steps, cfg.beta_init, cfg.beta_final
        )
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.x, beta, key
        )
        # masks are constant buffers: null their grads
        grads = grads._replace(masks=jnp.zeros_like(grads.masks))
        if not cfg.eps_trainable:
            grads = grads._replace(raw_eps=jnp.zeros_like(grads.raw_eps))
        in_warmup = state.step < cfg.eps_warmup_steps
        if cfg.eps_warmup_steps > 0:
            # dual-averaging drives eps during warmup; keep the ESJD eps
            # gradient out of Adam's moments meanwhile
            grads = grads._replace(
                raw_eps=jnp.where(in_warmup, 0.0, grads.raw_eps))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        da = state.da
        if cfg.eps_warmup_steps > 0:
            da_next = dual_averaging_update(
                state.da, aux["accept_prob"], target=cfg.eps_target_accept)
            da = jax.tree.map(
                lambda a, b: jnp.where(in_warmup, a, b), da_next, state.da)
            # exploration value while adapting; smoothed average from the
            # last warmup step onward (the handoff value gradient training
            # continues from)
            last_warmup = state.step == (cfg.eps_warmup_steps - 1)
            eps_da = jnp.exp(
                jnp.where(last_warmup, da.log_eps_avg, da.log_eps))
            params = params._replace(raw_eps=jnp.where(
                in_warmup, eps_da.astype(params.raw_eps.dtype),
                params.raw_eps))

        x_new = u1.wrap(aux["x_out"])
        if cfg.train_hops:
            from l2hmc_tpu.dynamics import topo

            x_new = topo.instanton_hop(
                x_new, beta, jax.random.fold_in(key, 77), cfg.shape).x_out
        obs = u1.observables(x_new, cfg.shape)
        metrics = {
            "loss": loss,
            "accept_prob": aux["accept_prob"],
            "dq": aux["dq"],
            "eps": get_eps(params, dyn_cfg),
            "beta": beta,
            "lr": lr_sched(state.step),
            "actions": jnp.mean(obs["actions"]),
            "plaqs": jnp.mean(obs["plaqs"]),
            "charges2": jnp.mean(jnp.square(obs["charges"])),
        }
        if cfg.grad_summaries:
            # when a 32x32 run blows up, the JSONL must show which
            # parameter group moved (VERDICT r2 missing item 1)
            metrics.update(tree_summaries(grads, "grads"))
            metrics.update(tree_summaries(params, "params"))
            metrics["grads/global_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            params=params, opt_state=opt_state, x=x_new, step=state.step + 1,
            da=da,
        )
        return new_state, metrics

    return train_step


def make_train_chunk(cfg: GaugeConfig, chunk_size: int):
    """Scan ``chunk_size`` train steps in one device program.

    One host dispatch + one metrics transfer per chunk — the TPU-native
    answer to the reference's per-step ``sess.run`` with 10 fetches.
    """
    step_fn = make_train_step(cfg)

    @jax.jit
    def chunk(state: TrainState, key: jax.Array):
        keys = jax.random.split(key, chunk_size)
        return jax.lax.scan(step_fn, state, keys)

    return chunk


def train_to_convergence(cfg: GaugeConfig, key: jax.Array, *,
                         chunk_size: int = 250, retrain_acc: float = 0.0,
                         max_retrains: int = 3, trace=None):
    """Train the sampler; detect-and-retrain on the beta>=5 bimodality.

    At beta >= 5 the annealed training recipe lands in one of two
    perfectly separable basins (measured over 8 seeds at 16x16:
    end-of-training acceptance 0.55 +- 0.03 in the failed basin vs
    0.87 +- 0.01 converged — no overlap; RESULTS.md r4), a coin flip
    that made the shipped recipe's UNCONDITIONAL quality untrustworthy.
    ``retrain_acc`` > 0 arms the detector: when the mean acceptance over
    the tail of the final training chunk falls below it, training
    restarts from a fresh fold of the seed, up to ``max_retrains``
    extra attempts.  The threshold sits between the basins (0.7 is the
    midpoint of the measured gap).

    Returns ``(state, last_metrics, attempts)`` where ``attempts`` is
    the per-attempt record (for params.json provenance).  ``trace`` is
    an optional ``fn(msg)`` progress callback.
    """
    chunk_size = min(chunk_size, max(cfg.train_steps, 1))
    chunk = make_train_chunk(cfg, chunk_size)
    attempts = []
    state = m = None
    for attempt in range(max_retrains + 1):
        akey = key if attempt == 0 else jax.random.fold_in(key, 7700 + attempt)
        state = init_train_state(cfg, akey)
        kk = akey
        for _ in range(max(cfg.train_steps // chunk_size, 1)):
            kk, sub = jax.random.split(kk)
            state, m = chunk(state, sub)
        tail = np.asarray(m["accept_prob"])[-min(50, chunk_size):]
        end_acc = float(tail.mean())
        attempts.append({"attempt": attempt,
                         "end_accept": round(end_acc, 4)})
        converged = retrain_acc <= 0 or end_acc >= retrain_acc
        if trace is not None:
            trace(f"training attempt {attempt}: end acc {end_acc:.3f}"
                  + ("" if converged else
                     f" < {retrain_acc} — retraining"))
        if converged:
            break
    return state, m, attempts


def make_eval_chunk(cfg: GaugeConfig, chunk_size: int):
    """Sampling-only chunk (no grads) for in-training evaluation and the
    post-training ``run`` protocol (``gauge_model.py:1304-1460``)."""
    _, dyn, _ = build_dynamics(cfg)
    shape = cfg.shape

    @jax.jit
    def chunk(params: DynamicsParams, x: jax.Array, beta, key: jax.Array):
        def body(x, k):
            out = dyn["transition"](params, x, beta, k)
            x_new = u1.wrap(out.x_out)
            obs = u1.observables(x_new, shape)
            step_metrics = {
                "accept_prob": out.accept_prob,
                "actions": obs["actions"],
                "plaqs": obs["plaqs"],
                "charges": obs["charges"],
                # 2x2 Wilson loop: string-tension observable with the exact
                # 2-D area-law anchor (I1/I0)^4 (lattice/u1.py wilson_loop)
                "wloop22": u1.wilson_loop(u1.to_links(x_new, shape), 2, 2),
            }
            return x_new, step_metrics

        keys = jax.random.split(key, chunk_size)
        return jax.lax.scan(body, x, keys)

    return chunk
