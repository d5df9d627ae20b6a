"""Annealing and learning-rate schedules.

- beta annealing: linear in 1/beta from beta_init to beta_final over the
  training run (``gauge_model.py:1039-1046``),
- exponential learning-rate decay (``gauge_model.py:934-939``),
- multiplicative temperature annealing with *dynamic* adaptation driven by
  measured tunneling rates (``mog_model.py:940-952,489-663``) — the schedule
  state is a small pytree updated from diagnostics, not Python mutation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def beta_schedule(step, train_steps: int, beta_init: float, beta_final: float):
    """Inverse-beta-linear annealing (``gauge_model.py:1039-1046``)::

        1/beta(t) = (1 - t/T) * 1/beta_init + (t/T) * 1/beta_final
    """
    frac = jnp.clip(step / max(train_steps, 1), 0.0, 1.0)
    inv = (1.0 - frac) / beta_init + frac / beta_final
    return 1.0 / inv


def make_lr_schedule(
    lr_init: float, decay_steps: int, decay_rate: float, warmup_steps: int = 0
):
    """Exponential decay ``lr * rate^(t/steps)`` (``gauge_model.py:934-939``)
    with an optional linear warmup.

    Warmup is NOT in the reference but is load-bearing at scale: Adam's
    first update moves every parameter by ~lr, and with fan-in ~2*x_dim the
    S/T/Q outputs jump O(lr * hidden) in function space — at 16x16 that is
    enough to collapse acceptance to exactly 0 in one step, after which the
    ESJD gradient vanishes (px = 0) and training is dead.  A few hundred
    warmup steps keep early updates inside the kernel's stable region.
    """
    decay = optax.exponential_decay(
        init_value=lr_init, transition_steps=decay_steps, decay_rate=decay_rate,
        staircase=False,
    )
    if warmup_steps <= 0:
        return decay
    warmup = optax.linear_schedule(0.0, lr_init, warmup_steps)
    return optax.join_schedules([warmup, decay], [warmup_steps])


class TemperatureSchedule(NamedTuple):
    """State of the MoG temperature annealer (``mog_model.py:489-663``).

    ``temperature`` multiplies T <- T*factor every ``annealing_steps`` until
    T == 1; the dynamic adaptation shrinks the factor (anneal slower) when
    the measured tunneling rate drops, and fast-forwards when it is healthy.
    """

    temperature: jax.Array           # current T >= 1
    annealing_factor: jax.Array      # multiplicative factor < 1
    steps_since_update: jax.Array    # int32 counter


def init_temperature(t_init: float = 10.0, factor: float = 0.98) -> TemperatureSchedule:
    return TemperatureSchedule(
        temperature=jnp.asarray(t_init, jnp.float32),
        annealing_factor=jnp.asarray(factor, jnp.float32),
        steps_since_update=jnp.asarray(0, jnp.int32),
    )


def temperature_step(
    sched: TemperatureSchedule, annealing_steps: int
) -> TemperatureSchedule:
    """Advance one training step; multiply T by the factor every
    ``annealing_steps``, clipped at 1 (``mog_model.py:940-952``)."""
    count = sched.steps_since_update + 1
    fire = count >= annealing_steps
    new_t = jnp.maximum(sched.temperature * sched.annealing_factor, 1.0)
    return TemperatureSchedule(
        temperature=jnp.where(fire, new_t, sched.temperature),
        annealing_factor=sched.annealing_factor,
        steps_since_update=jnp.where(fire, 0, count),
    )


def adapt_temperature_schedule(
    sched: TemperatureSchedule,
    tunneling_rate: jax.Array,
    target_rate: float = 0.2,
    slow_factor: float = 0.5,
    fast_factor: float = 1.05,
) -> TemperatureSchedule:
    """Dynamic schedule adaptation from measured tunneling diagnostics.

    Distills ``mog_model.py:_update_annealing_schedule (489-663)``: if the
    tunneling rate collapsed, back off (raise T a bit and anneal slower);
    if healthy, anneal slightly faster.  Pure function of the diagnostic.
    """
    collapsed = tunneling_rate < target_rate
    # move annealing factor toward 1 (slower) on collapse, away on health
    af = sched.annealing_factor
    af_slow = 1.0 - (1.0 - af) * slow_factor      # closer to 1
    af_fast = jnp.clip(1.0 - (1.0 - af) * fast_factor, 0.5, 0.9999)
    new_af = jnp.where(collapsed, af_slow, af_fast)
    # on collapse, also step the temperature back up by one factor
    new_t = jnp.where(
        collapsed, jnp.maximum(sched.temperature / af, 1.0), sched.temperature
    )
    return TemperatureSchedule(
        temperature=new_t, annealing_factor=new_af,
        steps_since_update=sched.steps_since_update,
    )
