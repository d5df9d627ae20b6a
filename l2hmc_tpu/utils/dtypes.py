"""Global dtype policy.

The reference keeps a single ``TF_FLOAT``/``NP_FLOAT`` switch
(``utils/config.py:26-27``).  Here the policy is richer because TPUs care:

- ``state`` dtype: chain state / momenta / log-dets.  float32 — MCMC
  reversibility and detailed balance need full single precision.
- ``compute`` dtype: network matmul inputs.  bfloat16 by default on TPU so
  the MXU runs at full rate; accumulation stays float32
  (``preferred_element_type``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    state: jnp.dtype = jnp.float32
    compute: jnp.dtype = jnp.bfloat16
    param: jnp.dtype = jnp.float32


DEFAULT_POLICY = DTypePolicy()

# Reference parity: GLOBAL_SEED = 42 (reference globals.py:12).
GLOBAL_SEED = 42
