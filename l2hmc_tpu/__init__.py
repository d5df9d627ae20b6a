"""l2hmc_tpu — a TPU-native L2HMC framework (JAX / XLA / Pallas / pjit).

A from-scratch rebuild of the capability set of saforem2/l2hmc (reference
mounted at /root/reference), designed TPU-first:

- pure-functional transition kernels under `jax.jit` (`lax.scan` hot loops),
- chains vectorized on the batch axis and sharded over a `jax.sharding.Mesh`,
- fused Pallas kernels for the Wilson-action hot path,
- explicit PRNG key threading (no hidden RNG state),
- Orbax single-pytree checkpointing.

Subpackages
-----------
lattice   U(1) gauge lattice (Wilson action, observables), Ising, SU(N) scaffolding
targets   analytic target distributions (Gaussian/GMM/rough-well/funnel/...)
networks  scale/translation/transformation nets (MLP + periodic CNN)
dynamics  L2HMC augmented leapfrog, plain HMC, NUTS, AIS, SMC
ops       Pallas TPU kernels
train     losses, schedules, trainer, checkpointing
parallel  mesh/sharding utilities, multi-host data parallelism, halo exchange
analysis  autocorrelation/ESS/IAT, jackknife, tunneling diagnostics
utils     config, IO, logging
"""

__version__ = "0.1.0"
