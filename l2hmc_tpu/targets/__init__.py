from l2hmc_tpu.targets.distributions import (  # noqa: F401
    GMM,
    Gaussian,
    GaussianFunnel,
    RoughWell,
    gen_ring,
    gmm_axes,
    quadratic_gaussian,
    random_tilted_gaussian,
    scg_2d,
)
