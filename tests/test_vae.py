"""VAE + L2HMC posterior sampler tests on the bundled digits dataset."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from l2hmc_tpu.train.vae import (
    VAEConfig,
    build_vae,
    load_digits_binarized,
    make_vae_train_step,
)

CFG = VAEConfig(data_dim=64, latent_dim=6, enc_hidden=64, dec_hidden=64,
                num_steps=3, mh_steps=2, sampler_hidden=32)


def test_digits_dataset():
    x = load_digits_binarized()
    assert x.shape[1] == 64
    assert set(np.unique(x)) <= {0.0, 1.0}
    assert x.shape[0] > 1000


def test_vae_training_improves_elbo(key):
    x = load_digits_binarized()
    init_state, train_step, fns = make_vae_train_step(CFG)
    state = init_state(key)

    elbos = []
    for i in range(60):
        key, kb, ks = jax.random.split(key, 3)
        idx = jax.random.randint(kb, (128,), 0, x.shape[0])
        batch = jnp.asarray(x[np.asarray(idx)])
        state, aux = train_step(state, batch, ks)
        elbos.append(float(aux["elbo"]))
    assert elbos[-1] > elbos[0] + 5.0, f"ELBO did not improve: {elbos[0]} -> {elbos[-1]}"
    assert np.isfinite(elbos).all()
    assert 0.0 <= float(aux["accept_prob"]) <= 1.0


def test_posterior_sampler_conditions_on_data(key):
    """The aux-conditioned sampler must produce different dynamics for
    different data (conditioning actually wired through)."""
    init, fns = build_vae(CFG)
    params = init(key)
    # give aux weights some magnitude so conditioning is visible at init
    # (aux rows are the trailing aux_dim rows of the fused input embedding)
    xnet = dict(params.dynamics.xnet)
    xnet["in_w"] = xnet["in_w"].at[-CFG.data_dim :].add(0.3)
    params = params._replace(dynamics=params.dynamics._replace(xnet=xnet))

    x1 = jnp.zeros((8, 64))
    x2 = jnp.ones((8, 64))
    z1, p1, _ = fns["sample_posterior"](params, x1, key)
    z2, p2, _ = fns["sample_posterior"](params, x2, key)
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_ais_log_likelihood_finite(key):
    from l2hmc_tpu.train.vae import ais_log_likelihood

    x = load_digits_binarized()[:16]
    init, fns = build_vae(CFG)
    params = init(key)
    logp = ais_log_likelihood(CFG, fns, params, jnp.asarray(x), key,
                              num_betas=30, eps=0.2)
    assert logp.shape == (16,)
    assert np.isfinite(np.asarray(logp)).all()
    # untrained decoder: log p(x) should be worse than -D log 2 baseline-ish
    assert np.asarray(logp).mean() < 0.0


def test_posterior_sampler_autocovariance(key):
    """eval_sampler.py parity: mixing diagnostics of the trained posterior
    sampler are finite and acceptance is healthy."""
    from l2hmc_tpu.train.vae import (
        VAEConfig, build_vae, posterior_sampler_autocovariance,
    )

    cfg = VAEConfig(data_dim=64, latent_dim=4, enc_hidden=32, dec_hidden=32,
                    sampler_hidden=16, num_steps=3)
    init, fns = build_vae(cfg)
    params = init(key)
    x = (jax.random.uniform(jax.random.fold_in(key, 1), (16, 64)) > 0.5
         ).astype(jnp.float32)
    out = posterior_sampler_autocovariance(cfg, fns, params, x,
                                           jax.random.fold_in(key, 2),
                                           num_transitions=60)
    assert np.isfinite(out["ess_per_step"])
    assert 0.0 < out["accept_prob"] <= 1.0
    assert np.isfinite(np.asarray(out["autocorrelation"])).all()
