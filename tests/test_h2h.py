"""Statistics helpers of the head-to-head campaign harnesses."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from benchmarks.h2h_seeds import jackknife_mean_err
from benchmarks.trained_vs_hmc import trace_stats


def test_jackknife_matches_sem_iid():
    rng = np.random.default_rng(3)
    vals = rng.normal(1.05, 0.02, size=40)
    mean, err = jackknife_mean_err(vals)
    np.testing.assert_allclose(mean, vals.mean(), rtol=1e-12)
    # delete-1 jackknife SE == classical SEM for the sample mean
    np.testing.assert_allclose(err, vals.std(ddof=1) / np.sqrt(len(vals)),
                               rtol=1e-6)


def test_jackknife_degenerate():
    m, e = jackknife_mean_err([1.07])
    assert m == 1.07 and np.isnan(e)


def test_trace_stats_scales_with_total_chains():
    rng = np.random.default_rng(0)
    tr = rng.normal(size=(400, 64))
    a = trace_stats(tr, wall=2.0, total_chains=64)
    b = trace_stats(tr, wall=2.0, total_chains=2048)
    assert b["eff_samples_per_s"] > 20 * a["eff_samples_per_s"]
    np.testing.assert_allclose(
        b["eff_samples_per_s"] / a["eff_samples_per_s"], 2048 / 64, rtol=1e-4)
    assert a["ess_ratio"] == b["ess_ratio"]
