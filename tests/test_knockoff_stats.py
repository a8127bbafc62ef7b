"""Knockoffs + running-stats tests."""

import numpy as np

from legume_tpu.ops.knockoff import knockoff_filter, second_order_knockoffs
from legume_tpu.utils.running_stats import RunningMoments, RunningQuantile


def test_knockoffs_preserve_covariance():
    rng = np.random.default_rng(0)
    n, p = 2000, 8
    a = rng.normal(size=(p, p))
    cov = a @ a.T / p + np.eye(p)
    x = rng.multivariate_normal(np.zeros(p), cov, size=n)
    xk = second_order_knockoffs(x, seed=1)
    xs = (x - x.mean(0)) / x.std(0)
    # marginal correlation structure preserved
    c_orig = np.corrcoef(xs, rowvar=False)
    c_k = np.corrcoef(xk, rowvar=False)
    np.testing.assert_allclose(c_k, c_orig, atol=0.12)
    # cross-correlation: corr(X_j, Xk_l) ~ corr(X_j, X_l) off-diagonal
    cross = np.corrcoef(np.hstack([xs, xk]), rowvar=False)[:p, p:]
    off = ~np.eye(p, dtype=bool)
    np.testing.assert_allclose(cross[off], c_orig[off], atol=0.12)


def test_knockoff_filter_controls_selection():
    rng = np.random.default_rng(1)
    # strong positive W for 10 true features, symmetric noise for 90
    w = np.concatenate([np.full(10, 5.0) + rng.normal(0, 0.5, 10), rng.normal(0, 1, 90)])
    t, sel = knockoff_filter(w, fdr=0.2)
    assert sel[:10].all()
    assert sel[10:].mean() < 0.2


def test_running_quantile_converges():
    rng = np.random.default_rng(2)
    rq = RunningQuantile(0.5)
    xs = rng.normal(10, 2, 5000)
    rq.update_many(xs)
    assert abs(rq.value() - np.median(xs)) < 0.25


def test_running_moments():
    rng = np.random.default_rng(3)
    rm = RunningMoments(shape=(4,))
    data = rng.normal(3, 1.5, size=(1000, 4))
    for row in data:
        rm.update(row)
    np.testing.assert_allclose(rm.mean, data.mean(0), rtol=1e-6)
    np.testing.assert_allclose(rm.var, data.var(0, ddof=1), rtol=1e-6)
