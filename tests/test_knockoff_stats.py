"""Knockoffs + running-stats tests."""

import numpy as np

from legume_tpu.ops.knockoff import (
    _knockoff_s_coordinate,
    knockoff_filter,
    knockoff_s_equicorrelated,
    second_order_knockoffs,
)
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


def _random_corr(p, k, ridge, seed):
    """Random PD correlation from k latent factors + ridge (the
    reference's random_corr fixture shape, knockoff.rs:181)."""
    rng = np.random.default_rng(seed)
    f = rng.standard_normal((p, k))
    cov = f @ f.T + ridge * np.eye(p)
    d = np.sqrt(np.diag(cov))
    return cov / np.outer(d, d)


def _min_eig_2sigma_minus_d(sigma, s):
    return float(np.linalg.eigvalsh(2 * sigma - np.diag(s))[0])


def test_knockoff_s_feasible_all_methods():
    """s_j > 0 and 2*Sigma - diag(s) PSD for mvr/me/equi
    (knockoff.rs s_vectors_are_feasible)."""
    for seed in (1, 2, 3):
        sigma = _random_corr(40, 6, 0.2, seed)
        for method in ("mvr", "me"):
            s = _knockoff_s_coordinate(sigma, method)
            assert (s > -1e-9).all(), f"{method}: negative s"
            lam = _min_eig_2sigma_minus_d(sigma, s)
            assert lam > -1e-6, f"{method}: 2S-D not PSD ({lam:.3e}) seed={seed}"
        s = knockoff_s_equicorrelated(sigma)
        assert _min_eig_2sigma_minus_d(sigma, s) > -1e-6


def test_mvr_beats_equicorrelated_objective():
    """MVR attains a lower reconstructability objective than equi
    (knockoff.rs mvr_beats_equicorrelated_objective)."""
    sigma = _random_corr(50, 8, 0.1, 7)

    def obj(s):
        minv = np.linalg.inv(2 * sigma - np.diag(s))
        return np.trace(minv) + np.sum(1.0 / s)

    s_mvr = _knockoff_s_coordinate(sigma, "mvr")
    # equi at exactly 2*lambda_min puts M on the PSD boundary (singular);
    # compare against a point just inside so the objective is finite
    s_equi = knockoff_s_equicorrelated(sigma) * 0.999
    assert obj(s_mvr) < obj(s_equi)


def test_me_beats_equicorrelated_objective():
    """ME attains a lower entropy objective than equi."""
    sigma = _random_corr(50, 8, 0.1, 7)

    def obj(s):
        sign, logdet = np.linalg.slogdet(2 * sigma - np.diag(s))
        assert sign > 0
        return -logdet - np.sum(np.log(s))

    s_me = _knockoff_s_coordinate(sigma, "me")
    s_equi = knockoff_s_equicorrelated(sigma) * 0.999
    assert obj(s_me) < obj(s_equi)


def test_mvr_outpowers_equicorrelated_with_tight_clusters():
    """A couple of near-collinear pairs drag lambda_min (and thus every
    equi s_j) down; MVR lifts the independent features back toward
    s ~ 1 (knockoff.rs mvr_outpowers_equicorrelated_with_tight_clusters)."""
    p = 20
    sigma = np.eye(p)
    for a, b in ((0, 1), (2, 3)):
        sigma[a, b] = sigma[b, a] = 0.985
    s_equi = knockoff_s_equicorrelated(sigma)
    s_mvr = _knockoff_s_coordinate(sigma, "mvr")
    assert _min_eig_2sigma_minus_d(sigma, s_mvr) > -1e-6
    assert s_equi[0] < 0.05
    assert s_mvr[4:].mean() > 0.7
    assert s_mvr.mean() > 5.0 * s_equi.mean()


def test_mvr_knockoffs_preserve_joint_covariance():
    """End-to-end: mvr s-method still produces valid second-order
    knockoffs (cross-corr matches off-diagonal)."""
    rng = np.random.default_rng(4)
    n, p = 3000, 6
    a = rng.normal(size=(p, p))
    cov = a @ a.T / p + np.eye(p)
    x = rng.multivariate_normal(np.zeros(p), cov, size=n)
    xk = second_order_knockoffs(x, seed=1, s_method="mvr")
    xs = (x - x.mean(0)) / x.std(0)
    c_orig = np.corrcoef(xs, rowvar=False)
    cross = np.corrcoef(np.hstack([xs, xk]), rowvar=False)[:p, p:]
    off = ~np.eye(p, dtype=bool)
    np.testing.assert_allclose(cross[off], c_orig[off], atol=0.12)
    # diag(cross) = 1 - s: with mvr the independent-ish features keep
    # s large -> knockoff decorrelated from its original
    assert np.all(np.diag(cross) < 1.0 - np.diag(_s_for(x)) + 0.15)


def _s_for(x):
    xs = (x - x.mean(0)) / np.maximum(x.std(0), 1e-8)
    s_corr = np.corrcoef(xs, rowvar=False)
    s_corr = (s_corr + s_corr.T) / 2 + 1e-4 * np.eye(s_corr.shape[0])
    return np.diag(_knockoff_s_coordinate(s_corr, "mvr"))


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
