"""faba dyn-assoc --trend-method quasi|binomial: the IRLS spline GAM
(assoc/gam.rs + trend.rs). Mirrors the reference's gam/tests.rs suite
(rising/falling/flat/overdispersion-conservatism) and cross-checks the
batched device IRLS against an independent per-site numpy fit."""

import numpy as np
import pytest

from legume_tpu.faba.gam import gam_association_batch, spline_design


def _logit_line(b0, b1, cov, m, seed=0):
    """assoc/test_util.rs logit_line: deterministic k = round(n * p)."""
    x = np.arange(m) / (m - 1)
    p = 1.0 / (1.0 + np.exp(-(b0 + b1 * x)))
    k = np.round(cov * p)
    n = np.full(m, cov, np.float64)
    return k[None, :], n[None, :], x.astype(np.float64)


def test_rising_trend_detected_positive_effect():
    k, n, x = _logit_line(-2.5, 5.0, 30, 60)
    fit = gam_association_batch(k, n, x)
    assert fit["ok"][0]
    assert fit["pvalue"][0] < 0.01
    assert fit["effect"][0] > 0.0


def test_falling_trend_detected_negative_effect():
    k, n, x = _logit_line(2.5, -5.0, 30, 60)
    fit = gam_association_batch(k, n, x)
    assert fit["pvalue"][0] < 0.01
    assert fit["effect"][0] < 0.0


def test_flat_rate_not_called():
    m = 60
    k = np.full((1, m), 9.0)
    n = np.full((1, m), 30.0)
    x = np.arange(m) / (m - 1)
    fit = gam_association_batch(k, n, x)
    assert fit["pvalue"][0] > 0.2, fit["pvalue"][0]
    assert abs(fit["stat"][0]) < 1.0


def test_quasi_binomial_more_conservative_under_overdispersion():
    # mild trend + alternating jitter the spline can't absorb
    # (gam/tests.rs quasi_binomial_is_more_conservative...)
    m, cov = 60, 20
    x = np.arange(m) / (m - 1)
    base = 1.0 / (1.0 + np.exp(-(-0.8 + 1.6 * x)))
    jitter = np.where(np.arange(m) % 2 == 0, 0.22, -0.22)
    p = np.clip(base + jitter, 0.02, 0.98)
    k = np.round(cov * p)[None, :]
    n = np.full((1, m), float(cov))
    quasi = gam_association_batch(k, n, x, overdispersion=True)
    binom = gam_association_batch(k, n, x, overdispersion=False)
    assert quasi["dispersion"][0] > 1.0
    assert quasi["pvalue"][0] >= binom["pvalue"][0] - 1e-6


def test_zero_coverage_cells_drop_out():
    """Per-site n=0 cells must contribute nothing (reference drops them
    before the fit) — a site padded with zero-coverage cells must fit
    identically to the same site without them, and n_obs must count
    only covered cells."""
    k, n, x = _logit_line(-2.0, 4.0, 25, 50)
    # pad 10 extra cells with zero coverage and garbage k=0 at x values
    # inside the span (the design includes them; weights remove them)
    x_pad = np.concatenate([x, np.linspace(0.1, 0.9, 10)])
    k_pad = np.concatenate([k[0], np.zeros(10)])[None, :]
    n_pad = np.concatenate([n[0], np.zeros(10)])[None, :]
    fit_pad = gam_association_batch(k_pad, n_pad, x_pad)
    assert fit_pad["n_obs"][0] == 50
    assert fit_pad["ok"][0] and fit_pad["pvalue"][0] < 0.01


def _numpy_irls(x_mp, k, n, max_iter=50):
    """Independent per-site f64 IRLS oracle (no jax, no shared code)."""
    m, p = x_mp.shape
    y = k / n
    mu = (k + 0.5) / (n + 1.0)
    eta = np.log(mu / (1 - mu))
    beta = np.zeros(p)
    for _ in range(max_iter):
        v = np.maximum(mu * (1 - mu), 1e-9)
        w = n * v
        z = eta + (y - mu) / v
        xtwx = x_mp.T @ (w[:, None] * x_mp) + 1e-8 * np.eye(p)
        beta = np.linalg.solve(xtwx, x_mp.T @ (w * z))
        eta = np.clip(x_mp @ beta, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-eta))
    with np.errstate(divide="ignore", invalid="ignore"):
        dev = 2 * np.sum(
            n
            * (
                np.where(y > 0, y * np.log(y / mu), 0)
                + np.where(y < 1, (1 - y) * np.log((1 - y) / (1 - mu)), 0)
            )
        )
    return beta, dev


def test_batched_fit_matches_independent_oracle():
    """The one-dispatch batched IRLS must agree per site with an
    independent numpy fit on the same standardized design."""
    rng = np.random.default_rng(3)
    m, s = 80, 12
    x = np.sort(rng.uniform(0, 1, m))
    n = rng.integers(5, 40, (s, m)).astype(np.float64)
    slopes = rng.uniform(-4, 4, s)
    p_true = 1.0 / (1.0 + np.exp(-(-1.0 + slopes[:, None] * x[None, :])))
    k = rng.binomial(n.astype(int), p_true).astype(np.float64)

    fit = gam_association_batch(k, n, x, overdispersion=False)
    x_mp, contrast = spline_design(x, 5)
    for si in range(s):
        beta, dev = _numpy_irls(x_mp, k[si], n[si])
        eff = np.clip(contrast @ beta, -60, 60)
        np.testing.assert_allclose(fit["effect"][si], eff, rtol=1e-3, atol=1e-3)


def test_gam_cli_e2e(tmp_path):
    """argv e2e: planted rising-rate sites called, flat sites not."""
    import pandas as pd
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sparse_io import create_sparse_from_csc

    rng = np.random.default_rng(11)
    m = 120
    x = np.sort(rng.uniform(0, 1, m))
    cov = rng.integers(10, 30, m)
    n_sites = 8
    counts = np.zeros((n_sites, m))
    for si in range(n_sites):
        if si < 4:  # rising
            p = 1.0 / (1.0 + np.exp(-(-2.0 + 4.0 * x)))
        else:  # flat
            p = np.full(m, 0.25)
        counts[si] = rng.binomial(cov, p)
    be = tmp_path / "sites.zarr"
    create_sparse_from_csc(
        sp.csc_matrix(counts.astype(np.float32)), str(be),
        [f"s{i}" for i in range(n_sites)], [f"c{j}" for j in range(m)],
    )
    exb = tmp_path / "cov.zarr"
    cov_sm = np.broadcast_to(cov[None, :], counts.shape).astype(np.float32)
    create_sparse_from_csc(
        sp.csc_matrix(cov_sm), str(exb),
        [f"s{i}" for i in range(n_sites)], [f"c{j}" for j in range(m)],
    )
    bp = tmp_path / "pt.parquet"
    pd.DataFrame(
        {"cell": [f"c{j}" for j in range(m)], "pseudotime": x}
    ).to_parquet(bp)
    out = str(tmp_path / "ga")
    cli.run_faba([
        "dyn-assoc", "--backend", str(be), "--branches", str(bp),
        "--exposure", str(exb), "--output", out,
        "--trend-method", "quasi", "--fdr-alpha", "0.05",
    ])
    res = pd.read_parquet(out + ".assoc.parquet").set_index("site")
    rising = [f"s{i}" for i in range(4)]
    flat = [f"s{i}" for i in range(4, 8)]
    assert res.loc[rising, "significant"].all()
    assert (res.loc[rising, "effect"] > 0).all()
    assert not res.loc[flat, "significant"].any()
