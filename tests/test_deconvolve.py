"""Bulk deconvolution recovery: Dirichlet-mixed reference profiles must
be un-mixed (reference pattern 3 + the bench_tool scoring harness
pattern, `senna/examples/bench_tool.rs`)."""

import numpy as np
import pytest

from legume_tpu.senna.deconvolve import DeconvConfig, DeconvResult, deconvolve


def test_deconvolve_recovers_fractions():
    rng = np.random.default_rng(0)
    d, r, s = 300, 4, 6
    # well-separated reference profiles
    mu = rng.gamma(0.3, 1.0, size=(d, r)) * 5.0
    for m in range(r):
        mu[m * 60 : (m + 1) * 60, m] *= 10.0  # marker blocks
    frac_true = rng.dirichlet(np.ones(r), size=s)
    depth = 50_000
    lam = frac_true @ mu.T
    lam = lam / lam.sum(1, keepdims=True) * depth
    y = rng.poisson(lam).astype(np.float32)

    res = deconvolve(
        y, mu / mu.sum(0, keepdims=True),
        config=DeconvConfig(n_sweeps=400, burn_in=150, seed=1),
    )
    assert res.fractions.shape == (s, r)
    np.testing.assert_allclose(res.fractions.sum(1), 1.0, rtol=1e-4)
    # correlation with truth per sample
    for si in range(s):
        corr = np.corrcoef(res.fractions[si], frac_true[si])[0, 1]
        assert corr > 0.9, (si, corr, res.fractions[si], frac_true[si])


def test_deconvolve_readout_maps_components():
    rng = np.random.default_rng(1)
    d, r, s = 100, 4, 2
    mu = rng.gamma(1.0, 1.0, size=(d, r))
    y = rng.poisson(mu.sum(1) * 10, size=(s, d)).astype(np.float32)
    # two components map to one cell type each
    readout = np.asarray([[1, 0], [1, 0], [0, 1], [0, 1]], np.float32)
    res = deconvolve(y, mu, readout, DeconvConfig(n_sweeps=100, burn_in=50))
    assert res.fractions.shape == (s, 2)
    np.testing.assert_allclose(res.fractions.sum(1), 1.0, rtol=1e-4)
