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


def test_tempering_widens_posterior():
    """Power-posterior contract (the reference's own regression,
    deconvolve/tests.rs:180): tau scales the evidence, so tempered
    chains carry wider, better-mixed posteriors. Fractions are RATIOS
    (u / sum u), so their sd widens sub-1/sqrt(tau); assert direction +
    mixing, at a depth where the tau=1 chain itself mixes."""
    rng = np.random.default_rng(0)
    d, r = 60, 3
    mu = rng.gamma(2.0, 1.0, (d, r)).astype(np.float32)
    mu[:20, 0] *= 8
    mu[20:40, 1] *= 8
    mu[40:, 2] *= 8
    u_true = np.asarray([[3.0, 1.0, 2.0]])
    y = rng.poisson((u_true @ mu.T) * 1.0).astype(np.float32)

    full = deconvolve(y, mu, config=DeconvConfig(n_sweeps=800, burn_in=300, seed=3))
    temp = deconvolve(
        y, mu,
        config=DeconvConfig(n_sweeps=800, burn_in=300, seed=3, count_scale=0.05),
    )
    ratio = temp.fractions_sd.mean() / max(full.fractions_sd.mean(), 1e-12)
    assert 1.3 < ratio < 8.0, f"tempering widened by {ratio:.2f}x"
    # tempering also improves mixing (the knob's purpose at high depth)
    assert temp.ess.min() >= full.ess.min()
    # point estimates stay consistent under tempering
    assert np.abs(temp.fractions - full.fractions).max() < 0.1
