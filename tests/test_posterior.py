"""bge posterior ESS + selection-pass tests."""

import numpy as np
import pytest

from legume_tpu.embedding.posterior import pb_posterior_ess, selection_pass


def test_pb_posterior_recovers_embedding():
    rng = np.random.default_rng(0)
    p, d, h = 16, 120, 2
    feat = rng.normal(0, 0.8, size=(d, h)).astype(np.float32)
    feat_b = np.full(d, -1.0, np.float32)
    e_true = rng.normal(0, 0.8, size=(p, h)).astype(np.float32)
    eta = e_true @ feat.T + feat_b[None, :]
    y = rng.poisson(np.exp(eta)).astype(np.float32)

    out = pb_posterior_ess(y, feat, feat_b, num_samples=150, burn_in=50, seed=1)
    # posterior mean embedding correlates with truth per dim (up to noise)
    for hh in range(h):
        corr = np.corrcoef(out["e_mean"][:, hh], e_true[:, hh])[0, 1]
        assert corr > 0.8, (hh, corr)
    assert np.all(np.isfinite(out["lnpdf"]))
    assert np.median(out["ess"]) > 10


def test_selection_pass_keeps_informative_dims():
    """Construct counts consistent with the NCE optimum
    (score = log(c / (k q m))) so the fitted bilinear scores ARE the
    truth; gates must stay on for score-carrying dims and fall to the
    prior on dims the scores never use."""
    rng = np.random.default_rng(1)
    p, d, h = 20, 80, 4
    k_neg = 5.0
    feat = np.zeros((d, h), np.float32)
    feat[:, :2] = rng.normal(0, 1.0, size=(d, 2))
    feat[:, 2:] = rng.normal(0, 1.0, size=(d, 2))  # present but unused dims
    axis = np.zeros((p, h), np.float32)
    axis[:, :2] = rng.normal(0, 1.0, size=(p, 2))
    s0 = axis @ feat.T  # only dims 0-1 contribute

    # invert the NCE optimum c = k q m exp(score) SELF-CONSISTENTLY:
    # the pb bias absorbs the per-row normalizer so rowsums(c) = m
    q = np.full(d, 1.0 / d)
    m = np.full(p, 2000.0)
    axis_b = -np.log(k_neg * (q[None, :] * np.exp(s0)).sum(1))
    scores = s0 + axis_b[:, None]
    counts = (k_neg * q[None, :] * m[:, None] * np.exp(scores)).astype(np.float32)
    np.testing.assert_allclose(counts.sum(1), m, rtol=1e-4)

    gates = selection_pass(
        feat, np.zeros(d, np.float32), axis, axis_b.astype(np.float32), counts,
        n_sweeps=2, prior_logit=-1.0, k_neg=k_neg, q_marginal=q, seed=2,
    )
    assert gates.shape == (d, h)
    # informative dims keep far more gate mass than unused dims, which
    # fall to the prior rate sigmoid(-1) ~ 0.27
    assert gates[:, :2].mean() > 0.6, gates.mean(0)
    assert gates[:, 2:].mean() < 0.45, gates.mean(0)
