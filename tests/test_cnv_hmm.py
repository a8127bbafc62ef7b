"""CNV HMM tests: segment-state recovery on synthetic log-ratio tracks
(reference pattern 3; cnv/src/hmm.rs test style)."""

import numpy as np
import pytest

from legume_tpu.ops.cnv_hmm import CnvHmmParams, fit_em, infer_sample


@pytest.fixture(scope="module")
def track():
    rng = np.random.default_rng(0)
    states = np.concatenate(
        [np.full(60, 1), np.full(40, 0), np.full(50, 1), np.full(30, 2), np.full(40, 1)]
    )
    means = np.asarray([-0.5, 0.0, 0.3])
    y = means[states] + rng.normal(0, 0.12, len(states))
    return y.astype(np.float32), states


def test_viterbi_recovers_segments(track):
    y, states = track
    params = CnvHmmParams.default_3state()
    res = infer_sample(params, y, alpha=1.0, sigma_sq=0.0144)
    acc = (res.viterbi_path == states).mean()
    assert acc > 0.95, acc
    assert np.isfinite(res.log_likelihood)


def test_posteriors_sum_to_one(track):
    y, _ = track
    params = CnvHmmParams.default_3state()
    res = infer_sample(params, y)
    np.testing.assert_allclose(res.posteriors.sum(1), 1.0, rtol=1e-4)


def test_em_estimates_scale(track):
    y, states = track
    # two samples: unit scale and 2x amplified
    ys = np.stack([y, 2.0 * y])
    params = CnvHmmParams.default_3state()
    alpha, sigma, post = fit_em(params, ys, n_iter=25)
    assert abs(alpha[1] / alpha[0] - 2.0) < 0.3, alpha
    assert post.shape == (2, len(y), 3)
    # posterior argmax tracks the truth for the clean sample
    acc = (post[0].argmax(1) == states).mean()
    assert acc > 0.9


def test_kmeans_bic_state_selection():
    """CnvHmmParams.from_kmeans_bic (kmeans_init.rs): three
    well-separated CN levels select K=3 from {3,5,6} with the neutral
    component pinned near 0; the seeded HMM still segments the planted
    amplification."""
    rng = np.random.default_rng(0)
    y = np.concatenate([
        rng.normal(-0.6, 0.05, 400),
        rng.normal(0.0, 0.05, 1200),
        rng.normal(0.45, 0.05, 400),
    ])
    params = CnvHmmParams.from_kmeans_bic(y, k_range=(3, 5, 6))
    assert params.n_states == 3
    assert abs(params.emission_means[np.argmax(params.log_pi)]) < 0.1

    # segment a planted gain with the seeded params
    sig = np.zeros(300)
    sig[100:160] = 0.45
    obs = sig + rng.normal(0, 0.05, 300)
    res = infer_sample(params, obs)
    gain_state = int(np.argmax(params.emission_means))
    path = res.viterbi_path
    inside = (path[100:160] == gain_state).mean()
    outside = (path[:100] == gain_state).mean()
    assert inside > 0.9 and outside < 0.05
