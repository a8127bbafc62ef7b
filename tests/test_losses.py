"""Likelihood zoo unit tests against scipy ground truth.

Mirrors the reference's inline-unit-test style (SURVEY.md section 4.1);
NB/Poisson/multinomial forms checked against scipy.stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from legume_tpu.models import losses


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_gaussian_kl_zero_at_prior():
    mu = jnp.zeros((4, 3))
    lnvar = jnp.zeros((4, 3))
    np.testing.assert_allclose(losses.gaussian_kl(mu, lnvar), 0.0, atol=1e-6)


def test_gaussian_kl_matches_formula(rng):
    mu = jnp.asarray(rng.normal(size=(5, 2)).astype(np.float32))
    lnvar = jnp.asarray(rng.normal(size=(5, 2)).astype(np.float32))
    got = losses.gaussian_kl(mu, lnvar)
    var = np.exp(np.asarray(lnvar))
    want = 0.5 * np.sum(var - 1 + np.asarray(mu) ** 2 - np.asarray(lnvar), axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_poisson_llik_vs_scipy(rng):
    x = rng.poisson(3.0, size=(6, 10)).astype(np.float32)
    rate = rng.gamma(2.0, 2.0, size=(6, 10)).astype(np.float32)
    got = losses.poisson_log_likelihood(jnp.asarray(x), jnp.asarray(rate))
    # the reference drops the log(x!) constant (loss.rs:107-118)
    want = np.sum(x * np.log(rate) - rate, axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_nb_llik_vs_scipy(rng):
    x = rng.poisson(4.0, size=(5, 8)).astype(np.float32)
    mu = rng.gamma(3.0, 2.0, size=(5, 8)).astype(np.float32)
    log_phi = rng.normal(size=(1, 8)).astype(np.float32)
    got = losses.nb_log_likelihood(
        jnp.asarray(x), jnp.asarray(mu), jnp.asarray(log_phi), exact_lgamma=True
    )
    phi = np.exp(log_phi)
    # scipy NB: n = phi, p = phi / (phi + mu)
    want = st.nbinom.logpmf(x, phi, phi / (phi + mu)).sum(-1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-3)
    # the approx-lgamma default (reference parity) stays close too
    approx = losses.nb_log_likelihood(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(log_phi))
    np.testing.assert_allclose(approx, want, rtol=5e-2, atol=0.5)


def test_multinomial_llik(rng):
    x = rng.poisson(2.0, size=(4, 6)).astype(np.float32)
    logits = rng.normal(size=(4, 6)).astype(np.float32)
    logp = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    got = losses.topic_log_likelihood(jnp.asarray(x), logp)
    want = np.sum(x * np.asarray(logp), axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_zi_topic_matches_manual_formula(rng):
    x = rng.poisson(2.0, size=(4, 6)).astype(np.float32)
    x[0, 0] = 0.0
    logp_j = jax.nn.log_softmax(jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32)))
    logit = rng.normal(size=(1, 6)).astype(np.float32)
    got = losses.zi_topic_log_likelihood(jnp.asarray(x), logp_j, jnp.asarray(logit))
    # manual reference formula (loss.rs:120-132)
    pi = 1.0 / (1.0 + np.exp(-logit))
    logp = np.asarray(logp_j, dtype=np.float64)
    zero_path = np.log(pi + (1 - pi) * np.exp(logp))
    nonzero_path = np.log(1 - pi) + x * logp
    want = np.where(x == 0, zero_path, nonzero_path).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_stick_breaking_sums_to_one(rng):
    logits = jnp.asarray(rng.normal(size=(7, 5)).astype(np.float32) * 3)
    log_theta = losses.stick_breaking_log_simplex(logits)
    np.testing.assert_allclose(np.exp(log_theta).sum(-1), 1.0, rtol=1e-4)


def test_smooth_topics_stays_simplex(rng):
    logits = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
    logp = jax.nn.log_softmax(logits, axis=-1)
    sm = losses.smooth_topics(logp, 0.1)
    np.testing.assert_allclose(np.exp(sm).sum(-1), 1.0, rtol=1e-4)


def test_log_sigmoid_stable():
    x = jnp.asarray([-1e4, -10.0, 0.0, 10.0, 1e4], dtype=jnp.float32)
    out = losses.log_sigmoid(x)
    assert np.all(np.isfinite(np.asarray(out[1:])))
    np.testing.assert_allclose(out[2], np.log(0.5), rtol=1e-5)


def test_approx_lgamma_close_to_exact():
    # the reference surrogate (loss.rs:98-105) is crude below x ~ 1 but
    # tight for the count arguments the NB llik feeds it (x + phi >= 1)
    import scipy.special as sps

    x = jnp.asarray([2.0, 5.0, 20.0, 100.0], dtype=jnp.float32)
    got = losses.approx_lgamma(x)
    want = sps.gammaln(np.asarray(x))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=1e-3)
