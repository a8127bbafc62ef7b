"""GammaParam and value-transform unit tests (matrix-param /
value_transform parity; SURVEY.md section 2.1 / 2.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sps

from legume_tpu.ops import gamma as gp
from legume_tpu.ops import transforms as tf


def test_gamma_posterior_planes():
    a = jnp.asarray([[2.0, 5.0], [1.5, 10.0]])
    b = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
    g = gp.GammaParam(a=a, b=b)
    np.testing.assert_allclose(g.mean(), np.asarray(a) / np.asarray(b))
    np.testing.assert_allclose(g.sd(), np.sqrt(np.asarray(a)) / np.asarray(b))
    np.testing.assert_allclose(
        g.log_mean(), sps.digamma(np.asarray(a)) - np.log(np.asarray(b)), rtol=1e-4
    )


def test_gamma_update_adds_prior():
    add_a = jnp.ones((3, 2)) * 4.0
    add_b = jnp.ones((3, 2)) * 2.0
    g = gp.gamma_update(None, add_a, add_b, a0=1.0, b0=1.0)
    np.testing.assert_allclose(g.mean(), 5.0 / 3.0, rtol=1e-6)


def test_gamma_sample_moments():
    key = jax.random.key(0)
    g = gp.GammaParam(a=jnp.full((20000,), 50.0), b=jnp.full((20000,), 10.0))
    s = g.sample(key)
    assert abs(float(s.mean()) - 5.0) < 0.05
    assert abs(float(s.std()) - np.sqrt(50.0) / 10.0) < 0.05


def test_sparsify_mean_to_support():
    mean = jnp.asarray([[0.5, 0.2], [0.3, 0.1]])
    num = jnp.asarray([[1.0, 0.0], [0.0, 2.0]])
    out = gp.sparsify_mean_to_support(mean, num)
    np.testing.assert_allclose(out, [[0.5, 0.0], [0.0, 0.1]])


def test_anscombe_unit_variance_on_poisson():
    rng = np.random.default_rng(1)
    x = rng.poisson(50.0, size=200000).astype(np.float32)
    a = np.asarray(tf.anscombe(jnp.asarray(x)))
    # Anscombe(Poisson(lam)) ~ N(2 sqrt(lam), 1) for moderate lam
    assert abs(a.std() - 1.0) < 0.05


def test_anscombe_residual_bounds_spikes():
    rng = np.random.default_rng(2)
    x = rng.poisson(2.0, size=(64, 32)).astype(np.float32)
    x[0, 0] = 10000.0
    out = np.asarray(tf.anscombe_residual(jnp.asarray(x)))
    # spike contributes ~TANH_K * std, not 10000 (value_transform.rs:36-44)
    assert np.all(np.isfinite(out))
    col = out[:, 0]
    assert out[0, 0] <= tf.TANH_K * (col.std() + 60)  # generous bound, still << raw


def test_anscombe_residual_division_floor():
    y = jnp.asarray([[10.0, 10.0]])
    x0 = jnp.asarray([[1e-6, 1.0]])  # tiny null must be floored at 0.1
    clean = np.asarray(tf.count_rate_clean(y, x0))
    np.testing.assert_allclose(clean[0, 0], 100.0, rtol=1e-5)  # 10 / 0.1
    np.testing.assert_allclose(clean[0, 1], 10.0, rtol=1e-5)


def test_count_rate_clean_composes_nulls():
    y = jnp.full((2, 3), 12.0)
    null = jnp.full((2, 3), 2.0)
    mean = jnp.full((2, 3), 3.0)
    out = np.asarray(tf.count_rate_clean(y, null, mean))
    np.testing.assert_allclose(out, 2.0, rtol=1e-6)
