"""Likelihood / divergence zoo (candle-util `loss.rs` equivalent).

Per-sample (row) log-likelihoods for the decoder families and the
Gaussian KL / reparameterization used by every VAE encoder. All
functions are pure jnp and reduce over the trailing (feature) axis,
matching the reference contracts (`candle-util/src/loss.rs:15-257`).

NB defaults to the reference's fast `approx_lgamma` (loss.rs:98-105)
for ELBO-trace parity with the Rust engine AND cheaper VPU math; pass
`exact_lgamma=True` for the exact gammaln form.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import gammaln


def gaussian_kl(z_mean: jax.Array, z_lnvar: jax.Array) -> jax.Array:
    """KL(N(mu, e^lnvar) || N(0, I)) summed over the last axis (loss.rs:15-18)."""
    return 0.5 * jnp.sum(jnp.exp(z_lnvar) - 1.0 + z_mean**2 - z_lnvar, axis=-1)


def gaussian_reparameterize(
    key: jax.Array, z_mean: jax.Array, z_lnvar: jax.Array, train: bool
) -> jax.Array:
    """mean + exp(lnvar/2) * eps at train time; posterior mode at eval
    (loss.rs:24-31)."""
    if not train:
        return z_mean
    eps = jax.random.normal(key, z_mean.shape, dtype=z_mean.dtype)
    return z_mean + jnp.exp(0.5 * z_lnvar) * eps


def gaussian_neg_log_prob(z, mean, lnvar):
    """0.5 * sum[(z-mu)^2/var + lnvar] per row (loss.rs:39-43)."""
    diff = z - mean
    return 0.5 * jnp.sum(diff * diff / jnp.exp(lnvar) + lnvar, axis=-1)


def topic_log_likelihood(x_nd: jax.Array, log_recon_nd: jax.Array) -> jax.Array:
    """Multinomial llik with log-scale reconstruction (loss.rs:70-74)."""
    return jnp.sum(jnp.clip(x_nd, 0.0, None) * log_recon_nd, axis=-1)


def topic_likelihood(x_nd: jax.Array, recon_nd: jax.Array) -> jax.Array:
    """Multinomial llik with probability-scale reconstruction (loss.rs:53-60)."""
    return topic_log_likelihood(x_nd, jnp.log(recon_nd + 1e-8))


def poisson_log_likelihood(x_nd: jax.Array, rate_nd: jax.Array) -> jax.Array:
    """sum[x log(rate) - rate] per row (loss.rs:114-118)."""
    return jnp.sum(x_nd * jnp.log(rate_nd) - rate_nd, axis=-1)


def approx_lgamma(x: jax.Array) -> jax.Array:
    """The reference's fast lgamma surrogate (loss.rs:98-105); kept for
    parity tests against the Rust engine's ELBO traces."""
    return -0.0810614667 - x - jnp.log(x) + (0.5 + x) * jnp.log1p(x)


def nb_log_likelihood_elem(
    x: jax.Array, mu: jax.Array, log_phi: jax.Array, *, exact_lgamma: bool = False
) -> jax.Array:
    """Elementwise NB llik, no reduction (loss.rs:215-234).

    log p(x | mu, phi) = lgamma(x+phi) - lgamma(phi) - lgamma(x+1)
                         + phi log(phi/(phi+mu)) + x log(mu/(phi+mu))
    with mu clamped to [1e-6, 1e6] and phi to [e^-10, e^10].
    """
    phi = jnp.exp(jnp.clip(log_phi, -10.0, 10.0))
    mu = jnp.clip(mu, 1e-6, 1e6)
    eps = 1e-8
    log_denom = jnp.log(phi + mu + eps)
    term_phi = phi * (jnp.log(phi + eps) - log_denom)
    term_x = x * (jnp.log(mu + eps) - log_denom)
    lg = gammaln if exact_lgamma else approx_lgamma
    lgamma_term = lg(x + phi) - lg(phi) - lg(x + 1.0)
    return lgamma_term + term_phi + term_x


def nb_log_likelihood(
    x_nd: jax.Array, mu_nd: jax.Array, log_phi_1d: jax.Array, *, exact_lgamma: bool = False
) -> jax.Array:
    """Row-summed NB llik with per-feature dispersion (loss.rs:201-204)."""
    return jnp.sum(
        nb_log_likelihood_elem(x_nd, mu_nd, log_phi_1d, exact_lgamma=exact_lgamma),
        axis=-1,
    )


def zi_topic_log_likelihood(
    x_nd: jax.Array, log_recon_nd: jax.Array, dropout_logit_1d: jax.Array
) -> jax.Array:
    """Zero-inflated multinomial llik (loss.rs:134-168)."""
    eps = 1e-20
    log_pi = jnp.log(jax.nn.sigmoid(dropout_logit_1d) + eps)
    log_1mpi = jnp.log(jax.nn.sigmoid(-dropout_logit_1d) + eps)
    # zero path: logsumexp(log_pi, log(1-pi) + log_recon)
    log_term2 = log_1mpi + log_recon_nd
    m = jnp.maximum(log_pi, log_term2)
    zero_llik = m + jnp.log(jnp.exp(log_pi - m) + jnp.exp(log_term2 - m))
    nonzero_llik = log_1mpi + x_nd * log_recon_nd
    return jnp.sum(jnp.where(x_nd == 0.0, zero_llik, nonzero_llik), axis=-1)


def dirichlet_log_likelihood(x_nd: jax.Array, mass_nd: jax.Array) -> jax.Array:
    """Dirichlet-multinomial llik (loss.rs:85-96)."""
    a_nd = x_nd + mass_nd
    term1 = jnp.sum(gammaln(a_nd) - gammaln(mass_nd), axis=-1)
    term2 = gammaln(jnp.sum(mass_nd, axis=-1)) - gammaln(jnp.sum(a_nd, axis=-1))
    return term1 + term2


def gaussian_log_likelihood(x_nd: jax.Array, hat_nd: jax.Array) -> jax.Array:
    """-0.5 sum (x - xhat)^2 (loss.rs:255-257)."""
    return -0.5 * jnp.sum((x_nd - hat_nd) ** 2, axis=-1)


def log_sigmoid(x: jax.Array) -> jax.Array:
    """Stable log sigmoid: min(x,0) - log1p(exp(-|x|)) (loss.rs:242-246)."""
    return jnp.minimum(x, 0.0) - jnp.log1p(jnp.exp(-jnp.abs(x)))


def smooth_topics(log_z_nk: jax.Array, alpha: float) -> jax.Array:
    """Mix the simplex with uniform in log space (vae/mod.rs:26-33)."""
    if alpha <= 0.0:
        return log_z_nk
    k = log_z_nk.shape[-1]
    return jnp.log(jnp.exp(log_z_nk) * (1.0 - alpha) + alpha / k)


def stick_breaking_log_simplex(logits_nk: jax.Array) -> jax.Array:
    """Deterministic stick-breaking logits -> log-simplex (vae/mod.rs:35-70).

    log theta_k = eta_k + sum_{j<=k} log(1 - v_j) for k < K-1, and the
    last topic takes the closing mass. Rows sum to 1 by telescoping.
    """
    k = logits_nk.shape[-1]
    if k == 1:
        return jnp.zeros_like(logits_nk)
    eta = logits_nk[..., : k - 1]
    log_1mv = log_sigmoid(-eta)
    incl = jnp.cumsum(log_1mv, axis=-1)
    head = eta + incl
    tail = incl[..., -1:]
    return jnp.concatenate([head, tail], axis=-1)
