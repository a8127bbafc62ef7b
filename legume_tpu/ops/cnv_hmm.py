"""Copy-number HMM on genomic segments (`cnv` crate equivalent;
`cnv/src/hmm.rs:213-232`, EM `:472`, kmeans init `kmeans_init.rs`).

Gaussian emissions with per-sample scale alpha and variance sigma^2 over
relative-CN states (3/5/6-state, e.g. means [-0.5, 0, 0.3]). The
forward-backward and Viterbi recursions are `lax.scan`s over segments,
vmapped over samples — the per-sample rayon loop of the reference
becomes one batched device program.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class CnvHmmParams:
    """hmm.rs:29-44 parity."""

    emission_means: np.ndarray  # [K]
    log_trans: np.ndarray  # [K, K]
    log_pi: np.ndarray  # [K]

    @classmethod
    def new(cls, emission_means, transition_prob: float = 1e-4, neutral_idx: int | None = None):
        means = np.asarray(emission_means, np.float32)
        k = len(means)
        if neutral_idx is None:
            neutral_idx = int(np.argmin(np.abs(means)))
        trans = np.full((k, k), transition_prob / max(k - 1, 1))
        np.fill_diagonal(trans, 1.0 - transition_prob)
        pi = np.full(k, 0.05 / max(k - 1, 1))
        pi[neutral_idx] = 0.95
        return cls(
            emission_means=means,
            log_trans=np.log(trans).astype(np.float32),
            log_pi=np.log(pi).astype(np.float32),
        )

    @classmethod
    def default_3state(cls):
        """{del, neutral, gain} (hmm.rs:90)."""
        return cls.new(np.asarray([-0.5, 0.0, 0.3]))

    @classmethod
    def from_kmeans_bic(
        cls,
        values: np.ndarray,
        k_range=(3, 5, 6),
        *,
        transition_prob: float = 1e-4,
        seed: int = 0,
    ) -> "CnvHmmParams":
        """Seed the state means from the marginal signal distribution:
        hard-assignment 1D kmeans per candidate K, soft Gaussian-
        mixture log-likelihood at the kmeans stats, BIC with
        p = 3K - 1 free params, smallest BIC wins; components sort by
        mean and the one nearest 0 becomes neutral
        (cnv/src/kmeans_init.rs cluster_stats_kmeans/select_kmeans_k/
        sort_components)."""
        v = np.asarray(values, np.float64).ravel()
        n = len(v)
        best = None
        for k in k_range:
            if k <= 1 or k > n:
                continue
            means, variances, weights, ll = _kmeans_component_stats(v, k, seed)
            p = 3 * k - 1
            bic = -2.0 * ll + p * np.log(max(n, 1))
            if best is None or bic < best[0]:
                best = (bic, means)
        if best is None:
            return cls.default_3state()
        means = np.sort(best[1])
        return cls.new(means.astype(np.float32), transition_prob=transition_prob)

    @property
    def n_states(self):
        return len(self.emission_means)


def _log_emissions(params_means, y, alpha, sigma_sq):
    """[S, K] Gaussian log density of y around alpha * mu_k."""
    mu = alpha * params_means[None, :]
    return -0.5 * ((y[:, None] - mu) ** 2 / sigma_sq + jnp.log(2 * jnp.pi * sigma_sq))


@jax.jit
def _forward_backward(log_pi, log_trans, log_emit):
    """Posteriors [S, K] + loglik via scan (hmm.rs:213-222, 244-305)."""

    def fwd_step(alpha_prev, emit_t):
        a = jax.scipy.special.logsumexp(alpha_prev[:, None] + log_trans, axis=0) + emit_t
        return a, a

    alpha0 = log_pi + log_emit[0]
    _, alphas = jax.lax.scan(fwd_step, alpha0, log_emit[1:])
    alphas = jnp.concatenate([alpha0[None], alphas], 0)

    def bwd_step(beta_next, emit_next):
        b = jax.scipy.special.logsumexp(
            log_trans + (emit_next + beta_next)[None, :], axis=1
        )
        return b, b

    betaT = jnp.zeros_like(alpha0)
    _, betas_rev = jax.lax.scan(bwd_step, betaT, log_emit[1:][::-1])
    betas = jnp.concatenate([betas_rev[::-1], betaT[None]], 0)

    log_post = alphas + betas
    loglik = jax.scipy.special.logsumexp(alphas[-1])
    post = jnp.exp(log_post - jax.scipy.special.logsumexp(log_post, axis=1, keepdims=True))
    return post, loglik


@jax.jit
def _viterbi(log_pi, log_trans, log_emit):
    """Most-likely path via max-product scan (hmm.rs:224-230, 307-347)."""

    def step(delta_prev, emit_t):
        scores = delta_prev[:, None] + log_trans
        back = jnp.argmax(scores, axis=0)
        delta = jnp.max(scores, axis=0) + emit_t
        return delta, back

    delta0 = log_pi + log_emit[0]
    deltaT, backs = jax.lax.scan(step, delta0, log_emit[1:])

    last = jnp.argmax(deltaT)

    def trace(state, back_t):
        prev = back_t[state]
        return prev, prev

    _, path_rev = jax.lax.scan(trace, last, backs[::-1])
    return jnp.concatenate([path_rev[::-1], jnp.asarray([last])])


@dataclass
class HmmResult:
    posteriors: np.ndarray  # [S, K]
    viterbi_path: np.ndarray  # [S]
    log_likelihood: float


def infer_sample(params: CnvHmmParams, y: np.ndarray, alpha: float = 1.0, sigma_sq: float = 0.04) -> HmmResult:
    means = jnp.asarray(params.emission_means)
    emit = _log_emissions(means, jnp.asarray(y, jnp.float32), alpha, sigma_sq)
    post, ll = _forward_backward(
        jnp.asarray(params.log_pi), jnp.asarray(params.log_trans), emit
    )
    path = _viterbi(jnp.asarray(params.log_pi), jnp.asarray(params.log_trans), emit)
    return HmmResult(
        posteriors=np.asarray(post),
        viterbi_path=np.asarray(path),
        log_likelihood=float(ll),
    )


def fit_em(
    params: CnvHmmParams,
    y_samples: np.ndarray,  # [B, S] per-sample segment log-ratios
    *,
    n_iter: int = 20,
    min_sigma: float = 1e-3,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-sample (alpha, sigma^2) EM with shared states
    (estimate_sample_params + fit_em, hmm.rs:424-640), vmapped over
    samples. Returns (alpha [B], sigma_sq [B], posteriors [B, S, K])."""
    means = jnp.asarray(params.emission_means)
    log_pi = jnp.asarray(params.log_pi)
    log_trans = jnp.asarray(params.log_trans)
    y = jnp.asarray(y_samples, jnp.float32)

    @jax.jit
    def em(y):
        def one(y_s, alpha, sigma_sq):
            emit = _log_emissions(means, y_s, alpha, sigma_sq)
            post, ll = _forward_backward(log_pi, log_trans, emit)
            # M-step: alpha = <y, post mu> / <post mu, mu>, sigma from resid
            mu_s = post @ means  # [S] expected state mean
            denom = jnp.maximum(jnp.sum(post @ (means**2)), 1e-8)
            alpha_new = jnp.clip(jnp.sum(y_s * mu_s) / denom, 0.1, 10.0)
            resid = y_s - alpha_new * mu_s
            sigma_new = jnp.maximum(jnp.mean(resid**2), min_sigma)
            return alpha_new, sigma_new, post, ll

        def scan_iter(carry, _):
            alpha, sigma = carry
            a, s, _, _ = jax.vmap(one)(y, alpha, sigma)
            return (a, s), None

        b = y.shape[0]
        (alpha, sigma), _ = jax.lax.scan(
            scan_iter, (jnp.ones(b), jnp.full(b, 0.04)), None, length=n_iter
        )
        _, _, post, ll = jax.vmap(one)(y, alpha, sigma)
        return alpha, sigma, post

    alpha, sigma, post = em(y)
    return np.asarray(alpha), np.asarray(sigma), np.asarray(post)


def _kmeans_component_stats(v: np.ndarray, k: int, seed: int):
    """1D kmeans component fit (kmeans_init.rs cluster_stats_kmeans):
    hard-assignment kmeans seeds (means, variances, weights); the
    returned log-likelihood is the SOFT Gaussian-mixture value at
    those stats (tighter BIC, avoids favouring extreme K)."""
    from .kmeans import kmeans as _kmeans

    _, labels = _kmeans(v[:, None].astype(np.float32), k, seed=seed)
    means = np.zeros(k)
    variances = np.full(k, 1e-4)
    weights = np.zeros(k)
    for j in range(k):
        m = labels == j
        if m.any():
            means[j] = v[m].mean()
            variances[j] = max(float(v[m].var()), 1e-4)
            weights[j] = m.mean()
    log_p = (
        np.log(np.maximum(weights, 1e-30))[None, :]
        - 0.5 * ((v[:, None] - means[None, :]) ** 2 / variances[None, :]
                 + np.log(2 * np.pi * variances[None, :]))
    )
    mx = log_p.max(1, keepdims=True)
    ll = float((mx[:, 0] + np.log(np.exp(log_p - mx).sum(1))).sum())
    return means, variances, weights, ll
