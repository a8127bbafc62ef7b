"""Black-box stochastic-gradient variational Bayes for regression and
fine-mapping (candle-util `sgvb/` equivalent; SURVEY.md section 2.4).

Contract parity (`sgvb/traits.rs:5-80`):
- likelihoods evaluate log p(y | eta) on S sampled linear predictors
  (no gradient through the likelihood's internals needed — JAX
  differentiates the whole ELBO anyway, matching the local
  reparameterization estimator);
- variational families expose elementwise moments (mean, var) so the
  linear predictor is sampled in eta-space:
      eta ~ N(X E[theta], X^2 Var[theta])   (local reparameterization)
- priors provide analytical KL from the Gaussian/structured q.

Families:
- `GaussianVar` — mean-field Gaussian (variational_gaussian.rs)
- `SpikeSlabVar` — independent Bernoulli gates (variational_spike_slab.rs)
- `SusieVar` — sum of single effects with optional null absorber
  (variational_susie.rs; Wang et al. 2020)

Likelihoods: Gaussian / weighted Gaussian / Poisson / NB / RSS
(summary statistics; Zhu & Stephens 2017 via the eigenspace projection
of `sgvb/likelihood/rss.rs`: ytilde = Dreg^-1 V' z, Xtilde = Dreg V').
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# ----------------------------------------------------------------------------
# variational families (pure param pytrees + functions)
# ----------------------------------------------------------------------------


def smoothed_sigmoid(logits, epsilon=1e-3):
    """eps + (1-2eps) sigmoid(x) (variational_susie.rs:7-15)."""
    return epsilon + (1.0 - 2.0 * epsilon) * jax.nn.sigmoid(logits)


class GaussianVarParams(NamedTuple):
    mean: jax.Array  # [p, k]
    ln_std: jax.Array  # [p, k]


def gaussian_var_init(key, p, k, scale=0.01):
    return GaussianVarParams(
        mean=scale * jax.random.normal(key, (p, k)),
        ln_std=jnp.full((p, k), -2.0),
    )


def gaussian_var_moments(q: GaussianVarParams):
    var = jnp.exp(2.0 * q.ln_std)
    return q.mean, var


def gaussian_var_kl(q: GaussianVarParams, prior_var: float = 1.0):
    """KL(N(mu, s^2) || N(0, v0)) summed."""
    var = jnp.exp(2.0 * q.ln_std)
    return 0.5 * jnp.sum(
        (var + q.mean**2) / prior_var - 1.0 + jnp.log(prior_var) - 2.0 * q.ln_std
    )


class SpikeSlabVarParams(NamedTuple):
    gate_logits: jax.Array  # [p, k]
    beta_mean: jax.Array  # [p, k]
    beta_ln_std: jax.Array  # [p, k]


def spike_slab_init(key, p, k):
    return SpikeSlabVarParams(
        gate_logits=jnp.zeros((p, k)),
        beta_mean=0.01 * jax.random.normal(key, (p, k)),
        beta_ln_std=jnp.full((p, k), -2.0),
    )


def spike_slab_moments(q: SpikeSlabVarParams):
    a = smoothed_sigmoid(q.gate_logits)
    var_b = jnp.exp(2.0 * q.beta_ln_std)
    mean = a * q.beta_mean
    var = a * (var_b + q.beta_mean**2) - mean**2
    return mean, jnp.maximum(var, 1e-12)


def spike_slab_kl(q: SpikeSlabVarParams, prior_pi: float = 0.1, prior_var: float = 1.0):
    a = smoothed_sigmoid(q.gate_logits)
    var_b = jnp.exp(2.0 * q.beta_ln_std)
    kl_gate = jnp.sum(
        a * (jnp.log(a) - jnp.log(prior_pi))
        + (1 - a) * (jnp.log1p(-a) - jnp.log(1 - prior_pi))
    )
    kl_slab = jnp.sum(
        a
        * 0.5
        * (
            (var_b + q.beta_mean**2) / prior_var
            - 1.0
            + jnp.log(prior_var)
            - 2.0 * q.beta_ln_std
        )
    )
    return kl_gate + kl_slab


class SusieVarParams(NamedTuple):
    logits: jax.Array  # [L, p (+1 null), k]
    beta_mean: jax.Array  # [L, p, k]
    beta_ln_std: jax.Array  # [L, p, k]


def susie_init(key, L, p, k, *, with_null: bool = True):
    p_logits = p + int(with_null)
    return SusieVarParams(
        logits=jnp.zeros((L, p_logits, k)),
        beta_mean=0.01 * jax.random.normal(key, (L, p, k)),
        beta_ln_std=jnp.full((L, p, k), -2.0),
    )


def susie_alpha(q: SusieVarParams, p: int):
    """Selection probabilities over the REAL positions [L, p, k]
    (null mass excluded; variational_susie.rs new_with_null)."""
    full = jax.nn.softmax(q.logits, axis=1)
    return full[:, :p, :]


def susie_moments(q: SusieVarParams):
    p = q.beta_mean.shape[1]
    a = susie_alpha(q, p)  # [L, p, k]
    var_b = jnp.exp(2.0 * q.beta_ln_std)
    mean_l = a * q.beta_mean  # [L, p, k]
    var_l = a * (var_b + q.beta_mean**2) - mean_l**2
    return mean_l.sum(0), jnp.maximum(var_l, 1e-12).sum(0)


def susie_pip(q: SusieVarParams):
    """Posterior inclusion probability 1 - prod_l (1 - alpha_l)
    (susie_util.rs pip_from_alpha)."""
    p = q.beta_mean.shape[1]
    a = susie_alpha(q, p)
    return 1.0 - jnp.prod(1.0 - a, axis=0)


def susie_kl(q: SusieVarParams, prior_var: float = 1.0):
    """Categorical-vs-uniform KL per component + alpha-weighted Gaussian
    KL (susie_util.rs kl_categorical_uniform)."""
    L, p_logits, k = q.logits.shape
    p = q.beta_mean.shape[1]
    full = jax.nn.softmax(q.logits, axis=1)
    log_full = jax.nn.log_softmax(q.logits, axis=1)
    kl_cat = jnp.sum(full * (log_full + jnp.log(p_logits)))
    a = full[:, :p, :]
    var_b = jnp.exp(2.0 * q.beta_ln_std)
    kl_gauss = jnp.sum(
        a
        * 0.5
        * (
            (var_b + q.beta_mean**2) / prior_var
            - 1.0
            + jnp.log(prior_var)
            - 2.0 * q.beta_ln_std
        )
    )
    return kl_cat + kl_gauss


class BiSusieVarParams(NamedTuple):
    """BiSuSiE (variational_bisusie.rs): selection SHARED across the k
    output traits (one causal configuration drives both), per-trait
    effect sizes."""

    logits: jax.Array  # [L, p (+1 null), 1] shared selection
    beta_mean: jax.Array  # [L, p, k]
    beta_ln_std: jax.Array  # [L, p, k]


def bisusie_init(key, L, p, k, *, with_null: bool = True):
    p_logits = p + int(with_null)
    return BiSusieVarParams(
        logits=jnp.zeros((L, p_logits, 1)),
        beta_mean=0.01 * jax.random.normal(key, (L, p, k)),
        beta_ln_std=jnp.full((L, p, k), -2.0),
    )


def bisusie_moments(q: BiSusieVarParams):
    p = q.beta_mean.shape[1]
    a = jax.nn.softmax(q.logits, axis=1)[:, :p, :]  # [L, p, 1] broadcast
    var_b = jnp.exp(2.0 * q.beta_ln_std)
    mean_l = a * q.beta_mean
    var_l = a * (var_b + q.beta_mean**2) - mean_l**2
    return mean_l.sum(0), jnp.maximum(var_l, 1e-12).sum(0)


def bisusie_kl(q: BiSusieVarParams, prior_var: float = 1.0):
    L, p_logits, _ = q.logits.shape
    p = q.beta_mean.shape[1]
    full = jax.nn.softmax(q.logits, axis=1)
    log_full = jax.nn.log_softmax(q.logits, axis=1)
    kl_cat = jnp.sum(full * (log_full + jnp.log(p_logits)))
    a = full[:, :p, :]
    var_b = jnp.exp(2.0 * q.beta_ln_std)
    kl_gauss = jnp.sum(
        a
        * 0.5
        * (
            (var_b + q.beta_mean**2) / prior_var
            - 1.0
            + jnp.log(prior_var)
            - 2.0 * q.beta_ln_std
        )
    )
    return kl_cat + kl_gauss


def bisusie_pip(q: BiSusieVarParams):
    p = q.beta_mean.shape[1]
    a = jax.nn.softmax(q.logits, axis=1)[:, :p, 0]
    return 1.0 - jnp.prod(1.0 - a, axis=0)


class MlSusieVarParams(NamedTuple):
    """Multilevel SuSiE (variational_multilevel_susie.rs): the per-effect
    selection softmax is factored hierarchically — a categorical over LD
    blocks (plus a null block) times a categorical over variants WITHIN
    the selected block. Same posterior family as flat SuSiE but the
    parameterization mixes far better when p is large and LD is
    block-structured: a block-level logit moves all its variants' mass
    jointly instead of fighting p-way softmax competition."""

    block_logits: jax.Array  # [L, B + 1, k] (last block = null)
    within_logits: jax.Array  # [L, p, k]
    beta_mean: jax.Array  # [L, p, k]
    beta_ln_std: jax.Array  # [L, p, k]


def ml_susie_init(key, L, p, k, n_blocks):
    return MlSusieVarParams(
        block_logits=jnp.zeros((L, n_blocks + 1, k)),
        within_logits=jnp.zeros((L, p, k)),
        beta_mean=0.01 * jax.random.normal(key, (L, p, k)),
        beta_ln_std=jnp.full((L, p, k), -2.0),
    )


def _ml_susie_alpha(q: MlSusieVarParams, group_onehot: jax.Array):
    """alpha[l, j, k] = P(block of j) * P(j | block of j); one-hot
    [p, B] matmuls keep the per-block normalization on the MXU."""
    b = group_onehot.shape[1]
    block_prob = jax.nn.softmax(q.block_logits, axis=1)  # [L, B+1, k]
    # within-block softmax via segment normalization; a global max
    # shift keeps exp in range (per-block shift is unnecessary at the
    # logit scales Adam produces)
    w = q.within_logits
    w = w - jax.lax.stop_gradient(w.max(axis=1, keepdims=True))
    e = jnp.exp(w)
    denom_b = jnp.einsum("lpk,pb->lbk", e, group_onehot)  # [L, B, k]
    denom_p = jnp.einsum("lbk,pb->lpk", denom_b, group_onehot)
    within_prob = e / jnp.maximum(denom_p, 1e-30)
    blk_p = jnp.einsum("lbk,pb->lpk", block_prob[:, :b, :], group_onehot)
    return blk_p * within_prob  # [L, p, k]; null mass = block_prob[:, b]


def ml_susie_moments(q: MlSusieVarParams, group_onehot):
    a = _ml_susie_alpha(q, group_onehot)
    var_b = jnp.exp(2.0 * q.beta_ln_std)
    mean_l = a * q.beta_mean
    var_l = a * (var_b + q.beta_mean**2) - mean_l**2
    return mean_l.sum(0), jnp.maximum(var_l, 1e-12).sum(0)


def ml_susie_kl(q: MlSusieVarParams, group_onehot, prior_var: float = 1.0):
    """KL of the factored categorical vs uniform over p + 1 outcomes,
    plus the alpha-weighted Gaussian slab KL (same as flat SuSiE)."""
    p = q.beta_mean.shape[1]
    b = group_onehot.shape[1]
    a = _ml_susie_alpha(q, group_onehot)  # [L, p, k]
    null = jax.nn.softmax(q.block_logits, axis=1)[:, b, :]  # [L, k]
    log_a = jnp.log(jnp.maximum(a, 1e-30))
    log_null = jnp.log(jnp.maximum(null, 1e-30))
    kl_cat = jnp.sum(a * (log_a + jnp.log(p + 1.0))) + jnp.sum(
        null * (log_null + jnp.log(p + 1.0))
    )
    var_b = jnp.exp(2.0 * q.beta_ln_std)
    kl_gauss = jnp.sum(
        a
        * 0.5
        * (
            (var_b + q.beta_mean**2) / prior_var
            - 1.0
            + jnp.log(prior_var)
            - 2.0 * q.beta_ln_std
        )
    )
    return kl_cat + kl_gauss


def ml_susie_pip(q: MlSusieVarParams, group_onehot):
    a = _ml_susie_alpha(q, group_onehot)
    return 1.0 - jnp.prod(1.0 - a, axis=0)


def contiguous_ld_blocks(p: int, block_size: int | None = None) -> np.ndarray:
    """Positional LD blocks (fit_sumstat_sgvb.rs multilevel option):
    contiguous windows of ~sqrt(p) variants."""
    if block_size is None:
        block_size = max(int(np.ceil(np.sqrt(p))), 2)
    return (np.arange(p) // block_size).astype(np.int32)


# family registry: (init, moments, kl)
FAMILIES = {
    "gaussian": (gaussian_var_init, gaussian_var_moments, gaussian_var_kl),
    "spike-slab": (spike_slab_init, spike_slab_moments, spike_slab_kl),
    "susie": (None, susie_moments, susie_kl),  # init needs L
    "bisusie": (None, bisusie_moments, bisusie_kl),
}


def cavi_susie(
    x: np.ndarray,  # [n, p] standardized design
    y: np.ndarray,  # [n]
    *,
    L: int = 5,
    prior_var: float = 0.2,
    obs_var: float | None = None,
    n_iter: int = 50,
) -> dict:
    """Exact SuSiE coordinate ascent (cavi_susie.rs; Wang et al. 2020):
    iterative Bayesian single-effect regressions on residuals.
    Returns alpha [L, p], posterior means, pip [p]."""
    n, p = x.shape
    y = np.asarray(y, np.float64).ravel()
    x = np.asarray(x, np.float64)
    xtx = (x * x).sum(0)  # [p]
    s2 = float(np.var(y)) if obs_var is None else obs_var

    alpha = np.full((L, p), 1.0 / p)
    mu = np.zeros((L, p))
    fitted = np.zeros(n)
    for _ in range(n_iter):
        for l in range(L):
            fitted -= x @ (alpha[l] * mu[l])
            r = y - fitted
            bhat = (x.T @ r) / np.maximum(xtx, 1e-12)
            shat2 = s2 / np.maximum(xtx, 1e-12)
            post_var = 1.0 / (1.0 / prior_var + 1.0 / shat2)
            post_mean = post_var * bhat / shat2
            # log Bayes factor per variable
            lbf = 0.5 * np.log(shat2 / (shat2 + prior_var)) + 0.5 * bhat**2 / shat2 * (
                prior_var / (prior_var + shat2)
            )
            lbf -= lbf.max()
            w = np.exp(lbf)
            alpha[l] = w / w.sum()
            mu[l] = post_mean
            fitted += x @ (alpha[l] * mu[l])
    pip = 1.0 - np.prod(1.0 - alpha, axis=0)
    return {"alpha": alpha, "mu": mu, "pip": pip, "beta": (alpha * mu).sum(0)}


# ----------------------------------------------------------------------------
# likelihoods (sgvb/likelihood/)
# ----------------------------------------------------------------------------


def gaussian_llik(y, eta, obs_var=1.0):
    """log N(y | eta, v) summed over observations; [S, n, k] -> [S]."""
    return -0.5 * jnp.sum((y[None] - eta) ** 2 / obs_var, axis=(1, 2))


def weighted_gaussian_llik(y, eta, weights):
    return -0.5 * jnp.sum(weights[None] * (y[None] - eta) ** 2, axis=(1, 2))


def poisson_llik(y, eta):
    """y ~ Poisson(exp(eta)) (sgvb/likelihood/poisson.rs)."""
    lam = jnp.exp(jnp.clip(eta, -20.0, 20.0))
    return jnp.sum(y[None] * eta - lam, axis=(1, 2))


def nb_llik(y, eta, log_phi=0.0):
    from .losses import nb_log_likelihood_elem

    mu = jnp.exp(jnp.clip(eta, -20.0, 20.0))
    return jnp.sum(
        nb_log_likelihood_elem(y[None], mu, jnp.asarray(log_phi)), axis=(1, 2)
    )


def vmf_llik(y, eta, kappa=10.0):
    """von Mises-Fisher likelihood on unit-normalized responses
    (sgvb/likelihood/vmf.rs): log p ~ kappa * <y_unit, eta_unit>,
    constants dropped (kappa fixed)."""
    y_unit = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-8)
    eta_unit = eta / jnp.maximum(jnp.linalg.norm(eta, axis=-1, keepdims=True), 1e-8)
    return kappa * jnp.sum(y_unit[None] * eta_unit, axis=(1, 2))


@dataclass
class RssDesign:
    """Eigenspace RSS design (likelihood/rss.rs): fit a fixed-variance
    Gaussian regression of `y_tilde` on `x_tilde`."""

    x_tilde: np.ndarray  # [K, p] = Dreg V'
    y_tilde: np.ndarray  # [K, T] = Dreg^-1 V' z

    @classmethod
    def from_genotypes(
        cls, x_geno: np.ndarray, z: np.ndarray, *,
        rank: int | None = None, lam: float = 0.1,
        ldsc_intercept: bool = True,
        pve_adjust: bool = True,
    ):
        """SVD of X/sqrt(n) -> R = V D^2 V'; Dreg = sqrt(D^2 + lam).

        `ldsc_intercept` estimates the per-trait confounding intercept
        a from E[(V'z)^2_k] = h d^2_k + a (rss_svd.rs:110-152, clamped
        >= 1, no deflation) and rescales z by 1/sqrt(a) when inflated.
        `pve_adjust` applies the winner's-curse shrinkage
        z * sqrt((n-1)/(z^2+n-2)) (common.rs no_pve_adjust gate)."""
        n, p = x_geno.shape
        xs = (x_geno - x_geno.mean(0)) / np.maximum(x_geno.std(0), 1e-8)
        u, d, vt = np.linalg.svd(xs / np.sqrt(n), full_matrices=False)
        if rank is not None:
            d, vt = d[:rank], vt[:rank]
        z = np.atleast_2d(np.asarray(z, np.float64).T).T  # [p, T]
        if pve_adjust and n > 2:
            z = z * np.sqrt((n - 1.0) / (z * z + n - 2.0))
        if ldsc_intercept and len(d) > 2:
            d_sq = d * d
            y_raw = vt @ z  # [K, T]
            mean_x = d_sq.mean()
            var_x = ((d_sq - mean_x) ** 2).sum()
            y2 = y_raw**2  # [K, T]
            mean_y = y2.mean(0)
            cov = ((d_sq - mean_x)[:, None] * (y2 - mean_y[None, :])).sum(0)
            slope = np.where(np.abs(var_x) > 1e-12, cov / var_x, 0.0)
            intercept = np.maximum(mean_y - slope * mean_x, 1.0)  # [T]
            z = z / np.sqrt(intercept)[None, :]
        d_reg = np.sqrt(d * d + lam)
        x_tilde = d_reg[:, None] * vt  # [K, p]
        y_tilde = (vt @ z) / d_reg[:, None]  # [K, T]
        return cls(x_tilde=x_tilde.astype(np.float32), y_tilde=y_tilde.astype(np.float32))


# ----------------------------------------------------------------------------
# SGVB regression trainer (regression_linear.rs + sgvb_util.rs)
# ----------------------------------------------------------------------------


@dataclass
class SgvbConfig:
    num_steps: int = 1000
    num_samples: int = 8  # MC samples per step
    learning_rate: float = 0.01
    kl_weight: float = 1.0
    prior_var: float = 1.0
    seed: int = 0


def fit_regression(
    x: np.ndarray,  # [n, p] design
    y: np.ndarray,  # [n, k] responses
    *,
    family: str = "susie",
    L: int = 5,
    llik: Callable = gaussian_llik,
    config: SgvbConfig | None = None,
    with_null: bool = True,
    groups: np.ndarray | None = None,  # ml-susie: variant -> LD block
):
    """Fit q(theta) by maximizing the local-reparameterized ELBO:

        eta_s = X mu_theta + sqrt(X^2 var_theta) * eps_s
        ELBO  = E_s[llik(y, eta_s)] - kl_weight * KL(q || prior)
    """
    cfg = config or SgvbConfig()
    key = jax.random.key(cfg.seed)
    p = x.shape[1]
    k = y.shape[1] if y.ndim > 1 else 1
    y = y.reshape(-1, k)

    k_init, key = jax.random.split(key)
    if family == "susie":
        q = susie_init(k_init, L, p, k, with_null=with_null)
        moments, kl_fn = susie_moments, susie_kl
    elif family == "ml-susie":
        g = groups if groups is not None else contiguous_ld_blocks(p)
        g = np.asarray(g, np.int32)
        n_blocks = int(g.max()) + 1
        onehot = jnp.asarray(np.eye(n_blocks, dtype=np.float32)[g])  # [p, B]
        q = ml_susie_init(k_init, L, p, k, n_blocks)
        moments = lambda q: ml_susie_moments(q, onehot)
        kl_fn = lambda q, prior_var: ml_susie_kl(q, onehot, prior_var=prior_var)
    elif family == "bisusie":
        q = bisusie_init(k_init, L, p, k, with_null=with_null)
        moments, kl_fn = bisusie_moments, bisusie_kl
    elif family == "spike-slab":
        q = spike_slab_init(k_init, p, k)
        moments, kl_fn = spike_slab_moments, spike_slab_kl
    else:
        q = gaussian_var_init(k_init, p, k)
        moments, kl_fn = gaussian_var_moments, gaussian_var_kl

    x_j = jnp.asarray(x, jnp.float32)
    x_sq = x_j * x_j
    y_j = jnp.asarray(y, jnp.float32)

    optimizer = optax.adam(cfg.learning_rate)
    opt_state = optimizer.init(q)

    def elbo_loss(q, key):
        mean, var = moments(q)
        eta_mean = x_j @ mean  # [n, k]
        eta_var = x_sq @ var
        eps = jax.random.normal(key, (cfg.num_samples, *eta_mean.shape))
        eta = eta_mean[None] + jnp.sqrt(jnp.maximum(eta_var, 1e-12))[None] * eps
        ll = jnp.mean(llik(y_j, eta))
        return -(ll - cfg.kl_weight * kl_fn(q, prior_var=cfg.prior_var))

    @jax.jit
    def step(q, opt_state, key):
        loss, grads = jax.value_and_grad(elbo_loss)(q, key)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(q, updates), opt_state, loss

    losses = []
    for i in range(cfg.num_steps):
        key, k_s = jax.random.split(key)
        q, opt_state, loss = step(q, opt_state, k_s)
        if i % 50 == 0:
            losses.append(float(loss))

    # final ELBO on a fixed key (comparable across prior-var grid points)
    final_elbo = -float(elbo_loss(q, jax.random.key(cfg.seed ^ 0x5EED)))
    result = {"q": q, "losses": losses, "elbo": final_elbo}
    mean, var = moments(q)
    result["theta_mean"] = np.asarray(mean)
    result["theta_var"] = np.asarray(var)
    if family == "susie":
        result["pip"] = np.asarray(susie_pip(q))
        result["alpha"] = np.asarray(susie_alpha(q, p))
    elif family == "ml-susie":
        result["pip"] = np.asarray(ml_susie_pip(q, onehot))
        result["alpha"] = np.asarray(_ml_susie_alpha(q, onehot))
    elif family == "bisusie":
        result["pip"] = np.asarray(bisusie_pip(q))[:, None]
    elif family == "spike-slab":
        result["pip"] = np.asarray(smoothed_sigmoid(q.gate_logits))
    return result


def fit_regression_grid(
    x: np.ndarray,
    y: np.ndarray,
    *,
    prior_vars,
    family: str = "susie",
    L: int = 5,
    llik: Callable = gaussian_llik,
    config: SgvbConfig | None = None,
    with_null: bool = True,
    groups: np.ndarray | None = None,
) -> dict:
    """Single-Gaussian prior with grid search over prior variances
    (fit_sumstat_sgvb.rs `--prior-type single`): fit once per grid value
    and keep the max-ELBO fit. Adds `prior_var` and `grid_elbos`."""
    cfg = config or SgvbConfig()
    best = None
    grid_elbos = []
    for v in prior_vars:
        out = fit_regression(
            x, y, family=family, L=L, llik=llik,
            config=dataclasses.replace(cfg, prior_var=float(v)),
            with_null=with_null, groups=groups,
        )
        grid_elbos.append(out["elbo"])
        if best is None or out["elbo"] > best["elbo"]:
            best = out
            best["prior_var"] = float(v)
    best["grid_elbos"] = grid_elbos
    return best


class AshVarParams(NamedTuple):
    """Spike-slab q + per-coordinate mixture responsibilities over the
    prior-variance grid (fit_sumstat_sgvb.rs `--prior-type ash`:
    mixture-of-Gaussians prior, learnable weights)."""

    gate_logits: jax.Array  # [p, k]
    beta_mean: jax.Array  # [p, k]
    beta_ln_std: jax.Array  # [p, k]
    resp_logits: jax.Array  # [p, k, C] component responsibilities
    mix_logits: jax.Array  # [C] shared mixture weights


def ash_kl(q: AshVarParams, prior_vars: jax.Array, prior_pi: float = 0.1):
    """Exact KL for the component-augmented model: responsibilities are
    the variational posterior over the mixture assignment, so
    KL = sum_j sum_c r_jc [KL(q_j || N(0, v_c)) + log r_jc - log pi_c]
    + Bernoulli gate term."""
    a = smoothed_sigmoid(q.gate_logits)
    var_b = jnp.exp(2.0 * q.beta_ln_std)
    kl_gate = jnp.sum(
        a * (jnp.log(a) - jnp.log(prior_pi))
        + (1 - a) * (jnp.log1p(-a) - jnp.log(1 - prior_pi))
    )
    # per-coordinate per-component slab KL [p, k, C]
    kl_c = 0.5 * (
        (var_b[..., None] + q.beta_mean[..., None] ** 2) / prior_vars
        - 1.0
        + jnp.log(prior_vars)
        - 2.0 * q.beta_ln_std[..., None]
    )
    r = jax.nn.softmax(q.resp_logits, axis=-1)
    log_pi = jax.nn.log_softmax(q.mix_logits)
    # slab + assignment KL weighted by the gate (spike contributes only
    # through the Bernoulli term, matching spike_slab_kl's structure)
    kl_slab_mix = jnp.sum(
        a * jnp.sum(r * (kl_c + jnp.log(jnp.maximum(r, 1e-12)) - log_pi), axis=-1)
    )
    return kl_gate + kl_slab_mix


def fit_regression_ash(
    x: np.ndarray,
    y: np.ndarray,
    *,
    prior_vars,
    llik: Callable = gaussian_llik,
    config: SgvbConfig | None = None,
    prior_pi: float = 0.1,
) -> dict:
    """Spike-slab SGVB with an adaptive-shrinkage (ash) mixture prior
    over the effect-size variance grid. The mixture weights and
    per-coordinate responsibilities are optimized with the rest of the
    variational state; returns `mix_weights` over the grid."""
    cfg = config or SgvbConfig()
    key = jax.random.key(cfg.seed)
    p = x.shape[1]
    k = y.shape[1] if y.ndim > 1 else 1
    y = y.reshape(-1, k)
    c = len(prior_vars)
    pv = jnp.asarray(np.asarray(prior_vars, np.float32))

    k_init, key = jax.random.split(key)
    ss = spike_slab_init(k_init, p, k)
    q = AshVarParams(
        gate_logits=ss.gate_logits,
        beta_mean=ss.beta_mean,
        beta_ln_std=ss.beta_ln_std,
        resp_logits=jnp.zeros((p, k, c)),
        mix_logits=jnp.zeros(c),
    )
    x_j = jnp.asarray(x, jnp.float32)
    x_sq = x_j * x_j
    y_j = jnp.asarray(y, jnp.float32)
    optimizer = optax.adam(cfg.learning_rate)
    opt_state = optimizer.init(q)

    def moments(q):
        return spike_slab_moments(
            SpikeSlabVarParams(q.gate_logits, q.beta_mean, q.beta_ln_std)
        )

    def elbo_loss(q, key):
        mean, var = moments(q)
        eta_mean = x_j @ mean
        eta_var = x_sq @ var
        eps = jax.random.normal(key, (cfg.num_samples, *eta_mean.shape))
        eta = eta_mean[None] + jnp.sqrt(jnp.maximum(eta_var, 1e-12))[None] * eps
        ll = jnp.mean(llik(y_j, eta))
        return -(ll - cfg.kl_weight * ash_kl(q, pv, prior_pi))

    @jax.jit
    def step(q, opt_state, key):
        loss, grads = jax.value_and_grad(elbo_loss)(q, key)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(q, updates), opt_state, loss

    losses = []
    for i in range(cfg.num_steps):
        key, k_s = jax.random.split(key)
        q, opt_state, loss = step(q, opt_state, k_s)
        if i % 50 == 0:
            losses.append(float(loss))
    final_elbo = -float(elbo_loss(q, jax.random.key(cfg.seed ^ 0x5EED)))
    mean, var = moments(q)
    return {
        "q": q,
        "losses": losses,
        "elbo": final_elbo,
        "theta_mean": np.asarray(mean),
        "theta_var": np.asarray(var),
        "pip": np.asarray(smoothed_sigmoid(q.gate_logits)),
        "mix_weights": np.asarray(jax.nn.softmax(q.mix_logits)),
        "prior_vars": np.asarray(pv),
    }


def fit_susie_rss(
    design: RssDesign,
    *,
    L: int = 5,
    config: SgvbConfig | None = None,
) -> dict:
    """SuSiE fine-mapping on GWAS summary stats
    (`fagioli map-sumstat` core; fit_sumstat_sgvb.rs)."""
    return fit_regression(
        design.x_tilde,
        design.y_tilde,
        family="susie",
        L=L,
        llik=gaussian_llik,
        config=config,
    )
