"""Pseudobulk-level posterior MCMC over the bilinear embedding
(graph-embedding-util `posterior/` equivalent) and the spike-slab
feature-selection pass (`fit/selection.rs`).

- `pb_posterior_ess`: per-anchor elliptical-slice chains under the
  Poisson likelihood with the feature side frozen. Anchors (pb rows)
  are conditionally independent given the frozen slate
  (posterior/mod.rs:5-9) — the reference parallelizes them over rayon;
  here ALL anchors step in lockstep through the batched ESS kernel
  (`ops/mcmc.py`), so one sweep is a handful of [P, D] matmuls.
  Alternating sides = call twice with sides swapped (pb_gibbs).

- `selection_pass`: blocked Gibbs over per-(feature, dim) binary gates
  on the expected-NCE objective. For one dim h, zeroing e_feat[:, h]
  changes every score by an additive rank-1 term, so the per-feature
  on/off objective delta is computable for ALL features from two
  dense matmuls; gates sample independently within the dim block
  (the chromatic schedule: dims are the colors).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.losses import log_sigmoid
from ..ops.mcmc import run_ess_chains


def pb_posterior_ess(
    counts_pd: np.ndarray,  # [P, D]
    feat_e: np.ndarray,  # [D, H] frozen feature embeddings
    feat_b: np.ndarray,  # [D] frozen feature biases
    *,
    num_samples: int = 45,
    burn_in: int = 10,
    prior_sd: float = 1.0,
    seed: int = 0,
) -> dict:
    """Posterior draws of pb embeddings (+ bias) under
    y_pg ~ Poisson(exp(e_p . f_g + b_g + b_p)). Returns draws and
    split-Rhat/ESS diagnostics per anchor."""
    from ..ops.mcmc import ess as ess_diag
    from ..ops.mcmc import split_rhat

    p, d = counts_pd.shape
    h = feat_e.shape[1]
    y = jnp.asarray(counts_pd, jnp.float32)
    f = jnp.asarray(feat_e, jnp.float32)
    fb = jnp.asarray(feat_b, jnp.float32)

    def lnpdf(state):  # [P, H+1] -> [P]
        e = state[:, :h]
        b = state[:, h]
        eta = e @ f.T + fb[None, :] + b[:, None]
        eta = jnp.clip(eta, -20.0, 20.0)
        return jnp.sum(y * eta - jnp.exp(eta), axis=1)

    init = jnp.zeros((p, h + 1))
    samples, lnp = run_ess_chains(
        jax.random.key(seed),
        init,
        prior_draw=lambda k, s: prior_sd * jax.random.normal(k, s),
        lnpdf=lnpdf,
        num_samples=num_samples,
        burn_in=burn_in,
    )
    draws = np.asarray(samples)  # [T, P, H+1]
    rhat = np.asarray([split_rhat(draws[:, i, 0]) for i in range(min(p, 20))])
    ess_v = np.asarray([ess_diag(draws[:, i, 0]) for i in range(min(p, 20))])
    return {
        "e_mean": draws[:, :, :h].mean(0),
        "b_mean": draws[:, :, h].mean(0),
        "draws": draws,
        "rhat": rhat,
        "ess": ess_v,
        "lnpdf": np.asarray(lnp),
    }


@partial(jax.jit, static_argnames=("k_neg",))
def _gate_dim_delta(e_feat, b_feat, gates, dim, axis_e, axis_b, counts_pd, q_d, m_p, k_neg):
    """Per-feature objective delta of turning gate[:, dim] ON vs OFF,
    all else fixed. Returns [D] log-odds contribution."""
    gated = e_feat * gates
    scores_off = axis_e @ (gated.at[:, dim].set(0.0)).T + b_feat[None, :] + axis_b[:, None]
    contrib = jnp.outer(axis_e[:, dim], e_feat[:, dim])  # [P, D]
    scores_on = scores_off + contrib

    def obj(scores):
        pos = counts_pd * log_sigmoid(scores)
        neg = (k_neg * m_p[:, None] * q_d[None, :]) * log_sigmoid(-scores)
        return (pos + neg).sum(axis=0)  # per-feature column sums

    return obj(scores_on) - obj(scores_off)


def selection_pass(
    e_feat: np.ndarray,  # [D, H]
    b_feat: np.ndarray,
    axis_e: np.ndarray,  # [P, H] pb embeddings
    axis_b: np.ndarray,
    counts_pd: np.ndarray,
    *,
    gates: np.ndarray | None = None,
    prior_logit: float = -1.0,
    n_sweeps: int = 3,
    k_neg: float = 5.0,
    neg_alpha: float = 0.75,
    temperature: float = 1.0,
    q_marginal: np.ndarray | None = None,
    seed: int = 0,
) -> np.ndarray:
    """Gibbs-sample per-(feature, dim) gates (fit/selection.rs role):
    p(gate=1) = sigmoid((delta-objective)/T + prior_logit). Returns the
    gate matrix [D, H] in {0, 1}. `q_marginal` overrides the negative
    distribution (must match the one used to FIT the embeddings)."""
    d, h = e_feat.shape
    if q_marginal is not None:
        q = jnp.asarray(np.asarray(q_marginal, np.float32))
    else:
        q = counts_pd.sum(0) ** neg_alpha
        q = jnp.asarray((q / max(q.sum(), 1e-30)).astype(np.float32))
    m_p = jnp.asarray(counts_pd.sum(1).astype(np.float32))
    y = jnp.asarray(counts_pd, jnp.float32)
    ef = jnp.asarray(e_feat, jnp.float32)
    bf = jnp.asarray(b_feat, jnp.float32)
    ae = jnp.asarray(axis_e, jnp.float32)
    ab = jnp.asarray(axis_b, jnp.float32)

    g = (
        jnp.ones((d, h))
        if gates is None
        else jnp.asarray(np.asarray(gates, np.float32))
    )
    key = jax.random.key(seed)
    for sweep in range(n_sweeps):
        for dim in range(h):
            delta = _gate_dim_delta(ef, bf, g, dim, ae, ab, y, q, m_p, k_neg)
            # raw objective delta IS the Gibbs log-odds (the NCE
            # objective plays the log-likelihood role); `temperature`
            # tempers it, 1.0 = exact conditional
            logit = delta / temperature + prior_logit
            key, kd = jax.random.split(key)
            on = jax.random.bernoulli(kd, jax.nn.sigmoid(logit))
            g = g.at[:, dim].set(on.astype(g.dtype))
    return np.asarray(g)
