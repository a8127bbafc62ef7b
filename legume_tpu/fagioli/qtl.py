"""Single-cell eQTL mapping + simulation
(`fagioli map-qtl` -> fit_qtl_sgvb.rs; `sim-qtl` equivalents).

map-qtl: per (individual, cell-type) Poisson-Gamma pseudobulk
posterior -> per-gene weighted-Gaussian SuSiE regression on genotypes
(weights = posterior precision of the log-rate), vmappable across
genes.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..models.sgvb import SgvbConfig, fit_regression, weighted_gaussian_llik
from ..ops.gamma import GammaParam

log = logging.getLogger(__name__)


@dataclass
class QtlSim:
    counts: np.ndarray  # [G, N] cell counts
    cell_indv: np.ndarray
    genotypes: np.ndarray  # [I, P]
    causal_variant: np.ndarray  # [G] variant index (-1 none)
    beta: np.ndarray  # [G] effect size


def simulate_qtl(
    n_genes: int = 40,
    n_indv: int = 60,
    cells_per_indv: int = 25,
    n_variants: int = 50,
    frac_egenes: float = 0.5,
    effect_sd: float = 0.5,
    depth: float = 2000.0,
    seed: int = 0,
) -> QtlSim:
    """Single-cell eQTL generative model (`fagioli sim-qtl`)."""
    rng = np.random.default_rng(seed)
    g, i, p = n_genes, n_indv, n_variants
    maf = rng.uniform(0.1, 0.5, p)
    geno = rng.binomial(2, maf[None, :], size=(i, p)).astype(np.float64)
    gs = (geno - geno.mean(0)) / np.maximum(geno.std(0), 1e-8)

    causal = np.full(g, -1, np.int64)
    beta = np.zeros(g)
    egenes = rng.random(g) < frac_egenes
    causal[egenes] = rng.integers(0, p, egenes.sum())
    beta[egenes] = rng.normal(0, effect_sd, egenes.sum())

    cell_indv = np.repeat(np.arange(i), cells_per_indv)
    base = rng.gamma(2.0, 1.0, g)
    log_mu = np.log(base)[:, None] + np.where(
        causal[:, None] >= 0, beta[:, None] * gs[cell_indv][:, np.clip(causal, 0, p - 1)].T, 0.0
    )
    lam = depth / g * np.exp(np.clip(log_mu, -6, 6))
    counts = rng.poisson(lam * rng.gamma(8, 0.125, size=(g, len(cell_indv))))
    return QtlSim(
        counts=counts.astype(np.float32),
        cell_indv=cell_indv,
        genotypes=geno,
        causal_variant=causal,
        beta=beta,
    )


def pseudobulk_log_rates(
    counts_gn: np.ndarray, cell_indv: np.ndarray, n_indv: int, *, a0=1.0, b0=1.0
):
    """Per-(gene, individual) Gamma posterior of the rate: returns
    (log_mean [G, I], precision weights [G, I])."""
    import jax.numpy as jnp

    g = counts_gn.shape[0]
    sums = np.zeros((g, n_indv))
    sizes = np.zeros(n_indv)
    np.add.at(sums.T, cell_indv, counts_gn.T)
    np.add.at(sizes, cell_indv, 1.0)
    gp = GammaParam(a=jnp.asarray(a0 + sums), b=jnp.asarray(b0 + sizes[None, :]))
    log_mean = np.asarray(gp.log_mean())
    log_sd = np.asarray(gp.log_sd())
    w = 1.0 / np.maximum(log_sd, 1e-3) ** 2
    return log_mean, w


def map_qtl(
    counts_gn: np.ndarray,
    cell_indv: np.ndarray,
    genotypes: np.ndarray,  # [I, P]
    *,
    L: int = 3,
    num_steps: int = 800,
    seed: int = 0,
) -> dict:
    """Per-gene SuSiE fine-mapping of pseudobulk log-rates on genotypes
    with posterior-precision weights (fit_qtl_sgvb.rs)."""
    n_indv = genotypes.shape[0]
    log_mu, w = pseudobulk_log_rates(counts_gn, cell_indv, n_indv)
    gs = (genotypes - genotypes.mean(0)) / np.maximum(genotypes.std(0), 1e-8)

    g = counts_gn.shape[0]
    pips, effects = [], []
    for gi in range(g):
        y = (log_mu[gi] - log_mu[gi].mean())[:, None]
        wg = w[gi][:, None] / max(w[gi].mean(), 1e-9)
        out = fit_regression(
            gs, y, family="susie", L=L,
            llik=lambda yy, ee, wg=wg: weighted_gaussian_llik(yy, ee, wg),
            config=SgvbConfig(num_steps=num_steps, learning_rate=0.02, seed=seed),
        )
        pips.append(out["pip"][:, 0])
        effects.append(out["theta_mean"][:, 0])
    return {"pip": np.stack(pips), "effect": np.stack(effects)}
