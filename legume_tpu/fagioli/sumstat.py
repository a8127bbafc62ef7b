"""fagioli: GWAS/eQTL fine-mapping from summary statistics
(`fagioli/src/fit_sumstat_sgvb.rs` + `sim-sumstat` equivalents).

- `simulate_sumstat`: LD-blocked genotype + causal-effect generator
  producing z-scores (fagioli `sim-sumstat`).
- `map_sumstat`: SuSiE-RSS fine-mapping on z-scores against a
  reference genotype panel (rSVD-compressed LD; `map-sumstat` ->
  fit_sumstat_sgvb.rs).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from ..models.sgvb import RssDesign, SgvbConfig, fit_susie_rss

log = logging.getLogger(__name__)


@dataclass
class SumstatSim:
    genotypes: np.ndarray  # [n, p] 0/1/2 dosages
    z: np.ndarray  # [p] marginal z-scores
    beta: np.ndarray  # [p] true effects
    causal: np.ndarray  # [p] bool


def simulate_sumstat(
    n: int = 500,
    p: int = 200,
    n_causal: int = 3,
    h2: float = 0.3,
    ld_decay: float = 0.1,
    maf_low: float = 0.05,
    seed: int = 0,
) -> SumstatSim:
    """LD via an AR(1)-correlated latent; marginal z from the realized
    phenotype (fagioli sim-sumstat model)."""
    rng = np.random.default_rng(seed)
    # AR(1) latent -> correlated genotypes
    eps = rng.standard_normal((n, p))
    lat = np.empty((n, p))
    lat[:, 0] = eps[:, 0]
    rho = np.exp(-ld_decay)
    for j in range(1, p):
        lat[:, j] = rho * lat[:, j - 1] + np.sqrt(1 - rho * rho) * eps[:, j]
    from scipy.stats import norm

    maf = rng.uniform(maf_low, 0.5, p)
    thr = norm.ppf(1 - maf)  # lat columns are ~N(0,1)
    x = (lat > thr[None, :]).astype(np.float64) + (
        rng.random((n, p)) < maf[None, :]
    ).astype(np.float64)

    causal = np.zeros(p, bool)
    causal[rng.choice(p, n_causal, replace=False)] = True
    beta = np.where(causal, rng.normal(0, 1, p), 0.0)
    xs = (x - x.mean(0)) / np.maximum(x.std(0), 1e-8)
    g = xs @ beta
    g_var = g.var()
    noise = rng.standard_normal(n) * np.sqrt(g_var * (1 - h2) / max(h2, 1e-9))
    y = g + noise
    y = (y - y.mean()) / y.std()

    z = (xs * y[:, None]).sum(0) / np.sqrt(n)
    return SumstatSim(genotypes=x, z=z, beta=beta, causal=causal)


def map_sumstat(
    z: np.ndarray,
    ref_genotypes: np.ndarray,
    *,
    L: int = 5,
    rank: Optional[int] = None,
    lam: float = 0.1,
    ldsc_intercept: bool = True,
    pve_adjust: bool = True,
    config: SgvbConfig | None = None,
    multilevel: bool = False,
    block_size: int | None = None,
    ld_blocks: "np.ndarray | None" = None,  # [p] block id per variant
) -> dict:
    """SuSiE-RSS fine-mapping: returns pip [p], alpha [L, p], effects.

    ``multilevel`` switches the variational family to the hierarchical
    block/within-block selection softmax over positional LD blocks
    (fit_sumstat_sgvb.rs multilevel option); ``ld_blocks`` overrides
    the contiguous auto-blocking with user block ids
    (CommonSumstatArgs ld_block_file)."""
    design = RssDesign.from_genotypes(
        ref_genotypes, z, rank=rank, lam=lam,
        ldsc_intercept=ldsc_intercept, pve_adjust=pve_adjust,
    )
    if multilevel:
        from ..models.sgvb import contiguous_ld_blocks, fit_regression, gaussian_llik

        p = z.shape[0]
        out = fit_regression(
            design.x_tilde,
            design.y_tilde,
            family="ml-susie",
            L=L,
            llik=gaussian_llik,
            config=config,
            groups=(
                np.asarray(ld_blocks, np.int32)
                if ld_blocks is not None
                else contiguous_ld_blocks(p, block_size)
            ),
        )
    else:
        out = fit_susie_rss(design, L=L, config=config)
    out["pip"] = out["pip"][:, 0]
    return out


def fit_prs(
    z: np.ndarray,
    ref_genotypes: np.ndarray,
    *,
    L: int = 10,
    score_genotypes: np.ndarray | None = None,
    config: SgvbConfig | None = None,
) -> dict:
    """Sparse polygenic-score weights via SuSiE on summary stats
    (`fagioli fit-prs-susie`): posterior-mean effects are the PRS
    weights; optionally scores a genotype panel (standardized dosages)
    with them."""
    out = map_sumstat(z, ref_genotypes, L=L, config=config)
    weights = out["theta_mean"][:, 0]
    result = {"weights": weights, "pip": out["pip"]}
    if score_genotypes is not None:
        xs = np.asarray(score_genotypes, np.float64)
        xs = (xs - xs.mean(0)) / np.maximum(xs.std(0), 1e-8)
        result["prs"] = xs @ weights
    return result


def fit_sumstat_mcmc(
    z: np.ndarray,
    ref_genotypes: np.ndarray,
    *,
    rank: Optional[int] = None,
    lam: float = 0.1,
    ldsc_intercept: bool = True,
    pve_adjust: bool = True,
    prior_sd: float = 0.3,
    num_samples: int = 1000,
    burn_in: int = 200,
    n_chains: int = 4,
    seed: int = 0,
) -> dict:
    """Posterior over effects by elliptical slice sampling on the RSS
    likelihood (`fagioli fit-sumstat-mcmc` -> mcmc-util sampler): beta
    ~ N(0, prior_sd^2 I) prior, y_tilde ~ N(X_tilde beta, I)
    likelihood. ESS needs only prior draws + log-likelihood, so a
    non-Gaussian extension drops in by swapping the prior sampler.
    Returns posterior mean/sd plus split-Rhat and ESS diagnostics."""
    import jax
    import jax.numpy as jnp

    from ..models.sgvb import RssDesign
    from ..ops.mcmc import ess as ess_diag
    from ..ops.mcmc import run_ess_chains, split_rhat

    design = RssDesign.from_genotypes(
        ref_genotypes, z, rank=rank, lam=lam,
        ldsc_intercept=ldsc_intercept, pve_adjust=pve_adjust,
    )
    x_t = jnp.asarray(design.x_tilde)  # [r, p]
    y_t = jnp.asarray(design.y_tilde[:, 0])

    def lnpdf(beta):  # [C, p] -> [C]
        resid = y_t[None, :] - beta @ x_t.T
        return -0.5 * jnp.sum(resid**2, axis=-1)

    p = z.shape[0]
    key = jax.random.key(seed)
    init = prior_sd * jax.random.normal(key, (n_chains, p))
    samples, _ = run_ess_chains(
        key, init,
        prior_draw=lambda k, s: prior_sd * jax.random.normal(k, s),
        lnpdf=lnpdf, num_samples=num_samples, burn_in=burn_in,
    )  # [num_samples, C, p]
    s = np.asarray(samples)
    flat = s.reshape(-1, p)
    rhat = np.asarray([split_rhat(s[:, :, j].T.reshape(-1)) for j in range(p)])
    ess_j = np.asarray([ess_diag(flat[:, j]) for j in range(p)])
    return {
        "beta_mean": flat.mean(0),
        "beta_sd": flat.std(0),
        "rhat": rhat,
        "ess": ess_j,
        "samples": s,
    }


def fit_sumstat_sgvb(
    z: np.ndarray,
    ref_genotypes: np.ndarray,
    *,
    model: str = "susie",
    prior_type: str = "single",
    prior_vars: Optional[Sequence[float]] = None,
    L: int = 5,
    rank: Optional[int] = None,
    lam: float = 0.1,
    ldsc_intercept: bool = True,
    pve_adjust: bool = True,
    config=None,
    block_size: Optional[int] = None,
) -> dict:
    """SGVB fine-mapping on summary stats with model-family and prior
    choice (`fagioli fit-sumstat-sgvb`; fit_sumstat_sgvb.rs):

    - model: susie / bisusie / spike-slab / ml-susie
    - prior_type "single": grid search over `prior_vars`, keep the
      max-ELBO fit (reports `prior_var`, `grid_elbos`)
    - prior_type "ash": mixture-of-Gaussians prior over the grid with
      learnable weights (spike-slab family; reports `mix_weights`)
    """
    from ..models.sgvb import (
        RssDesign,
        SgvbConfig,
        contiguous_ld_blocks,
        fit_regression_ash,
        fit_regression_grid,
        gaussian_llik,
    )

    grid = list(prior_vars) if prior_vars else [0.01, 0.1, 1.0]
    cfg = config or SgvbConfig(num_steps=1000)
    design = RssDesign.from_genotypes(
        ref_genotypes, z, rank=rank, lam=lam,
        ldsc_intercept=ldsc_intercept, pve_adjust=pve_adjust,
    )
    if prior_type == "ash":
        if model not in ("spike-slab",):
            log.info(
                "ash prior runs on the spike-slab family (requested %s)", model
            )
        out = fit_regression_ash(
            design.x_tilde, design.y_tilde, prior_vars=grid,
            llik=gaussian_llik, config=cfg,
        )
    else:
        groups = (
            contiguous_ld_blocks(z.shape[0], block_size)
            if model == "ml-susie"
            else None
        )
        out = fit_regression_grid(
            design.x_tilde, design.y_tilde, prior_vars=grid,
            family=model, L=L, llik=gaussian_llik, config=cfg, groups=groups,
        )
    pip = np.asarray(out["pip"])
    out["pip"] = pip[:, 0] if pip.ndim > 1 else pip
    return out
