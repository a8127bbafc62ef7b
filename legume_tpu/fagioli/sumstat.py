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
from typing import Optional

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
    config: SgvbConfig | None = None,
    multilevel: bool = False,
    block_size: int | None = None,
) -> dict:
    """SuSiE-RSS fine-mapping: returns pip [p], alpha [L, p], effects.

    ``multilevel`` switches the variational family to the hierarchical
    block/within-block selection softmax over positional LD blocks
    (fit_sumstat_sgvb.rs multilevel option)."""
    design = RssDesign.from_genotypes(ref_genotypes, z, rank=rank, lam=lam)
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
            groups=contiguous_ld_blocks(p, block_size),
        )
    else:
        out = fit_susie_rss(design, L=L, config=config)
    out["pip"] = out["pip"][:, 0]
    return out
