"""Genotype-panel and mediation simulators
(`fagioli sim-geno` / `fagioli sim-mediation`;
`fagioli/src/main.rs:66-85`, `fagioli/tests/sim_mediation_roundtrip.rs`).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class GenoSim:
    genotypes: np.ndarray  # [n, p] 0/1/2 dosages
    maf: np.ndarray
    block: np.ndarray  # [p] LD-block id per variant


def simulate_genotypes(
    n: int = 500,
    p: int = 200,
    block_size: int = 25,
    ld_decay: float = 0.1,
    maf_low: float = 0.05,
    seed: int = 0,
) -> GenoSim:
    """LD-blocked dosage panel: AR(1)-correlated latents WITHIN each
    block, independent across blocks (the reference's LD-block GWAS
    panel shape)."""
    rng = np.random.default_rng(seed)
    rho = np.exp(-ld_decay)
    lat = np.empty((n, p))
    block = np.arange(p) // block_size
    eps = rng.standard_normal((n, p))
    for j in range(p):
        if j % block_size == 0:
            lat[:, j] = eps[:, j]
        else:
            lat[:, j] = rho * lat[:, j - 1] + np.sqrt(1 - rho * rho) * eps[:, j]
    maf = rng.uniform(maf_low, 0.5, p)
    from scipy.stats import norm

    thr = norm.ppf(1 - maf)
    geno = (lat > thr[None, :]).astype(np.float64) + (
        rng.standard_normal((n, p)) + lat > thr[None, :]
    ).astype(np.float64)
    return GenoSim(genotypes=geno, maf=maf, block=block)


@dataclass
class MediationSim:
    genotypes: np.ndarray  # [n, p]
    mediators: np.ndarray  # [n, m]
    outcome: np.ndarray  # [n]
    z_med: np.ndarray  # [p, m] variant -> mediator marginal z
    z_out: np.ndarray  # [p] variant -> outcome marginal z
    alpha: np.ndarray  # [p, m] true variant->mediator effects
    beta_med: np.ndarray  # [m] true mediator->outcome effects
    theta_direct: np.ndarray  # [p] true direct variant->outcome effects


def simulate_mediation(
    n: int = 800,
    p: int = 100,
    n_mediators: int = 5,
    n_causal_med: int = 2,
    pve_mediated: float = 0.2,
    pve_direct: float = 0.05,
    seed: int = 0,
) -> MediationSim:
    """X -> M -> Y with a small direct X -> Y path; marginal summary
    statistics for both stages (the mediation-roundtrip fixture,
    `fagioli/tests/sim_mediation_roundtrip.rs`)."""
    rng = np.random.default_rng(seed)
    gs = simulate_genotypes(n=n, p=p, seed=seed)
    x = (gs.genotypes - gs.genotypes.mean(0)) / np.maximum(gs.genotypes.std(0), 1e-8)

    m = n_mediators
    alpha = np.zeros((p, m))
    for j in range(m):
        idx = rng.choice(p, 3, replace=False)
        alpha[idx, j] = rng.normal(0, 0.5, 3)
    med = x @ alpha + rng.standard_normal((n, m))

    beta_med = np.zeros(m)
    causal_m = rng.choice(m, n_causal_med, replace=False)
    beta_med[causal_m] = rng.normal(0, 1.0, n_causal_med)
    g_med = med @ beta_med
    if g_med.var() > 0:
        s_med = np.sqrt(pve_mediated / g_med.var())
        beta_med *= s_med
        g_med *= s_med

    theta_direct = np.zeros(p)
    idx_d = rng.choice(p, 2, replace=False)
    theta_direct[idx_d] = rng.normal(0, 1.0, 2)
    g_dir = x @ theta_direct
    if g_dir.var() > 0:
        s_dir = np.sqrt(pve_direct / g_dir.var())
        theta_direct *= s_dir
        g_dir *= s_dir

    y = g_med + g_dir + rng.standard_normal(n) * np.sqrt(
        max(1.0 - pve_mediated - pve_direct, 0.05)
    )

    med_s = (med - med.mean(0)) / np.maximum(med.std(0), 1e-8)
    y_s = (y - y.mean()) / max(y.std(), 1e-8)
    z_med = x.T @ med_s / np.sqrt(n)
    z_out = x.T @ y_s / np.sqrt(n)
    return MediationSim(
        genotypes=gs.genotypes,
        mediators=med,
        outcome=y,
        z_med=z_med * np.sqrt(n),
        z_out=z_out * np.sqrt(n),
        alpha=alpha,
        beta_med=beta_med,
        theta_direct=theta_direct,
    )
