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


def pseudobulk_celltype_log_rates(
    counts_gn: np.ndarray,
    cell_indv: np.ndarray,
    n_indv: int,
    membership_nc: np.ndarray,  # [N, C] soft cell-type membership
    *,
    a0: float = 1.0,
    b0: float = 1.0,
):
    """Per-(celltype, gene, individual) Gamma posterior log-rates with
    membership-weighted sufficient statistics (fit_qtl_sgvb.rs
    collapse_pseudobulk with soft Membership): returns
    (log_mean [C, G, I], precision weights [C, G, I],
    effective cell weight [C, I])."""
    import jax.numpy as jnp

    g, n = counts_gn.shape
    c = membership_nc.shape[1]
    sums = np.zeros((c, g, n_indv))
    sizes = np.zeros((c, n_indv))
    for ci in range(c):
        w = membership_nc[:, ci]
        np.add.at(sums[ci].T, cell_indv, (counts_gn * w[None, :]).T)
        np.add.at(sizes[ci], cell_indv, w)
    gp = GammaParam(
        a=jnp.asarray(a0 + sums), b=jnp.asarray(b0 + sizes[:, None, :])
    )
    log_mean = np.asarray(gp.log_mean())
    log_sd = np.asarray(gp.log_sd())
    prec = 1.0 / np.maximum(log_sd, 1e-3) ** 2
    return log_mean, prec, sizes


def fit_qtl_sgvb(
    counts_gn: np.ndarray,
    cell_indv: np.ndarray,
    genotypes: np.ndarray,  # [I, P]
    *,
    membership_nc: np.ndarray | None = None,  # [N, C]; None = one bulk type
    celltype_names: list | None = None,
    model: str = "susie",
    prior_type: str = "single",
    prior_vars=None,
    L: int = 3,
    num_steps: int = 800,
    min_weight: float = 2.0,
    gene_tss: np.ndarray | None = None,  # [G] bp (cis mode)
    var_pos: np.ndarray | None = None,  # [P] bp (cis mode)
    cis_window: int = 1_000_000,
    a0: float = 1.0,
    b0: float = 1.0,
    learning_rate: float = 0.02,
    mc_samples: int = 8,
    # per-individual covariates [I, K], residualized out of the
    # pseudobulk log-rates before the fit (fit_qtl_sgvb.rs covariates)
    covariates_i: np.ndarray | None = None,
    # append the per-individual cell-type composition fractions to the
    # covariates (fit_qtl_sgvb.rs composition_covariates)
    composition_covariates: bool = False,
    # cross-gene empirical Bayes on the prior-variance grid
    # (fit_qtl_sgvb.rs empirical_bayes): pool every gene's grid ELBOs,
    # pick ONE variance, report each gene's fit at it — a gene no
    # longer wins a huge prior just because its own noisy ELBO did
    empirical_bayes: bool = False,
    seed: int = 0,
) -> dict:
    """Per-(celltype, gene) SGVB eQTL fine-mapping on membership-weighted
    pseudobulk (fit_qtl_sgvb.rs): model family + prior grid/ash, with
    optional cis-window variant subsetting and a min effective-cell
    filter on (indv, celltype) pairs."""
    from ..models.sgvb import (
        SgvbConfig,
        fit_regression,
        fit_regression_ash,
        fit_regression_grid,
        weighted_gaussian_llik,
    )

    n_indv = genotypes.shape[0]
    if membership_nc is None:
        membership_nc = np.ones((counts_gn.shape[1], 1), np.float32)
    c = membership_nc.shape[1]
    names = celltype_names or [f"ct{j}" for j in range(c)]
    grid = list(prior_vars) if prior_vars else [0.01, 0.1, 1.0]
    log_mu, prec, eff = pseudobulk_celltype_log_rates(
        counts_gn, cell_indv, n_indv, membership_nc, a0=a0, b0=b0
    )
    gs = (genotypes - np.nanmean(genotypes, 0)) / np.maximum(
        np.nanstd(genotypes, 0), 1e-8
    )
    gs = np.nan_to_num(gs)

    # covariate design: user tables + optional composition fractions,
    # residualized out of y per individual subset below
    cov = None
    if covariates_i is not None:
        cov = np.asarray(covariates_i, np.float64)
    if composition_covariates and c > 1:
        frac = eff.T / np.maximum(eff.sum(0)[:, None], 1e-9)  # [I, C]
        cov = frac if cov is None else np.concatenate([cov, frac], 1)

    def residualize(y, keep_i):
        if cov is None:
            return y
        z = cov[keep_i]
        z = np.concatenate([np.ones((len(z), 1)), z], 1)
        beta, *_ = np.linalg.lstsq(z, y, rcond=None)
        return y - z @ beta

    rows = {"celltype": [], "gene": [], "variant": [], "pip": [],
            "effect": [], "prior_var": []}
    g = counts_gn.shape[0]
    eb_stash = []  # (meta, per-variance fits) for the EB second pass
    for ci in range(c):
        keep_i = np.flatnonzero(eff[ci] >= min_weight)
        if keep_i.size < 3:
            log.info("fit-qtl-sgvb: %s has <3 usable individuals; skipped", names[ci])
            continue
        for gi in range(g):
            cols = (
                np.flatnonzero(np.abs(var_pos - gene_tss[gi]) <= cis_window)
                if gene_tss is not None and var_pos is not None
                else np.arange(gs.shape[1])
            )
            if cols.size == 0:
                continue
            x = gs[np.ix_(keep_i, cols)]
            y = log_mu[ci, gi, keep_i]
            y = residualize((y - y.mean())[:, None], keep_i)
            w = prec[ci, gi, keep_i][:, None]
            w = w / max(w.mean(), 1e-9)
            cfg = SgvbConfig(
                num_steps=num_steps, learning_rate=learning_rate,
                num_samples=mc_samples, seed=seed,
            )
            llik = lambda yy, ee, w=w: weighted_gaussian_llik(yy, ee, w)
            if prior_type == "ash":
                out = fit_regression_ash(
                    x, y, prior_vars=grid, llik=llik, config=cfg
                )
                out["prior_var"] = float("nan")
            elif empirical_bayes:
                import dataclasses as _dc

                fits = [
                    fit_regression(
                        x, y, family=model, L=L, llik=llik,
                        config=_dc.replace(cfg, prior_var=float(v)),
                    )
                    for v in grid
                ]
                eb_stash.append((names[ci], gi, cols, fits))
                continue
            else:
                out = fit_regression_grid(
                    x, y, prior_vars=grid, family=model, L=L,
                    llik=llik, config=cfg,
                )
            _emit(rows, names[ci], gi, cols, out)
    if eb_stash:
        pooled = np.zeros(len(grid))
        for _, _, _, fits in eb_stash:
            pooled += np.asarray([f["elbo"] for f in fits])
        v_star = int(np.argmax(pooled))
        log.info(
            "empirical Bayes: pooled grid ELBOs over %d fits pick "
            "prior_var=%g", len(eb_stash), grid[v_star],
        )
        for ct, gi, cols, fits in eb_stash:
            out = dict(fits[v_star])
            out["prior_var"] = float(grid[v_star])
            _emit(rows, ct, gi, cols, out)
    return rows


def _emit(rows, ct, gi, cols, out):
    pip = np.asarray(out["pip"]).reshape(-1)
    rows["celltype"].extend([ct] * len(cols))
    rows["gene"].extend([gi] * len(cols))
    rows["variant"].extend(np.asarray(cols).tolist())
    rows["pip"].extend(pip.tolist())
    rows["effect"].extend(np.asarray(out["theta_mean"])[:, 0].tolist())
    rows["prior_var"].extend(
        [float(out.get("prior_var", float("nan")))] * len(cols)
    )


def simulate_qtl_full(
    genotypes: np.ndarray,  # [I, P] dosages (PLINK panel or synthetic)
    var_pos: "np.ndarray | None" = None,
    *,
    n_genes: int = 50,
    gene_tss: "np.ndarray | None" = None,  # [G] bp (cis mode)
    n_cell_types: int = 5,
    n_factors: int = 5,
    gene_loading_std: float = 0.5,
    factor_score_std: float = 0.5,
    eqtl_gene_proportion: float = 0.5,
    shared_eqtl_proportion: float = 0.5,
    independent_eqtl_proportion: float = 0.5,
    n_shared_causal: int = 1,
    n_independent_causal: int = 1,
    genetic_variance: float = 0.3,
    cis_window: int = 1_000_000,
    pve_cell_type: float = 0.3,
    mean_cells_per_individual: float = 50.0,
    depth_per_cell: float = 2000.0,
    dirichlet_alpha: "list | None" = None,
    seed: int = 42,
) -> dict:
    """Reference-style single-cell eQTL generator (`sim_qtl.rs`):

      log-rate[g, cell] = mu_g + sqrt(pve_ct) * ct_effect[g, ct(cell)]
                        + factor model (loadings @ scores[indv])
                        + genetic term (shared + cell-type-specific
                          causal variants, scaled to `genetic_variance`
                          of the per-gene variance)
      counts ~ Multinomial(depth_per_cell, softmax over genes) per cell
      cells per individual ~ Poisson(mean_cells_per_individual),
      cell types ~ Dirichlet(alpha)-weighted categorical per individual.

    Returns counts [G, N], cell_indv, cell_type, truth tables."""
    rng = np.random.default_rng(seed)
    n_indv, p = genotypes.shape
    gs = np.nan_to_num(
        (genotypes - np.nanmean(genotypes, 0))
        / np.maximum(np.nanstd(genotypes, 0), 1e-8)
    )

    # cells per individual + cell types
    n_cells_i = rng.poisson(mean_cells_per_individual, n_indv).clip(min=1)
    cell_indv = np.repeat(np.arange(n_indv), n_cells_i)
    n = len(cell_indv)
    alpha = (
        np.asarray(dirichlet_alpha, np.float64)
        if dirichlet_alpha else np.ones(n_cell_types)
    )
    frac_i = rng.dirichlet(alpha, n_indv)  # [I, C]
    cell_type = np.concatenate([
        rng.choice(n_cell_types, k, p=frac_i[i])
        for i, k in enumerate(n_cells_i)
    ])

    # eQTL architecture: shared + cell-type-specific causal variants
    is_egene = rng.uniform(size=n_genes) < eqtl_gene_proportion
    truth = []
    genetic_i = np.zeros((n_genes, n_cell_types, n_indv))
    for gi in range(n_genes):
        if not is_egene[gi]:
            continue
        if gene_tss is not None and var_pos is not None:
            cand = np.flatnonzero(
                np.abs(var_pos - gene_tss[gi]) <= cis_window
            )
        else:
            cand = np.arange(p)
        if cand.size == 0:
            continue
        if rng.uniform() < shared_eqtl_proportion:
            for v in rng.choice(cand, min(n_shared_causal, cand.size),
                                replace=False):
                b = rng.normal()
                genetic_i[gi, :, :] += b * gs[:, v][None, :]
                truth.append((gi, -1, int(v), float(b), "shared"))
        if rng.uniform() < independent_eqtl_proportion:
            for v in rng.choice(cand,
                                min(n_independent_causal, cand.size),
                                replace=False):
                ct = int(rng.integers(n_cell_types))
                b = rng.normal()
                genetic_i[gi, ct, :] += b * gs[:, v]
                truth.append((gi, ct, int(v), float(b), "independent"))

    # factor model for gene-gene correlation across individuals
    loadings = rng.normal(0, gene_loading_std, (n_genes, n_factors))
    scores = rng.normal(0, factor_score_std, (n_factors, n_indv))
    indiv_term = loadings @ scores  # [G, I]
    ct_effect = rng.normal(0, 1.0, (n_genes, n_cell_types))
    mu_g = rng.normal(0, 0.5, n_genes)

    non_gen = (
        np.sqrt(pve_cell_type) * ct_effect[:, cell_type]
        + np.sqrt(1 - pve_cell_type) * indiv_term[:, cell_indv]
    )  # [G, N]
    gen_cells = genetic_i[:, cell_type, cell_indv]  # [G, N]
    # per-gene heritability: scale the genetic term so it explains
    # `genetic_variance` of each eQTL gene's log-rate variance
    # (sim_qtl.rs genetic_variance)
    gvar = gen_cells.var(1)
    rvar = non_gen.var(1)
    scale = np.where(
        gvar > 1e-12,
        np.sqrt(genetic_variance / max(1 - genetic_variance, 1e-6)
                * np.maximum(rvar, 1e-12) / np.maximum(gvar, 1e-12)),
        0.0,
    )
    log_rate = mu_g[:, None] + non_gen + scale[:, None] * gen_cells
    # per-cell multinomial at the given depth over the gene softmax
    prob = np.exp(log_rate - log_rate.max(0, keepdims=True))
    prob /= prob.sum(0, keepdims=True)
    counts = np.stack([
        rng.multinomial(int(rng.poisson(depth_per_cell)), prob[:, j])
        for j in range(n)
    ], axis=1).astype(np.float32)
    return {
        "counts": counts, "cell_indv": cell_indv,
        "cell_type": cell_type,
        "truth": truth, "frac_i": frac_i,
    }
