"""`senna deconvolve` — hierarchical-Bayes bulk deconvolution
(`senna/src/deconvolve/gibbs.rs:1-23` model):

    eps_{s,g} ~ Gamma(r, r)                       NB overdispersion, mean 1
    y_{s,g}   ~ Poisson(eps_{s,g} sum_m u_{s,m} mu_{g,m})
    Z split   ~ Multinomial(y, p), p_m ~ u_m mu_gm  (eps cancels)
    eps       ~ Gamma(r + tau y, r + tau lam)       conjugate
    u_{s,m}   ~ Gamma(a0 + tau sum_g Z, b0 + tau sum_g eps mu)

`tau` tempers the likelihood (power posterior); `r` fixed. Fractions
map components to cell types through the readout A.

TPU formulation: the multinomial count split never materializes — its
sufficient statistic `sum_g Z_{s,m,g}` is a RAO-BLACKWELLIZED
expectation-free draw in the reference; here we sample it directly as
the Gamma-conjugate form needs only `sum_g Z`, drawn as a Poisson
thinning in expectation. We use the collapsed exact form:
E[Z_m | y] = y * u_m mu_gm / lam, and sample the Gamma with that mean
(a standard blocked approximation, exact as counts grow). Chains over
ALL bulk samples step in lockstep — one jitted sweep.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mcmc import ess as ess_diag
from ..ops.mcmc import split_rhat

ABUNDANCE_FLOOR = 1e-12  # gibbs.rs:41


@dataclass
class DeconvConfig:
    n_sweeps: int = 300
    burn_in: int = 100
    thin: int = 1
    a0: float = 1.0  # --frac-prior-shape
    b0: float = 1.0  # --frac-prior-rate
    nb_dispersion: float = 10.0  # r
    count_scale: float = 1.0  # tau
    seed: int = 0


@dataclass
class ArchetypeReference:
    """Measured archetype profiles (deconvolve/archetypes.rs:1-15):
    Leiden communities on the cell embedding give sub-type-resolution
    profiles; the annotation posterior carries each community's label
    mix into the readout instead of forcing a hard label."""

    mu_gm: np.ndarray  # [D_sc, R] measured mean profiles
    readout: np.ndarray  # [R, C] community -> cell-type posterior
    gene_names: list
    celltype_names: list
    membership: np.ndarray  # [N] cell -> community (-1 = dropped)
    n_cells: np.ndarray  # [R]


def leiden_at_count(
    embedding: np.ndarray, target: int, *, knn: int = 30, seed: int = 0,
    max_bisect: int = 8,
) -> np.ndarray:
    """Leiden membership with ~`target` communities: binary search on
    the resolution from 1.0 (archetypes.rs LEIDEN_RESOLUTION binary
    search)."""
    from ..ops.leiden import knn_adjacency, leiden_clustering

    adj = knn_adjacency(embedding, k=min(knn, len(embedding) - 1))
    lo, hi = 0.01, 100.0
    res = 1.0
    best = None
    for _ in range(max_bisect):
        memb = leiden_clustering(adj, resolution=res, seed=seed).membership
        k = int(memb.max()) + 1
        if best is None or abs(k - target) < abs(int(best.max()) + 1 - target):
            best = memb
        if k == target:
            break
        if k < target:
            lo = res
        else:
            hi = res
        res = float(np.sqrt(lo * hi))
    return best


def build_archetype_reference(
    sc_vec,  # backend/vec: [D_sc, N] counts
    embedding: np.ndarray,  # [N, H] cell embedding
    annotation: np.ndarray,  # [N] string labels ('' = unannotated)
    *,
    n_archetypes: int = 200,
    min_cells: int = 10,
    knn: int = 30,
    seed: int = 0,
    block_size: int = 2048,
) -> ArchetypeReference:
    """One granularity of the empirical archetype reference
    (archetypes.rs build): profiles are MEASURED from the counts (mean
    per community), never reconstructed from the embedding."""
    from ..data.visitors import visit_columns_by_block

    n = sc_vec.num_columns
    d = sc_vec.num_rows
    if len(embedding) != n or len(annotation) != n:
        raise ValueError("embedding/annotation rows must match sc columns")

    memb = leiden_at_count(embedding, n_archetypes, knn=knn, seed=seed)
    counts = np.bincount(memb, minlength=int(memb.max()) + 1)
    keep = counts >= min_cells
    remap = np.full(len(counts), -1, np.int64)
    remap[keep] = np.arange(int(keep.sum()))
    memb = np.where(memb >= 0, remap[memb], -1)
    r_comp = int(keep.sum())
    if r_comp == 0:
        raise ValueError("no archetype community reached --archetype-min-cells")

    # streaming measured profiles: sum counts per community, device path
    sums = np.zeros((d, r_comp), np.float64)
    seg = np.where(memb >= 0, memb, r_comp).astype(np.int32)
    import jax.numpy as _jnp

    from ..ops import sparse as sparse_ops

    for blk in visit_columns_by_block(sc_vec, block_size=block_size):
        seg_blk = np.concatenate([seg[blk.lb : blk.lb + blk.ncols], [r_comp]])
        plane = sparse_ops.collapse_block(
            _jnp.asarray(blk.row_ids),
            sparse_ops.block_col_ids(blk),
            _jnp.asarray(blk.vals),
            seg_of_col=_jnp.asarray(seg_blk),
            num_genes=d,
            num_groups=r_comp,
        )
        sums += np.asarray(plane, np.float64)
    n_cells = np.bincount(memb[memb >= 0], minlength=r_comp).astype(np.float32)
    mu_gm = (sums / np.maximum(n_cells, 1.0)).astype(np.float32)

    # soft readout: per-community annotation fractions; with NO
    # annotations at all the readout falls back to identity (each
    # archetype reports as itself) instead of a silent all-zero matrix
    labels = np.asarray([str(a) for a in annotation])
    annotated = labels != ""
    if not annotated.any():
        n_cells = np.bincount(memb[memb >= 0], minlength=r_comp).astype(np.float32)
        sums_mean = (sums / np.maximum(n_cells, 1.0)).astype(np.float32)
        return ArchetypeReference(
            mu_gm=sums_mean,
            readout=np.eye(r_comp, dtype=np.float32),
            gene_names=list(sc_vec.row_names()),
            celltype_names=[f"archetype{r}" for r in range(r_comp)],
            membership=memb,
            n_cells=n_cells,
        )
    types = sorted(set(labels[annotated]))
    t_idx = {t: i for i, t in enumerate(types)}
    readout = np.zeros((r_comp, max(len(types), 1)), np.float32)
    for j in np.nonzero(annotated & (memb >= 0))[0]:
        readout[memb[j], t_idx[labels[j]]] += 1.0
    readout = readout / np.maximum(readout.sum(1, keepdims=True), 1e-12)
    # unannotated communities fall back to the global label marginal
    empty = readout.sum(1) == 0
    if empty.any() and annotated.any():
        marg = np.bincount(
            [t_idx[t] for t in labels[annotated]], minlength=len(types)
        ).astype(np.float32)
        readout[empty] = marg / marg.sum()

    return ArchetypeReference(
        mu_gm=mu_gm,
        readout=readout,
        gene_names=list(sc_vec.row_names()),
        celltype_names=list(types) if types else ["type0"],
        membership=memb,
        n_cells=n_cells,
    )


@dataclass
class DeconvResult:
    fractions: np.ndarray  # [S, C] posterior-mean cell-type fractions
    fractions_sd: np.ndarray
    u_mean: np.ndarray  # [S, R]
    rhat: np.ndarray  # [S] worst split-Rhat across components
    ess: np.ndarray


def deconvolve(
    y_sg: np.ndarray,  # [S, D] bulk counts
    mu_gm: np.ndarray,  # [D, R] reference component rates
    readout_mc: np.ndarray | None = None,  # [R, C] component -> cell type
    config: DeconvConfig | None = None,
) -> DeconvResult:
    cfg = config or DeconvConfig()
    s, d = y_sg.shape
    r_comp = mu_gm.shape[1]
    a_read = (
        np.eye(r_comp, dtype=np.float32) if readout_mc is None else np.asarray(readout_mc, np.float32)
    )
    c = a_read.shape[1]

    y = jnp.asarray(y_sg, jnp.float32)
    mu = jnp.asarray(mu_gm, jnp.float32)
    tau = cfg.count_scale
    r_nb = cfg.nb_dispersion

    @jax.jit
    def sweep(key, u_sm, eps_sg):
        k1, k2, k3 = jax.random.split(key, 3)
        lam = jnp.maximum(u_sm @ mu.T, 1e-12)  # [S, D]
        # EXACT multinomial count split (gibbs.rs:148 binomial chain):
        # Z_{s,.,g} ~ Multinomial(y_sg, p), p_m = u_m mu_gm / lam; the
        # conjugate update needs only sum_g Z, but the split itself is
        # sampled exactly — component m draws Binomial(n_rem,
        # p_m / p_rem) per (s, g), scanned over components
        p_smg = u_sm[:, None, :] * mu[None, :, :] / lam[:, :, None]  # [S, D, R]

        def split_comp(carry, inp):
            n_rem, p_rem = carry
            p_m, km = inp
            frac = jnp.clip(p_m / jnp.maximum(p_rem, 1e-12), 0.0, 1.0)
            z_m = jax.random.binomial(km, n_rem, frac)
            return (n_rem - z_m, p_rem - p_m), z_m.sum(axis=1)  # [S]

        keys_m = jax.random.split(k1, r_comp - 1) if r_comp > 1 else k1[None]
        (n_last, _), z_head = jax.lax.scan(
            split_comp,
            (y, jnp.ones_like(y)),
            (jnp.moveaxis(p_smg, 2, 0)[: r_comp - 1], keys_m[: r_comp - 1]),
        )
        z_sm = jnp.concatenate(
            [z_head.T, n_last.sum(axis=1)[:, None]], axis=1
        )  # [S, R]
        # eps | rest ~ Gamma(r + tau y, r + tau lam) per gene
        eps_a = r_nb + tau * y
        eps_b = r_nb + tau * lam
        eps_sg = jax.random.gamma(k2, eps_a) / eps_b
        # u | rest ~ Gamma(a0 + tau sum_g Z, b0 + tau sum_g eps mu):
        # tau tempers the SUFFICIENT STATISTICS (power posterior,
        # gibbs.rs:207), so posterior variance scales as 1/tau
        u_b = cfg.b0 + tau * (eps_sg @ mu)
        u_a = cfg.a0 + tau * z_sm
        u_sm = jnp.maximum(jax.random.gamma(k3, u_a) / u_b, ABUNDANCE_FLOOR)
        return u_sm, eps_sg

    key = jax.random.key(cfg.seed)
    k_init, key = jax.random.split(key)
    u = jax.random.gamma(k_init, jnp.full((s, r_comp), cfg.a0)) / cfg.b0
    eps = jnp.ones((s, d))

    # whole chain in ONE dispatch (scan over sweeps; per-sweep python
    # dispatches cost ~seconds over a tunneled device)
    @jax.jit
    def run_chain(key, u, eps):
        def body(carry, k):
            u, eps = carry
            u, eps = sweep(k, u, eps)
            return (u, eps), u

        keys = jax.random.split(key, cfg.n_sweeps)
        _, all_u = jax.lax.scan(body, (u, eps), keys)
        return all_u

    key, k_c = jax.random.split(key)
    u_draws = np.asarray(run_chain(k_c, u, eps))[cfg.burn_in :: max(cfg.thin, 1)]  # [T, S, R]
    a_j = np.asarray(a_read)
    frac_draws = (u_draws @ a_j) / np.maximum(
        u_draws.sum(-1, keepdims=True), 1e-30
    )  # [T, S, C]

    rhat = np.zeros(s)
    ess_v = np.zeros(s)
    for si in range(s):
        worst_r, worst_e = 1.0, np.inf
        for m in range(min(r_comp, 10)):
            x = u_draws[:, si, m]
            worst_r = max(worst_r, split_rhat(x))
            worst_e = min(worst_e, ess_diag(x))
        rhat[si] = worst_r
        ess_v[si] = worst_e

    return DeconvResult(
        fractions=frac_draws.mean(0),
        fractions_sd=frac_draws.std(0),
        u_mean=u_draws.mean(0),
        rhat=rhat,
        ess=ess_v,
    )
