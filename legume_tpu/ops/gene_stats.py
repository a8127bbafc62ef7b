"""Per-gene streaming statistics: HVG selection and NB-Fisher weights
(data-beans-alg `hvg.rs` + `nb_dispersion.rs` + `gene_weighting.rs`
equivalent).

The streaming pass computes per-gene (mean, variance, marginal
probability) of raw counts from COO blocks via device segment sums
(`legume_tpu.ops.sparse.block_row_stats`); the dispersion trend and the
ranking are tiny host math.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..data.visitors import visit_columns_by_block
from . import sparse as sparse_ops

MIN_MEAN_FOR_FIT = 1e-4  # nb_dispersion.rs:32
PHI_FLOOR = 0.0  # :36
PHI_CEIL = 100.0  # :41


@dataclass
class DispersionTrend:
    """Weighted log-log fit of NB dispersion vs mean
    (nb_dispersion.rs:55-141): phi_hat = (var - mu) / mu^2, regress
    log(phi_hat) on log(mu) with weights mu."""

    a: float
    b: float
    num_fit: int

    @classmethod
    def fit(cls, means: np.ndarray, vars_: np.ndarray) -> "DispersionTrend":
        means = np.asarray(means, np.float64)
        vars_ = np.asarray(vars_, np.float64)
        phi_hat = (vars_ - means) / np.maximum(means * means, 1e-30)
        ok = (
            np.isfinite(means)
            & np.isfinite(vars_)
            & (means >= MIN_MEAN_FOR_FIT)
            & (phi_hat > 0)
        )
        if ok.sum() < 2:
            return cls(a=-np.inf, b=0.0, num_fit=int(ok.sum()))
        x = np.log(means[ok])
        y = np.log(phi_hat[ok])
        w = means[ok]
        wsum = w.sum()
        xm = (x * w).sum() / wsum
        ym = (y * w).sum() / wsum
        sxx = (w * (x - xm) ** 2).sum()
        sxy = (w * (x - xm) * (y - ym)).sum()
        if sxx <= 0:
            return cls(a=-np.inf, b=0.0, num_fit=int(ok.sum()))
        b = sxy / sxx
        a = ym - b * xm
        return cls(a=float(a), b=float(b), num_fit=int(ok.sum()))

    def phi_at(self, mu: np.ndarray) -> np.ndarray:
        mu = np.asarray(mu, np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            phi = np.exp(self.a + self.b * np.log(np.maximum(mu, 1e-30)))
        return np.clip(np.nan_to_num(phi, nan=0.0, posinf=PHI_CEIL), PHI_FLOOR, PHI_CEIL)

    def excess(self, mu: np.ndarray, var: np.ndarray) -> np.ndarray:
        """Excess dispersion above the trend (nb_dispersion.rs:135-141)."""
        mu = np.asarray(mu, np.float64)
        var = np.asarray(var, np.float64)
        phi_hat = (var - mu) / np.maximum(mu * mu, 1e-30)
        out = phi_hat - self.phi_at(mu)
        bad = ~np.isfinite(mu) | (mu <= 0) | ~np.isfinite(var)
        out[bad] = -np.inf
        return out

    def fisher_weights(self, pi: np.ndarray, means: np.ndarray, avg_s: float) -> np.ndarray:
        """DC-Poisson gene weight `1 / (1 + pi * s * phi(mu))`, in (0, 1]
        (nb_dispersion.rs:143-159)."""
        return 1.0 / (1.0 + np.asarray(pi) * avg_s * self.phi_at(means))


@dataclass
class GeneStreamStats:
    mean: np.ndarray  # [D]
    var: np.ndarray  # [D]
    pi: np.ndarray  # [D] marginal nonzero probability
    n_cells: int


def streaming_gene_stats(data, *, block_size: int = 8192) -> GeneStreamStats:
    """One pass over column blocks -> per-gene raw-count moments
    (`select_hvg_streaming`, hvg.rs; accumulation on device)."""
    d = data.num_rows
    s1 = jnp.zeros(d, jnp.float32)
    s2 = jnp.zeros(d, jnp.float32)
    cnt = jnp.zeros(d, jnp.float32)
    n = 0
    for blk in visit_columns_by_block(data, block_size=block_size):
        b1, b2, bc = sparse_ops.block_row_stats(
            jnp.asarray(blk.row_ids), jnp.asarray(blk.vals), num_genes=d
        )
        s1, s2, cnt = s1 + b1, s2 + b2, cnt + bc
        n += blk.ncols
    mean = np.asarray(s1) / max(n, 1)
    var = np.asarray(s2) / max(n, 1) - mean * mean
    pi = np.asarray(cnt) / max(n, 1)
    return GeneStreamStats(mean=mean, var=np.maximum(var, 0.0), pi=pi, n_cells=n)


def reduce_gene_stats(local: "GeneStreamStats", reduce_sums) -> "GeneStreamStats":
    """Merge per-shard gene moments across hosts: rebuild the raw sums
    (s1 = mean*n, s2 = (var+mean^2)*n, cnt = pi*n), sum them with the
    caller's collective (`DistContext.reduce_sums`), and re-derive the
    global moments — exact, not an average of averages."""
    n = max(local.n_cells, 1)
    s1 = local.mean * n
    s2 = (local.var + local.mean * local.mean) * n
    cnt = local.pi * n
    s1, s2, cnt, ntot = reduce_sums(
        s1, s2, cnt, np.asarray([float(local.n_cells)], np.float64)
    )
    n_glob = max(float(ntot[0]), 1.0)
    mean = s1 / n_glob
    var = np.maximum(s2 / n_glob - mean * mean, 0.0)
    return GeneStreamStats(
        mean=mean, var=var, pi=cnt / n_glob, n_cells=int(round(float(ntot[0])))
    )


def select_hvg_by_stats(means, vars_, n_genes: int) -> np.ndarray:
    """Top-N indices by excess dispersion, ascending order
    (hvg.rs:80-101)."""
    d = len(means)
    if n_genes >= d or n_genes == 0:
        return np.arange(d)
    trend = DispersionTrend.fit(means, vars_)
    score = trend.excess(means, vars_)
    top = np.argpartition(-score, n_genes)[:n_genes]
    return np.sort(top)


def select_hvg_streaming(data, n_genes: int, *, block_size: int = 8192) -> np.ndarray:
    stats = streaming_gene_stats(data, block_size=block_size)
    return select_hvg_by_stats(stats.mean, stats.var, n_genes)


def hvg_row_weights(
    data, n_genes: int, *, block_size: int = 8192,
    stats: GeneStreamStats | None = None,
) -> np.ndarray:
    """0/1 row weights gating the projection basis (senna semantics:
    HVG only weights the sketch, every gene still trains; hvg.rs long_help).
    `stats` injects precomputed (possibly cross-host-reduced) moments."""
    d = data.num_rows
    if n_genes == 0 or n_genes >= d:
        return np.ones(d, np.float32)
    w = np.zeros(d, np.float32)
    if stats is None:
        stats = streaming_gene_stats(data, block_size=block_size)
    w[select_hvg_by_stats(stats.mean, stats.var, n_genes)] = 1.0
    return w


def nb_fisher_weights(
    data, *, block_size: int = 8192, stats: GeneStreamStats | None = None
) -> np.ndarray:
    """Per-gene NB-Fisher loss weights from the streaming moments
    (`gene_weighting.rs` / `compute_nb_fisher_weights`, cmd.rs:440-463)."""
    if stats is None:
        stats = streaming_gene_stats(data, block_size=block_size)
    trend = DispersionTrend.fit(stats.mean, stats.var)
    avg_s = float(stats.mean.sum())  # mean library size proxy per cell
    return trend.fisher_weights(stats.pi, stats.mean, max(avg_s, 1.0)).astype(np.float32)


def hvg_feature_qc(
    counts_rows: np.ndarray,  # [R, D] count rows (cells or pseudobulks)
    *,
    min_excess: float = 0.0,
    min_nnz: float = 0.0,
) -> np.ndarray:
    """Model-independent feature QC for the NCE engine
    (`graph-embedding-util/src/feature_qc.rs` contract): keep genes whose
    NB dispersion exceeds the fitted mean-dispersion trend by more than
    `min_excess` (the standard HVG cut), with an expression floor dropping
    genes detected in fewer than `min_nnz` rows.  A majority guard keeps
    every gene when a degenerate fit would drop most of them — safe under
    logistic NCE (no softmax partition to collapse), catastrophic to apply
    blindly."""
    x = np.asarray(counts_rows, np.float64)
    mu = x.mean(axis=0)
    var = x.var(axis=0)
    nnz = (x > 0).sum(axis=0)
    trend = DispersionTrend.fit(mu, var)
    keep = trend.excess(mu, var) > min_excess
    if min_nnz > 0:
        keep &= nnz >= min_nnz
    if keep.sum() < 0.05 * keep.size:  # guard: would drop >=95% (feature_qc.rs:65)
        return np.ones(keep.size, bool)
    return keep
