"""Topic-weighted counterfactual matched-stat collection
(`cocoa/src/collapse_cocoa_data.rs` equivalent).

For each cell j (individual i(j), exposure x_i, pseudobulk sample p(j))
and topic k with z_jk >= 1e-8:

    weights over matched set M_j (kNN cells from opposite-exposure
    individuals):  w_a = exp(-dist_a) * z_matched[a, k], normalized
    y0[g,k,p] += z_jk * sum_a w_a y[g, a] / sum_a w_a
    y1[g,k,p] += z_jk * y[g, j];   y1_di[g,k,i] += z_jk * y[g, j]
    size[k,p] += z_jk;             size_ip[k,i,p] += z_jk

(collapse_cocoa_data.rs:86-215). Matching is exact on-device top-k per
individual (`knn_batches = n_indv` in the reference means k matches
from EVERY other individual, collapse_cocoa_data.rs:110-133); the
match cache (indices/distances per cell) is retained so permutation
replays only re-filter by exposure (MatchCache::replay_with_exposure,
collapse_cocoa_data.rs:241-315) — no re-matching.

Device shapes: the y0 accumulation is a [nnz]-gather of per-(pair,
topic) coefficients + gene segment-sum; y1 terms are [nnz] x [K]
contributions segmented by gene — all VPU/segment work with one
coefficient matmul per block.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.visitors import csc_to_coo_block
from ..ops import sparse as sparse_ops
from .stat import CocoaStat


@dataclass
class MatchCache:
    """Per-cell kNN matches from every other individual
    (collapse_cocoa_data.rs:222-244)."""

    idx: np.ndarray  # [N, M] global matched cell ids
    dist: np.ndarray  # [N, M] L2 distances
    valid: np.ndarray  # [N, M]
    matched_indv: np.ndarray  # [N, M] individual of each matched cell


def build_match_cache(
    proj_nk: np.ndarray,
    cell_indv: np.ndarray,
    n_indv: int,
    knn: int,
    *,
    chunk: int = 4096,
) -> MatchCache:
    """kNN per OTHER individual for every cell (exposure-agnostic)."""
    from ..ops.knn import knn_search

    n = proj_nk.shape[0]
    m = max(n_indv - 1, 1) * knn
    idx = np.zeros((n, m), np.int32)
    dist = np.full((n, m), np.inf, np.float32)
    valid = np.zeros((n, m), bool)

    slot_of = lambda q_i, t_i: (t_i - 1 if t_i > q_i else t_i)
    for i in range(n_indv):
        in_i = cell_indv == i
        ni = int(in_i.sum())
        if ni == 0:
            continue
        kk = min(knn, ni)
        d, ix = knn_search(proj_nk, proj_nk, kk, chunk=chunk, mask=in_i)
        for q_i in range(n_indv):
            if q_i == i:
                continue
            rows = cell_indv == q_i
            s = slot_of(q_i, i)
            idx[rows, s * knn : s * knn + kk] = ix[rows]
            dist[rows, s * knn : s * knn + kk] = d[rows]
            valid[rows, s * knn : s * knn + kk] = True
    return MatchCache(
        idx=idx, dist=dist, valid=valid, matched_indv=cell_indv[idx]
    )


@jax.jit
def _pair_coeffs(dist, valid, z_query_k, z_matched_k):
    """Per-(cell, pair, topic) normalized weights:
    c[j,a,k] = z_jk * exp(-d_a) z0[a,k] / sum_a' exp(-d_a') z0[a',k],
    zeroed when z_jk < 1e-8 or denom < 1e-8
    (collapse_cocoa_data.rs:151-175)."""
    ed = jnp.where(valid, jnp.exp(-dist), 0.0)  # [C, M]
    w = ed[:, :, None] * z_matched_k  # [C, M, K]
    denom = jnp.sum(w, axis=1, keepdims=True)  # [C, 1, K]
    w = jnp.where(denom > 1e-8, w / jnp.maximum(denom, 1e-30), 0.0)
    zq = jnp.where(z_query_k >= 1e-8, z_query_k, 0.0)  # [C, K]
    active = (denom[:, 0, :] > 1e-8).astype(zq.dtype) * zq  # z_jk where matched
    return w * zq[:, None, :], active  # coeffs [C, M, K], z-active [C, K]


def collect_cocoa_stat(
    data,
    cell_topic_nk: np.ndarray,  # [N, K] proportions
    cell_indv: np.ndarray,  # [N] individual of each cell
    pb_sample: np.ndarray,  # [N] pseudobulk sample of each cell
    n_samples: int,
    exposure: np.ndarray,  # [I] exposure of each individual
    cache: MatchCache,
    *,
    gene_weights: np.ndarray | None = None,
    cell_block: int = 1024,
) -> CocoaStat:
    """One pass over cell blocks; replayable with a permuted exposure
    by calling again with the same cache."""
    n, k = cell_topic_nk.shape
    d = data.num_rows
    n_indv = len(exposure)
    stat = CocoaStat.zeros(k, d, n_indv, n_samples)

    exposure = np.asarray(exposure)
    y1_kdp = jnp.zeros((d, n_samples, k))
    y0_kdp = jnp.zeros((d, n_samples, k))
    y1_kdi = jnp.zeros((d, n_indv, k))

    m = cache.idx.shape[1]
    for lb in range(0, n, cell_block):
        ub = min(lb + cell_block, n)
        c = ub - lb
        # exposure filter: match only into opposite-exposure individuals
        q_exp = exposure[cell_indv[lb:ub]][:, None]  # [c, 1]
        m_exp = exposure[cache.matched_indv[lb:ub]]  # [c, M]
        valid = cache.valid[lb:ub] & (m_exp != q_exp)

        zq = cell_topic_nk[lb:ub]  # [c, K]
        zm = cell_topic_nk[cache.idx[lb:ub].reshape(-1)].reshape(c, m, k)
        coeffs, z_active = _pair_coeffs(
            jnp.asarray(cache.dist[lb:ub]), jnp.asarray(valid), jnp.asarray(zq), jnp.asarray(zm)
        )
        coeffs_flat = jnp.concatenate(
            [jnp.asarray(coeffs).reshape(c * m, k), jnp.zeros((1, k))], axis=0
        )  # pad slot c*m

        # y0: read matched columns (duplicated per pair), accumulate per
        # (gene, query-sample, topic) via flat segment ids:
        pair_cols = cache.idx[lb:ub].reshape(-1)
        y0_blk = csc_to_coo_block(data.read_columns_csc(pair_cols))
        pair_sample = np.full(c * m + 1, n_samples, np.int32)
        pair_sample[: c * m] = pb_sample[lb:ub].repeat(m)
        # y0[g, p, k] += val * coeff[pair, k] grouped by pair sample
        y0_blk_cols = sparse_ops.col_ids_from_counts(
            jnp.asarray(y0_blk.col_counts),
            cap=len(y0_blk.row_ids), ncols=y0_blk.ncols,
        )
        contrib = jnp.asarray(y0_blk.vals)[:, None] * coeffs_flat[
            jnp.minimum(y0_blk_cols, c * m)
        ]  # [nnz, K]
        flat = jnp.asarray(y0_blk.row_ids).astype(jnp.int32) * (n_samples + 1) + jnp.asarray(
            pair_sample
        )[jnp.minimum(y0_blk_cols, c * m)]
        y0_dpk = jax.ops.segment_sum(
            contrib, flat, num_segments=d * (n_samples + 1)
        ).reshape(d, n_samples + 1, k)[:, :n_samples, :]
        y0_kdp = y0_kdp + y0_dpk

        # y1 terms: block of query cells
        y_blk = csc_to_coo_block(data.read_columns_csc(np.arange(lb, ub)))
        z_active_flat = jnp.concatenate([jnp.asarray(z_active), jnp.zeros((1, k))], 0)
        q_sample = np.full(c + 1, n_samples, np.int32)
        q_sample[:c] = pb_sample[lb:ub]
        q_indv = np.full(c + 1, n_indv, np.int32)
        q_indv[:c] = cell_indv[lb:ub]
        y_cols = jnp.minimum(
            sparse_ops.col_ids_from_counts(
                jnp.asarray(y_blk.col_counts),
                cap=len(y_blk.row_ids), ncols=y_blk.ncols,
            ),
            c,
        )
        contrib1 = jnp.asarray(y_blk.vals)[:, None] * z_active_flat[y_cols]
        flat_p = jnp.asarray(y_blk.row_ids).astype(jnp.int32) * (n_samples + 1) + jnp.asarray(
            q_sample
        )[y_cols]
        y1_kdp = y1_kdp + jax.ops.segment_sum(
            contrib1, flat_p, num_segments=d * (n_samples + 1)
        ).reshape(d, n_samples + 1, k)[:, :n_samples, :]
        flat_i = jnp.asarray(y_blk.row_ids).astype(jnp.int32) * (n_indv + 1) + jnp.asarray(
            q_indv
        )[y_cols]
        y1_kdi = y1_kdi + jax.ops.segment_sum(
            contrib1, flat_i, num_segments=d * (n_indv + 1)
        ).reshape(d, n_indv + 1, k)[:, :n_indv, :]

        # sizes
        za = np.asarray(z_active)  # [c, K]
        np.add.at(stat.size_kp.transpose(1, 0), pb_sample[lb:ub], za)
        ip = np.zeros((n_indv, n_samples, k), np.float32)
        np.add.at(ip, (cell_indv[lb:ub], pb_sample[lb:ub]), za)
        stat.size_kip += ip.transpose(2, 0, 1)

    stat.y1_sum_kdp = np.asarray(y1_kdp).transpose(2, 0, 1)
    stat.y0_sum_kdp = np.asarray(y0_kdp).transpose(2, 0, 1)
    stat.y1_sum_kdi = np.asarray(y1_kdi).transpose(2, 0, 1)
    if gene_weights is not None:
        stat.apply_gene_weights(gene_weights)
    return stat
