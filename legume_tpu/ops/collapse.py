"""The central pseudobulk collapse engine
(data-beans-alg `collapse_data` equivalent; SURVEY.md section 2.3).

Three stages, mirroring `CollapsingOps::collapse_columns`
(`collapse_data/mod.rs:102-256`):

1. sufficient-statistic collection — basic per-group sums, per-batch
   sums, and (with >1 batch) counterfactual matched stats via exact
   on-device kNN (`legume_tpu.ops.knn`) with softmax(-distance)
   weights (stats.rs:26-107, 604-689);
2. `optimize` — Poisson-Gamma coordinate descent alternating
   mu_adjusted (biology), gamma (counterfactual scale), with
   mu_residual fixed and delta (batch effect) closed-form at the end
   (stats.rs:164-311);
3. `CollapsedOut` — GammaParam posteriors per plane.

The descent is elementwise per (gene, group) given shared per-group
sizes, so the whole fit is one jitted `lax.fori_loop` over [D, S]
planes — no gene blocking needed (XLA streams the planes); under a mesh
the gene axis shards freely (the same separability the reference
exploits for its block fit, stats.rs:313-321).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.visitors import visit_columns_by_block
from . import sparse as sparse_ops
from .gamma import GammaParam


@dataclass
class CollapsedStat:
    """Host-side sufficient statistics (stats.rs:486-505)."""

    observed_sum_ds: np.ndarray  # [D, S]
    imputed_sum_ds: np.ndarray  # [D, S]
    residual_sum_ds: np.ndarray  # [D, S]
    size_s: np.ndarray  # [S]
    observed_sum_db: np.ndarray  # [D, B]
    n_bs: np.ndarray  # [B, S]

    @classmethod
    def zeros(cls, num_genes: int, num_groups: int, num_batches: int):
        return cls(
            observed_sum_ds=np.zeros((num_genes, num_groups), np.float32),
            imputed_sum_ds=np.zeros((num_genes, num_groups), np.float32),
            residual_sum_ds=np.zeros((num_genes, num_groups), np.float32),
            size_s=np.zeros(num_groups, np.float32),
            observed_sum_db=np.zeros((num_genes, num_batches), np.float32),
            n_bs=np.zeros((num_batches, num_groups), np.float32),
        )

    @property
    def num_genes(self):
        return self.observed_sum_ds.shape[0]

    @property
    def num_groups(self):
        return self.observed_sum_ds.shape[1]

    @property
    def num_batches(self):
        return self.observed_sum_db.shape[1]


@dataclass
class CollapsedOut:
    """Gamma posteriors per plane (stats.rs:456-462)."""

    mu_observed: GammaParam
    mu_adjusted: Optional[GammaParam] = None
    mu_residual: Optional[GammaParam] = None
    gamma: Optional[GammaParam] = None
    delta: Optional[GammaParam] = None


# ----------------------------------------------------------------------------
# stat collection
# ----------------------------------------------------------------------------


def collect_basic_stats(
    data,
    groups: np.ndarray,
    num_groups: int,
    *,
    num_batches: int = 1,
    batches: np.ndarray | None = None,
    block_size: int = 8192,
) -> CollapsedStat:
    """Observed per-group (and per-batch) sums in one streaming pass
    (collect_basic_stat_visitor + collect_batch_stat_visitor,
    stats.rs:110-156). Accumulation happens on device; the running
    [D, S] planes stay on device across blocks."""
    d = data.num_rows
    stat = CollapsedStat.zeros(d, num_groups, num_batches)

    groups = np.asarray(groups, dtype=np.int32)
    obs_ds = jnp.zeros((d, num_groups), jnp.float32)
    obs_db = jnp.zeros((d, num_batches), jnp.float32) if num_batches > 1 else None

    # consecutive same-shape blocks batch into ONE scanned dispatch —
    # per-block dispatches cost ~seconds over a tunneled device
    # (docs/BENCH_NOTES.md 1M-bench lesson)
    import os

    dispatch_batch = int(os.environ.get("LEGUME_DISPATCH_BATCH", "8"))
    buf: list = []

    def seg_of(blk, labels, n_seg):
        seg = np.full(blk.ncols + 1, n_seg, np.int32)
        seg[: blk.ncols] = labels[blk.lb : blk.lb + blk.ncols]
        return seg

    def flush():
        nonlocal obs_ds, obs_db
        if not buf:
            return
        g = len(buf)
        # pad the group to the next power of two with zero-value blocks
        # (at most log2(dispatch_batch)+1 scan programs per bucket
        # shape; remote compiles cost minutes). Stack ON DEVICE from
        # per-block async transfers, and ship per-cell counts instead
        # of expanded col_ids — the host expansion + np.stack measured
        # seconds per pass at 27M nnz (BENCH_NOTES teardown table).
        g_pad = 1 << (g - 1).bit_length()
        rows_l = [jnp.asarray(b.row_ids) for b in buf]
        cnts_l = [jnp.asarray(b.col_counts) for b in buf]
        vals_l = [jnp.asarray(b.vals) for b in buf]
        segs_l = [jnp.asarray(seg_of(b, groups, num_groups)) for b in buf]
        if g_pad > g:
            pad = g_pad - g
            rows_l += [jnp.zeros_like(rows_l[0])] * pad
            cnts_l += [jnp.zeros_like(cnts_l[0])] * pad
            vals_l += [jnp.zeros_like(vals_l[0])] * pad
            segs_l += [jnp.full_like(segs_l[0], num_groups)] * pad
        rows = jnp.stack(rows_l)
        cnts = jnp.stack(cnts_l)
        vals = jnp.stack(vals_l)
        obs_ds = obs_ds + sparse_ops.collapse_blocks_scan(
            rows, cnts, vals, jnp.stack(segs_l),
            num_genes=d, num_groups=num_groups,
        )
        if obs_db is not None:
            bsegs_l = [
                jnp.asarray(seg_of(b, batches, num_batches)) for b in buf
            ]
            if g_pad > g:
                bsegs_l += [jnp.full_like(bsegs_l[0], num_batches)] * (g_pad - g)
            obs_db = obs_db + sparse_ops.collapse_blocks_scan(
                rows, cnts, vals, jnp.stack(bsegs_l),
                num_genes=d, num_groups=num_batches,
            )
        buf.clear()

    use_pallas = os.environ.get("LEGUME_PALLAS") == "1"
    for blk in visit_columns_by_block(data, block_size=block_size):
        if use_pallas:
            from .pallas_kernels import collapse_block_tiled

            out = collapse_block_tiled(
                blk.row_ids, blk.col_ids, blk.vals,
                seg_of(blk, groups, num_groups),
                ncols=blk.ncols, num_genes=d, num_groups=num_groups,
                interpret=jax.default_backend() == "cpu",
            )
            if out is not None:  # None = group count over VMEM budget
                obs_ds = obs_ds + out
                if obs_db is not None:
                    out_b = collapse_block_tiled(
                        blk.row_ids, blk.col_ids, blk.vals,
                        seg_of(blk, batches, num_batches),
                        ncols=blk.ncols, num_genes=d, num_groups=num_batches,
                        interpret=jax.default_backend() == "cpu",
                    )
                    obs_db = obs_db + out_b
                continue
        if buf and (
            buf[0].ncols != blk.ncols or len(buf[0].row_ids) != len(blk.row_ids)
        ):
            flush()
        buf.append(blk)
        if len(buf) >= dispatch_batch:
            flush()
    flush()

    stat.observed_sum_ds = np.asarray(obs_ds)
    np.add.at(stat.size_s, groups, 1.0)
    if num_batches > 1:
        stat.observed_sum_db = np.asarray(obs_db)
        np.add.at(stat.n_bs, (np.asarray(batches, np.int64), groups.astype(np.int64)), 1.0)
    return stat


@jax.jit
def _matched_weights(
    dist: jax.Array,  # [C, M] L2 distances of matched pairs
    valid: jax.Array,  # [C, M] bool
) -> jax.Array:
    """softmax(-distance) per query over its pooled matched set
    (stats.rs:76-84 `normalize_exp_logits_columns`)."""
    neg = jnp.where(valid, -dist, -jnp.inf)
    mx = jnp.max(neg, axis=-1, keepdims=True)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)  # all-invalid row guard
    e = jnp.where(valid, jnp.exp(neg - mx), 0.0)
    s = jnp.sum(e, axis=-1, keepdims=True)
    return jnp.where(s > 0, e / jnp.maximum(s, 1e-30), 0.0)


@partial(jax.jit, static_argnames=("chunk_d", "ncells"))
def _densify_gene_chunk(
    row_ids, col_ids, vals, chunk_lb, *, chunk_d: int, ncells: int
) -> jax.Array:
    """Dense [ncells, chunk_d] slab of one gene range of a COO block.
    `chunk_lb` is a traced scalar so looping over gene chunks reuses ONE
    compiled kernel."""
    in_range = (row_ids >= chunk_lb) & (row_ids < chunk_lb + chunk_d)
    local_r = jnp.where(in_range, row_ids - chunk_lb, 0)
    local_c = jnp.where(in_range & (col_ids < ncells), col_ids, ncells)
    flat = local_c.astype(jnp.int32) * chunk_d + local_r
    out = jax.ops.segment_sum(
        jnp.where(in_range, vals, 0.0), flat, num_segments=(ncells + 1) * chunk_d
    ).reshape(ncells + 1, chunk_d)
    return out[:ncells]


def collect_matched_stats(
    data,
    groups: np.ndarray,
    num_groups: int,
    batches: np.ndarray,
    num_batches: int,
    proj_nk: np.ndarray,  # [N, K] projected cells (kNN coordinates)
    *,
    knn: int = 10,
    cell_block: int = 1024,
    gene_chunk: int = 4096,
    stat: CollapsedStat | None = None,
    query_range: tuple[int, int] | None = None,
) -> CollapsedStat:
    """Counterfactual matched sufficient statistics
    (collect_matched_stat_visitor, stats.rs:26-107).

    For each cell j: pool the `knn` nearest cells from every other
    batch, weight them by softmax(-L2), and accumulate

        imputed_sum_ds[:, s]  += y_hat_j        (weighted counterfactual)
        residual_sum_ds[:, s] += y_j ./ (y_hat_j * scale_j)   on y_j's
            support where y_hat > 0, raw y_j elsewhere
            (adjust_by_division_inplace, dmatrix_util.rs:145-176),
        scale_j = sum(y_j) / sum(y_hat_j).

    Matching is exact device top-k (ops.knn), not HNSW — deterministic
    with no seed plumbing.

    `query_range=(lb, ub)` restricts the QUERY cells to a column range
    (the multi-process split: each host owns its queries' per-cell
    work; partner columns still read globally — kNN matches live on
    arbitrary shards). Partial planes sum across hosts afterwards.
    """
    from .knn import matched_neighbors_across_batches

    d = data.num_rows
    if stat is None:
        stat = CollapsedStat.zeros(d, num_groups, num_batches)
    groups = np.asarray(groups, dtype=np.int32)

    m_idx, m_dist, m_valid = matched_neighbors_across_batches(
        proj_nk, np.asarray(batches), num_batches, knn
    )
    m = m_idx.shape[1]

    imputed = jnp.zeros((d, num_groups), jnp.float32)
    residual = jnp.zeros((d, num_groups), jnp.float32)

    n = data.num_columns
    q_lb, q_ub = query_range if query_range is not None else (0, n)
    for lb in range(q_lb, q_ub, cell_block):
        ub = min(lb + cell_block, q_ub)
        c = ub - lb
        w = np.asarray(
            _matched_weights(jnp.asarray(m_dist[lb:ub]), jnp.asarray(m_valid[lb:ub]))
        )  # [c, M]

        # read y block and the (duplicated) matched columns
        from ..data.visitors import csc_to_coo_block

        y_blk = csc_to_coo_block(data.read_columns_csc(np.arange(lb, ub)))
        pair_cols = m_idx[lb:ub].reshape(-1)  # [c*M] global cell ids
        y0_blk = csc_to_coo_block(data.read_columns_csc(pair_cols))

        w_flat = jnp.asarray(w.reshape(-1))  # [c*M]
        seg_group = np.full(c * m + 1, num_groups, np.int32)
        seg_group[: c * m] = groups[lb:ub].repeat(m)
        # weighted vals: pad col_ids index into w via clip (pad weight 0)
        y0_cols = sparse_ops.col_ids_from_counts(
            jnp.asarray(y0_blk.col_counts),
            cap=len(y0_blk.row_ids), ncols=y0_blk.ncols,
        )
        y0_w = jnp.where(
            y0_cols < c * m, w_flat[jnp.clip(y0_cols, 0, c * m - 1)], 0.0
        )
        y0_vals_w = jnp.asarray(y0_blk.vals) * y0_w

        # imputed: weighted collapse of matched cells into query groups
        imputed = imputed + sparse_ops.collapse_block(
            jnp.asarray(y0_blk.row_ids),
            y0_cols,
            y0_vals_w,
            jnp.asarray(seg_group),
            num_genes=d,
            num_groups=num_groups,
        )

        # per-query totals for the scale: xsum / dsum (floor dsum>0 -> 1)
        y_cols_dev = sparse_ops.col_ids_from_counts(
            jnp.asarray(y_blk.col_counts),
            cap=len(y_blk.row_ids), ncols=y_blk.ncols,
        )
        xsum = sparse_ops.block_col_sums(
            y_cols_dev, jnp.asarray(y_blk.vals), ncols=c
        )
        pair_query = y0_cols // m  # pair -> query (pad maps anywhere, val 0)
        pair_query = jnp.where(y0_cols < c * m, pair_query, c)
        dsum = jax.ops.segment_sum(y0_vals_w, pair_query, num_segments=c + 1)[:c]
        scale = jnp.where(dsum > 0, xsum / jnp.maximum(dsum, 1e-30), 1.0)

        # residual: gene-chunked dense division on y's support
        qgrp = np.full(c + 1, num_groups, np.int32)
        qgrp[:c] = groups[lb:ub]
        qgrp_j = jnp.asarray(qgrp)
        y_rows = jnp.asarray(y_blk.row_ids)
        y_cols = y_cols_dev
        y_vals = jnp.asarray(y_blk.vals)
        y0_rows = jnp.asarray(y0_blk.row_ids)
        # pad the gene axis so every chunk shares one compiled shape
        for g_lb in range(0, d, gene_chunk):
            g_d = min(gene_chunk, d - g_lb)
            y_dense = _densify_gene_chunk(
                y_rows, y_cols, y_vals, g_lb, chunk_d=gene_chunk, ncells=c
            )
            yhat_dense = _densify_gene_chunk(
                y0_rows, pair_query, y0_vals_w, g_lb, chunk_d=gene_chunk, ncells=c
            )
            adj = jnp.where(
                (y_dense > 0) & (yhat_dense > 0),
                y_dense / (yhat_dense * scale[:, None]),
                y_dense,
            )
            res_chunk = jax.ops.segment_sum(adj, qgrp_j[:c], num_segments=num_groups)
            residual = residual.at[g_lb : g_lb + g_d, :].add(res_chunk.T[:g_d])

    stat.imputed_sum_ds += np.asarray(imputed)
    stat.residual_sum_ds += np.asarray(residual)
    return stat


# ----------------------------------------------------------------------------
# Gamma optimization (stats.rs:164-311)
# ----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("num_iter", "batched"))
def _optimize_device(
    observed_ds: jax.Array,
    imputed_ds: jax.Array,
    residual_ds: jax.Array,
    size_s: jax.Array,
    observed_db: jax.Array,
    n_bs: jax.Array,
    *,
    num_iter: int,
    batched: bool,
    a0: float = 1.0,
    b0: float = 1.0,
):
    """Jitted DC-Poisson coordinate descent. Returns dict of (a, b)
    sufficient-stat plane pairs."""
    size_row = size_s[None, :]  # [1, S]

    # observed mean is always closed-form (stats.rs:265-273, 293-299)
    mu_obs = (a0 + observed_ds, b0 + jnp.broadcast_to(size_row, observed_ds.shape))

    if not batched:
        return {"mu_observed": mu_obs}

    # mu_resid fixed across the loop (stats.rs:198-207)
    resid_a = a0 + residual_ds
    resid_b = b0 + jnp.broadcast_to(size_row, residual_ds.shape)
    resid_mean = resid_a / resid_b

    mu_adj_a = a0 + observed_ds + imputed_ds  # constant across iterations
    g_a = a0 + imputed_ds

    def body(_, carry):
        gamma_mean, _mu_b, _g_b = carry
        #      observed + imputed
        # mu = ---------------------------- (stats.rs:218-231)
        #      (mu_resid + gamma) * size_s
        mu_b = b0 + (resid_mean + gamma_mean) * size_row
        mu_mean = mu_adj_a / mu_b
        #          imputed
        # gamma = ----------------- (stats.rs:233-241)
        #          mu * size_s
        g_b = b0 + mu_mean * size_row
        return (g_a / g_b, mu_b, g_b)

    # gamma's posterior mean starts at an eager ZERO, not a0/b0
    # (dmatrix_gamma.rs:49-52 "relying on a zero start")
    zero = jnp.zeros_like(observed_ds)
    one = jnp.ones_like(observed_ds)
    _, mu_adj_b, g_b = jax.lax.fori_loop(0, num_iter, body, (zero, one, one))

    # delta = observed_db / (mu * n_bs^T) (stats.rs:257-263)
    delta_a = a0 + observed_db
    delta_b = b0 + (mu_adj_a / mu_adj_b) @ n_bs.T

    return {
        "mu_observed": mu_obs,
        "mu_adjusted": (mu_adj_a, mu_adj_b),
        "mu_residual": (resid_a, resid_b),
        "gamma": (g_a, g_b),
        "delta": (delta_a, delta_b),
    }


def optimize(
    stat: CollapsedStat,
    *,
    num_iter: int = 100,
    a0: float = 1.0,
    b0: float = 1.0,
) -> CollapsedOut:
    """Fit the Gamma posteriors from a populated stat (stats.rs:321-452)."""
    batched = stat.num_batches > 1
    planes = _optimize_device(
        jnp.asarray(stat.observed_sum_ds),
        jnp.asarray(stat.imputed_sum_ds),
        jnp.asarray(stat.residual_sum_ds),
        jnp.asarray(stat.size_s),
        jnp.asarray(stat.observed_sum_db),
        jnp.asarray(stat.n_bs),
        num_iter=num_iter,
        batched=batched,
        a0=a0,
        b0=b0,
    )

    def mk(name) -> Optional[GammaParam]:
        if name not in planes:
            return None
        a, b = planes[name]
        return GammaParam(a=a, b=b, a0=a0, b0=b0)

    # MeanOnly consumers that need sparse support apply
    # `gamma.sparsify_mean_to_support` on the mean reads downstream
    # (stats.rs:275-284).
    return CollapsedOut(
        mu_observed=mk("mu_observed"),
        mu_adjusted=mk("mu_adjusted"),
        mu_residual=mk("mu_residual"),
        gamma=mk("gamma"),
        delta=mk("delta"),
    )


def merge_stat(
    fine: CollapsedStat, fine_to_coarse: np.ndarray, num_coarse: int
) -> CollapsedStat:
    """Aggregate fine-group stats into coarse groups (stats.rs:695-725)."""
    d = fine.num_genes
    b = fine.num_batches
    coarse = CollapsedStat.zeros(d, num_coarse, b)
    f2c = np.asarray(fine_to_coarse, dtype=np.int64)
    np.add.at(coarse.observed_sum_ds.T, f2c, fine.observed_sum_ds.T)
    np.add.at(coarse.imputed_sum_ds.T, f2c, fine.imputed_sum_ds.T)
    np.add.at(coarse.residual_sum_ds.T, f2c, fine.residual_sum_ds.T)
    np.add.at(coarse.size_s, f2c, fine.size_s)
    np.add.at(coarse.n_bs.T, f2c, fine.n_bs.T)
    coarse.observed_sum_db = fine.observed_sum_db.copy()
    return coarse
