"""Multi-host/multi-chip streaming reductions.

The survey's north-star layout (SURVEY.md section 2.7 / 5): cells
shard across hosts (each host streams its own zarr column shards),
genes replicated; sufficient statistics merge with `psum` over ICI.
This module implements that reduction as a `shard_map` over the dp
axis: every device reduces ITS padded COO shard into the full [D, S]
plane, then one `psum` merges — exercised on the virtual CPU mesh in
tests and by `__graft_entry__.dryrun_multichip`-style runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


def collapse_stats_sharded(
    mesh,
    row_ids: np.ndarray,  # [n_dev, nnz_pad] per-shard gene ids
    col_ids: np.ndarray,  # [n_dev, nnz_pad] LOCAL cell ids per shard
    vals: np.ndarray,  # [n_dev, nnz_pad]
    seg_of_col: np.ndarray,  # [n_dev, ncols_pad + 1] group of each local cell
    *,
    num_genes: int,
    num_groups: int,
) -> np.ndarray:
    """observed_sum_ds [D, S] reduced across all shards with one psum."""
    from jax.experimental.shard_map import shard_map

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(),
    )
    def reduce_shard(r, c, v, seg):
        r, c, v, seg = r[0], c[0], v[0], seg[0]
        grp = seg[c]  # [nnz] group of each nonzero (pad -> num_groups)
        flat = r.astype(jnp.int32) * (num_groups + 1) + grp
        local = jax.ops.segment_sum(
            v, flat, num_segments=num_genes * (num_groups + 1)
        ).reshape(num_genes, num_groups + 1)[:, :num_groups]
        return jax.lax.psum(local, DATA_AXIS)

    out = reduce_shard(
        jnp.asarray(row_ids), jnp.asarray(col_ids), jnp.asarray(vals), jnp.asarray(seg_of_col)
    )
    return np.asarray(out)


def collapse_observed_multihost(
    vec,
    groups: np.ndarray,  # [N] pseudobulk assignment per cell
    mesh,
    *,
    block_size: int = 8192,
) -> np.ndarray:
    """Stream a zarr/h5 backend into per-device column shards and
    reduce observed pseudobulk sums with one psum — the multi-host
    topic-pipeline collapse path (SURVEY.md section 2.7).

    Each mesh device owns a contiguous column (cell) range and only
    that range is read for it, mirroring the real multi-host layout
    where every host streams its own zarr shard: on a true multi-host
    mesh, each process calls this with the same global `vec` but the
    reads below touch only the local devices' ranges."""
    d = vec.num_rows
    n = vec.num_columns
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    bounds = np.linspace(0, n, n_dev + 1).astype(np.int64)
    num_groups = int(groups.max()) + 1

    shard_coo = []
    max_nnz, max_cols = 1, 1
    for s in range(n_dev):
        lb, ub = int(bounds[s]), int(bounds[s + 1])
        rows_l, cols_l, vals_l = [], [], []
        for blk_lb in range(lb, ub, block_size):
            blk_ub = min(blk_lb + block_size, ub)
            coo = vec.read_columns_csc(np.arange(blk_lb, blk_ub)).tocoo()
            rows_l.append(coo.row.astype(np.int32))
            cols_l.append((coo.col + (blk_lb - lb)).astype(np.int32))
            vals_l.append(coo.data.astype(np.float32))
        r = np.concatenate(rows_l) if rows_l else np.zeros(0, np.int32)
        c = np.concatenate(cols_l) if cols_l else np.zeros(0, np.int32)
        v = np.concatenate(vals_l) if vals_l else np.zeros(0, np.float32)
        shard_coo.append((r, c, v, ub - lb, groups[lb:ub]))
        max_nnz = max(max_nnz, len(r))
        max_cols = max(max_cols, ub - lb)

    rows = np.zeros((n_dev, max_nnz), np.int32)
    cols = np.full((n_dev, max_nnz), max_cols, np.int32)
    vals = np.zeros((n_dev, max_nnz), np.float32)
    segs = np.full((n_dev, max_cols + 1), num_groups, np.int32)
    for s, (r, c, v, ncols, g) in enumerate(shard_coo):
        rows[s, : len(r)] = r
        cols[s, : len(r)] = c
        vals[s, : len(r)] = v
        segs[s, :ncols] = g
    return collapse_stats_sharded(
        mesh, rows, cols, vals, segs, num_genes=d, num_groups=num_groups
    )


def shard_coo_by_cells(
    csc, groups: np.ndarray, n_shards: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Split a CSC matrix into per-shard padded COO (the per-host zarr
    shard stand-in): contiguous column ranges per shard, local col ids,
    one shared nnz pad."""
    import scipy.sparse as sp

    d, n = csc.shape
    bounds = np.linspace(0, n, n_shards + 1).astype(np.int64)
    shards = []
    max_nnz, max_cols = 1, 1
    for s in range(n_shards):
        lb, ub = bounds[s], bounds[s + 1]
        coo = sp.csc_matrix(csc[:, lb:ub]).tocoo()
        shards.append((coo, ub - lb, groups[lb:ub]))
        max_nnz = max(max_nnz, coo.nnz)
        max_cols = max(max_cols, ub - lb)

    num_groups = int(groups.max()) + 1
    rows = np.zeros((n_shards, max_nnz), np.int32)
    cols = np.full((n_shards, max_nnz), max_cols, np.int32)
    vals = np.zeros((n_shards, max_nnz), np.float32)
    segs = np.full((n_shards, max_cols + 1), num_groups, np.int32)
    for s, (coo, ncols, g) in enumerate(shards):
        rows[s, : coo.nnz] = coo.row
        cols[s, : coo.nnz] = coo.col
        vals[s, : coo.nnz] = coo.data
        segs[s, :ncols] = g
    return rows, cols, vals, segs
