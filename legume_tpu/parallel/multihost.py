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
