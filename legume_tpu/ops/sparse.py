"""Device-side sparse primitives over padded COO blocks.

The reference streams CSC slabs through rayon visitors with per-nonzero
host loops (`sparse_data_visitors.rs:9`, `random_projection.rs`). Here a
block arrives as a padded COO triple (see
`legume_tpu.data.visitors.CooBlock`) and every reduction happens on
device:

- `project_block`: K x B = basis . X_block, the JL-projection inner
  kernel (HOT in `senna topic`'s call stack, SURVEY.md section 3.1).
  Implemented as gather-weight-segment_sum; `col_ids` come sorted from
  CSC so the sorted fast path applies.
- `collapse_block`: per-(gene, group) sufficient-stat scatter
  (`collapse_data` basic/batched stats).
- `densify_block`: [B, D] dense slab for small D (pseudobulk training
  inputs, HVG stats).

All functions are jit-compatible with static `num_*` arguments; padding
lands in a discard slot (segment id = ncols or num_groups).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("cap", "ncols"))
def col_ids_from_counts(col_counts, *, cap: int, ncols: int):
    """Rebuild a CooBlock's padded col_ids vector ON DEVICE from the
    [ncols] per-cell counts (jit-traceable; `cap`/`ncols` static).
    Padding entries land in segment `ncols`, matching the CooBlock
    contract — shipping counts instead of ids cuts a third of the
    host->device bytes and skips a host expansion this machine does at
    ~100 MB/s."""
    counts = col_counts.astype(jnp.int32)
    ext = jnp.concatenate([counts, (cap - counts.sum())[None]])
    return jnp.repeat(
        jnp.arange(ncols + 1, dtype=jnp.int32), ext, total_repeat_length=cap
    )


def block_col_ids(blk) -> jax.Array:
    """Device col_ids for a CooBlock: ship the [ncols] counts and
    expand on device instead of transferring (and host-building) the
    [nnz_pad] id vector — see CooBlock's lazy col_ids contract."""
    return col_ids_from_counts(
        jnp.asarray(blk.col_counts), cap=len(blk.row_ids), ncols=blk.ncols
    )


@partial(jax.jit, static_argnames=("ncols",))
def project_block(
    basis_dk: jax.Array,  # [D, K]
    row_ids: jax.Array,  # [nnz] int32 gene ids
    col_ids: jax.Array,  # [nnz] int32 local cell ids, sorted; ncols = pad
    vals: jax.Array,  # [nnz] f32
    *,
    ncols: int,
) -> jax.Array:
    """Projected block [ncols, K]: out[j] = sum_nz basis[row, :] * val.
    Accepts narrow wire dtypes (uint16 ids, uint8/16 vals) and casts
    at entry — see csc_to_coo_block's narrow-dtype contract."""
    row_ids = row_ids.astype(jnp.int32)
    vals = vals.astype(jnp.float32)
    contrib = basis_dk[row_ids] * vals[:, None]  # [nnz, K]
    out = jax.ops.segment_sum(
        contrib, col_ids, num_segments=ncols + 1, indices_are_sorted=True
    )
    return out[:ncols]


@partial(jax.jit, static_argnames=("num_genes", "num_groups"))
def collapse_block(
    row_ids: jax.Array,
    col_ids: jax.Array,
    vals: jax.Array,
    seg_of_col: jax.Array,  # [ncols + 1] int32 group of each local cell; last = discard
    *,
    num_genes: int,
    num_groups: int,
) -> jax.Array:
    """Accumulate sum_ds[gene, group] += val for every nonzero.

    `seg_of_col[-1]` must be `num_groups` (the discard slot for padding).
    Returns [num_genes, num_groups].
    """
    vals = vals.astype(jnp.float32)
    seg = seg_of_col[col_ids.astype(jnp.int32)]  # [nnz]
    flat = row_ids.astype(jnp.int32) * (num_groups + 1) + seg
    sums = jax.ops.segment_sum(
        vals, flat, num_segments=num_genes * (num_groups + 1)
    ).reshape(num_genes, num_groups + 1)
    return sums[:, :num_groups]


@partial(jax.jit, static_argnames=("ncols", "num_genes"))
def densify_block(
    row_ids: jax.Array,
    col_ids: jax.Array,
    vals: jax.Array,
    *,
    ncols: int,
    num_genes: int,
) -> jax.Array:
    """Dense [ncols, num_genes] slab (cells as rows, TPU layout)."""
    vals = vals.astype(jnp.float32)
    flat = col_ids.astype(jnp.int32) * num_genes + row_ids.astype(jnp.int32)
    out = jax.ops.segment_sum(
        vals, flat, num_segments=(ncols + 1) * num_genes, indices_are_sorted=False
    ).reshape(ncols + 1, num_genes)
    return out[:ncols]


@partial(jax.jit, static_argnames=("ncols",))
def block_col_sums(
    col_ids: jax.Array, vals: jax.Array, *, ncols: int
) -> jax.Array:
    """Per-cell library sizes of a block [ncols]."""
    out = jax.ops.segment_sum(
        vals.astype(jnp.float32), col_ids.astype(jnp.int32),
        num_segments=ncols + 1, indices_are_sorted=True,
    )
    return out[:ncols]


@partial(jax.jit, static_argnames=("num_genes",))
def block_row_stats(
    row_ids: jax.Array, vals: jax.Array, *, num_genes: int
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-gene (sum, sum of squares, nnz count) of a block — the
    streaming moments HVG and NB-dispersion ride on (hvg.rs:39)."""
    row_ids = row_ids.astype(jnp.int32)
    vals = vals.astype(jnp.float32)
    s1 = jax.ops.segment_sum(vals, row_ids, num_segments=num_genes)
    s2 = jax.ops.segment_sum(vals * vals, row_ids, num_segments=num_genes)
    cnt = jax.ops.segment_sum(
        (vals != 0).astype(jnp.float32), row_ids, num_segments=num_genes
    )
    return s1, s2, cnt


@partial(jax.jit, static_argnames=("num_genes", "num_groups"))
def collapse_blocks_scan(
    rows_g: jax.Array,  # [G, nnz_pad]
    counts_g: jax.Array,  # [G, ncols] per-cell entry counts
    vals_g: jax.Array,
    segs_g: jax.Array,  # [G, ncols + 1]
    *,
    num_genes: int,
    num_groups: int,
) -> jax.Array:
    """Sum of `collapse_block` over a STACK of same-shape blocks in one
    dispatch (a per-block dispatch costs ~seconds over a tunneled
    device — docs/BENCH_NOTES.md 1M-bench lesson). Column ids expand
    from per-cell counts on device (`col_ids_from_counts`)."""
    cap = rows_g.shape[-1]
    ncols = counts_g.shape[-1]

    def body(acc, inp):
        r, cc, v, s = inp
        c = col_ids_from_counts(cc, cap=cap, ncols=ncols)
        return acc + collapse_block(
            r, c, v, s, num_genes=num_genes, num_groups=num_groups
        ), None

    out, _ = jax.lax.scan(
        body,
        jnp.zeros((num_genes, num_groups), jnp.float32),
        (rows_g, counts_g, vals_g, segs_g),
    )
    return out


@partial(jax.jit, static_argnames=("ncols",))
def project_blocks_scan(
    basis_dk: jax.Array,
    rows_g: jax.Array,  # [G, nnz_pad]
    counts_g: jax.Array,  # [G, ncols] per-cell entry counts
    vals_g: jax.Array,
    *,
    ncols: int,
) -> jax.Array:
    """[G, ncols, K] projections of a stack of same-shape blocks in one
    dispatch (same launch-amortization rationale); column ids expand
    from per-cell counts on device."""
    cap = rows_g.shape[-1]

    def body(_, inp):
        r, cc, v = inp
        c = col_ids_from_counts(cc, cap=cap, ncols=ncols)
        return None, project_block(basis_dk, r, c, v, ncols=ncols)

    _, out = jax.lax.scan(body, None, (rows_g, counts_g, vals_g))
    return out


def project_blocks_sharded(
    mesh,
    basis_dk: jax.Array,
    rows_g: jax.Array,  # [G, nnz_pad], G divisible by the dp size
    counts_g: jax.Array,  # [G, ncols]
    vals_g: jax.Array,
    *,
    ncols: int,
) -> jax.Array:
    """dp form of `project_blocks_scan` (VERDICT r4 #6: svd's streaming
    Nystrom projection had no mesh path): the stacked-block axis
    shard_maps over dp, each device projecting its own blocks against
    the replicated basis — cells are disjoint, so no collectives."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    @partial(jax.jit, static_argnames=("ncols",))
    def run(basis, r_g, c_g, v_g, *, ncols):
        def local(b, r, cc, v):
            return project_blocks_scan(b, r, cc, v, ncols=ncols)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
        )(basis, r_g, c_g, v_g)

    return run(basis_dk, rows_g, counts_g, vals_g, ncols=ncols)
