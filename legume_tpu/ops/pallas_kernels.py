"""Pallas TPU kernels for the sparse hot loops.

`coo_project_pallas` fuses the JL-projection inner kernel — gather
basis rows at nonzero gene ids, scale by values, accumulate by (sorted)
cell segment — into one kernel that streams the nonzero arrays through
VMEM in fixed-size chunks while the basis stays VMEM-resident
(D x K x 4 bytes <= ~8 MB for D=34k, K=64, comfortably under the
16 MB/core budget). The XLA fallback materializes an [nnz, K] gather
intermediate in HBM; the kernel never does, so the op becomes
HBM-bandwidth-bound on exactly the nnz + output traffic.

Grid: one program per nnz chunk; the output block index map pins every
program to the SAME [B, K] accumulator block, which Pallas keeps
resident across sequential grid steps (TPU grid execution is
sequential), so accumulation is in-VMEM.

Validated in interpreter mode on CPU (tests) and used on TPU behind
`LEGUME_PALLAS=1` (`project_block` dispatch in `ops/sparse.py`).

STATUS (round 2): the round-1 COO kernel below still needs
per-element int indexing and remains interpret-only. The RESOLUTION of
SURVEY hard-part 1 is `project_block_tiled` further down: a fully
block-structured (Mosaic-legal) formulation where gather and scatter
both become one-hot MXU matmuls — VALIDATED ON THE REAL CHIP (max rel
err 3e-3 vs XLA, from MXU f32-pass rounding; immaterial for the JL
sketch whose downstream is sign bits) and measured 2.26x faster than
the XLA segment path device-side at the production shape (40.8 ms vs
92.3 ms for 8.4M nnz; docs/BENCH_NOTES.md roofline). Host-side tile
bucketing is the trade: O(nnz) sort + scatter that this dev host runs
~100x slower than a normal core (np divide of 8M int64 = 3.4 s), so
the production default stays the XLA path; LEGUME_PALLAS=1 opts in
where blocks are re-projected repeatedly (rSVD power iterations,
matched re-reads) or bucketing can be pushed to ingest time.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

CHUNK = 8192  # nonzeros per grid step

# auto-dispatch crossover (cells): below this the cached Pallas path
# measured SLOWER than the XLA scan through the tunnel (BENCH_r02:
# 2.93 s vs 1.97 s at 10k cells), above it 5.1x FASTER (BENCH_NOTES
# 40k-cell table). Tunable via LEGUME_PALLAS_AUTO_MIN_CELLS.
PALLAS_AUTO_MIN_CELLS = 24_576


def pallas_auto_enabled(*, n_cells: int | None = None) -> bool:
    """Shape-gated automatic Pallas dispatch (VERDICT r2 weak #1):
    take the tile-cache kernel only in the measured win region —
    real TPU backend AND enough cells to amortize the per-block kernel
    overhead. `LEGUME_PALLAS=1` forces it regardless (handled by the
    callers); `LEGUME_PALLAS=0` denies; unset -> this heuristic."""
    import os

    env = os.environ.get("LEGUME_PALLAS")
    if env == "0":
        return False
    if env == "1":
        return True
    if jax.default_backend() != "tpu":
        return False
    min_cells = int(
        os.environ.get("LEGUME_PALLAS_AUTO_MIN_CELLS", PALLAS_AUTO_MIN_CELLS)
    )
    return n_cells is None or n_cells >= min_cells


def _kernel(row_ref, col_ref, val_ref, basis_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    rows = row_ref[:]  # [CHUNK] gene ids of this chunk
    cols = col_ref[:]  # [CHUNK] cell ids (sorted; pad -> B)
    vals = val_ref[:]  # [CHUNK]
    contrib = basis_ref[rows, :] * vals[:, None]  # [CHUNK, K]
    # chunk-local segment accumulation with VALUE semantics —
    # `ref[idx] += v` silently drops duplicate indices, `.at[].add`
    # accumulates them; the final full-block add has no duplicates
    seg = jnp.zeros_like(out_ref).at[cols, :].add(contrib)
    out_ref[:, :] += seg


def coo_project_pallas(
    basis_dk: jax.Array,  # [D, K]
    row_ids: jax.Array,  # [nnz] int32, padded with 0
    col_ids: jax.Array,  # [nnz] int32, sorted; padding -> ncols
    vals: jax.Array,  # [nnz] f32, padding -> 0
    *,
    ncols: int,
    interpret: bool = False,
) -> jax.Array:
    """[ncols, K] projected block; matches `sparse.project_block`."""
    nnz = row_ids.shape[0]
    k = basis_dk.shape[1]
    num_chunks = max(nnz // CHUNK, 1)
    assert nnz % CHUNK == 0 or nnz < CHUNK, "pad nnz to a CHUNK multiple"
    chunk = min(CHUNK, nnz)

    out = pl.pallas_call(
        _kernel,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,)),
            pl.BlockSpec((chunk,), lambda i: (i,)),
            pl.BlockSpec((chunk,), lambda i: (i,)),
            pl.BlockSpec(basis_dk.shape, lambda i: (0, 0)),  # resident
        ],
        out_specs=pl.BlockSpec((ncols + 1, k), lambda i: (0, 0)),  # pinned
        out_shape=jax.ShapeDtypeStruct((ncols + 1, k), basis_dk.dtype),
        interpret=interpret,
    )(row_ids, col_ids, vals, basis_dk)
    return out[:ncols]


# ----------------------------------------------------------------------------
# Mosaic-legal tiled SpMM (round 2: SURVEY hard-part 1 resolution)
# ----------------------------------------------------------------------------
#
# The round-1 kernel above needs per-element int indexing, which Mosaic
# rejects on real TPUs. This formulation is block-structured end to end:
# nonzeros bucket into (gene-tile x cell-tile) chunks on the host; on
# device, gather and scatter both become ONE-HOT MATMULS on the MXU
# (one-hot built from broadcasted_iota + compare — no int indexing):
#
#   gathered [C, K]  = onehot(local_row, TILE_G) . vals  @  basis_tile
#   out_tile [Tc, K] += onehot(local_col, TILE_C)^T @ gathered
#
# Scalar-prefetch index maps pick the basis tile (gi) and output tile
# (cj) per chunk; chunks arrive sorted by (cj, gi) so each output tile
# is visited contiguously and accumulates in VMEM, zeroed when a chunk
# opens a new tile. Roofline: the XLA segment_sum path measures ~24
# GB/s effective (0.07x of saxpy) because TPU scatter serializes; this
# kernel replaces scatter with ~49 KFLOP/nnz of MXU work, which the
# MXU absorbs far below the scatter latency (docs/BENCH_NOTES.md).

from jax.experimental.pallas import tpu as pltpu  # noqa: E402

TILE_G = 128  # genes per basis tile (MXU-aligned)
TILE_C = 256  # cells per output tile
ENTRY_CHUNK = 1024  # nonzero entries per grid step (8 x 128 VMEM tile)
_ROWS = ENTRY_CHUNK // 128  # entry arrays are [n_chunks * 8, 128]


def _tiled_kernel(gi_ref, cj_ref, new_ref, lr_ref, lc_ref, v_ref, basis_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(new_ref[i] == 1)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    # entry blocks are [1, C, 1]: the trailing length-1 dim lets the
    # one-hot build broadcast WITHOUT any reshape (Mosaic rejects
    # vector reshapes like (8,128)->(1024,1))
    lr = lr_ref[0]  # [C, 1] local gene row in [0, TILE_G)
    lc = lc_ref[0]  # [C, 1] local cell col in [0, TILE_C)
    v = v_ref[0]  # [C, 1] values (0 = padding)

    iota_g = jax.lax.broadcasted_iota(jnp.int32, (ENTRY_CHUNK, TILE_G), 1)
    # when the basis plane ships as bf16 (halving the dominant HBM
    # gather traffic — roofline push, VERDICT r2 weak #2), the one-hot
    # side drops to bf16 too (Mosaic wants matched dot dtypes); the
    # MXU accumulates in f32 either way. Value rounding is 2^-8
    # relative — same order as the already-measured 3e-3 MXU f32-pass
    # error, immaterial for the JL sketch's sign-bit consumers.
    oh_g = jnp.where(iota_g == lr, v, 0.0).astype(basis_ref.dtype)  # [C, G]
    gathered = jnp.dot(oh_g, basis_ref[:, :], preferred_element_type=jnp.float32)

    iota_c = jax.lax.broadcasted_iota(jnp.int32, (ENTRY_CHUNK, TILE_C), 1)
    oh_c = (iota_c == lc).astype(jnp.float32)  # [C, Tc]
    out_ref[:, :] += jax.lax.dot_general(
        oh_c, gathered,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def bucket_coo_for_tiles(
    rows: np.ndarray, cols: np.ndarray, vals: np.ndarray
) -> tuple[np.ndarray, ...]:
    """Host-side bucketing: entries sorted by (cell tile, gene tile) and
    split into fixed-size chunks; returns per-chunk scalars
    (gi, cj, new_out_tile) and [n_chunks, ENTRY_CHUNK] local entries."""
    gi = rows // TILE_G
    cj = cols // TILE_C
    order = np.lexsort((gi, cj))
    rows, cols, vals = rows[order], cols[order], vals[order]
    gi, cj = gi[order], cj[order]

    key = cj.astype(np.int64) * (gi.max() + 1 if len(gi) else 1) + gi
    uniq, run_start, counts = np.unique(key, return_index=True, return_counts=True)
    n_runs = len(uniq)
    chunks_per_run = -(-counts // ENTRY_CHUNK)
    chunk_off = np.zeros(n_runs + 1, np.int64)
    np.cumsum(chunks_per_run, out=chunk_off[1:])
    n_chunks = int(chunk_off[-1])

    run_of_entry = np.repeat(np.arange(n_runs), counts)
    within = np.arange(len(rows)) - run_start[run_of_entry]
    chunk_of_entry = chunk_off[run_of_entry] + within // ENTRY_CHUNK
    slot = within % ENTRY_CHUNK

    lr = np.zeros((n_chunks, ENTRY_CHUNK), np.int32)
    lc = np.zeros((n_chunks, ENTRY_CHUNK), np.int32)
    vv = np.zeros((n_chunks, ENTRY_CHUNK), np.float32)
    lr[chunk_of_entry, slot] = (rows % TILE_G).astype(np.int32)
    lc[chunk_of_entry, slot] = (cols % TILE_C).astype(np.int32)
    vv[chunk_of_entry, slot] = vals.astype(np.float32)
    # [n_chunks, C, 1] layout: trailing unit dim == the array dim, so
    # the (1, C, 1) block satisfies Mosaic's last-two-dims rule
    lr = lr[:, :, None]
    lc = lc[:, :, None]
    vv = vv[:, :, None]

    gi_of_chunk = np.repeat(gi[run_start], chunks_per_run).astype(np.int32)
    cj_of_chunk = np.repeat(cj[run_start], chunks_per_run).astype(np.int32)
    new_tile = np.ones(n_chunks, np.int32)
    new_tile[1:] = (cj_of_chunk[1:] != cj_of_chunk[:-1]).astype(np.int32)
    return gi_of_chunk, cj_of_chunk, new_tile, lr, lc, vv


def project_block_tiled(
    basis_dk,  # [D, K] numpy or jax
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    *,
    ncols: int,
    interpret: bool = False,
) -> jax.Array:
    """Mosaic-legal tiled SpMM projection: [ncols, K] = scatter-by-cell
    of basis rows gathered at nonzero gene ids. Matches
    `sparse.project_block` numerically (reordering-level float error)."""
    basis = np.asarray(basis_dk, np.float32)
    d, k = basis.shape
    k_pad = -(-k // 128) * 128
    d_pad = -(-d // TILE_G) * TILE_G
    n_ct = max(-(-ncols // TILE_C), 1)
    basis_p = np.zeros((d_pad, k_pad), np.float32)
    basis_p[:d, :k] = basis

    tiles = prepare_tiles(rows, cols, vals, ncols=ncols)
    if tiles is None:
        return jnp.zeros((ncols, k), jnp.float32)
    out = tiled_call(
        jnp.asarray(tiles["gi"]), jnp.asarray(tiles["cj"]),
        jnp.asarray(tiles["new"]), jnp.asarray(tiles["lr"]),
        jnp.asarray(tiles["lc"]), jnp.asarray(tiles["vv"]),
        jnp.asarray(basis_p), n_ct=n_ct, k_pad=k_pad, interpret=interpret,
    )
    return out[:ncols, :k]


def prepare_tiles(
    rows: np.ndarray, cols: np.ndarray, vals: np.ndarray, *, ncols: int
) -> dict | None:
    """Host half of the tiled SpMM: filter COO padding, bucket into
    fixed chunks, and pad empty cell tiles. The returned dict is the
    exact device input of `tiled_call` — persist it at ingest time
    (data/tile_cache.py) so the hot path never re-buckets."""
    n_ct = max(-(-ncols // TILE_C), 1)
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    real = (cols >= 0) & (cols < ncols)  # drop COO padding slots
    gi, cj, new, lr, lc, vv = bucket_coo_for_tiles(
        rows[real].astype(np.int64), cols[real].astype(np.int64), vals[real]
    )
    if len(gi) == 0:
        return None

    # cell tiles with no nonzeros still need their output block zeroed:
    # give each missing tile one empty chunk (all-padding entries)
    missing = np.setdiff1d(np.arange(n_ct), np.unique(cj))
    if len(missing):
        gi = np.concatenate([gi, np.zeros(len(missing), np.int32)])
        cj = np.concatenate([cj, missing.astype(np.int32)])
        new = np.concatenate([new, np.ones(len(missing), np.int32)])
        lr = np.concatenate([lr, np.zeros((len(missing), ENTRY_CHUNK, 1), np.int32)])
        lc = np.concatenate([lc, np.zeros((len(missing), ENTRY_CHUNK, 1), np.int32)])
        vv = np.concatenate([vv, np.zeros((len(missing), ENTRY_CHUNK, 1), np.float32)])
        order = np.argsort(cj, kind="stable")
        gi, cj, new = gi[order], cj[order], new[order]
        lr, lc, vv = lr[order], lc[order], vv[order]
    return {"gi": gi, "cj": cj, "new": new, "lr": lr, "lc": lc, "vv": vv,
            "ncols": np.int64(ncols)}


def project_tiles(
    basis_dk,
    tiles: dict,
    *,
    log1p: bool = True,
    interpret: bool = False,
    basis_dtype: "jnp.dtype | None" = None,
) -> tuple[jax.Array, jax.Array]:
    """Project prebucketed tiles and return (proj [ncols, K],
    sq_norm [ncols]) — the per-cell squared norms come from the same
    tiled entries (global cell id = cj * TILE_C + lc), so the cached
    path needs no COO arrays at all.

    `basis_dtype=bf16` ships the basis plane (the kernel's dominant
    HBM traffic: one [TILE_G, K] tile per chunk) at half width;
    default on TPU unless `LEGUME_PALLAS_BF16=0`."""
    import os

    if basis_dtype is None:
        basis_dtype = (
            jnp.bfloat16
            if (jax.default_backend() == "tpu"
                and os.environ.get("LEGUME_PALLAS_BF16") != "0")
            else jnp.float32
        )
    basis = np.asarray(basis_dk, np.float32)
    d, k = basis.shape
    ncols = int(tiles["ncols"])
    k_pad = -(-k // 128) * 128
    d_pad = -(-d // TILE_G) * TILE_G
    n_ct = max(-(-ncols // TILE_C), 1)
    basis_p = np.zeros((d_pad, k_pad), np.float32)
    basis_p[:d, :k] = basis
    basis_p = basis_p.astype(basis_dtype)

    vv = jnp.asarray(tiles["vv"])
    if log1p:
        vv = jnp.log1p(vv)
    out = tiled_call(
        jnp.asarray(tiles["gi"]), jnp.asarray(tiles["cj"]),
        jnp.asarray(tiles["new"]), jnp.asarray(tiles["lr"]),
        jnp.asarray(tiles["lc"]), vv,
        jnp.asarray(basis_p), n_ct=n_ct, k_pad=k_pad, interpret=interpret,
    )
    cell_ids = (
        jnp.asarray(tiles["cj"])[:, None, None] * TILE_C + jnp.asarray(tiles["lc"])
    ).reshape(-1)
    sq = jax.ops.segment_sum(
        (vv * vv).reshape(-1), cell_ids, num_segments=n_ct * TILE_C
    )
    return out[:ncols, :k], sq[:ncols]


@partial(jax.jit, static_argnames=("n_ct", "k_pad", "interpret"))
def tiled_call(gi, cj, new, lr, lc, vv, basis_p, *, n_ct, k_pad, interpret=False):
    """The device half of `project_block_tiled` (prebucketed inputs);
    exposed separately so the roofline bench can time it alone."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gi.shape[0],),
        in_specs=[
            pl.BlockSpec((1, ENTRY_CHUNK, 1), lambda i, gi, cj, nw: (i, 0, 0)),
            pl.BlockSpec((1, ENTRY_CHUNK, 1), lambda i, gi, cj, nw: (i, 0, 0)),
            pl.BlockSpec((1, ENTRY_CHUNK, 1), lambda i, gi, cj, nw: (i, 0, 0)),
            pl.BlockSpec((TILE_G, k_pad), lambda i, gi, cj, nw: (gi[i], 0)),
        ],
        out_specs=pl.BlockSpec((TILE_C, k_pad), lambda i, gi, cj, nw: (cj[i], 0)),
    )
    return pl.pallas_call(
        _tiled_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ct * TILE_C, k_pad), jnp.float32),
        interpret=interpret,
    )(gi, cj, new, lr, lc, vv, basis_p)


# ----------------------------------------------------------------------------
# Tiled collapse (per-(gene, group) sums) — the other hot SpMM-like op.
#
# collapse_block's XLA path is a scatter (segment_sum over gene*group
# keys), which serializes on TPU exactly like the projection scatter
# did. Same cure: entries bucket into gene-tile chunks on the host;
# on device the scatter becomes one one-hot MXU matmul per chunk:
#
#   out_tile [TILE_G, GRP] += onehot(local_row)^T @ (vals (.) onehot(group))
#
# The output block is indexed by the gene tile (gi); chunks arrive
# sorted by gi so each [TILE_G, GRP_PAD] block accumulates in VMEM.
# GRP_PAD caps at _COLLAPSE_MAX_GRP to bound VMEM; larger group counts
# fall back to the XLA path.
# ----------------------------------------------------------------------------

TILE_GRP = 128  # groups per output tile (MXU-aligned)

# Entries per collapse chunk. The collapse kernel is GRID-STEP bound,
# not MXU bound: at the roofline shape (8.4M nnz, 607 groups) the
# one-hot matmuls cost ~300 GFLOP ~ 13 ms of MXU time, yet the 1024-
# entry kernel measures 57 ms over ~8.8k sequential grid steps. The
# on-chip sweep (docs/BENCH_NOTES.md round 4): 1024 -> 57.4 ms,
# 1536 -> 21.8 ms (6.6x the XLA segment path; 12 sublanes x 128 is
# the Mosaic layout sweet spot), 2048 -> 74.6 ms, 4096 -> VMEM OOM
# (the two [C, 128] f32 one-hot planes + double buffering exceed the
# 16 MB scoped budget).
import os as _os

COLLAPSE_CHUNK = int(_os.environ.get("LEGUME_COLLAPSE_CHUNK", "1536"))


def _collapse_kernel(gi_ref, gj_ref, new_ref, lr_ref, lg_ref, v_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(new_ref[i] == 1)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    lr = lr_ref[0]  # [C, 1] local gene row in [0, TILE_G)
    lg = lg_ref[0]  # [C, 1] LOCAL group id in [0, TILE_GRP)
    v = v_ref[0]  # [C, 1] values (0 = padding)

    c = lr.shape[0]
    iota_grp = jax.lax.broadcasted_iota(jnp.int32, (c, TILE_GRP), 1)
    oh_grp = jnp.where(iota_grp == lg, v, 0.0)  # [C, TILE_GRP]
    iota_g = jax.lax.broadcasted_iota(jnp.int32, (c, TILE_G), 1)
    oh_g = (iota_g == lr).astype(jnp.float32)  # [C, TILE_G]
    out_ref[:, :] += jax.lax.dot_general(
        oh_g, oh_grp,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def bucket_coo_for_collapse(
    rows: np.ndarray, groups_of_entry: np.ndarray, vals: np.ndarray
) -> dict | None:
    """Host bucketing for the collapse kernel: entries sorted by
    (gene tile, GROUP tile) and split into fixed chunks with LOCAL
    group ids. Tiling the group axis keeps per-chunk MXU work at
    C x TILE_G x TILE_GRP regardless of the total group count, and
    cells arrive pre-sorted by projection codes, so group locality is
    high (few occupied group tiles per gene-tile run)."""
    rows = np.asarray(rows, np.int64)
    grp = np.asarray(groups_of_entry, np.int64)
    gi = rows // TILE_G
    gj = grp // TILE_GRP
    order = np.lexsort((gj, gi))
    rows = rows[order]
    gi, gj = gi[order], gj[order]
    grp = grp[order]
    vals = np.asarray(vals, np.float32)[order]
    if len(rows) == 0:
        return None

    key = gi * (gj.max() + 1) + gj
    uniq, run_start, counts = np.unique(key, return_index=True, return_counts=True)
    chunks_per_run = -(-counts // COLLAPSE_CHUNK)
    chunk_off = np.zeros(len(uniq) + 1, np.int64)
    np.cumsum(chunks_per_run, out=chunk_off[1:])
    n_chunks = int(chunk_off[-1])
    run_of_entry = np.repeat(np.arange(len(uniq)), counts)
    within = np.arange(len(rows)) - run_start[run_of_entry]
    chunk_of_entry = chunk_off[run_of_entry] + within // COLLAPSE_CHUNK
    slot = within % COLLAPSE_CHUNK

    lr = np.zeros((n_chunks, COLLAPSE_CHUNK), np.int32)
    lg = np.zeros((n_chunks, COLLAPSE_CHUNK), np.int32)
    vv = np.zeros((n_chunks, COLLAPSE_CHUNK), np.float32)
    lr[chunk_of_entry, slot] = (rows % TILE_G).astype(np.int32)
    lg[chunk_of_entry, slot] = (grp % TILE_GRP).astype(np.int32)
    vv[chunk_of_entry, slot] = vals
    gi_of_chunk = np.repeat(gi[run_start], chunks_per_run).astype(np.int32)
    gj_of_chunk = np.repeat(gj[run_start], chunks_per_run).astype(np.int32)
    new = np.ones(n_chunks, np.int32)
    new[1:] = (
        (gi_of_chunk[1:] != gi_of_chunk[:-1])
        | (gj_of_chunk[1:] != gj_of_chunk[:-1])
    ).astype(np.int32)
    return {
        "gi": gi_of_chunk, "gj": gj_of_chunk, "new": new,
        "lr": lr[:, :, None], "lg": lg[:, :, None], "vv": vv[:, :, None],
    }


def collapse_tiled_call(gi, gj, new, lr, lg, vv, *, n_gt, n_grpt, interpret=False):
    """Device half of `collapse_block_tiled` (prebucketed inputs)."""
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gi.shape[0],),
        in_specs=[
            pl.BlockSpec((1, COLLAPSE_CHUNK, 1), lambda i, gi, gj, nw: (i, 0, 0)),
            pl.BlockSpec((1, COLLAPSE_CHUNK, 1), lambda i, gi, gj, nw: (i, 0, 0)),
            pl.BlockSpec((1, COLLAPSE_CHUNK, 1), lambda i, gi, gj, nw: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (TILE_G, TILE_GRP), lambda i, gi, gj, nw: (gi[i], gj[i])
        ),
    )
    return pl.pallas_call(
        _collapse_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_gt * TILE_G, n_grpt * TILE_GRP), jnp.float32
        ),
        interpret=interpret,
    )(gi, gj, new, lr, lg, vv)


def collapse_block_tiled(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    seg_of_col: np.ndarray,  # [ncols + 1]; last slot = discard
    *,
    ncols: int,
    num_genes: int,
    num_groups: int,
    interpret: bool = False,
) -> jax.Array | None:
    """Mosaic-legal tiled collapse: [num_genes, num_groups] group sums.
    Matches `sparse.collapse_block`. Group axis is tiled too, so any
    group count fits the VMEM budget."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)
    real = (cols >= 0) & (cols < ncols)
    seg = np.asarray(seg_of_col)[np.clip(cols, 0, len(seg_of_col) - 1)]
    real &= seg < num_groups  # discard slot
    tiles = bucket_coo_for_collapse(rows[real], seg[real], vals[real])
    if tiles is None:
        return jnp.zeros((num_genes, num_groups), jnp.float32)
    n_gt = -(-num_genes // TILE_G)
    n_grpt = max(-(-int(num_groups) // TILE_GRP), 1)
    # zero unvisited output tiles: one all-padding chunk per missing
    # (gene tile, group tile) pair (same trick as project_block_tiled)
    visited = set(zip(tiles["gi"].tolist(), tiles["gj"].tolist()))
    missing = [
        (a, b) for a in range(n_gt) for b in range(n_grpt)
        if (a, b) not in visited
    ]
    if missing:
        ma = np.asarray([m[0] for m in missing], np.int32)
        mb = np.asarray([m[1] for m in missing], np.int32)
        z_entry = np.zeros((len(missing), COLLAPSE_CHUNK, 1), np.int32)
        tiles = {
            "gi": np.concatenate([tiles["gi"], ma]),
            "gj": np.concatenate([tiles["gj"], mb]),
            "new": np.concatenate([tiles["new"], np.ones(len(missing), np.int32)]),
            "lr": np.concatenate([tiles["lr"], z_entry]),
            "lg": np.concatenate([tiles["lg"], z_entry]),
            "vv": np.concatenate([tiles["vv"], z_entry.astype(np.float32)]),
        }
    out = collapse_tiled_call(
        jnp.asarray(tiles["gi"]), jnp.asarray(tiles["gj"]),
        jnp.asarray(tiles["new"]), jnp.asarray(tiles["lr"]),
        jnp.asarray(tiles["lg"]), jnp.asarray(tiles["vv"]),
        n_gt=n_gt, n_grpt=n_grpt, interpret=interpret,
    )
    return out[:num_genes, :num_groups]
