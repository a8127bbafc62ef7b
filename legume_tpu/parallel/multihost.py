"""Multi-host / multi-chip streaming reductions.

The survey's north-star layout (SURVEY.md section 2.7 / 5): cells
shard across hosts — EACH PROCESS READS ONLY ITS OWN column shards of
the zarr backends — genes replicated; sufficient statistics merge with
`psum` over ICI. Three pieces:

- `maybe_initialize_distributed`: `jax.distributed.initialize`
  plumbing behind env/CLI switches (`LEGUME_COORDINATOR` etc.);
- `plan_column_shards`: nnz-balanced contiguous column split so every
  device decodes a similar number of nonzeros (the reference's rayon
  blocks are uniform-width because its visitor is shared-memory;
  across hosts unbalanced nnz = stragglers);
- `collapse_observed_multihost`: per-process local shard reads →
  `jax.make_array_from_single_device_arrays` over the global mesh →
  one `shard_map` + `psum` reduction. Single-process virtual meshes
  and true multi-process runs take the same code path (the process
  view is injectable for tests and the driver's dryrun stage).
"""

from __future__ import annotations

import logging
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

log = logging.getLogger(__name__)


# ----------------------------------------------------------------------------
# jax.distributed plumbing
# ----------------------------------------------------------------------------


def maybe_initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize `jax.distributed` when configured; no-op otherwise.

    Switches (env, overridable by args): `LEGUME_COORDINATOR`
    (host:port), `LEGUME_NUM_PROCESSES`, `LEGUME_PROCESS_ID`. On TPU
    pods where the runtime provides cluster discovery, setting only
    `LEGUME_DISTRIBUTED=1` calls `initialize()` with no arguments.
    Returns True when a multi-process runtime is active after the call.
    """
    try:  # already initialized? (must not touch the XLA backend here)
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return True
    except Exception:
        pass
    coordinator = coordinator or os.environ.get("LEGUME_COORDINATOR")
    n = num_processes if num_processes is not None else os.environ.get("LEGUME_NUM_PROCESSES")
    pid = process_id if process_id is not None else os.environ.get("LEGUME_PROCESS_ID")
    if coordinator and n is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(n),
            process_id=int(pid),
        )
        log.info(
            "jax.distributed initialized: process %d/%d via %s",
            jax.process_index(), jax.process_count(), coordinator,
        )
        return True
    if os.environ.get("LEGUME_DISTRIBUTED") == "1":
        jax.distributed.initialize()
        return True
    return False


# ----------------------------------------------------------------------------
# nnz-balanced shard planning
# ----------------------------------------------------------------------------


def column_nnz(vec) -> np.ndarray:
    """Per-column nonzero counts from backend metadata (indptr diff —
    no data reads; `sparse_io/traits.rs:845-848` caches the same)."""
    if hasattr(vec, "column_nnz"):
        out = vec.column_nnz()
        if out is not None:
            return np.asarray(out, np.int64)
    if hasattr(vec, "_backends"):  # SparseIoVec
        return np.concatenate([column_nnz(b) for b in vec._backends])
    if hasattr(vec, "_column_indptr"):
        ptr = vec._column_indptr()
        return np.diff(ptr).astype(np.int64)
    if hasattr(vec, "_csc"):
        return np.diff(vec._csc.indptr).astype(np.int64)
    raise TypeError(f"cannot derive per-column nnz from {type(vec)!r}")


def plan_column_shards(col_nnz: np.ndarray, n_shards: int) -> np.ndarray:
    """Contiguous [n_shards+1] column bounds balancing total nnz per
    shard (prefix-sum split at equal-mass targets). Columns stay in
    order so every shard is one ranged zarr read per chunk run."""
    col_nnz = np.asarray(col_nnz, np.int64)
    n = len(col_nnz)
    if n_shards >= n:
        # degenerate: at most one column per shard
        bounds = np.concatenate([np.arange(n + 1), np.full(n_shards - n, n)])
        return bounds.astype(np.int64)
    # weight empty columns slightly so all-zero stretches still spread
    w = col_nnz.astype(np.float64) + 1e-3
    cum = np.concatenate([[0.0], np.cumsum(w)])
    targets = cum[-1] * np.arange(1, n_shards) / n_shards
    cuts = np.searchsorted(cum, targets, side="left")
    bounds = np.concatenate([[0], cuts, [n]]).astype(np.int64)
    # enforce monotonicity (possible ties on pathological inputs)
    np.maximum.accumulate(bounds, out=bounds)
    return bounds


# ----------------------------------------------------------------------------
# sharded collapse reduction
# ----------------------------------------------------------------------------


def _reduce_shard_fn(mesh, num_genes: int, num_groups: int):
    @partial(
        jax.shard_map,
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

    return reduce_shard


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
    """observed_sum_ds [D, S] reduced across all shards with one psum
    (single-process form: the full stacked arrays exist locally)."""
    out = _reduce_shard_fn(mesh, num_genes, num_groups)(
        jnp.asarray(row_ids), jnp.asarray(col_ids), jnp.asarray(vals),
        jnp.asarray(seg_of_col),
    )
    return np.asarray(out)


def _local_shard_ids(
    n_dev: int, process_index: int, num_processes: int
) -> list[int]:
    """Shard s lives on mesh device s; contiguous blocks per process."""
    per = n_dev // num_processes
    assert per * num_processes == n_dev, "mesh size must divide by process count"
    return list(range(process_index * per, (process_index + 1) * per))


def collapse_observed_multihost(
    vec,
    groups: np.ndarray,  # [N] pseudobulk assignment per cell
    mesh,
    *,
    num_groups: int | None = None,
    block_size: int = 8192,
    nnz_balanced: bool = True,
    process_index: int | None = None,
    num_processes: int | None = None,
    read_log: list | None = None,
) -> np.ndarray:
    """Stream a zarr/h5 backend into per-device column shards and
    reduce observed pseudobulk sums with one psum — the multi-host
    topic-pipeline collapse path (SURVEY.md section 2.7).

    Each mesh device owns one contiguous, nnz-balanced column (cell)
    range, and THIS PROCESS ONLY READS the ranges of its own devices
    (`jax.local_devices()`); the global array assembles from the
    single-device shards, so the zarr/h5 I/O is split across hosts.
    `num_groups` must agree across processes — pass it explicitly when
    the caller's group space can exceed `groups.max()+1`
    (trailing empty pseudobulks would otherwise shrink the plane).

    `process_index`/`num_processes` default to the live jax process
    view; tests and the driver dryrun inject a simulated view to
    assert read isolation (`read_log` collects the (lb, ub) column
    ranges actually read).
    """
    d = vec.num_rows
    n = vec.num_columns
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if num_groups is None:
        num_groups = int(groups.max()) + 1

    simulated = process_index is not None or num_processes is not None
    p_idx = jax.process_index() if process_index is None else int(process_index)
    p_cnt = jax.process_count() if num_processes is None else int(num_processes)

    # ---- global shard plan (metadata only, identical on all hosts) ----
    if nnz_balanced:
        nnz_per_col = column_nnz(vec)
        bounds = plan_column_shards(nnz_per_col, n_dev)
        shard_nnz = np.asarray(
            [int(nnz_per_col[bounds[s] : bounds[s + 1]].sum()) for s in range(n_dev)]
        )
    else:
        bounds = np.linspace(0, n, n_dev + 1).astype(np.int64)
        nnz_per_col = None
        shard_nnz = None
    shard_cols = np.diff(bounds)
    max_cols = max(int(shard_cols.max()), 1)
    if shard_nnz is not None:
        max_nnz = max(int(shard_nnz.max()), 1)
    else:
        max_nnz = None  # discovered from local reads; see below

    # ---- local reads only -------------------------------------------------
    local_ids = _local_shard_ids(n_dev, p_idx, p_cnt)
    local_coo = {}
    local_max_nnz = 1
    for s in local_ids:
        lb, ub = int(bounds[s]), int(bounds[s + 1])
        rows_l, cols_l, vals_l = [], [], []
        for blk_lb in range(lb, ub, block_size):
            blk_ub = min(blk_lb + block_size, ub)
            if read_log is not None:
                read_log.append((blk_lb, blk_ub))
            coo = vec.read_columns_csc(np.arange(blk_lb, blk_ub)).tocoo()
            rows_l.append(coo.row.astype(np.int32))
            cols_l.append((coo.col + (blk_lb - lb)).astype(np.int32))
            vals_l.append(coo.data.astype(np.float32))
        r = np.concatenate(rows_l) if rows_l else np.zeros(0, np.int32)
        c = np.concatenate(cols_l) if cols_l else np.zeros(0, np.int32)
        v = np.concatenate(vals_l) if vals_l else np.zeros(0, np.float32)
        local_coo[s] = (r, c, v, ub - lb, groups[lb:ub])
        local_max_nnz = max(local_max_nnz, len(r))
    if max_nnz is None:
        # without metadata the nnz pad is only known locally; uniform
        # split keeps it consistent enough but balanced mode is exact
        max_nnz = local_max_nnz

    if simulated and p_cnt > 1:
        # simulated multi-process view on a single-process mesh: return
        # this process's partial (caller sums partials to check both
        # coverage and isolation) — the live path below needs every
        # mesh device addressable
        partial_sum = np.zeros((d, num_groups), np.float32)
        for s in local_ids:
            r, c, v, _, g = local_coo[s]
            np.add.at(partial_sum, (r, g[c]), v)
        return partial_sum

    # ---- assemble the global sharded arrays -------------------------------
    mesh_devs = list(np.asarray(mesh.devices).reshape(-1))
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def build(per_shard):
        pieces, width = [], 1
        for s in local_ids:
            arr = per_shard(s)
            width = arr.shape[0]
            pieces.append(jax.device_put(arr[None, :], mesh_devs[s]))
        return jax.make_array_from_single_device_arrays(
            (n_dev, width), sharding, pieces
        )

    def rows_of(s):
        r = np.zeros(max_nnz, np.int32)
        r[: len(local_coo[s][0])] = local_coo[s][0]
        return r

    def cols_of(s):
        c = np.full(max_nnz, max_cols, np.int32)
        c[: len(local_coo[s][1])] = local_coo[s][1]
        return c

    def vals_of(s):
        v = np.zeros(max_nnz, np.float32)
        v[: len(local_coo[s][2])] = local_coo[s][2]
        return v

    def segs_of(s):
        seg = np.full(max_cols + 1, num_groups, np.int32)
        ncols, g = local_coo[s][3], local_coo[s][4]
        seg[:ncols] = g
        return seg

    rows = build(rows_of)
    cols = build(cols_of)
    vals = build(vals_of)
    segs = build(segs_of)
    out = _reduce_shard_fn(mesh, d, num_groups)(rows, cols, vals, segs)
    return np.asarray(out)


class DistContext:
    """Process-level sharding context for the streaming pipeline.

    The whole `senna topic` call stack (SURVEY.md section 3.1) runs
    under one of these when `jax.distributed` is live: each process
    streams ONLY its own nnz-balanced contiguous column (cell) range
    through projection / QC / stat collection / latent eval, and the
    tiny cross-process syncs are explicit —

    - `allgather_rows`: per-cell planes (raw projection, latents)
      concatenate in process order so every host sees the global
      ensemble (the binary sort + centering moments are global
      statistics);
    - `reduce_sums` / `reduce_stat`: [D, S] sufficient-statistic
      planes sum across processes (the psum of the north-star layout).

    The matched-stat pass is the one deliberate exception to read
    isolation: kNN partners live on arbitrary shards, so each process
    reads its OWN queries' partner columns wherever they are (zarr on
    shared storage); the per-query work — the expensive part — still
    splits evenly.
    """

    def __init__(self, process_index: int, process_count: int):
        self.process_index = int(process_index)
        self.process_count = int(process_count)

    @classmethod
    def detect(cls) -> "DistContext | None":
        """A live context iff jax runs multi-process."""
        if jax.process_count() > 1:
            return cls(jax.process_index(), jax.process_count())
        return None

    @property
    def primary(self) -> bool:
        return self.process_index == 0

    # -- column plan ---------------------------------------------------

    def column_bounds(self, vec) -> np.ndarray:
        """Per-PROCESS contiguous nnz-balanced bounds [P+1]."""
        return plan_column_shards(column_nnz(vec), self.process_count)

    def local_range(self, bounds: np.ndarray) -> tuple[int, int]:
        return int(bounds[self.process_index]), int(bounds[self.process_index + 1])

    def local_view(self, vec, bounds: np.ndarray):
        """This process's column-range view (a contiguous
        `ColumnSubsetVec`: reads stay inside the local range)."""
        lb, ub = self.local_range(bounds)
        keep = np.zeros(vec.num_columns, bool)
        keep[lb:ub] = True
        return vec.subset_columns(keep)

    # -- collectives -----------------------------------------------------

    def allgather_rows(self, local: np.ndarray, bounds: np.ndarray) -> np.ndarray:
        """Concatenate per-process row blocks into the global [N, ...]
        array on every process (pad to the max shard, gather, slice)."""
        from jax.experimental import multihost_utils as mhu

        local = np.asarray(local)
        widths = np.diff(bounds)
        lb, ub = self.local_range(bounds)
        assert local.shape[0] == ub - lb, (local.shape, lb, ub)
        max_w = max(int(widths.max()), 1)
        padded = np.zeros((max_w,) + local.shape[1:], local.dtype)
        padded[: local.shape[0]] = local
        stacked = np.asarray(mhu.process_allgather(padded))  # [P, max_w, ...]
        return np.concatenate(
            [stacked[p, : widths[p]] for p in range(self.process_count)], axis=0
        )

    def reduce_sums(self, *arrays: np.ndarray) -> list[np.ndarray]:
        """Elementwise sum of same-shaped per-process partials."""
        from jax.experimental import multihost_utils as mhu

        out = []
        for a in arrays:
            a = np.asarray(a)
            g = np.asarray(mhu.process_allgather(a))  # [P, ...]
            out.append(g.sum(axis=0).astype(a.dtype))
        return out

    def reduce_stat(self, stat):
        """Sum every plane of a `CollapsedStat` across processes."""
        (
            stat.observed_sum_ds,
            stat.imputed_sum_ds,
            stat.residual_sum_ds,
            stat.size_s,
            stat.observed_sum_db,
            stat.n_bs,
        ) = self.reduce_sums(
            stat.observed_sum_ds,
            stat.imputed_sum_ds,
            stat.residual_sum_ds,
            stat.size_s,
            stat.observed_sum_db,
            stat.n_bs,
        )
        return stat


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
