"""Streaming column-block visitors (sparse_data_visitors.rs equivalent).

The reference pattern is `visit_columns_by_block(visitor, shared_in,
Arc<Mutex<shared_out>>, block_size)` — rayon threads race over column
blocks into a mutex'd accumulator (`sparse_data_visitors.rs:9-43`).

The TPU-native pattern inverts it: host threads only do I/O (zarr chunk
decode + padded-COO packing), while ALL accumulation happens on device
inside jitted segment reductions. A bounded prefetch queue overlaps the
next block's disk read with the current block's device compute — the
overlap the survey flags as load-bearing for the matched-read path
(SURVEY.md section 7 hard-part 2).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Iterator, Sequence

import numpy as np
import scipy.sparse as sp


class CooBlock:
    """A padded COO slab of `ncols` cells, device-ready.

    Static-shape contract: `row_ids/col_ids/vals` are padded to a bucket
    size so XLA compiles one kernel per bucket, not per block
    (SURVEY.md section 7 hard-part 1). Padding rows carry `col_id =
    ncols` (one past the last real cell) and `val = 0`, so a
    segment-sum with `num_segments = ncols + 1` lands all padding in a
    discard slot.

    `col_ids` is LAZY: the canonical storage is `col_counts` (int32
    [ncols] real entries per cell), from which device paths rebuild the
    padded id vector with `jnp.repeat` in-kernel — shipping [ncols]
    ints instead of [nnz_pad] cuts a third of the wire bytes, and this
    host builds the expanded vector at ~100 MB/s (measured: seconds per
    pass at 27M nnz). Legacy consumers touching `.col_ids` get the host
    expansion, built once and cached.
    """

    __slots__ = ("lb", "ncols", "row_ids", "vals", "col_counts", "_col_ids")

    def __init__(self, lb, ncols, row_ids, vals, col_counts, col_ids=None):
        self.lb = lb  # global column offset of this block
        self.ncols = ncols  # real cells in this block
        self.row_ids = row_ids  # int32 [nnz_pad] gene ids
        self.vals = vals  # float32 [nnz_pad]
        self.col_counts = col_counts  # int32 [ncols] entries per cell
        self._col_ids = col_ids

    @property
    def col_ids(self) -> np.ndarray:
        """int32 [nnz_pad] local cell ids; `ncols` marks padding."""
        if self._col_ids is None:
            cap = len(self.row_ids)
            nnz = int(self.col_counts.sum())
            out = np.full(cap, self.ncols, dtype=np.int32)
            out[:nnz] = np.repeat(
                np.arange(self.ncols, dtype=np.int32), self.col_counts
            )
            self._col_ids = out
        return self._col_ids

    @property
    def nnz(self) -> int:
        return int(self.col_counts.sum())


def bucket_size(nnz: int, quantum: int = 1 << 16) -> int:
    """Round nnz up to a power-of-two multiple of `quantum` so the set of
    compiled shapes stays tiny (avoids the recompilation storms the
    survey warns about)."""
    if nnz <= quantum:
        return quantum
    # next power of two times quantum
    b = quantum
    while b < nnz:
        b <<= 1
    return b


def csc_to_coo_block(csc: sp.csc_matrix, lb: int = 0, pad_to: int | None = None) -> CooBlock:
    """Pack a [D, B] CSC slab into a padded COO block (no `tocoo`
    expansion: CSC indices ARE the row ids, and the column side rides
    as per-cell counts — see CooBlock's lazy col_ids contract)."""
    if not sp.issparse(csc) or csc.format != "csc":
        csc = sp.csc_matrix(csc)
    nnz = csc.nnz
    ncols = csc.shape[1]
    cap = pad_to if pad_to is not None else bucket_size(nnz)
    # narrow wire dtypes: the tunnel moves ~20 MB/s sustained, so the
    # block bytes ARE the streaming-pass wall time at scale (1M-cell
    # teardown, BENCH_NOTES). Row ids fit uint16 when D < 64k; count
    # values ship uint8/uint16 when losslessly representable. Device
    # primitives (ops/sparse.py) cast to int32/f32 at entry.
    row_dt = np.uint16 if csc.shape[0] < 65536 else np.int32
    row_ids = np.zeros(cap, dtype=row_dt)
    row_ids[:nnz] = csc.indices[:nnz].astype(row_dt, copy=False)
    data = csc.data[:nnz]
    val_dt = np.float32
    if data.size:
        if data.dtype.kind in "iu":
            mx = int(data.max())
            if data.min() >= 0 and mx < 65536:
                val_dt = np.uint8 if mx < 256 else np.uint16
        elif data.dtype in (np.float32, np.float64):
            mx = float(data.max())
            if float(data.min()) >= 0.0 and mx < 65536.0:
                dt = np.uint8 if mx < 256.0 else np.uint16
                cast = data.astype(dt)
                if np.array_equal(cast, data):  # lossless integral
                    data, val_dt = cast, dt
    vals = np.zeros(cap, dtype=val_dt)
    vals[:nnz] = data.astype(val_dt, copy=False)
    col_counts = np.diff(csc.indptr).astype(np.int32)
    return CooBlock(
        lb=lb, ncols=ncols, row_ids=row_ids, vals=vals, col_counts=col_counts
    )


def visit_columns_by_block(
    data,
    block_size: int = 8192,
    *,
    as_coo: bool = True,
    prefetch: int = 2,
    columns: np.ndarray | None = None,
) -> Iterator[CooBlock] | Iterator[tuple[int, sp.csc_matrix]]:
    """Yield column blocks with threaded prefetch.

    `data` is anything with `read_columns_csc` + `num_columns`
    (a backend or a `SparseIoVec`). With `as_coo` (default) yields
    device-ready `CooBlock`s; otherwise `(lb, csc)` tuples.
    """
    n = data.num_columns if columns is None else len(columns)
    jobs = [(lb, min(lb + block_size, n)) for lb in range(0, n, block_size)]

    def load(job):
        lb, ub = job
        cols = np.arange(lb, ub) if columns is None else columns[lb:ub]
        csc = data.read_columns_csc(cols)
        if as_coo:
            return csc_to_coo_block(csc, lb=lb)
        return (lb, csc)

    from ..utils.progress import progress

    with cf.ThreadPoolExecutor(max_workers=max(prefetch, 1)) as pool, progress.stage(
        "stream-columns", total=len(jobs)
    ) as stage:
        pending = [pool.submit(load, j) for j in jobs[:prefetch]]
        next_job = prefetch
        for _ in range(len(jobs)):
            fut = pending.pop(0)
            if next_job < len(jobs):
                pending.append(pool.submit(load, jobs[next_job]))
                next_job += 1
            stage.update()
            yield fut.result()


def visit_columns_by_group(
    data,
    cells_per_group: Sequence[np.ndarray],
    *,
    as_coo: bool = True,
    prefetch: int = 2,
):
    """Yield `(group_index, block)` per pseudobulk group
    (`visit_columns_by_group`, sparse_data_visitors.rs:60)."""

    def load(item):
        s, cells = item
        csc = data.read_columns_csc(cells)
        if as_coo:
            return s, csc_to_coo_block(csc, lb=0)
        return s, csc

    items = list(enumerate(cells_per_group))
    with cf.ThreadPoolExecutor(max_workers=max(prefetch, 1)) as pool:
        pending = [pool.submit(load, it) for it in items[:prefetch]]
        next_job = prefetch
        for _ in range(len(items)):
            fut = pending.pop(0)
            if next_job < len(items):
                pending.append(pool.submit(load, items[next_job]))
                next_job += 1
            yield fut.result()
