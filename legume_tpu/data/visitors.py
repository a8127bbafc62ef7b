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
from dataclasses import dataclass
from typing import Callable, Iterator, Sequence

import numpy as np
import scipy.sparse as sp


@dataclass(frozen=True)
class CooBlock:
    """A padded COO slab of `ncols` cells, device-ready.

    Static-shape contract: `row_ids/col_ids/vals` are padded to a bucket
    size so XLA compiles one kernel per bucket, not per block
    (SURVEY.md section 7 hard-part 1). Padding rows carry `col_id =
    ncols` (one past the last real cell) and `val = 0`, so a
    segment-sum with `num_segments = ncols + 1` lands all padding in a
    discard slot.
    """

    lb: int  # global column offset of this block
    ncols: int  # real cells in this block
    row_ids: np.ndarray  # int32 [nnz_pad] gene ids
    col_ids: np.ndarray  # int32 [nnz_pad] local cell ids; ncols = padding
    vals: np.ndarray  # float32 [nnz_pad]

    @property
    def nnz(self) -> int:
        return int((self.col_ids < self.ncols).sum())


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
    """Pack a [D, B] CSC slab into a padded COO block."""
    coo = csc.tocoo()
    nnz = coo.nnz
    ncols = csc.shape[1]
    cap = pad_to if pad_to is not None else bucket_size(nnz)
    row_ids = np.full(cap, 0, dtype=np.int32)
    col_ids = np.full(cap, ncols, dtype=np.int32)
    vals = np.zeros(cap, dtype=np.float32)
    row_ids[:nnz] = coo.row.astype(np.int32)
    col_ids[:nnz] = coo.col.astype(np.int32)
    vals[:nnz] = coo.data.astype(np.float32)
    return CooBlock(lb=lb, ncols=ncols, row_ids=row_ids, col_ids=col_ids, vals=vals)


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
