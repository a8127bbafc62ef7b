"""SparseIoVec: a vertical stack of backends presented as one
(features x all-cells) matrix (`data-beans/src/sparse_io_vector/mod.rs:93`).

Carries the registries the collapse/matching layer needs:
- global column -> (backend, local column) locations (mod.rs:33),
- batch membership per cell (batch.rs:46),
- group membership for pseudobulk collapse (groups.rs:39),
- row (feature) alignment across backends (Disjoint/Union canonicalizers,
  mod.rs:41-58).

kNN matching is NOT a per-batch HNSW here: the TPU engine matches cells
with exact on-device chunked top-k over the projected coordinates
(`legume_tpu.ops.knn`), which is deterministic by construction
(SURVEY.md section 7 hard-part 2).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import scipy.sparse as sp

from .sparse_io import SparseBackend


def read_data_on_shared_rows(backends, *, mode: str = "union") -> "SparseIoVec":
    """Stack backends whose feature rows differ, aligning on the union
    (or intersection) of row names
    (`auxiliary-data/src/data_loading.rs:95` equivalent). Backends are
    wrapped in row-remapping views; missing features read as zeros."""
    from .sparse_io import MemoryBackend

    all_names = [b.row_names() for b in backends]
    if mode == "union":
        shared: list[str] = []
        seen = set()
        for names in all_names:
            for nm in names:
                if nm not in seen:
                    seen.add(nm)
                    shared.append(nm)
    else:
        inter = set(all_names[0])
        for names in all_names[1:]:
            inter &= set(names)
        shared = [nm for nm in all_names[0] if nm in inter]

    pos = {nm: i for i, nm in enumerate(shared)}
    vec = SparseIoVec()
    import scipy.sparse as _sp

    for b, names in zip(backends, all_names):
        csc = b.read_columns_csc(np.arange(b.num_columns)).tocoo()
        keep = np.asarray([names[i] in pos for i in range(len(names))])
        row_map = np.asarray([pos.get(nm, -1) for nm in names], dtype=np.int64)
        ok = keep[csc.row]
        remapped = _sp.coo_matrix(
            (csc.data[ok], (row_map[csc.row[ok]], csc.col[ok])),
            shape=(len(shared), b.num_columns),
        ).tocsc()
        vec.push(MemoryBackend(remapped, shared, b.column_names()))
    return vec


class SparseIoVec:
    def __init__(self):
        self._backends: list[SparseBackend] = []
        self._offsets: list[int] = [0]
        self._row_names: list[str] | None = None
        self._batch_membership: np.ndarray | None = None
        self._batch_names: list[str] | None = None
        self._groups: np.ndarray | None = None
        self._num_groups: int = 0

    # ---- stacking -------------------------------------------------------

    def push(self, backend: SparseBackend):
        """Append a backend; feature rows must align with what's already
        stacked (the Disjoint mode of mod.rs:256-330 — Union alignment is
        handled by `data_loading.read_data_on_shared_rows`)."""
        names = backend.row_names()
        if self._row_names is None:
            self._row_names = names
        elif names != self._row_names:
            raise ValueError(
                "backend feature rows disagree with the stack; align/reorder first"
            )
        self._backends.append(backend)
        self._offsets.append(self._offsets[-1] + backend.num_columns)

    @property
    def num_rows(self) -> int:
        return self._backends[0].num_rows if self._backends else 0

    @property
    def num_columns(self) -> int:
        return self._offsets[-1]

    @property
    def shape(self):
        return (self.num_rows, self.num_columns)

    def row_names(self) -> list[str]:
        return list(self._row_names or [])

    def column_names(self) -> list[str]:
        out: list[str] = []
        for i, b in enumerate(self._backends):
            out.extend(f"{n}@{i}" if self._seen_dup else n for n in b.column_names())
        return out

    @property
    def _seen_dup(self) -> bool:
        return len(self._backends) > 1

    def backend_location(self, j: int) -> tuple[int, int]:
        """Global column -> (backend index, local column) (mod.rs:33)."""
        b = int(np.searchsorted(self._offsets, j, side="right")) - 1
        return b, j - self._offsets[b]

    # ---- reads ----------------------------------------------------------

    def read_columns_csc(self, columns: Sequence[int] | np.ndarray) -> sp.csc_matrix:
        cols = np.asarray(columns, dtype=np.int64)
        if len(self._backends) == 1:
            return self._backends[0].read_columns_csc(cols)
        which = np.searchsorted(self._offsets, cols, side="right") - 1
        pieces = []
        order = []
        for b_idx in range(len(self._backends)):
            m = which == b_idx
            if not m.any():
                continue
            local = cols[m] - self._offsets[b_idx]
            pieces.append(self._backends[b_idx].read_columns_csc(local))
            order.append(np.nonzero(m)[0])
        stacked = sp.hstack(pieces, format="csc")
        perm = np.concatenate(order)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        return stacked[:, inv]

    def read_columns_dense(self, columns) -> np.ndarray:
        return np.asarray(self.read_columns_csc(columns).todense())

    def column_nnz(self) -> np.ndarray:
        """Per-column nnz over the whole stack (metadata only; drives
        nnz-balanced multi-host shard planning)."""
        from ..parallel.multihost import column_nnz as _nnz

        return np.concatenate([_nnz(b) for b in self._backends])

    # ---- batch registry (batch.rs:46) -----------------------------------

    def register_batches(self, membership: Sequence[str] | np.ndarray):
        memb = np.asarray(membership)
        if len(memb) != self.num_columns:
            raise ValueError("batch membership length != total cells")
        names, codes = np.unique(memb, return_inverse=True)
        self._batch_names = [str(x) for x in names]
        self._batch_membership = codes.astype(np.int32)

    @property
    def num_batches(self) -> int:
        return len(self._batch_names) if self._batch_names else 1

    def batch_membership(self) -> np.ndarray:
        if self._batch_membership is None:
            return np.zeros(self.num_columns, dtype=np.int32)
        return self._batch_membership

    def batch_names(self) -> list[str]:
        return list(self._batch_names or ["0"])

    # ---- group (pseudobulk) registry (groups.rs:39) ----------------------

    def assign_groups(self, groups: np.ndarray, num_groups: int | None = None):
        groups = np.asarray(groups, dtype=np.int32)
        if len(groups) != self.num_columns:
            raise ValueError("group assignment length != total cells")
        self._groups = groups
        self._num_groups = int(num_groups if num_groups is not None else groups.max() + 1)

    @property
    def num_groups(self) -> int:
        return self._num_groups

    def groups(self) -> np.ndarray:
        if self._groups is None:
            raise ValueError("no group assignment registered")
        return self._groups

    def cells_per_group(self) -> list[np.ndarray]:
        g = self.groups()
        order = np.argsort(g, kind="stable")
        sorted_g = g[order]
        bounds = np.searchsorted(sorted_g, np.arange(self._num_groups + 1))
        return [order[bounds[s] : bounds[s + 1]] for s in range(self._num_groups)]

    # ---- column block jobs ----------------------------------------------

    def column_blocks(self, block_size: int) -> list[tuple[int, int]]:
        n = self.num_columns
        return [(lb, min(lb + block_size, n)) for lb in range(0, n, block_size)]

    # ---- QC subsetting ---------------------------------------------------

    def subset_columns(self, keep: np.ndarray) -> "ColumnSubsetVec":
        """View over the kept columns (QC keep mask; the reference
        applies `compute_qc_stack`'s mask before projection,
        `topic/common.rs` load_and_project / `qc_lib.rs:297`)."""
        return ColumnSubsetVec(self, np.asarray(keep))


class ColumnSubsetVec:
    """Column-subset view of a SparseIoVec (or any backend-like): the
    QC keep mask applied lazily at read time — nothing is rewritten."""

    def __init__(self, base, keep: np.ndarray):
        keep = np.asarray(keep)
        if keep.dtype == bool:
            self._idx = np.nonzero(keep)[0].astype(np.int64)
        else:
            self._idx = keep.astype(np.int64)
        self._base = base

    @property
    def kept_indices(self) -> np.ndarray:
        return self._idx

    @property
    def num_rows(self) -> int:
        return self._base.num_rows

    @property
    def num_columns(self) -> int:
        return len(self._idx)

    @property
    def shape(self):
        return (self.num_rows, self.num_columns)

    def row_names(self):
        return self._base.row_names()

    def column_names(self):
        names = self._base.column_names()
        return [names[j] for j in self._idx]

    def read_columns_csc(self, columns) -> sp.csc_matrix:
        return self._base.read_columns_csc(self._idx[np.asarray(columns, np.int64)])

    def read_columns_dense(self, columns) -> np.ndarray:
        return np.asarray(self.read_columns_csc(columns).todense())

    def column_nnz(self) -> np.ndarray:
        from ..parallel.multihost import column_nnz as _nnz

        return _nnz(self._base)[self._idx]

    @property
    def num_batches(self) -> int:
        return getattr(self._base, "num_batches", 1)

    def batch_membership(self) -> np.ndarray:
        return self._base.batch_membership()[self._idx]

    def batch_names(self):
        return self._base.batch_names()

    def column_blocks(self, block_size: int) -> list[tuple[int, int]]:
        n = self.num_columns
        return [(lb, min(lb + block_size, n)) for lb in range(0, n, block_size)]

    def subset_columns(self, keep: np.ndarray) -> "ColumnSubsetVec":
        """Compose subsets (QC mask then a per-process column range):
        the indices flatten onto the base so reads stay one hop."""
        keep = np.asarray(keep)
        idx = np.nonzero(keep)[0] if keep.dtype == bool else keep
        return ColumnSubsetVec(self._base, self._idx[idx.astype(np.int64)])
