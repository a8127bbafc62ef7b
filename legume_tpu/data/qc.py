"""Cell QC (data-beans `qc_lib.rs:45-501` equivalent).

Streaming per-cell statistics (total counts, genes detected, mito
fraction) with a robust MAD-outlier keep rule and a QC report table.
Accumulation rides the device segment ops per block.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .visitors import visit_columns_by_block
from ..ops import sparse as sparse_ops

MITO_PREFIXES = ("MT-", "mt-", "Mt-")


@dataclass
class CellQcStats:
    total: np.ndarray  # [N] total counts
    n_genes: np.ndarray  # [N] genes detected
    mito_frac: np.ndarray  # [N]

    def keep_mask(
        self,
        *,
        min_total: float = 0.0,
        min_genes: int = 0,
        max_mito_frac: float = 1.0,
        nmads: float = 5.0,
    ) -> np.ndarray:
        """Robust-outlier keep rule (qc_lib.rs keep rule): hard floors +
        log-scale MAD fences on total counts and genes detected."""
        keep = (
            (self.total >= min_total)
            & (self.n_genes >= min_genes)
            & (self.mito_frac <= max_mito_frac)
        )

        def mad_fence(x):
            lx = np.log1p(x)
            med = np.median(lx)
            mad = np.median(np.abs(lx - med)) * 1.4826
            if mad <= 0:
                return np.ones_like(x, bool)
            return np.abs(lx - med) <= nmads * mad

        return keep & mad_fence(self.total) & mad_fence(self.n_genes)

    def report(self) -> dict:
        return {
            "n_cells": len(self.total),
            "median_total": float(np.median(self.total)),
            "median_genes": float(np.median(self.n_genes)),
            "median_mito_frac": float(np.median(self.mito_frac)),
        }


def compute_cell_qc(data, *, block_size: int = 8192) -> CellQcStats:
    n = data.num_columns
    names = data.row_names()
    mito = np.asarray(
        [any(str(g).startswith(p) for p in MITO_PREFIXES) for g in names], bool
    )
    mito_ids = np.nonzero(mito)[0]

    total = np.zeros(n, np.float32)
    n_genes = np.zeros(n, np.float32)
    mito_total = np.zeros(n, np.float32)
    for blk in visit_columns_by_block(data, block_size=block_size):
        cols = sparse_ops.block_col_ids(blk)
        vals = jnp.asarray(blk.vals)
        t = sparse_ops.block_col_sums(cols, vals, ncols=blk.ncols)
        g = sparse_ops.block_col_sums(
            cols, (vals != 0).astype(jnp.float32), ncols=blk.ncols
        )
        total[blk.lb : blk.lb + blk.ncols] = np.asarray(t)
        n_genes[blk.lb : blk.lb + blk.ncols] = np.asarray(g)
        if len(mito_ids):
            is_mito = jnp.asarray(mito)[jnp.asarray(blk.row_ids)]
            mt = sparse_ops.block_col_sums(
                cols, jnp.where(is_mito, vals, 0.0), ncols=blk.ncols
            )
            mito_total[blk.lb : blk.lb + blk.ncols] = np.asarray(mt)
    return CellQcStats(
        total=total,
        n_genes=n_genes,
        mito_frac=mito_total / np.maximum(total, 1.0),
    )
