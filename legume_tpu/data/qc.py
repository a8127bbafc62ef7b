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
    ribo_frac: "np.ndarray | None" = None  # [N] (when a ribo pattern matched)
    feature_cells: "np.ndarray | None" = None  # [D] cells expressing each gene

    def keep_mask(
        self,
        *,
        min_total: float = 0.0,
        min_genes: int = 0,
        max_mito_frac: float = 1.0,
        max_ribo_frac: float = 1.0,
        nmads: float = 5.0,
        mad_on_counts: bool = True,
        mad_on_genes: bool = True,
    ) -> np.ndarray:
        """Robust-outlier keep rule (qc_lib.rs keep rule): hard floors +
        log-scale MAD fences on total counts and genes detected
        (qc_mads / qc_mad_on_counts / qc_mad_on_genes)."""
        keep = (
            (self.total >= min_total)
            & (self.n_genes >= min_genes)
            & (self.mito_frac <= max_mito_frac)
        )
        if self.ribo_frac is not None and max_ribo_frac < 1.0:
            keep &= self.ribo_frac <= max_ribo_frac

        def mad_fence(x):
            lx = np.log1p(x)
            med = np.median(lx)
            mad = np.median(np.abs(lx - med)) * 1.4826
            if mad <= 0:
                return np.ones_like(x, bool)
            return np.abs(lx - med) <= nmads * mad

        if mad_on_counts:
            keep &= mad_fence(self.total)
        if mad_on_genes:
            keep &= mad_fence(self.n_genes)
        return keep

    def feature_keep_mask(self, min_cells: int = 0) -> "np.ndarray | None":
        """Gene-side keep rule over ALL streamed cells; for the
        kept-cells contract (qc_feature_min_cells) use
        `feature_cells_kept` with the keep mask."""
        if self.feature_cells is None:
            return None
        return self.feature_cells >= min_cells

    def report(self) -> dict:
        doc = {
            "n_cells": len(self.total),
            "median_total": float(np.median(self.total)),
            "median_genes": float(np.median(self.n_genes)),
            "median_mito_frac": float(np.median(self.mito_frac)),
        }
        if self.ribo_frac is not None:
            doc["median_ribo_frac"] = float(np.median(self.ribo_frac))
        return doc


def compute_cell_qc(
    data,
    *,
    block_size: int = 8192,
    mito_pattern: "str | None" = None,  # regex (qc_lib.rs qc_mito_pattern)
    ribo_pattern: "str | None" = None,  # regex (qc_ribo_pattern)
    with_feature_cells: bool = False,  # extra per-gene pass; only
    # `data-beans qc --feature-min-cells` consumes it
) -> CellQcStats:
    import re

    n = data.num_columns
    d = data.num_rows
    names = data.row_names()
    if mito_pattern:
        mre = re.compile(mito_pattern)
        mito = np.asarray([bool(mre.search(str(g))) for g in names], bool)
    else:
        mito = np.asarray(
            [any(str(g).startswith(p) for p in MITO_PREFIXES) for g in names], bool
        )
    ribo = None
    if ribo_pattern:
        rre = re.compile(ribo_pattern)
        ribo = np.asarray([bool(rre.search(str(g))) for g in names], bool)
    mito_ids = np.nonzero(mito)[0]

    total = np.zeros(n, np.float32)
    n_genes = np.zeros(n, np.float32)
    mito_total = np.zeros(n, np.float32)
    ribo_total = np.zeros(n, np.float32) if ribo is not None else None
    feature_cells = np.zeros(d, np.float64)
    for blk in visit_columns_by_block(data, block_size=block_size):
        cols = sparse_ops.block_col_ids(blk)
        vals = jnp.asarray(blk.vals)
        t = sparse_ops.block_col_sums(cols, vals, ncols=blk.ncols)
        nz = (vals != 0).astype(jnp.float32)
        g = sparse_ops.block_col_sums(cols, nz, ncols=blk.ncols)
        total[blk.lb : blk.lb + blk.ncols] = np.asarray(t)
        n_genes[blk.lb : blk.lb + blk.ncols] = np.asarray(g)
        if with_feature_cells:
            _, _, cnt = sparse_ops.block_row_stats(
                jnp.asarray(blk.row_ids), vals, num_genes=d
            )
            feature_cells += np.asarray(cnt, np.float64)
        if len(mito_ids):
            is_mito = jnp.asarray(mito)[jnp.asarray(blk.row_ids).astype(jnp.int32)]
            mt = sparse_ops.block_col_sums(
                cols, jnp.where(is_mito, vals.astype(jnp.float32), 0.0), ncols=blk.ncols
            )
            mito_total[blk.lb : blk.lb + blk.ncols] = np.asarray(mt)
        if ribo_total is not None:
            is_ribo = jnp.asarray(ribo)[jnp.asarray(blk.row_ids).astype(jnp.int32)]
            rt = sparse_ops.block_col_sums(
                cols, jnp.where(is_ribo, vals.astype(jnp.float32), 0.0), ncols=blk.ncols
            )
            ribo_total[blk.lb : blk.lb + blk.ncols] = np.asarray(rt)
    return CellQcStats(
        total=total,
        n_genes=n_genes,
        mito_frac=mito_total / np.maximum(total, 1.0),
        ribo_frac=(
            ribo_total / np.maximum(total, 1.0) if ribo_total is not None else None
        ),
        feature_cells=feature_cells if with_feature_cells else None,
    )


def feature_cells_kept(
    data, keep: np.ndarray, *, block_size: int = 8192
) -> np.ndarray:
    """[D] cells expressing each gene among the KEPT cells only — the
    qc_lib.rs qc_feature_min_cells contract (a gene supported only by
    discarded debris cells must NOT pass the gene gate)."""
    d = data.num_rows
    keep = np.asarray(keep, bool)
    out = np.zeros(d, np.float64)
    for blk in visit_columns_by_block(data, block_size=block_size):
        kcol = jnp.asarray(
            np.concatenate([keep[blk.lb : blk.lb + blk.ncols], [False]])
        )
        cols = sparse_ops.block_col_ids(blk)
        nz = jnp.where(
            kcol[jnp.minimum(cols, blk.ncols)],
            (jnp.asarray(blk.vals) != 0).astype(jnp.float32),
            0.0,
        )
        _, _, cnt = sparse_ops.block_row_stats(
            jnp.asarray(blk.row_ids), nz, num_genes=d
        )
        out += np.asarray(cnt, np.float64)
    return out
