"""CNV calling on cocoa residuals (`cocoa/src/cnv_call.rs` equivalent).

Per individual: genome-ordered per-gene residual log-ratios (observed
individual-level expression vs the shared component) smoothed into
segments and run through the CNV Gaussian HMM (`ops/cnv_hmm.py`) —
copy-number states per (individual, genomic bin).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..ops.cnv_hmm import CnvHmmParams, fit_em

log = logging.getLogger(__name__)


@dataclass
class CnvCallResult:
    log_ratio: np.ndarray  # [I, B] binned residual log-ratios
    states: np.ndarray  # [I, B] argmax CN state
    posteriors: np.ndarray  # [I, B, K]
    alpha: np.ndarray
    bin_of_gene: np.ndarray


def genome_bins(
    gene_order: np.ndarray, n_genes: int, genes_per_bin: int = 25
) -> np.ndarray:
    """bin index per gene given a genome ordering (cnv genome_order.rs)."""
    bins = np.zeros(n_genes, np.int64)
    for rank, g in enumerate(gene_order):
        bins[g] = rank // genes_per_bin
    return bins


def call_cnv_on_residuals(
    indv_expr_di: np.ndarray,  # [D, I] per-(gene, individual) expression (tau or residual means)
    shared_d: np.ndarray,  # [D] shared component
    *,
    gene_order: np.ndarray | None = None,
    genes_per_bin: int = 25,
    n_iter: int = 20,
) -> CnvCallResult:
    d, i = indv_expr_di.shape
    order = np.arange(d) if gene_order is None else np.asarray(gene_order)
    bins = genome_bins(order, d, genes_per_bin)
    n_bins = int(bins.max()) + 1

    lr = np.log(np.maximum(indv_expr_di, 1e-8)) - np.log(
        np.maximum(shared_d, 1e-8)
    )[:, None]
    # bin medians per individual (robust to single-gene spikes)
    binned = np.zeros((i, n_bins))
    for b in range(n_bins):
        sel = bins == b
        if sel.any():
            binned[:, b] = np.median(lr[sel], axis=0)
    binned -= np.median(binned, axis=1, keepdims=True)

    params = CnvHmmParams.default_3state()
    alpha, sigma, post = fit_em(params, binned.astype(np.float32), n_iter=n_iter)
    return CnvCallResult(
        log_ratio=binned,
        states=post.argmax(-1),
        posteriors=post,
        alpha=alpha,
        bin_of_gene=bins,
    )
