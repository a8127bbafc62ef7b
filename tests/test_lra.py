"""pinto ligand-receptor activity: a true spatially-coupled LR pair
must beat the gene-swap null."""

import numpy as np
import pytest

from legume_tpu.pinto.lra import morans_i, run_lra


def test_lra_detects_coupled_pair():
    rng = np.random.default_rng(0)
    n, d = 600, 300  # enough genes that matched null pools are populated
    coords = rng.uniform(0, 10, size=(n, 2))
    # colocalized spatial hotspot for the true pair
    field = np.exp(-((coords[:, 0] - 3) ** 2 + (coords[:, 1] - 5) ** 2) / 2)
    expr = rng.gamma(2, 0.3, size=(n, d)).astype(np.float64)
    expr[:, 0] = 8 * field + rng.gamma(2, 0.1, n)  # LIG
    expr[:, 1] = 8 * field + rng.gamma(2, 0.1, n)  # REC colocalized
    expr[:, 2] = rng.permutation(expr[:, 0])  # same marginal, no spatial link
    genes = ["LIG", "REC", "SHUF"] + [f"g{i}" for i in range(d - 3)]

    res = run_lra(
        expr, genes, coords,
        [("LIG", "REC"), ("SHUF", "REC")],
        knn=8, n_null=100, seed=1,
    )
    assert len(res.ligand) == 2
    i_true = res.ligand.index("LIG")
    i_null = res.ligand.index("SHUF")
    assert res.pvalue[i_true] < 0.05, res.pvalue
    assert res.pvalue[i_null] > 0.2, res.pvalue
    assert res.activity[i_true] > res.null_mean[i_true]


def test_morans_i_signs():
    rng = np.random.default_rng(1)
    n = 400
    coords = rng.uniform(0, 10, size=(n, 2))
    import scipy.sparse as sp

    from legume_tpu.pinto.lc import spatial_knn_edges

    edges = spatial_knn_edges(coords, 6)
    w = sp.csr_matrix(
        (np.ones(2 * len(edges)),
         (np.concatenate([edges[:, 0], edges[:, 1]]),
          np.concatenate([edges[:, 1], edges[:, 0]]))),
        shape=(n, n),
    )
    smooth = coords[:, 0]  # strong spatial structure
    noise = rng.normal(size=n)
    i_vals = morans_i(np.stack([smooth, noise], 1), w)
    assert i_vals[0] > 0.5
    assert abs(i_vals[1]) < 0.15
