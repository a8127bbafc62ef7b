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


def test_pinto_lc_batch_correction_and_qc(tmp_path):
    """pinto lc --batch-files/--qc (SrtInputArgs): a planted per-
    section gene flavor stops dominating the link communities once the
    batch correction divides it out; qc drops near-empty cells."""
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sparse_io import create_sparse_from_csc

    rng = np.random.default_rng(5)
    d, n = 40, 300
    # two spatial domains (left/right) with distinct programs...
    x = rng.uniform(0, 10, n)
    y = rng.uniform(0, 10, n)
    domain = (x > 5).astype(int)
    rates = np.full((2, d), 0.5)
    rates[0, :15] = 6.0
    rates[1, 15:30] = 6.0
    counts = rng.poisson(rates[domain]).astype(np.float32)
    # ...and an ORTHOGONAL section batch doubling the last 10 genes
    batch = (y > 5).astype(int)
    counts[batch == 1][:, 30:] *= 1.0  # placeholder, apply below
    counts[:, 30:] = counts[:, 30:] * np.where(batch[:, None] == 1, 4.0, 1.0)
    # plant 10 near-empty cells for qc
    counts[:10] = 0
    counts[:10, 0] = 1
    path = str(tmp_path / "c.zarr")
    create_sparse_from_csc(
        sp.csc_matrix(counts.T), path,
        [f"g{i}" for i in range(d)], [f"c{j}" for j in range(n)],
    )
    coord = tmp_path / "xy.tsv"
    coord.write_text("".join(f"c{j}\t{x[j]:.3f}\t{y[j]:.3f}\n" for j in range(n)))
    bf = tmp_path / "b.txt"
    bf.write_text("\n".join(f"s{int(b)}" for b in batch) + "\n")

    out = str(tmp_path / "lc")
    cli.main([
        "pinto", "lc", "--data-files", path, "--coords", str(coord),
        "--out", out, "-k", "2", "--knn", "6", "--sweeps", "10",
        "--em-sweeps", "3", "--batch-files", str(bf),
        "--qc", "--qc-min-total", "5", "--seed", "2",
    ])
    import pandas as pd

    prop = pd.read_parquet(out + ".propensity.parquet")
    assert len(prop) == 290  # qc dropped the 10 planted empties
    # communities align with the DOMAIN (x), not the section batch (y)
    kept = np.ones(n, bool)
    kept[:10] = False
    lab = prop[["c0", "c1"]].to_numpy().argmax(1)

    def agree(a, b):
        m = (a == b).mean()
        return max(m, 1 - m)

    dom_agree = agree(lab, domain[kept])
    bat_agree = agree(lab, batch[kept])
    assert dom_agree > bat_agree, (dom_agree, bat_agree)
    assert dom_agree > 0.75, dom_agree
