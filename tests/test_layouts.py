"""tsne/phate layouts preserve cluster structure (fit_layout_*.rs)."""

import numpy as np
import pytest

from legume_tpu.ops.layouts import phate, tsne


def _blobs(n_per=60, d=20, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=6.0, size=(3, d))
    x = np.concatenate(
        [c + rng.normal(scale=1.0, size=(n_per, d)) for c in centers]
    ).astype(np.float32)
    labels = np.repeat(np.arange(3), n_per)
    return x, labels


def _knn_purity(y, labels, k=10):
    d2 = ((y[:, None] - y[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nbr = np.argsort(d2, axis=1)[:, :k]
    return (labels[nbr] == labels[:, None]).mean()


def test_tsne_separates_blobs():
    x, labels = _blobs()
    y = tsne(x, perplexity=20, n_iter=300, seed=0)
    assert y.shape == (180, 2)
    assert np.isfinite(y).all()
    assert _knn_purity(y, labels) > 0.95


def test_phate_separates_blobs():
    x, labels = _blobs(seed=1)
    y = phate(x, knn=5, n_iter=200)
    assert y.shape == (180, 2)
    assert np.isfinite(y).all()
    assert _knn_purity(y, labels) > 0.9


def test_phate_trajectory_orders_points():
    # a 1-D trajectory in 10-D: PHATE's diffusion potential should
    # lay it out so euclidean order in 2-D tracks the path order
    rng = np.random.default_rng(2)
    t = np.linspace(0, 1, 150)
    x = (np.outer(t, rng.normal(size=10)) + rng.normal(scale=0.05, size=(150, 10))).astype(np.float32)
    y = phate(x, knn=5, n_iter=200)
    # distance from the start point should correlate with t
    d0 = np.linalg.norm(y - y[0], axis=1)
    r = np.corrcoef(d0, t)[0, 1]
    assert abs(r) > 0.8, r


def test_layout_tree_cli(tmp_path):
    """`senna pseudotime` -> `senna layout tree --from` (the reference's
    LayoutCmd::Tree, fit_layout_tree.rs:55): Reingold-Tilford node
    placement + per-cell edge lerp with jitter. y must track geodesic
    pseudotime; a 3-branch star must fan out into >= 3 leaf x-slots."""
    import pandas as pd

    from legume_tpu.cli import main as cli

    rng = np.random.default_rng(5)
    # three branches in 3-D meeting at the origin (tree_layout.rs test)
    rows, t_true = [], []
    dirs = [(1.0, 0.0, 0.0), (-0.5, 0.866, 0.0), (-0.5, -0.866, 0.0)]
    for dx, dy, dz in dirs:
        for i in range(80):
            s = i / 80 * 5.0
            rows.append(
                [dx * s + rng.normal(0, 0.05), dy * s + rng.normal(0, 0.05), dz * s]
            )
            t_true.append(s)
    z = np.asarray(rows, np.float32)
    zp = tmp_path / "z.parquet"
    pd.DataFrame(
        z, index=[f"c{i}" for i in range(len(z))], columns=["h0", "h1", "h2"]
    ).reset_index(names="cell").to_parquet(zp)

    pt_out = str(tmp_path / "pt")
    # root at the node nearest cell 0 (the origin end of branch 0's arm)
    origin_cell = int(np.argmin((z**2).sum(1)))
    cli.run_senna([
        "pseudotime", "--latent", str(zp), "--out", pt_out,
        "--n-nodes", "24", "--root-cell", str(origin_cell),
    ])
    assert (tmp_path / "pt.nodes_latent.parquet").exists()
    assert (tmp_path / "pt.edges.parquet").exists()

    out = str(tmp_path / "tl")
    cli.run_senna([
        "layout", "--method", "tree", "--from", pt_out, "--out", out,
        "--tree-jitter", "0.05",
    ])
    cc = pd.read_parquet(out + ".tree_layout.cell_coords.parquet")
    n2 = pd.read_parquet(out + ".tree_layout.nodes_2d.parquet")
    assert len(cc) == len(z)
    xy = cc[["x", "y"]].to_numpy()
    finite = np.isfinite(xy).all(1)
    assert finite.mean() >= 0.9  # >= 90% of cells land on reachable edges
    # y is geodesic pseudotime: must correlate with distance from origin
    r = np.corrcoef(xy[finite, 1], np.asarray(t_true)[finite])[0, 1]
    assert r > 0.8, r
    # node slots: >= 3 distinct leaf x positions for a 3-branch star
    nxy = n2[["x", "y"]].to_numpy()
    nok = np.isfinite(nxy).all(1)
    assert len(np.unique(np.round(nxy[nok, 0], 3))) >= 3
    # manifest updated with the tree artifacts (fit_layout_tree.rs:163)
    import json

    man = json.loads((tmp_path / "pt.senna.json").read_text())
    assert man["outputs"]["tree_cell_coords"].endswith("cell_coords.parquet")
