"""gem velocity model: genes whose unspliced counts lead a program
shift must carry velocity offsets pointing toward the target program."""

import numpy as np
import pytest

from legume_tpu.embedding.gem import fit_gem


def test_gem_velocity_recovers_shift():
    rng = np.random.default_rng(0)
    p, d = 60, 100
    # two programs; spliced expression splits pb's between them
    prog = np.arange(p) % 2
    beta_true = np.full((2, d), 0.2)
    beta_true[0, :50] = 3.0
    beta_true[1, 50:] = 3.0
    spliced = rng.poisson(beta_true[prog] * 20).astype(np.float32)
    # unspliced: program-0 pseudobulks are TRANSITIONING to program 1 —
    # their unspliced counts already look like program 1 for genes 50+
    un_true = beta_true[prog].copy()
    un_true[prog == 0, 50:] = 2.0  # leading indicator
    unspliced = rng.poisson(un_true * 8).astype(np.float32)

    res = fit_gem(spliced, unspliced, embedding_dim=8, epochs=600, seed=1)
    assert res.losses[-1] < res.losses[0]
    assert np.all(np.isfinite(res.delta))
    # genes 50+ (future program) should carry larger velocity offsets
    mag = np.linalg.norm(res.delta, axis=1)
    assert mag[50:].mean() > 1.3 * mag[:50].mean(), (mag[:50].mean(), mag[50:].mean())

    # per-cell velocity from unspliced loadings is finite and nonzero
    v = res.cell_velocity(unspliced)
    assert v.shape == (p, 8)
    assert np.linalg.norm(v, axis=1).mean() > 0


def test_resolve_embedding_spaces():
    """Procrustes resolution: a rotated/scaled copy of a run must map
    back onto the reference (resolve-embedding-space)."""
    from legume_tpu.embedding.resolve import resolve_embedding_spaces

    rng = np.random.default_rng(2)
    d, h = 50, 6
    names = [f"g{i}" for i in range(d)]
    e_ref = rng.normal(size=(d, h))
    # a rotated + scaled + shifted copy with an extra private feature
    q, _ = np.linalg.qr(rng.normal(size=(h, h)))
    e_rot = 2.5 * (e_ref @ q) + 1.0
    cells = rng.normal(size=(30, h)) @ q * 2.5 + 1.0
    runs = [
        {"feat_names": names, "e_feat": e_ref},
        {"feat_names": names, "e_feat": e_rot, "e_cell": cells},
    ]
    out = resolve_embedding_spaces(runs)
    np.testing.assert_allclose(out[1]["e_feat"], e_ref, atol=0.05)
    assert out[1]["e_cell"].shape == (30, h)


def test_annotate_by_projection():
    """Frozen-embedding type annotation: cells near their type's marker
    centroid get the right label; random cells stay unassigned."""
    from legume_tpu.embedding.type_annotation import annotate_by_projection

    rng = np.random.default_rng(3)
    d, h, n_per = 60, 8, 40
    feat = rng.normal(size=(d, h))
    genes = [f"g{i}" for i in range(d)]
    markers = {"typeA": [f"g{i}" for i in range(5)],
               "typeB": [f"g{i}" for i in range(30, 35)]}
    sigA = feat[:5].mean(0)
    sigB = feat[30:35].mean(0)
    cells = np.concatenate([
        sigA[None] * 3 + rng.normal(0, 0.3, (n_per, h)),
        sigB[None] * 3 + rng.normal(0, 0.3, (n_per, h)),
        rng.normal(0, 1.0, (n_per, h)) * 0.1,  # unrelated
    ])
    res = annotate_by_projection(cells, feat, genes, markers, min_z=2.0, seed=1)
    labels = np.asarray(res.labels)
    assert (labels[:n_per] == "typeA").mean() > 0.9
    assert (labels[n_per:2*n_per] == "typeB").mean() > 0.9
    assert (labels[2*n_per:] == "Unassigned").mean() > 0.5


def test_faba_lineage_cli_orients_by_velocity(tmp_path):
    """`faba lineage`: a 1D trajectory with velocity pointing toward
    increasing x must root at the low-x end (pseudotime correlates
    with x) and emit nodes/edges artifacts."""
    import pandas as pd

    from legume_tpu.cli import main as cli

    rng = np.random.default_rng(0)
    n = 300
    t = np.sort(rng.uniform(0, 1, n))
    z = np.stack([t * 10, np.sin(t * 3)], axis=1) + rng.normal(0, 0.05, (n, 2))
    vel = np.stack([np.ones(n) * 2, np.cos(t * 3) * 0.6], axis=1)
    zp = tmp_path / "z.parquet"
    vp = tmp_path / "v.parquet"
    cells = [f"c{i}" for i in range(n)]
    pd.DataFrame(z, index=cells, columns=["h0", "h1"]).reset_index(
        names="cell"
    ).to_parquet(zp)
    pd.DataFrame(vel, index=cells, columns=["v0", "v1"]).reset_index(
        names="cell"
    ).to_parquet(vp)
    out = str(tmp_path / "lin")
    cli.run_faba([
        "lineage", "--latent", str(zp), "--velocity", str(vp),
        "--out", out, "--n-nodes", "12", "--latent-geometry", "euclidean",
        "--layout", "none", "--edge-direction-n-boot", "50",
        "--edge-direction-n-perm", "100",
    ])
    pt = pd.read_parquet(f"{out}.pseudotime.parquet")
    r = np.corrcoef(np.nan_to_num(pt["pseudotime"]), t)[0, 1]
    assert r > 0.9, f"pseudotime-vs-truth correlation {r:.2f}"
    nodes = pd.read_parquet(f"{out}.nodes.parquet")
    trees = pd.read_parquet(f"{out}.trees.parquet")
    root = int(trees["root"].iloc[0])
    root_x = nodes["T0"].iloc[root]
    assert root_x < nodes["T0"].median()  # rooted at the low-x end
    edges = pd.read_parquet(f"{out}.edges.parquet")
    assert edges["selected"].sum() >= len(nodes) - 1 - 2  # near-tree


def test_faba_gem_posterior_cli(tmp_path):
    import pandas as pd
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sparse_io import create_sparse_from_csc

    rng = np.random.default_rng(5)
    d, p = 40, 30
    base = rng.gamma(2.0, 2.0, (d, p))
    s_counts = rng.poisson(base * 3.0).astype(np.float32)
    u_counts = rng.poisson(base * 1.0).astype(np.float32)
    u_counts[:8] = rng.poisson(base[:8] * 4.0)  # velocity-shifted genes
    genes = [f"g{i}" for i in range(d)]
    cols = [f"pb{j}" for j in range(p)]
    sp_path = str(tmp_path / "s.zarr")
    up_path = str(tmp_path / "u.zarr")
    create_sparse_from_csc(sp.csc_matrix(s_counts), sp_path, genes, cols)
    create_sparse_from_csc(sp.csc_matrix(u_counts), up_path, genes, cols)
    out = str(tmp_path / "gemp")
    cli.run_faba([
        "gem", "--spliced", sp_path, "--unspliced", up_path,
        "--output", out, "-d", "4", "--epochs", "80", "--posterior", "10",
    ])
    dp = pd.read_parquet(f"{out}.delta_posterior.parquet")
    assert len(dp) == d
    assert {"delta_pip", "beta_pip", "identified", "delta_norm"} <= set(dp.columns)
    assert dp["identified"].all()  # every gene has spliced counts here
    assert dp["delta_pip"].between(0, 1).all()


def test_gem_lineage_dag_and_sequential(tmp_path):
    """--lineage-dag second pass + pseudotime/fate lift and
    --sequential-velocity (gem/args.rs TrainArgs): a planted linear
    trajectory's DAG pseudotime tracks the true stage order; the
    sequential fit still recovers the velocity direction."""
    rng = np.random.default_rng(3)
    p, d, h = 60, 40, 6
    # linear trajectory: stage t in [0,1); spliced profile drifts with t,
    # unspliced leads it (velocity points forward)
    t = np.sort(rng.uniform(0, 1, p))
    prog = np.linspace(0, 1, d)
    s = rng.poisson(40 * np.exp(-((prog[None] - t[:, None]) ** 2) / 0.02)) * 1.0
    u = rng.poisson(40 * np.exp(-((prog[None] - t[:, None] - 0.08) ** 2) / 0.02)) * 1.0

    from legume_tpu.embedding.gem import fit_gem

    res = fit_gem(
        s, u, embedding_dim=h, epochs=300, lineage_dag=True,
        lineage_knn=8, seed=0,
    )
    assert res.dag_pseudotime is not None and res.dag_fate is not None
    # pseudotime correlates with the true stage (sign-free)
    r = np.corrcoef(res.dag_pseudotime, t)[0, 1]
    assert abs(r) > 0.6, f"pseudotime |r|={abs(r):.2f}"
    np.testing.assert_allclose(res.dag_fate.sum(1), 1.0, atol=1e-5)

    seq = fit_gem(
        s, u, embedding_dim=h, epochs=300, sequential_velocity=True, seed=0,
    )
    # the velocity offset still separates leading (unspliced-ahead)
    # genes: delta norms finite and nonzero
    assert np.isfinite(seq.delta).all() and np.linalg.norm(seq.delta) > 0
