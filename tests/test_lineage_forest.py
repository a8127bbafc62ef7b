"""faba lineage: velocity-informed forest inference
(`faba/src/lineage/` parity — orient.rs direction tests, branching.rs
max-weight branching, forest.rs Slingshot curves, run.rs pipeline)."""

import itertools

import numpy as np
import pandas as pd
import pytest

from legume_tpu.faba.lineage import (
    ABSTAIN,
    FORWARD,
    REVERSE,
    assemble_arcs,
    benjamini_hochberg,
    candidate_edges,
    edge_directionality,
    fit_forest_curves,
    fit_principal_curves,
    max_branching,
    mst_from_centroids,
    mst_only_directions,
)


def _brute_branching_weight(n, arcs, aff):
    in_arcs = [[] for _ in range(n)]
    for u, v, w in arcs:
        in_arcs[v].append((u, w))
    best_w = -np.inf
    for combo in itertools.product(
        *[[(None, aff[v])] + in_arcs[v] for v in range(n)]
    ):
        parent = [c[0] for c in combo]
        ok = True
        for v in range(n):
            seen, x = set(), v
            while parent[x] is not None:
                if x in seen:
                    ok = False
                    break
                seen.add(x)
                x = parent[x]
            if not ok:
                break
        if ok:
            best_w = max(best_w, sum(c[1] for c in combo))
    return best_w


def test_max_branching_matches_brute_force():
    rng = np.random.default_rng(0)
    for _ in range(60):
        n = int(rng.integers(2, 6))
        arcs = []
        for _ in range(int(rng.integers(1, n * (n - 1) + 1))):
            u, v = rng.integers(0, n, 2)
            if u != v:
                arcs.append((int(u), int(v), float(rng.uniform(0, 2))))
        aff = rng.uniform(0, 2, n)
        br = max_branching(n, arcs, aff)
        got = 0.0
        for v in range(n):
            if br.parent[v] is None:
                got += aff[v]
            else:
                got += max(w for u, vv, w in arcs
                           if u == br.parent[v] and vv == v)
        assert abs(got - _brute_branching_weight(n, arcs, aff)) < 1e-9


def test_max_branching_root_pin_and_trees():
    # chain arcs 0->1->2, strong; pinning node 2 as root forces a cut
    arcs = [(0, 1, 5.0), (1, 2, 5.0)]
    aff = np.array([1.0, 0.1, np.inf])
    br = max_branching(3, arcs, aff)
    assert br.parent[2] is None and 2 in br.roots
    assert br.parent[1] == 0 and br.parent[0] is None
    assert len(br.roots) == 2
    # dense tree ids ordered by ascending root
    assert br.tree[0] == br.tree[1] == 0 and br.tree[2] == 1


def test_benjamini_hochberg():
    q = benjamini_hochberg(np.array([0.01, 0.02, 0.5, 0.04]))
    assert np.all(np.diff(q[np.argsort([0.01, 0.02, 0.5, 0.04])]) >= -1e-12)
    np.testing.assert_allclose(q[0], 0.04, atol=1e-9)


@pytest.fixture(scope="module")
def y_trajectory():
    rng = np.random.default_rng(0)

    def seg(a, b, n):
        t = rng.uniform(0, 1, n)[:, None]
        return (np.array(a) + t * (np.array(b) - np.array(a))
                + rng.normal(0, 0.05, (n, 2)))

    theta = np.vstack([
        seg([0, 0], [1, 0], 300),
        seg([1, 0], [2, 1], 200),
        seg([1, 0], [2, -1], 200),
    ]).astype(np.float32)
    vel = (np.vstack([
        np.tile([1, 0], (300, 1)),
        np.tile([0.7, 0.7], (200, 1)),
        np.tile([0.7, -0.7], (200, 1)),
    ]) + rng.normal(0, 0.3, (700, 2))).astype(np.float32)
    return theta, vel


def test_edge_directionality_calls_and_abstains(y_trajectory):
    from legume_tpu.ops.kmeans import kmeans

    theta, vel = y_trajectory
    centroids, labels = kmeans(theta, 15, seed=1)
    centroids, labels = np.asarray(centroids), np.asarray(labels)
    mst = mst_from_centroids(centroids)
    cand = candidate_edges(centroids, mst, 4)
    assert set(mst) <= set(cand) and len(cand) > len(mst)

    dirs = edge_directionality(
        centroids, vel, labels, cand, mst, n_boot=100, n_perm=200, seed=1
    )
    frac_called = (dirs.call != ABSTAIN).mean()
    assert frac_called > 0.8
    # called directions flow with increasing x: FORWARD edges have the
    # larger-x centroid as the head
    for i in range(len(dirs)):
        d = dirs.called_direction(i)
        if d is not None:
            frm, to = d
            assert centroids[to, 0] > centroids[frm, 0] - 0.3

    # pure-noise velocity: (almost) everything abstains
    rng = np.random.default_rng(2)
    noise = rng.normal(0, 1, vel.shape).astype(np.float32)
    nd = edge_directionality(
        centroids, noise, labels, cand, mst, n_boot=100, n_perm=200, seed=1
    )
    assert (nd.call != ABSTAIN).mean() < 0.2


def test_mst_only_directions_reduce_to_geometric_mst(y_trajectory):
    from legume_tpu.ops.kmeans import kmeans

    theta, _ = y_trajectory
    centroids, labels = kmeans(theta, 12, seed=0)
    centroids, labels = np.asarray(centroids), np.asarray(labels)
    mst = mst_from_centroids(centroids)
    dirs = mst_only_directions(centroids, mst)
    assert np.all(dirs.call == ABSTAIN) and np.all(np.isnan(dirs.p))
    # with the default tau_root (median arc weight) the forest may
    # legitimately fragment; tau_root=0 keeps every geometric edge, so
    # the selected undirected set IS the MST (one tree)
    arcs, aff = assemble_arcs(dirs, 12, 0.0, None)
    br = max_branching(12, arcs, aff)
    sel = {
        (min(v, br.parent[v]), max(v, br.parent[v]))
        for v in range(12) if br.parent[v] is not None
    }
    assert sel == set(mst) and len(br.roots) == 1
    # default tau still selects a subset of the candidate (MST) set
    arcs2, aff2 = assemble_arcs(dirs, 12, None, None)
    br2 = max_branching(12, arcs2, aff2)
    sel2 = {
        (min(v, br2.parent[v]), max(v, br2.parent[v]))
        for v in range(12) if br2.parent[v] is not None
    }
    assert sel2 <= set(mst)


def test_principal_curves_y_shape(y_trajectory):
    from legume_tpu.ops.kmeans import kmeans

    theta, _ = y_trajectory
    centroids, labels = kmeans(theta, 15, seed=1)
    centroids, labels = np.asarray(centroids), np.asarray(labels)
    mst = mst_from_centroids(centroids)
    root = int(np.argmin(centroids[:, 0]))
    pc = fit_principal_curves(theta, centroids, mst, root, resolution=50)
    assert pc.n_lineages() >= 2  # the Y has two leaves
    # weights row-normalize; trunk cells belong to >1 lineage
    np.testing.assert_allclose(pc.weights.sum(1), 1.0, atol=1e-5)
    trunk = theta[:, 0] < 0.8
    assert (pc.weights[trunk].max(1) < 1.0).mean() > 0.6
    # pseudotime increases with x
    assert np.corrcoef(theta[:, 0], pc.pseudotime)[0, 1] > 0.95
    # per-lineage λ is NaN off-lineage, finite on it
    on = pc.weights > 0
    assert np.isfinite(pc.lineage_pseudotime[on]).all()
    assert np.isnan(pc.lineage_pseudotime[~on]).all()
    # curves run root→leaf: λ grid non-decreasing
    for c in pc.curves:
        assert np.all(np.diff(c.lambda_grid) >= -1e-6)
        assert c.node_path[0] == root


def test_forest_curves_and_order_confidence(y_trajectory):
    from legume_tpu.ops.kmeans import kmeans

    theta, vel = y_trajectory
    k = 15
    centroids, labels = kmeans(theta, k, seed=1)
    centroids, labels = np.asarray(centroids), np.asarray(labels)
    mst = mst_from_centroids(centroids)
    cand = candidate_edges(centroids, mst, 4)
    dirs = edge_directionality(
        centroids, vel, labels, cand, mst, n_boot=100, n_perm=200, seed=1
    )
    arcs, aff = assemble_arcs(dirs, k, None, None)
    br = max_branching(k, arcs, aff)
    fit = fit_forest_curves(theta, centroids, labels, br, dirs,
                            resolution=40)
    # single well-oriented tree; every cell placed
    assert len(br.roots) == 1
    assert np.isfinite(fit.curves.pseudotime).all()
    assert np.corrcoef(theta[:, 0], fit.curves.pseudotime)[0, 1] > 0.95
    # root is the low-x end
    assert centroids[br.roots[0], 0] < np.median(centroids[:, 0])
    # order confidence: high along the confidently-oriented tree
    assert np.nanmean(fit.order_conf) > 0.8


def test_run_lineage_end_to_end(y_trajectory, tmp_path):
    from legume_tpu.faba.lineage_run import run_lineage

    theta, vel = y_trajectory
    cells = [f"c{i}" for i in range(len(theta))]
    pd.DataFrame(theta, columns=["h0", "h1"]).assign(cell=cells).set_index(
        "cell").reset_index().to_parquet(tmp_path / "fit.latent.parquet")
    pd.DataFrame(vel, columns=["v0", "v1"]).assign(cell=cells).set_index(
        "cell").reset_index().to_parquet(tmp_path / "fit.velocity.parquet")
    res = run_lineage(
        str(tmp_path / "fit"), str(tmp_path / "lin"),
        n_centroids=15, seed=1, latent_geometry="euclidean",
        layout="phate", phate_landmarks=80, curve_resolution=40,
        edge_direction_n_boot=80, edge_direction_n_perm=150,
    )
    assert res["n_trees"] == 1 and res["n_lineages"] >= 2
    pt = pd.read_parquet(tmp_path / "lin.pseudotime.parquet")
    assert list(pt.columns) == [
        "cell", "pseudotime", "branch", "tree", "order_confidence"
    ]
    assert np.corrcoef(theta[:, 0], np.nan_to_num(pt.pseudotime))[0, 1] > 0.95
    edges = pd.read_parquet(tmp_path / "lin.edges.parquet")
    for col in ("geom_dist", "velocity_flux", "se", "ci_lo", "ci_hi",
                "p", "q", "n_cells", "confidence", "in_mst", "selected",
                "directed_from", "directed_to", "tree", "call"):
        assert col in edges.columns
    assert set(edges["call"]) <= {"forward", "reverse", "unassigned"}
    # weights + per-lineage pseudotime matrices
    w = pd.read_parquet(tmp_path / "lin.cell_lineage_weights.parquet")
    assert w.shape == (len(theta), 1 + res["n_lineages"])
    np.testing.assert_allclose(
        w.iloc[:, 1:].to_numpy().sum(1), 1.0, atol=1e-4
    )
    # layout artifacts incl. the velocity grid
    c2 = pd.read_parquet(tmp_path / "lin.cells_2d.parquet")
    assert list(c2.columns) == ["cell", "x", "y"] and len(c2) == len(theta)
    curves2 = pd.read_parquet(tmp_path / "lin.curves_2d.parquet")
    assert list(curves2.columns) == ["lineage", "grid", "x", "y"]
    grid = pd.read_parquet(tmp_path / "lin.velocity_grid_2d.parquet")
    assert list(grid.columns) == ["x", "y", "dx", "dy"] and len(grid) > 5
    # on the identity layout the arrow field must follow the true flow:
    # trunk bins (x < 0.9) all point +x
    from legume_tpu.faba.lineage_run import velocity_grid_arrows

    ga = velocity_grid_arrows(theta, theta, vel, 15)
    trunk = ga[ga[:, 0] < 0.9]
    assert len(trunk) >= 3 and np.all(trunk[:, 2] > 0)
    trees = pd.read_parquet(tmp_path / "lin.trees.parquet")
    assert trees["n_cells"].sum() == len(theta)


def test_run_lineage_root_pins(y_trajectory, tmp_path):
    from legume_tpu.faba.lineage_run import run_lineage

    theta, vel = y_trajectory
    cells = [f"c{i}" for i in range(len(theta))]
    pd.DataFrame(theta, columns=["h0", "h1"]).assign(cell=cells).set_index(
        "cell").reset_index().to_parquet(tmp_path / "f.latent.parquet")
    pd.DataFrame(vel, columns=["v0", "v1"]).assign(cell=cells).set_index(
        "cell").reset_index().to_parquet(tmp_path / "f.velocity.parquet")
    # --root-cell: a cell at the tip of the UP branch forces that root
    tip = int(np.argmax(theta[:, 1]))
    run_lineage(
        str(tmp_path / "f"), str(tmp_path / "r"), n_centroids=12, seed=1,
        latent_geometry="euclidean", layout="none", root_cell=cells[tip],
        edge_direction_n_boot=50, edge_direction_n_perm=100,
        curve_resolution=30,
    )
    trees = pd.read_parquet(tmp_path / "r.trees.parquet")
    nodes = pd.read_parquet(tmp_path / "r.nodes.parquet")
    root_y = nodes["T1"].iloc[int(trees["root"].iloc[0])]
    assert root_y > 0.5  # rooted on the up branch, against the flow

    # gem DAG root: low-τ cells at the up-branch tip vote the same node
    tau = -theta[:, 1]  # lowest τ = highest y
    pd.DataFrame({"cell": cells, "pseudotime": tau}).to_parquet(
        tmp_path / "f.dag_pseudotime.parquet")
    run_lineage(
        str(tmp_path / "f"), str(tmp_path / "g"), n_centroids=12, seed=1,
        latent_geometry="euclidean", layout="none", root_from_gem=True,
        edge_direction_n_boot=50, edge_direction_n_perm=100,
        curve_resolution=30,
    )
    trees_g = pd.read_parquet(tmp_path / "g.trees.parquet")
    root_y_g = nodes["T1"].iloc[int(trees_g["root"].iloc[0])]
    assert root_y_g > 0.5


def test_theta_auto_detects_log_simplex(tmp_path):
    from legume_tpu.faba.lineage_run import load_theta, resolve_geometry

    rng = np.random.default_rng(0)
    theta = rng.dirichlet(np.ones(5), 50).astype(np.float32)
    cells = [f"c{i}" for i in range(50)]
    pd.DataFrame(
        np.log(theta), columns=[f"k{j}" for j in range(5)]
    ).assign(cell=cells).set_index("cell").reset_index().to_parquet(
        tmp_path / "t.latent.parquet")
    loaded = load_theta(str(tmp_path / "t"), "auto", no_velocity=True)
    assert loaded.theta_from == "latent"
    np.testing.assert_allclose(loaded.theta.sum(1), 1.0, atol=1e-3)
    assert resolve_geometry("auto", loaded.theta_from) == "hellinger"

    # a raw H-space table stays on the embedding path (cosine)
    pd.DataFrame(
        rng.normal(0, 3, (50, 4)).astype(np.float32),
        columns=[f"h{j}" for j in range(4)],
    ).assign(cell=cells).set_index("cell").reset_index().to_parquet(
        tmp_path / "e.latent.parquet")
    emb = load_theta(str(tmp_path / "e"), "auto", no_velocity=True)
    assert emb.theta_from == "cell-embedding"
    assert resolve_geometry("auto", emb.theta_from) == "cosine"


def test_marker_node_calls_and_root_type(y_trajectory, tmp_path):
    from legume_tpu.faba.lineage_run import run_lineage

    theta, vel = y_trajectory
    n = len(theta)
    cells = [f"c{i}" for i in range(n)]
    # gene embedding: gene vectors pointing at the three compartments
    genes = [f"g{i}" for i in range(30)]
    gene_emb = np.zeros((30, 2), np.float32)
    gene_emb[:10] = [0.2, 0.0]   # trunk markers
    gene_emb[10:20] = [2.0, 1.0]  # up-branch markers
    gene_emb[20:] = [2.0, -1.0]  # down-branch markers
    pd.DataFrame(theta, columns=["h0", "h1"]).assign(cell=cells).set_index(
        "cell").reset_index().to_parquet(tmp_path / "m.latent.parquet")
    pd.DataFrame(vel, columns=["v0", "v1"]).assign(cell=cells).set_index(
        "cell").reset_index().to_parquet(tmp_path / "m.velocity.parquet")
    pd.DataFrame(
        gene_emb, columns=["h0", "h1"]
    ).assign(gene=genes).set_index("gene").reset_index().to_parquet(
        tmp_path / "m.gene_embedding.parquet")
    markers = tmp_path / "markers.tsv"
    markers.write_text("".join(
        [f"g{i}\tTrunk\n" for i in range(10)]
        + [f"g{i}\tBranchUp\n" for i in range(10, 20)]
        + [f"g{i}\tBranchDown\n" for i in range(20, 30)]
    ))
    run_lineage(
        str(tmp_path / "m"), str(tmp_path / "out"), n_centroids=12, seed=1,
        latent_geometry="euclidean", layout="none",
        markers=str(markers), marker_num_perm=50, marker_n_boot=20,
        marker_min_support=0.3, root_type="Trunk",
        edge_direction_n_boot=50, edge_direction_n_perm=100,
        curve_resolution=30,
    )
    annot = pd.read_parquet(tmp_path / "out.lineage_annot.parquet")
    nodes = pd.read_parquet(tmp_path / "out.nodes.parquet")
    traj = pd.read_parquet(tmp_path / "out.trajectory_annotation.parquet")
    assert set(traj["role"]) <= {"root", "terminal", "internal"}
    # low-x nodes carry the Trunk label; branch tips their own labels
    x = nodes["T0"].to_numpy()
    trunkish = annot["cell_type"][x < 0.7]
    assert (trunkish == "Trunk").mean() > 0.5
    # --root-type Trunk roots in the trunk even though velocity flows out
    trees = pd.read_parquet(tmp_path / "out.trees.parquet")
    assert x[int(trees["root"].iloc[0])] < 1.0


def test_lineage_cli_surface(y_trajectory, tmp_path):
    from legume_tpu.cli import main as cli

    theta, vel = y_trajectory
    cells = [f"c{i}" for i in range(len(theta))]
    pd.DataFrame(theta, columns=["h0", "h1"]).assign(cell=cells).set_index(
        "cell").reset_index().to_parquet(tmp_path / "p.latent.parquet")
    pd.DataFrame(vel, columns=["v0", "v1"]).assign(cell=cells).set_index(
        "cell").reset_index().to_parquet(tmp_path / "p.velocity.parquet")
    cli.run_faba([
        "lineage", "--from", str(tmp_path / "p"),
        "--out", str(tmp_path / "cli"),
        "--n-centroids", "12", "--latent-geometry", "euclidean",
        "--layout", "none", "--edge-direction-n-boot", "50",
        "--edge-direction-n-perm", "100", "--curve-resolution", "30",
        "--seed", "1",
    ])
    assert (tmp_path / "cli.pseudotime.parquet").exists()
    assert (tmp_path / "cli.curves.parquet").exists()
    curves = pd.read_parquet(tmp_path / "cli.curves.parquet")
    assert list(curves.columns[:3]) == ["lineage", "grid", "lambda"]


def test_plot_full_surface(y_trajectory, tmp_path):
    """faba plot renders the lineage's curves/arrows/type labels with
    the PlotArgs knobs (plot/mod.rs surface)."""
    from pathlib import Path

    from legume_tpu.cli import main as cli
    from legume_tpu.faba.lineage_run import run_lineage

    theta, vel = y_trajectory
    cells = [f"c{i}" for i in range(len(theta))]
    lat = tmp_path / "q.latent.parquet"
    pd.DataFrame(theta, columns=["h0", "h1"]).assign(cell=cells).set_index(
        "cell").reset_index().to_parquet(lat)
    pd.DataFrame(vel, columns=["v0", "v1"]).assign(cell=cells).set_index(
        "cell").reset_index().to_parquet(tmp_path / "q.velocity.parquet")
    genes = [f"g{i}" for i in range(20)]
    gene_emb = np.vstack([
        np.tile([1, 0], (10, 1)), np.tile([0, 1], (10, 1))
    ]).astype(np.float32) + 0.05
    pd.DataFrame(gene_emb, columns=["h0", "h1"]).assign(
        gene=genes).set_index("gene").reset_index().to_parquet(
        tmp_path / "q.gene_embedding.parquet")
    mk = tmp_path / "mk.tsv"
    mk.write_text("".join(
        [f"g{i}\tEarly\n" for i in range(10)]
        + [f"g{i}\tLate\n" for i in range(10, 20)]
    ))
    run_lineage(
        str(tmp_path / "q"), str(tmp_path / "q"), n_centroids=10, seed=1,
        latent_geometry="euclidean", layout="phate", phate_landmarks=60,
        curve_resolution=25, edge_direction_n_boot=50,
        edge_direction_n_perm=100, markers=str(mk), marker_num_perm=30,
        marker_n_boot=10, marker_min_support=0.2,
    )
    out = str(tmp_path / "fig.pdf")
    cli.run_faba([
        "plot", "-f", str(tmp_path / "q"), "--latent", str(lat),
        "-o", out, "--color-by", "celltype", "--svg",
        "--velocity-scale", "0.8", "--width", "7", "--height", "6",
        "--pt-ramp", "rank",
    ])
    assert Path(out).exists() and Path(str(tmp_path / "fig.svg")).exists()
    # pseudotime ramp variant over the reused layout
    cli.run_faba([
        "plot", "-f", str(tmp_path / "q"), "--latent", str(lat),
        "-o", str(tmp_path / "pt.png"), "--pt-ramp", "sqrt",
        "--no-type-labels", "--no-velocity-field", "--backbone", "tree",
    ])
    assert Path(tmp_path / "pt.png").exists()
