"""faba annotate: gem-prefix marker annotation, both modes
(`faba/src/annotate/{run,by_enrichment}.rs` parity)."""

import json

import numpy as np
import pandas as pd
import pytest

from legume_tpu.cli import main as cli
from legume_tpu.faba.annotate import (
    UNASSIGNED,
    annotate_enrichment,
    annotate_projection,
    parse_and_match_markers,
    resolve_mode,
)

H = 4


@pytest.fixture(scope="module")
def gem_prefix(tmp_path_factory):
    """A synthetic gem-style prefix: two cell types along two axes of
    an H=4 co-embedded space, with a velocity field pushing type A
    cells toward a third axis (so the velocity track calls the
    'Gamma' nascent program)."""
    tmp = tmp_path_factory.mktemp("annot")
    rng = np.random.default_rng(0)
    a = np.array([1, 0, 0, 0], np.float32)
    b = np.array([0, 1, 0, 0], np.float32)
    c = np.array([0, 0, 1, 0], np.float32)
    nh = 120
    cells = np.vstack([
        a + rng.normal(0, 0.15, (nh, H)),
        b + rng.normal(0, 0.15, (nh, H)),
    ]).astype(np.float32)
    vel = np.vstack([
        c + rng.normal(0, 0.1, (nh, H)),   # A cells transcribing Gamma
        b + rng.normal(0, 0.1, (nh, H)),
    ]).astype(np.float32)
    genes = [f"g{i}" for i in range(60)]
    spl = np.vstack([
        a + rng.normal(0, 0.1, (20, H)),
        b + rng.normal(0, 0.1, (20, H)),
        c + rng.normal(0, 0.1, (20, H)),
    ]).astype(np.float32)
    # unspliced rows = spliced + delta; give the Gamma genes a nascent
    # shift along c so the velocity track matches them
    unspl = spl.copy()
    names = [f"c{i}" for i in range(2 * nh)]
    prefix = str(tmp / "fit")
    pd.DataFrame(cells, columns=[f"h{j}" for j in range(H)]).assign(
        cell=names).set_index("cell").reset_index().to_parquet(
        f"{prefix}.cell_embedding.parquet")
    pd.DataFrame(vel, columns=[f"v{j}" for j in range(H)]).assign(
        cell=names).set_index("cell").reset_index().to_parquet(
        f"{prefix}.velocity.parquet")
    feat = np.vstack([spl, unspl])
    rows = ([f"{g}/count/spliced" for g in genes]
            + [f"{g}/count/unspliced" for g in genes])
    pd.DataFrame(feat, columns=[f"h{j}" for j in range(H)]).assign(
        feature=rows).set_index("feature").reset_index().to_parquet(
        f"{prefix}.feature_embedding.parquet")
    json.dump({"model_type": "embedding"}, open(f"{prefix}.gem.json", "w"))
    mk = tmp / "markers.tsv"
    mk.write_text("".join(
        [f"g{i}\tAlpha\n" for i in range(20)]
        + [f"g{i}\tBeta\n" for i in range(20, 40)]
        + [f"g{i}\tGamma\n" for i in range(40, 60)]
    ))
    return prefix, str(mk), cells, names


def test_marker_parsing_idf_and_gates(tmp_path):
    mk = tmp_path / "m.tsv"
    mk.write_text("g0\tA\ng1\tA\ng2\tA\ng0\tB\ng3\tB\ng4\tB\ngX\tC\n")
    names, markers = parse_and_match_markers(
        str(mk), ["g0", "g1", "g2", "g3", "g4"], min_markers=3,
    )
    assert names == ["A", "B"]  # C has 0 matched markers
    # g0 is shared by A and B -> lower IDF weight than the unique ones
    wa = dict(markers[0])
    unique_w = [w for j, w in markers[0] if j != 0]
    assert wa[0] < min(unique_w)
    with pytest.raises(ValueError, match="coverage"):
        parse_and_match_markers(
            str(mk), ["g0", "g1", "g2", "g3", "g4"],
            min_markers=1, min_panel_coverage=0.95,
        )


def test_projection_calls_clusters(gem_prefix):
    prefix, mk, cells, names = gem_prefix
    fe = pd.read_parquet(f"{prefix}.feature_embedding.parquet")
    spl = fe[fe["feature"].str.endswith("/count/spliced")]
    genes = [n[: -len("/count/spliced")] for n in spl["feature"]]
    res = annotate_projection(
        spl.iloc[:, 1:].to_numpy(np.float32), genes,
        cells, names, mk, n_perm=200, n_boot=20, knn=10, seed=0,
    )
    per_cell = np.array([
        res.cluster_call[list(np.unique(res.clusters)).index(c)]
        for c in res.clusters
    ])
    truth = np.array(["Alpha"] * 120 + ["Beta"] * 120)
    assert (per_cell == truth).mean() > 0.95
    # Q matrix rows over significant terms sum to 1 (or 0 when none)
    rows = res.qmatrix.sum(1)
    assert np.all((np.abs(rows - 1) < 1e-6) | (rows == 0))
    # Gamma has no cells: no cluster calls Gamma
    assert "Gamma" not in res.cluster_call


def test_projection_noise_panel_abstains(gem_prefix, tmp_path):
    """A marker panel orthogonal to every cell direction abstains
    under the bootstrap + the bias guard flags it."""
    prefix, _, cells, names = gem_prefix
    rng = np.random.default_rng(1)
    genes = [f"r{i}" for i in range(40)]
    gene_emb = rng.normal(0, 1, (40, H)).astype(np.float32)
    mk = tmp_path / "noise.tsv"
    mk.write_text("".join(
        [f"r{i}\tNoiseA\n" for i in range(20)]
        + [f"r{i}\tNoiseB\n" for i in range(20, 40)]
    ))
    res = annotate_projection(
        gene_emb, genes, cells, names, str(mk),
        n_perm=100, n_boot=30, panel_perm=30, knn=10, seed=0,
    )
    # random panels are as good as these: the bias-guard p is uniform
    # under the null, so it stays away from the 1/(R+1) floor on
    # average — while an informative panel pins the floor (below)
    assert res.panel_bias_p is not None
    assert res.panel_bias_p.mean() > 0.15
    # informative panels on a gene axis dominated by DIFFUSE decoys:
    # a random twin is then uninformative and the real panel pins the
    # 1/(R+1) floor
    a_dir = np.array([1, 0, 0, 0], np.float32)
    b_dir = np.array([0, 1, 0, 0], np.float32)
    decoys = rng.normal(0, 0.3, (200, H)).astype(np.float32)
    gene_emb2 = np.vstack([
        a_dir + rng.normal(0, 0.1, (15, H)),
        b_dir + rng.normal(0, 0.1, (15, H)),
        decoys,
    ]).astype(np.float32)
    genes2 = [f"m{i}" for i in range(230)]
    mk2 = tmp_path / "real.tsv"
    mk2.write_text("".join(
        [f"m{i}\tAlpha\n" for i in range(15)]
        + [f"m{i}\tBeta\n" for i in range(15, 30)]
    ))
    real = annotate_projection(
        gene_emb2, genes2, cells, names, str(mk2),
        n_perm=100, n_boot=0, bootstrap=False, panel_perm=30,
        knn=10, seed=0,
    )
    assert np.all(real.panel_bias_p <= 2 / 31)


def test_enrichment_factor_calls():
    rng = np.random.default_rng(0)
    genes = [f"g{i}" for i in range(60)]
    k = 2
    beta = np.full((60, k), 1e-3)
    beta[:20, 0] = 1.0
    beta[20:40, 1] = 1.0
    beta /= beta.sum(0, keepdims=True)
    theta = rng.dirichlet([1, 1], 80)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".tsv",
                                     delete=False) as f:
        f.write("".join(
            [f"g{i}\tAlpha\n" for i in range(20)]
            + [f"g{i}\tBeta\n" for i in range(20, 40)]
        ))
        mk = f.name
    res = annotate_enrichment(
        np.log(beta), genes, np.log(np.maximum(theta, 1e-9)),
        [f"c{i}" for i in range(80)], mk,
        n_perm=300, n_boot=10, seed=0,
    )
    assert res["factor_call"] == ["Alpha", "Beta"]
    dom = theta.argmax(1)
    labs = np.array(res["cell_labels"])
    assert (labs[dom == 0] == "Alpha").mean() > 0.9
    assert (labs[dom == 1] == "Beta").mean() > 0.9


def test_resolve_mode_manifest(tmp_path):
    p = str(tmp_path / "run")
    assert resolve_mode(p, None) == "projection"  # no manifest: fallback
    json.dump({"model_type": "topic"}, open(f"{p}.gem.json", "w"))
    assert resolve_mode(p, None) == "enrichment"
    assert resolve_mode(p, "projection") == "projection"  # warned override
    json.dump({"model_type": "embedding"}, open(f"{p}.gem.json", "w"))
    assert resolve_mode(p, None) == "projection"


def test_annotate_cli_projection_both_tracks(gem_prefix, tmp_path):
    prefix, mk, cells, names = gem_prefix
    out = str(tmp_path / "ann")
    cli.run_faba([
        "annotate", "--from", prefix, "--markers", mk, "--out", out,
        "--num-perm", "200", "--n-boot", "15", "--knn", "10",
        "--seed", "0",
    ])
    spliced = pd.read_parquet(f"{out}.spliced.annotation.parquet")
    truth = np.array(["Alpha"] * 120 + ["Beta"] * 120)
    assert (spliced["annotation"].to_numpy() == truth).mean() > 0.9
    clusters = pd.read_parquet(f"{out}.spliced.clusters.parquet")
    assert {"call", "p", "q", "label_support", "label_set"} <= set(
        clusters.columns)
    # velocity track: type-A cells transcribe the Gamma program
    velo = pd.read_parquet(f"{out}.velocity.annotation.parquet")
    a_cells = velo["annotation"].to_numpy()[:120]
    assert (a_cells == "Gamma").mean() > 0.8
    qm = pd.read_parquet(f"{out}.spliced.qmatrix.parquet")
    assert {"Alpha", "Beta", "Gamma"} <= set(qm.columns)


def test_annotate_cli_enrichment_on_topic_tables(tmp_path):
    """--mode enrichment reads senna-topic-style dictionary/latent
    log tables by prefix (the cross-binary story the reference's
    gem-encoder path names)."""
    rng = np.random.default_rng(0)
    genes = [f"g{i}" for i in range(60)]
    beta = np.full((60, 3), 1e-3)
    beta[:20, 0] = 1.0
    beta[20:40, 1] = 1.0
    beta[40:, 2] = 1.0
    beta /= beta.sum(0, keepdims=True)
    theta = rng.dirichlet([1, 1, 1], 90)
    prefix = str(tmp_path / "topic")
    pd.DataFrame(
        np.log(beta), columns=[f"t{k}" for k in range(3)],
    ).assign(gene=genes).set_index("gene").reset_index().to_parquet(
        f"{prefix}.dictionary.parquet")
    pd.DataFrame(
        np.log(np.maximum(theta, 1e-9)),
        columns=[f"t{k}" for k in range(3)],
    ).assign(cell=[f"c{i}" for i in range(90)]).set_index(
        "cell").reset_index().to_parquet(f"{prefix}.latent.parquet")
    json.dump({"model_type": "topic"}, open(f"{prefix}.gem.json", "w"))
    mk = tmp_path / "m.tsv"
    mk.write_text("".join(
        [f"g{i}\tAlpha\n" for i in range(20)]
        + [f"g{i}\tBeta\n" for i in range(20, 40)]
        + [f"g{i}\tGamma\n" for i in range(40, 60)]
    ))
    out = str(tmp_path / "e")
    cli.run_faba([
        "annotate", "--from", prefix, "--markers", str(mk),
        "--out", out, "--num-perm", "300", "--n-boot", "10",
        "--track", "spliced", "--seed", "0",
    ])
    fac = pd.read_parquet(f"{out}.enrichment.factors.parquet")
    assert list(fac["call"]) == ["Alpha", "Beta", "Gamma"]
    ann = pd.read_parquet(f"{out}.enrichment.annotation.parquet")
    dom = theta.argmax(1)
    labs = ann["annotation"].to_numpy()
    assert (labs[dom == 0] == "Alpha").mean() > 0.85


def test_annotate_cli_mode_guards(gem_prefix, tmp_path):
    prefix, mk, _, _ = gem_prefix
    with pytest.raises(SystemExit, match="nascent"):
        cli.run_faba([
            "annotate", "--from", prefix, "--markers", mk,
            "--out", str(tmp_path / "x"), "--track", "nascent",
        ])
    with pytest.raises(SystemExit, match="velocity"):
        cli.run_faba([
            "annotate", "--from", prefix, "--markers", mk,
            "--out", str(tmp_path / "x"), "--mode", "enrichment",
            "--track", "velocity",
        ])
    with pytest.raises(SystemExit, match="panel-perm"):
        cli.run_faba([
            "annotate", "--from", prefix, "--markers", mk,
            "--out", str(tmp_path / "x"), "--mode", "enrichment",
            "--panel-perm", "10",
        ])
