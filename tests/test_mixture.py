"""Per-gene 1D Gaussian mixture of modification sites
(`faba/src/editing/mixture.rs` bandwidth-first component calling)."""

import numpy as np
import pandas as pd
import pytest

from legume_tpu.faba.mixture import (
    MixtureParams,
    estimate_bandwidth,
    find_modes,
    fit_gene_mixture,
    fixed_em_weighted,
    gaussian_kernel_smooth,
)


def test_estimate_bandwidth_median_gap():
    # one gene, equally-weighted sites every 50 nt -> median gap 50
    pos = np.arange(0, 500, 50, dtype=float)
    w = np.ones(len(pos))
    bw, n_gaps = estimate_bandwidth([(pos, w)], scale=1.0)
    assert n_gaps == len(pos) - 1
    assert bw == pytest.approx(50.0)
    # atoi preset: scale 3 -> 150, inside [30, 600]
    bw3, _ = estimate_bandwidth(
        [(pos, w)], scale=3.0, min_bandwidth=30.0, max_bandwidth=600.0
    )
    assert bw3 == pytest.approx(150.0)


def test_estimate_bandwidth_weights_discount_marginal_sites():
    # a huge gap whose endpoints carry ~zero signal must not drag the
    # median up (gap weight = geometric mean of endpoint signal)
    pos = np.array([0.0, 20.0, 40.0, 5000.0])
    w = np.array([10.0, 10.0, 10.0, 1e-9])
    bw, _ = estimate_bandwidth([(pos, w)], scale=1.0)
    assert bw == pytest.approx(20.0)


def test_estimate_bandwidth_empty_floor():
    bw, n = estimate_bandwidth([], min_bandwidth=10.0)
    assert (bw, n) == (10.0, 0)


def test_find_modes_strict_interior():
    y = np.array([0.0, 2.0, 1.0, 3.0, 0.0])
    assert find_modes(y).tolist() == [1, 3]
    # plateaus are not strict maxima
    assert find_modes(np.array([0.0, 2.0, 2.0, 0.0])).tolist() == []


def test_kernel_smooth_constant_signal():
    x = np.array([0.0, 10.0, 20.0])
    y = np.array([5.0, 5.0, 5.0])
    out = gaussian_kernel_smooth(x, y, x, 10.0)
    assert np.allclose(out, 5.0)


def test_fixed_em_recovers_mixing_weights():
    # 2 Gaussians at 0 and 100 (sigma 5) + uniform noise over 1000;
    # 300 obs at 0, 100 at 100 -> pi ratio ~3:1, noise ~0
    rng = np.random.default_rng(0)
    pos = np.concatenate([rng.normal(0, 5, 300), rng.normal(100, 5, 100)])
    z0 = (pos - 0.0) / 5.0
    z1 = (pos - 100.0) / 5.0
    g = -0.5 * np.stack([z0 * z0, z1 * z1], 1) - np.log(5.0) - 0.5 * np.log(2 * np.pi)
    cll = np.concatenate([np.full((len(pos), 1), -np.log(1000.0)), g], axis=1)
    em = fixed_em_weighted(cll, None, n_free_params=2)
    assert em["weights"][1] == pytest.approx(0.75, abs=0.05)
    assert em["weights"][2] == pytest.approx(0.25, abs=0.05)


def test_fixed_em_prunes_to_noise_only():
    # component log-liks are hopeless vs noise -> all signal pruned,
    # noise survives as the sole component (em.rs contract)
    cll = np.column_stack([
        np.full(50, -np.log(100.0)),
        np.full(50, -1e4),
    ])
    em = fixed_em_weighted(cll, None, n_free_params=1)
    assert em["weights"][0] == pytest.approx(1.0)
    assert em["weights"][1] == 0.0


def test_fit_gene_mixture_two_components():
    # two site clusters with asymmetric weights; explicit bandwidth
    cells = np.array([0, 0, 1, 1])
    pos = np.array([100.0, 125.0, 300.0, 325.0])
    w = np.array([10.0, 5.0, 4.0, 8.0])
    fit = fit_gene_mixture(cells, pos, w, 1000.0, MixtureParams(bandwidth=25.0))
    assert fit is not None
    mus = np.sort(fit["mus"])
    assert mus[0] == pytest.approx(100.0)
    assert mus[-1] == pytest.approx(325.0)
    # cell 0's obs hard-assign to the first centre, cell 1's to the last
    cc = fit["cell_component_counts"]
    first = int(np.argmin(fit["mus"])) + 1  # +1: component 0 = noise
    last = int(np.argmax(fit["mus"])) + 1
    assert cc[(0, first)] == pytest.approx(15.0)
    assert cc[(1, last)] == pytest.approx(12.0)


def test_fit_gene_mixture_min_sites_gate():
    assert (
        fit_gene_mixture(
            np.array([0, 0]), np.array([10.0, 20.0]), np.array([1.0, 1.0]),
            1000.0, MixtureParams(min_sites=3),
        )
        is None
    )


def test_fit_gene_mixture_flat_centroid_fallback():
    # a single site repeated -> no interior mode -> weighted centroid
    cells = np.array([0, 1, 2])
    pos = np.array([50.0, 50.0, 50.0])
    w = np.array([2.0, 3.0, 5.0])
    fit = fit_gene_mixture(
        cells, pos, w, 500.0, MixtureParams(min_sites=1, bandwidth=20.0)
    )
    assert fit is not None
    assert len(fit["mus"]) == 1
    assert fit["mus"][0] == pytest.approx(50.0)


def _write_gff(path, *, name="GENE1", chrom="chr1", start=51, end=600, strand="+"):
    with open(path, "w") as f:
        f.write(
            f"{chrom}\tsrc\tgene\t{start}\t{end}\t.\t{strand}\t.\t"
            f"ID=gene:{name};Name={name}\n"
        )


def test_dartseq_mixture_cli_e2e(tmp_path):
    """argv-in/files-out: two planted site clusters in one gene ->
    two `GENE1/m6A/*` features whose totals match the converted reads."""
    from legume_tpu.cli.main import run_faba
    from legume_tpu.faba.bam import write_bam

    from test_dartseq import _reads_for_site

    rng = np.random.default_rng(0)
    cells = ["cellA", "cellB"]
    # sites land at pos+10: 110, 130 (cluster 1) and 390, 410 (cluster 2)
    wt, ct = [], []
    for tag, pos, n_conv in [
        ("a", 100, 12), ("b", 120, 8), ("c", 380, 8), ("d", 400, 12),
    ]:
        wt += _reads_for_site(f"{tag}_", pos, n_conv=n_conv, n_ref=8,
                              cells=cells, rng=rng)
        ct += _reads_for_site(f"c{tag}_", pos, n_conv=0, n_ref=20,
                              cells=cells, rng=rng)
    wt_path, ct_path = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    write_bam(wt_path, [("chr1", 10000)], wt)
    write_bam(ct_path, [("chr1", 10000)], ct)
    gff = str(tmp_path / "genes.gff")
    _write_gff(gff)  # gene spans [50, 600) 0-based, plus strand

    out = str(tmp_path / "dart")
    run_faba([
        "dartseq", "--bam", wt_path, "--control-bam", ct_path,
        "--output", out, "--gff", gff, "--mixture-weight", "converted",
    ])

    comp = pd.read_parquet(f"{out}.m6a_components.parquet")
    assert set(comp["gene"]) == {"GENE1"}
    assert len(comp) == 2
    # transcript-relative centres: sites at genomic 110/130 -> rel 60/80
    # (modes at the heavier site of each cluster: 60 and 360)
    mus = np.sort(comp["mu"].to_numpy())
    assert mus[0] == pytest.approx(60.0, abs=1.0)
    assert mus[1] == pytest.approx(360.0, abs=1.0)
    assert (comp["pi"] > 0).all()
    assert (comp["gene_length"] == 550).all()

    from legume_tpu.data.sparse_io import open_sparse_matrix

    be = open_sparse_matrix(f"{out}.mixture.zarr")
    names = be.row_names()
    assert sorted(names) == ["GENE1/m6A/0", "GENE1/m6A/1"]
    mat = be.read_columns_csc(np.arange(be.num_columns))
    totals = np.asarray(mat.sum(axis=1)).ravel()
    assert mat.shape[0] == 2
    # converted weight mode: component totals = converted UMIs per cluster
    assert sorted(totals.tolist()) == [20.0, 20.0]


def test_dartseq_mixture_posterior_weights_cli(tmp_path):
    """Posterior weighting regularizes low-coverage sites: runs end to
    end and yields fractional weighted counts bounded by coverage."""
    from legume_tpu.cli.main import run_faba
    from legume_tpu.faba.bam import write_bam

    from test_dartseq import _reads_for_site

    rng = np.random.default_rng(1)
    cells = ["cellA", "cellB"]
    wt, ct = [], []
    for tag, pos, n_conv in [("a", 100, 12), ("b", 120, 8), ("c", 400, 10)]:
        wt += _reads_for_site(f"{tag}_", pos, n_conv=n_conv, n_ref=6,
                              cells=cells, rng=rng)
        ct += _reads_for_site(f"c{tag}_", pos, n_conv=0, n_ref=18,
                              cells=cells, rng=rng)
    wt_path, ct_path = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    write_bam(wt_path, [("chr1", 10000)], wt)
    write_bam(ct_path, [("chr1", 10000)], ct)
    gff = str(tmp_path / "genes.gff")
    _write_gff(gff)

    out = str(tmp_path / "dartp")
    run_faba([
        "dartseq", "--bam", wt_path, "--control-bam", ct_path,
        "--output", out, "--gff", gff,
    ])
    comp = pd.read_parquet(f"{out}.m6a_components.parquet")
    assert len(comp) >= 1
    from legume_tpu.data.sparse_io import open_sparse_matrix

    be = open_sparse_matrix(f"{out}.mixture.zarr")
    mat = be.read_columns_csc(np.arange(be.num_columns))
    # Beta-posterior effective counts n*(c+1)/(n+2) are fractional
    # regularized versions of the raw converted counts
    vals = mat.data[mat.data > 0]
    assert len(vals) > 0
    assert not np.allclose(vals, np.round(vals))


def test_mixture_minus_strand_positions(tmp_path):
    """Minus-strand genes measure positions 5'->3' along the transcript:
    a site near the gene END maps to a SMALL relative position."""
    from legume_tpu.faba.genes import parse_gff_exons, parse_gff_genes
    from legume_tpu.faba.mixture import assign_sites_to_genes

    gff = str(tmp_path / "m.gff")
    _write_gff(gff, strand="-")
    model = parse_gff_genes(gff)
    exons = parse_gff_exons(gff, model)
    gene_of, rel, glen = assign_sites_to_genes(
        model, exons, ["chr1"],
        np.array([0, 0]), np.array([590, 60]), np.array(["-", "-"]),
    )
    assert gene_of.tolist() == [0, 0]
    assert glen.tolist() == [550.0, 550.0]
    # genomic 590 is 9 nt from the 3' genomic end = position 9 on the
    # minus-strand transcript; genomic 60 is near the transcript's end
    assert rel[0] == pytest.approx(9.0)
    assert rel[1] == pytest.approx(539.0)
    # plus-strand sites never match a minus-strand gene
    g2, _, _ = assign_sites_to_genes(
        model, exons, ["chr1"], np.array([0]), np.array([100]), np.array(["+"]),
    )
    assert g2.tolist() == [-1]
