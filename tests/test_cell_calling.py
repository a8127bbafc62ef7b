"""faba barcode QC / cell calling (cell_qc/mod.rs): OrdMag knee,
EmptyDrops ambient-multinomial rescue with Simple Good-Turing
smoothing, plus the dartseq CLI flag surface that consumes it
(--cell-filter, --site-min-cells, --output-bed-file, membership,
--cell-barcode-tag)."""

import gzip

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.faba.cell_calling import (
    CellCallParams,
    call_cells,
    load_cell_membership,
    match_barcode,
    ordmag_cutoff,
    simple_good_turing,
)


def test_simple_good_turing_properties():
    rng = np.random.default_rng(0)
    counts = rng.poisson(2.0, 500)
    counts[: 200] = 0  # unseen genes share the N1/N reserve
    p = simple_good_turing(counts)
    assert p.shape == (500,)
    assert np.all(p > 0)
    np.testing.assert_allclose(p.sum(), 1.0, rtol=1e-9)
    # unseen genes get equal, nonzero shares
    zero = p[counts == 0]
    assert np.allclose(zero, zero[0])
    # more-observed genes carry more mass
    assert p[np.argmax(counts)] > zero[0]


def test_simple_good_turing_degenerate_falls_back():
    # single frequency class -> degenerate log-log fit -> add-one-ish
    counts = np.array([3, 3, 3, 0, 0])
    p = simple_good_turing(counts)
    assert np.all(p > 0) and np.isclose(p.sum(), 1.0)


def test_ordmag_cutoff():
    # top-100 baseline at the 99th percentile, 10% fraction
    totals = np.concatenate([np.full(100, 1000.0), np.full(900, 10.0)])
    p = CellCallParams(expected_cells=100)
    assert ordmag_cutoff(totals, p) == 100.0


def _planted_matrix(rng, n_real=60, n_mid=30, n_ambient=600, g=80):
    """Real cells: distinct per-cell profiles, high depth. Mid cells:
    REAL profiles at ambient-like depth (EmptyDrops must rescue).
    Ambient: one shared profile, low depth."""
    ambient_profile = rng.dirichlet(np.ones(g) * 0.5)
    cols = []
    for _ in range(n_real):
        prof = rng.dirichlet(np.ones(g) * 0.05)  # spiky, unlike ambient
        # deep enough that the OrdMag knee (10% of the top baseline)
        # lands ABOVE the mid/ambient depth band
        cols.append(rng.multinomial(rng.integers(10_000, 20_000), prof))
    for _ in range(n_mid):
        prof = rng.dirichlet(np.ones(g) * 0.05)
        cols.append(rng.multinomial(rng.integers(600, 900), prof))
    for _ in range(n_ambient):
        cols.append(rng.multinomial(rng.integers(500, 800), ambient_profile))
    return sp.csc_matrix(np.stack(cols, axis=1).astype(np.float32))


def test_empty_drops_rescues_distinct_profiles():
    rng = np.random.default_rng(7)
    m = _planted_matrix(rng)
    # 1000 sims bound min-p at ~1e-3; with ~630 candidates the BH q of
    # a saturated p is ~0.02, so the FDR must sit above that floor
    p = CellCallParams(
        filter="empty-drops", expected_cells=60, ed_min_umis=400,
        ed_n_sims=1000, ed_ambient_lo=200, ed_ambient_hi=600, ed_fdr=0.05,
    )
    keep = call_cells(m, p)
    # all deep real cells kept by the knee
    assert keep[:60].all()
    # most mid-depth real cells rescued by EmptyDrops
    assert keep[60:90].mean() > 0.8, keep[60:90].mean()
    # ambient barcodes overwhelmingly rejected
    assert keep[90:].mean() < 0.1, keep[90:].mean()
    # ord-mag alone would MISS the mid cells (the rescue is real)
    keep_om = call_cells(m, CellCallParams(filter="ord-mag", expected_cells=60))
    assert keep_om[60:90].mean() < 0.5


def test_min_counts_and_nnz_filters():
    m = sp.csc_matrix(np.diag([10.0, 600.0, 40.0]))
    assert call_cells(m, CellCallParams(filter="nnz")).all()
    np.testing.assert_array_equal(
        call_cells(m, CellCallParams(filter="min-counts", min_counts=500)),
        [False, True, False],
    )


def test_membership_matching(tmp_path):
    p = tmp_path / "m.tsv"
    p.write_text("AACG-1\tTcell\nGGTT\tBcell\n")
    lut = load_cell_membership(str(p))
    assert match_barcode(lut, "AACG-1") == "Tcell"
    assert match_barcode(lut, "AACG") == "Tcell"  # suffix-tolerant
    assert match_barcode(lut, "GGTT-1") == "Bcell"
    assert match_barcode(lut, "AACG", exact=True) is None
    assert match_barcode(lut, "TTTT") is None


def _site_reads(prefix, pos, n_conv, n_ref, cells, read_len=40, off=10):
    reads = []
    for i in range(n_conv + n_ref):
        conv = i < n_conv
        md = f"{off}C{read_len - off - 1}" if conv else f"{read_len}"
        seq = list("A" * read_len)
        seq[off] = "T" if conv else "C"
        reads.append(
            dict(
                name=f"{prefix}{i}", ref_id=0, pos=pos, seq="".join(seq),
                cigar=f"{read_len}M", cb=cells[i % len(cells)],
                ub=f"u{prefix}{i}", md=md,
            )
        )
    return reads


def test_dartseq_cli_cell_filter_bed_and_tags(tmp_path):
    """argv e2e over the new DartSeqCountArgs surface: min-counts cell
    calling (low-depth barcode gated out), --site-min-cells, BED rows
    with cell types, and a non-10x --cell-barcode-tag."""
    import pandas as pd

    from legume_tpu.cli import main as cli
    from legume_tpu.faba.bam import write_bam

    cells = ["cellA", "cellB", "cellC"]
    wt = _site_reads("s1_", 100, 14, 8, cells)
    # one barcode with a single read: below --cell-min-umis
    wt += _site_reads("lo_", 100, 1, 0, ["cellLow"])
    # a second, sparser site: detected in 1 cell -> --site-min-cells drops it
    wt += _site_reads("s2_", 700, 6, 3, ["cellA"])
    ct = _site_reads("c1_", 100, 1, 20, cells) + _site_reads(
        "c2_", 700, 1, 9, cells
    )
    # a GFF so cell calling has gene counts (one gene spans everything)
    gff = tmp_path / "g.gff"
    gff.write_text(
        'chr1\tsrc\tgene\t1\t9000\t.\t+\t.\tgene_id "G1"; gene_name "G1";\n'
    )
    wt_p, ct_p = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    # write with a custom barcode tag to exercise --cell-barcode-tag
    write_bam(wt_p, [("chr1", 10000)], wt, cb_tag="XC", umi_tag="XM")
    write_bam(ct_p, [("chr1", 10000)], ct, cb_tag="XC", umi_tag="XM")
    mem = tmp_path / "mem.tsv"
    mem.write_text("cellA\tTcell\ncellB\tBcell\ncellC\tNK\n")

    out = str(tmp_path / "ds")
    cli.run_faba([
        "dartseq", "--bam", wt_p, "--control-bam", ct_p, "--output", out,
        "--gff", str(gff), "--no-mixture",
        "--cell-barcode-tag", "XC", "--umi-tag", "XM",
        "--cell-filter", "min-counts", "--cell-min-umis", "3",
        "--site-min-cells", "2",
        "--output-bed-file", "--cell-membership", str(mem),
        "--output-cell-types",
    ])
    called = (tmp_path / "ds.called_cells.txt").read_text().split()
    assert set(called) == {"cellA", "cellB", "cellC"}  # cellLow gated

    sites = pd.read_parquet(out + ".sites.parquet")
    assert (sites["pos"] == 110).any()

    from legume_tpu.data.sparse_io import open_sparse_matrix

    be = open_sparse_matrix(out + ".zarr")
    # site-min-cells=2 drops the single-cell site at 710
    assert all("710" not in n for n in be.row_names())
    assert "cellLow" in be.column_names()  # axis keeps all barcodes

    with gzip.open(out + ".bed.gz", "rt") as f:
        rows = [line.split("\t") for line in f.read().splitlines()]
    assert rows, "BED must not be empty"
    for r in rows:
        assert r[0] == "chr1" and int(r[2]) == int(r[1]) + 1
        assert r[4] == "G1"  # gene column resolved from the GFF
        assert int(r[5]) >= 1 and int(r[6]) >= 0  # converted/unconverted
        assert r[9] in {"Tcell", "Bcell", "NK", "unknown"}
    # barcodes sorted within the site block (deterministic output)
    cbs = [r[7] for r in rows if r[1] == "110"]
    assert cbs == sorted(cbs)


def test_mito_elbow_cutoff():
    from legume_tpu.faba.cell_calling import mito_elbow_cutoff

    # bulk of cells at ~2% MT, burst tail climbing to 60%
    fr = np.concatenate([
        np.linspace(0.0, 0.04, 180), np.linspace(0.1, 0.6, 20)
    ])
    cut = mito_elbow_cutoff(np.sort(fr))
    assert cut is not None and 0.03 <= cut <= 0.35
    # flat distribution / tiny n -> None
    assert mito_elbow_cutoff(np.full(100, 0.01)) is None
    assert mito_elbow_cutoff(np.linspace(0, 1, 20)) is None


def test_gene_qc_masks():
    from legume_tpu.faba.cell_calling import gene_qc_masks

    rng = np.random.default_rng(2)
    x = rng.poisson(1.0, (30, 50))
    x[5] = 0  # dead gene
    x[:, 7] = 0  # dead cell
    gk, ck = gene_qc_masks(
        sp.csc_matrix(x.astype(np.float32)),
        gene_min_cells=5, gene_min_counts=10, cell_min_genes=5,
    )
    assert not gk[5] and not ck[7]
    assert gk.sum() >= 25 and ck.sum() >= 45


def test_faba_genes_cli_gene_qc(tmp_path):
    """`faba genes --gene-qc`: mito genes excluded from the quantified
    set, cell_qc parquet written, expression floors applied."""
    import pandas as pd

    from legume_tpu.cli import main as cli
    from legume_tpu.faba.bam import write_bam

    cells = [f"c{i}" for i in range(6)]
    reads = []
    # gene on chr1 covered in all cells; gene on chrM covered too
    for i in range(40):
        reads.append(dict(name=f"a{i}", ref_id=0, pos=100 + (i % 7),
                          seq="A" * 30, cigar="30M", cb=cells[i % 6],
                          ub=f"ua{i}", md="30"))
    for i in range(12):
        reads.append(dict(name=f"m{i}", ref_id=1, pos=50, seq="A" * 30,
                          cigar="30M", cb=cells[i % 6], ub=f"um{i}", md="30"))
    bam = str(tmp_path / "r.bam")
    write_bam(bam, [("chr1", 5000), ("chrM", 2000)], reads)
    gff = tmp_path / "g.gff"
    gff.write_text(
        'chr1\ts\tgene\t1\t4000\t.\t+\t.\tgene_id "NUC"; gene_name "NUC";\n'
        'chrM\ts\tgene\t1\t1500\t.\t+\t.\tgene_id "MTG"; gene_name "MTG";\n'
    )
    out = str(tmp_path / "g.zarr")
    cli.run_faba([
        "genes", "--bam", bam, "--gff", str(gff), "--output", out,
        "--gene-qc", "--gene-min-cells", "2", "--cell-min-genes", "1",
        "--no-mito-cell-qc",
    ])
    from legume_tpu.data.sparse_io import open_sparse_matrix

    be = open_sparse_matrix(out)
    assert be.row_names() == ["NUC"]  # chrM gene excluded
    qc = pd.read_parquet(out + ".cell_qc.parquet")
    assert len(qc) == 6 and (qc["mito_frac"] > 0).all()
    # --keep-mito retains the chrM gene
    out2 = str(tmp_path / "g2.zarr")
    cli.run_faba([
        "genes", "--bam", bam, "--gff", str(gff), "--output", out2,
        "--gene-qc", "--gene-min-cells", "2", "--cell-min-genes", "1",
        "--keep-mito", "--no-mito-cell-qc",
    ])
    assert set(open_sparse_matrix(out2).row_names()) == {"NUC", "MTG"}


def test_dartseq_gene_qc_gates_cells(tmp_path):
    """dartseq --gene-qc: a cell detected in too few genes drops from
    the site pipeline (cell-min-genes floor on the gene counts)."""
    from legume_tpu.cli import main as cli
    from legume_tpu.faba.bam import write_bam

    cells = ["cellA", "cellB", "cellC"]
    wt = _site_reads("s1_", 100, 14, 8, cells)
    # cellGhost appears only outside any gene -> 0 genes detected
    wt += [dict(name="g0", ref_id=0, pos=4000, seq="A" * 30, cigar="30M",
                cb="cellGhost", ub="ug0", md="30")]
    ct = _site_reads("c1_", 100, 1, 20, cells)
    gff = tmp_path / "g.gff"
    gff.write_text(
        'chr1\ts\tgene\t1\t3000\t.\t+\t.\tgene_id "G1"; gene_name "G1";\n'
    )
    wt_p, ct_p = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    write_bam(wt_p, [("chr1", 10000)], wt)
    write_bam(ct_p, [("chr1", 10000)], ct)
    out = str(tmp_path / "dq")
    cli.run_faba([
        "dartseq", "--bam", wt_p, "--control-bam", ct_p, "--output", out,
        "--gff", str(gff), "--no-mixture",
        "--gene-qc", "--gene-min-cells", "1", "--cell-min-genes", "1",
    ])
    called = (tmp_path / "dq.called_cells.txt").read_text().split()
    assert "cellGhost" not in called and "cellA" in called
