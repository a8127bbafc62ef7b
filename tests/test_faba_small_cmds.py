"""faba small-command flag tails: metagene (MetaPlotR tripartite),
pwm --source reads, genes multi-BAM/biotype/cutoffs, depth tiles."""

import gzip

import numpy as np
import pandas as pd
import pytest

from legume_tpu.cli import main as cli
from legume_tpu.data.sparse_io import open_sparse_matrix
from legume_tpu.faba.bam import write_bam
from legume_tpu.faba.metagene import (
    elect_longest_isoform,
    metagene_metaplotr,
    parse_gff_transcripts,
)

TRIPARTITE_GFF = """chr1\tx\tgene\t1\t1000\t.\t+\t.\tID=gene:G1
chr1\tx\tmRNA\t1\t1000\t.\t+\t.\tID=transcript:T1;Parent=gene:G1
chr1\tx\texon\t1\t1000\t.\t+\t.\tParent=transcript:T1
chr1\tx\tfive_prime_UTR\t1\t100\t.\t+\t.\tParent=transcript:T1
chr1\tx\tCDS\t101\t800\t.\t+\t.\tParent=transcript:T1
chr1\tx\tthree_prime_UTR\t801\t1000\t.\t+\t.\tParent=transcript:T1
chr1\tx\tmRNA\t2001\t3000\t.\t-\t.\tID=transcript:T2;Parent=gene:G2
chr1\tx\texon\t2001\t3000\t.\t-\t.\tParent=transcript:T2
chr1\tx\tCDS\t2101\t2800\t.\t-\t.\tParent=transcript:T2
chr1\tx\ttranscript\t5001\t5500\t.\t+\t.\tID=transcript:NC1;Parent=gene:NC
chr1\tx\texon\t5001\t5500\t.\t+\t.\tParent=transcript:NC1
"""


def test_transcript_models_and_strand_aware_utrs(tmp_path):
    gff = tmp_path / "g.gff"
    gff.write_text(TRIPARTITE_GFF)
    models, nc = parse_gff_transcripts(str(gff))
    by_id = {m.tx_id: m for m in models}
    t1 = by_id["T1"]
    assert (t1.region_size(0), t1.region_size(1), t1.region_size(2)) \
        == (100, 700, 200)
    # T2 has no explicit UTR rows: derived from exons minus CDS span,
    # strand-aware (the HIGH side is the 5'UTR on the minus strand)
    t2 = by_id["T2"]
    assert (t2.region_size(0), t2.region_size(1), t2.region_size(2)) \
        == (200, 700, 100)
    assert [b.gene for b in nc] == ["NC"]


def test_metaplotr_rescaled_axis(tmp_path):
    gff = tmp_path / "g.gff"
    gff.write_text(TRIPARTITE_GFF)
    models, nc = parse_gff_transcripts(str(gff))
    chroms = np.array(["chr1"] * 4, object)
    pos = np.array([50, 400, 850, 5100])
    res = metagene_metaplotr(models, nc, chroms, pos, bins=30,
                             include_ncrna=True)
    loc = {d["site"]: d["rescaled_location"] for d in res["distances"]}
    # 5'UTR lands in [1-sf5, 1), CDS in [1,2), 3'UTR in [2, 2+sf3],
    # ncRNA on its own [0,1] axis
    sf5, sf3 = res["scale_factors"]
    assert 1 - sf5 <= loc[0] < 1 and 1 <= loc[1] < 2
    assert 2 <= loc[2] <= 2 + sf3 and 0 <= loc[3] < 1
    # bins split ~ proportionally to the 100/700/200 medians
    assert res["region_bins"] == [3, 21, 6]
    # every represented region keeps >= 1 bin even with tiny budgets
    tiny = metagene_metaplotr(models, nc, chroms, pos[:3], bins=4)
    assert all(b >= 1 for b in tiny["region_bins"])


def test_longest_isoform_election(tmp_path):
    gff = tmp_path / "iso.gff"
    gff.write_text(
        "chr1\tx\tmRNA\t1\t500\t.\t+\t.\tID=transcript:A1;Parent=gene:G\n"
        "chr1\tx\texon\t1\t500\t.\t+\t.\tParent=transcript:A1\n"
        "chr1\tx\tCDS\t1\t500\t.\t+\t.\tParent=transcript:A1\n"
        "chr1\tx\tmRNA\t1\t900\t.\t+\t.\tID=transcript:A2;Parent=gene:G\n"
        "chr1\tx\texon\t1\t900\t.\t+\t.\tParent=transcript:A2\n"
        "chr1\tx\tCDS\t1\t900\t.\t+\t.\tParent=transcript:A2\n"
    )
    models, _ = parse_gff_transcripts(str(gff))
    kept = elect_longest_isoform(models)
    assert [m.tx_id for m in kept] == ["A2"]


def test_metagene_cli(tmp_path, capsys):
    gff = tmp_path / "g.gff"
    gff.write_text(TRIPARTITE_GFF)
    sites = tmp_path / "sites.parquet"
    pd.DataFrame({
        "chrom": ["chr1"] * 3, "pos": [50, 400, 850],
    }).to_parquet(sites)
    out = str(tmp_path / "mg.tsv")
    cli.run_faba([
        "metagene", "--sites", str(sites), "--gff", str(gff),
        "--output", out, "--bins", "30",
        "--distances", str(tmp_path / "dist.tsv"), "--print",
    ])
    tsv = pd.read_csv(out, sep="\t")
    assert set(tsv["#feature"]) == {"5UTR", "CDS", "3UTR"}
    assert tsv["count"].sum() == 3
    dist = pd.read_csv(tmp_path / "dist.tsv", sep="\t")
    assert {"rescaled_location", "utr5_size", "cds_size",
            "utr3_size"} <= set(dist.columns)
    # legacy uniform-body mode still available
    cli.run_faba([
        "metagene", "--sites", str(sites), "--gff", str(gff),
        "--output", str(tmp_path / "body"), "--bins", "10", "--body",
    ])
    body = pd.read_parquet(tmp_path / "body.metagene.parquet")
    assert len(body) == 10


@pytest.fixture()
def site_bam(tmp_path):
    reads = []
    for i in range(10):
        conv = i < 6
        md = "10C29" if conv else "40"
        seq = list("A" * 40)
        seq[10] = "T" if conv else "C"
        reads.append(dict(
            name=f"r{i}", ref_id=0, pos=100, seq="".join(seq),
            cigar="40M", cb=f"c{i % 2}", ub=f"u{i}", md=md,
        ))
    bam = str(tmp_path / "t.bam")
    write_bam(bam, [("chr1", 400)], reads)
    fasta = tmp_path / "ref.fa"
    # site is at 0-based position 110: put the C there (flank context
    # 108..112 = GCCGT)
    fasta.write_text(">chr1\n" + "A" * 108 + "GCCGT" + "A" * 287 + "\n")
    sites = tmp_path / "s.parquet"
    pd.DataFrame({"chrom": ["chr1"], "pos": [110]}).to_parquet(sites)
    return bam, str(fasta), str(sites)


def test_pwm_source_reads(site_bam, tmp_path, capsys):
    bam, fasta, sites = site_bam
    cli.run_faba([
        "pwm", "--sites", sites, "--fasta", fasta,
        "--output", str(tmp_path / "ref_pwm"), "--flank", "2",
    ])
    ref_out = pd.read_parquet(tmp_path / "ref_pwm.pwm.parquet")
    # reference context at 110 +/- 2: CGCGA columns -> center is C
    assert ref_out.iloc[2][["A", "C", "G", "T"]].astype(float).idxmax() == "C"
    cli.run_faba([
        "pwm", "--sites", sites, "--fasta", fasta, "--source", "reads",
        "--bam", bam, "--output", str(tmp_path / "reads_pwm.tsv"),
        "--flank", "2",
    ])
    reads_out = pd.read_csv(tmp_path / "reads_pwm.tsv", sep="\t")
    # 6/10 reads converted C->T at the center: T dominates in the
    # read-sourced PWM where the reference PWM says C
    center = reads_out.iloc[2]
    assert center["T"] > center["C"]


def test_genes_multibam_biotype_cutoffs(tmp_path):
    reads = [
        dict(name=f"r{i}", ref_id=0, pos=100 + i, seq="A" * 30,
             cigar="30M", cb=f"c{i % 3}", ub=f"u{i}", md="30")
        for i in range(9)
    ]
    bam1 = str(tmp_path / "b1.bam")
    bam2 = str(tmp_path / "b2.bam")
    write_bam(bam1, [("chr1", 1000)], reads)
    write_bam(bam2, [("chr1", 1000)], reads[:3])
    gff = tmp_path / "g.gff"
    gff.write_text(
        "chr1\tx\tgene\t50\t400\t.\t+\t.\t"
        "gene_name=GP;gene_biotype=protein_coding\n"
        "chr1\tx\tgene\t500\t900\t.\t+\t.\t"
        "gene_name=GL;gene_biotype=lncRNA\n"
    )
    out = str(tmp_path / "g")
    cli.run_faba([
        "genes", "--bam", f"{bam1},{bam2}", "--gff", str(gff),
        "--output", out, "--gene-type", "protein_coding",
    ])
    b1 = open_sparse_matrix(f"{out}.b1")
    b2 = open_sparse_matrix(f"{out}.b2")
    assert b1.row_names() == ["GP"] and b2.row_names() == ["GP"]
    assert b1.num_columns == 3 and b2.num_columns == 3
    # column nnz cutoff drops silent cells
    cli.run_faba([
        "genes", "--bam", bam2, "--gff", str(gff),
        "--output", str(tmp_path / "cut"), "--column-nnz-cutoff", "1",
    ])
    cut = open_sparse_matrix(str(tmp_path / "cut"))
    assert cut.num_columns == 3  # all three cells have a read in b2


def test_pileup_matrix_track_mode(tmp_path, capsys):
    """pileup --data: locus-keyed matrix rows binned over a region
    with per-position aggregation + a sites second track."""
    import scipy.sparse as sp

    from legume_tpu.data.sparse_io import create_sparse_from_csc

    rows = [
        "chr1:100/m6a/CT", "chr1:150/m6a/CT",
        "chr1:900/m6a/CT", "chr2:100/m6a/CT",
    ]
    x = sp.csc_matrix(np.array([
        [3, 0, 1], [0, 2, 0], [5, 5, 5], [9, 9, 9],
    ], np.float32))
    be = str(tmp_path / "m.zarr")
    create_sparse_from_csc(x, be, rows, ["c0", "c1", "c2"])
    sites = tmp_path / "sites.parquet"
    pd.DataFrame({
        "chrom": ["chr1", "chr1"], "pos": [120, 905],
        "pvalue_betabinom": [1e-4, 1e-2],
    }).to_parquet(sites)
    out = str(tmp_path / "p.tsv")
    cli.run_faba([
        "pileup", "--data", be, "--regions", "chr1:50-1000",
        "--signal", "sum", "--bins", "10", "--output", out,
        "--sites", str(sites), "--site-signal", "neglog10pv",
        "--quiet",
    ])
    tsv = pd.read_csv(out, sep="\t")
    mat = tsv[tsv["track"] == "matrix"]
    # chr2 row excluded; totals: bin of 100/150 carries 4+2, bin of
    # 900 carries 15
    assert mat["value"].sum() == 21
    st = tsv[tsv["track"] == "sites"]
    assert st["value"].sum() == pytest.approx(4 + 2)
    # nnz aggregation
    cli.run_faba([
        "pileup", "--data", be, "--regions", "chr1:50-1000",
        "--signal", "nnz", "--bins", "5", "--output", out, "--quiet",
    ])
    tsv2 = pd.read_csv(out, sep="\t")
    assert tsv2["value"].sum() == 2 + 1 + 3
    # gene-symbol selection resolves through the GFF
    gff = tmp_path / "g.gff"
    gff.write_text("chr1\tx\tgene\t60\t200\t.\t+\t.\tgene_name=GX\n")
    cli.run_faba([
        "pileup", "--data", be, "--genes", "GX", "--gff", str(gff),
        "--signal", "sum", "--bins", "4", "--output", out, "--quiet",
    ])
    tsv3 = pd.read_csv(out, sep="\t")
    assert tsv3["value"].sum() == 6  # only the two sites inside GX


def test_depth_resolution_mode(tmp_path):
    reads = [
        dict(name=f"r{i}", ref_id=0, pos=100, seq="A" * 30,
             cigar="30M", cb="cA", ub=f"u{i}", md="30")
        for i in range(4)
    ] + [
        dict(name="far", ref_id=0, pos=3000, seq="A" * 30,
             cigar="30M", cb="cB", ub="uf", md="30")
    ]
    bam = str(tmp_path / "d.bam")
    write_bam(bam, [("chr1", 4000)], reads)
    out = str(tmp_path / "d")
    cli.run_faba([
        "depth", "--bam", bam, "--output", out, "--resolution-kb", "1",
        "--row-nnz-cutoff", "1",
    ])
    be = open_sparse_matrix(f"{out}.zarr")
    assert be.row_names() == ["chr1:0-1000", "chr1:3000-4000"]
    dense = be.read_columns_dense(np.arange(be.num_columns))
    assert dense.sum() == 5
    with pytest.raises(SystemExit, match="exactly one"):
        cli.run_faba(["depth", "--bam", bam, "--output", out])


def test_gem_raw_collapse_and_knobs(tmp_path):
    """gem --raw: in-command pseudobulk collapse (CollapseArgs) plus
    the softmax objective / AdamW knobs."""
    import scipy.sparse as sp

    from legume_tpu.data.sparse_io import create_sparse_from_csc

    rng = np.random.default_rng(0)
    d, n = 25, 150
    base = rng.gamma(2.0, 2.0, (d, n))
    s = rng.poisson(base * 3.0).astype(np.float32)
    u = rng.poisson(base * 1.0).astype(np.float32)
    genes = [f"g{i}" for i in range(d)]
    cells = [f"c{j}" for j in range(n)]
    create_sparse_from_csc(sp.csc_matrix(s), str(tmp_path / "s.zarr"),
                           genes, cells)
    create_sparse_from_csc(sp.csc_matrix(u), str(tmp_path / "u.zarr"),
                           genes, cells)
    out = str(tmp_path / "g")
    cli.run_faba([
        "gem", "--spliced", str(tmp_path / "s.zarr"),
        "--unspliced", str(tmp_path / "u.zarr"), "--output", out,
        "--raw", "--sort-dim", "4", "--proj-dim", "8", "--n-hvg", "15",
        "--epochs", "40", "--nce-objective", "softmax",
        "--weight-decay", "0.01", "--grad-clip", "1.0", "--seed", "1",
    ])
    lat = pd.read_parquet(f"{out}.latent.parquet")
    assert 1 < len(lat) <= 16  # <= 2^sort_dim pseudobulks
    part = np.load(f"{out}.partition.npz")
    assert len(part["fine_groups"]) == n


def test_dyn_assoc_from_prefix_modality_celltype(tmp_path):
    """dyn-assoc --from/--modality/--cell-membership surface."""
    import scipy.sparse as sp

    from legume_tpu.data.sparse_io import create_sparse_from_csc

    rng = np.random.default_rng(0)
    n = 120
    branch = np.repeat([0, 1], n // 2)
    # site 0 (m6a): branch-1 enriched; site 1 (atoi): flat
    counts = np.vstack([
        rng.poisson(np.where(branch == 1, 8.0, 1.0)),
        rng.poisson(np.full(n, 3.0)),
    ]).astype(np.float32)
    rows = ["chr1:100/m6a/CT", "chr1:200/atoi/AG"]
    cells = [f"c{j}" for j in range(n)]
    be = str(tmp_path / "sites.zarr")
    create_sparse_from_csc(sp.csc_matrix(counts), be, rows, cells)
    pd.DataFrame({
        "cell": cells, "pseudotime": np.linspace(0, 1, n),
        "branch": branch,
    }).to_parquet(tmp_path / "lin.pseudotime.parquet")
    memb = tmp_path / "ct.tsv"
    memb.write_text("".join(
        f"c{j}\t{'T' if j % 2 else 'B'}\n" for j in range(n)
    ))
    cli.run_faba([
        "dyn-assoc", "--backend", be, "--from", str(tmp_path / "lin"),
        "--modality", "m6a", "--cell-membership", str(memb),
        "--fdr-alpha", "0.05",
    ])
    res = pd.read_parquet(tmp_path / "lin.assoc.parquet")
    assert len(res) == 1 and res["site"].iloc[0].startswith("chr1:100")
    assert bool(res["significant"].iloc[0])
    ct = pd.read_parquet(tmp_path / "lin.assoc.celltype.parquet")
    assert set(ct["cell_type"]) == {"B", "T"}
    assert (ct["z"].abs() > 2).all()  # the effect holds within types
