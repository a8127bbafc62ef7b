"""faba dartseq: C->T site calling end-to-end on synthetic BAMs
(m6a pipeline parity, SURVEY.md section 3.5)."""

import numpy as np
import pytest

from legume_tpu.faba.bam import read_bam, write_bam
from legume_tpu.faba.dartseq import run_dartseq


def _reads_for_site(name_prefix, pos, n_conv, n_ref, cells, rng, read_len=40, site_off=10):
    """Reads covering a site at `pos + site_off` with/without C->T."""
    reads = []
    for i in range(n_conv + n_ref):
        conv = i < n_conv
        # MD: site_off matches, then mismatch C (ref) read T, then rest
        md = f"{site_off}C{read_len - site_off - 1}" if conv else f"{read_len}"
        seq = list("A" * read_len)
        seq[site_off] = "T" if conv else "C"
        reads.append(
            dict(
                name=f"{name_prefix}{i}", ref_id=0, pos=pos, seq="".join(seq),
                cigar=f"{read_len}M", cb=cells[i % len(cells)], ub=f"u{name_prefix}{i}",
                md=md,
            )
        )
    return reads


@pytest.fixture(scope="module")
def dartseq_bams(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("dart")
    rng = np.random.default_rng(0)
    cells = ["cellA", "cellB", "cellC"]

    # WT: strong conversion at site 110 (pos 100 + 10), noise at 510
    wt = []
    wt += _reads_for_site("s1_", 100, n_conv=12, n_ref=8, cells=cells, rng=rng)
    wt += _reads_for_site("s2_", 500, n_conv=1, n_ref=25, cells=cells, rng=rng)
    # control: background only at both sites
    ct = []
    ct += _reads_for_site("c1_", 100, n_conv=1, n_ref=20, cells=cells, rng=rng)
    ct += _reads_for_site("c2_", 500, n_conv=1, n_ref=24, cells=cells, rng=rng)

    wt_path, ct_path = str(tmp / "wt.bam"), str(tmp / "ct.bam")
    write_bam(wt_path, [("chr1", 10000)], wt)
    write_bam(ct_path, [("chr1", 10000)], ct)
    return wt_path, ct_path


def test_mismatch_extraction(dartseq_bams):
    wt_path, _ = dartseq_bams
    recs = read_bam(wt_path)
    assert recs.mm_pos is not None and len(recs.mm_pos) == 13  # 12 + 1 noise
    assert np.all(recs.mm_ref_base == ord("C"))
    assert np.all(recs.mm_read_base == ord("T"))
    assert set(recs.mm_pos.tolist()) == {110, 510}


def test_dartseq_calls_true_site(dartseq_bams):
    wt_path, ct_path = dartseq_bams
    res = run_dartseq(wt_path, ct_path, max_p=0.05, min_alt=3)
    # only the strong site survives
    assert res.sites.shape[0] == 1
    assert res.sites[0, 1] == 110
    assert res.site_names[0].startswith("chr1:110/m6a")
    # per-cell counts sum to the 12 deduped conversions
    assert res.cell_counts.sum() == 12
    assert res.cell_counts.shape[1] == 3


def test_atoi_reuses_contrast(tmp_path):
    """A->G editing calls ride the same machinery (faba atoi)."""
    from legume_tpu.faba.dartseq import run_atoi

    cells = ["c1", "c2"]
    rng = np.random.default_rng(1)
    wt, ct = [], []
    for i in range(14):
        conv = i < 10
        md = "10A29" if conv else "40"
        seq = list("C" * 40)
        seq[10] = "G" if conv else "A"
        wt.append(dict(name=f"w{i}", ref_id=0, pos=200, seq="".join(seq),
                       cigar="40M", cb=cells[i % 2], ub=f"uw{i}", md=md))
    for i in range(14):
        seq = "C" * 40
        ct.append(dict(name=f"k{i}", ref_id=0, pos=200, seq=seq,
                       cigar="40M", cb=cells[i % 2], ub=f"uk{i}", md="40"))
    wt_path, ct_path = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    write_bam(wt_path, [("chr1", 5000)], wt)
    write_bam(ct_path, [("chr1", 5000)], ct)
    res = run_atoi(wt_path, ct_path, max_p=0.05, min_alt=3)
    assert res.sites.shape[0] == 1
    assert res.site_names[0] == "chr1:210/atoi/AG"


def test_dartseq_minus_strand_channel(tmp_path):
    """Minus-strand genes convert as G->A in reference space; the
    complementary channel must be scanned and merged (dartseq.py
    strand handling; the reference resolves strand via the gene
    model before the contrast tests)."""
    cells = ["c1", "c2"]
    wt, ct = [], []
    for i in range(16):
        conv = i < 11
        md = "10G29" if conv else "40"
        seq = list("C" * 40)
        seq[10] = "A" if conv else "G"
        wt.append(dict(name=f"w{i}", ref_id=0, pos=300, seq="".join(seq),
                       cigar="40M", cb=cells[i % 2], ub=f"uw{i}", md=md))
    for i in range(16):
        ct.append(dict(name=f"k{i}", ref_id=0, pos=300, seq="C" * 40,
                       cigar="40M", cb=cells[i % 2], ub=f"uk{i}", md="40"))
    wt_path, ct_path = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    write_bam(wt_path, [("chr1", 5000)], wt)
    write_bam(ct_path, [("chr1", 5000)], ct)
    res = run_dartseq(wt_path, ct_path, max_p=0.05, min_alt=3)
    assert res.sites.shape[0] == 1
    assert res.sites[0, 1] == 310
    assert res.site_names[0] == "chr1:310/m6a/GA"
    assert res.strand[0] == "-"
    assert res.cell_counts.sum() == 11


def test_faba_all_pipeline(dartseq_bams, tmp_path):
    """`faba all` chains genes + apa + snp (+ m6a with a control)."""
    from pathlib import Path

    from legume_tpu.faba.pipeline import run_all

    wt_path, _ = dartseq_bams
    gff = tmp_path / "g.gff"
    gff.write_text(
        "chr1\tsrc\tgene\t50\t400\t.\t+\t.\tID=gene:GA;Name=GeneA\n"
        "chr1\tsrc\tgene\t450\t800\t.\t+\t.\tID=gene:GB;Name=GeneB\n"
    )
    res = run_all(wt_path, str(gff), str(tmp_path / "all"))
    assert "genes" in res.outputs
    assert Path(str(tmp_path / "all") + ".gem.json").exists()
    from legume_tpu.data import open_sparse_matrix

    be = open_sparse_matrix(res.outputs["genes"])
    assert be.num_rows == 2


def test_dartseq_snp_mask_and_coverage_floor(dartseq_bams):
    """--snp-mask-file excludes known variant positions and
    --min-coverage floors the WT coverage (DartSeqCountArgs
    snp_mask_file / min_coverage)."""
    wt_path, ct_path = dartseq_bams
    base = run_dartseq(wt_path, ct_path, max_p=0.05, min_alt=3)
    assert base.sites.shape[0] == 1
    masked = run_dartseq(
        wt_path, ct_path, max_p=0.05, min_alt=3,
        snp_mask={("chr1", 110)},
    )
    assert masked.sites.shape[0] == 0
    floored = run_dartseq(
        wt_path, ct_path, max_p=0.05, min_alt=3, min_coverage=10**6
    )
    assert floored.sites.shape[0] == 0


def test_dartseq_rac_motif_gate(tmp_path):
    """--genome restricts called sites to the DART RAC motif
    (editing/sifter.rs:67-83); --no-check-r-site relaxes [AG] at -2."""
    import pandas as pd

    from legume_tpu.cli.main import run_faba

    rng = np.random.default_rng(0)
    cells = ["cellA", "cellB"]
    wt, ct = [], []
    # two strong sites at 110 and 410
    for tag, pos in [("a", 100), ("b", 400)]:
        wt += _reads_for_site(f"{tag}_", pos, n_conv=12, n_ref=8,
                              cells=cells, rng=rng)
        ct += _reads_for_site(f"c{tag}_", pos, n_conv=0, n_ref=20,
                              cells=cells, rng=rng)
    wt_path, ct_path = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    write_bam(wt_path, [("chr1", 10000)], wt)
    write_bam(ct_path, [("chr1", 10000)], ct)

    # genome: RAC (GAC) around site 110, TAC around site 410 — the
    # second passes only when the R-site check is relaxed
    seq = list("T" * 1000)
    seq[108:111] = list("GAC")
    seq[408:411] = list("TAC")
    fasta = str(tmp_path / "genome.fa")
    with open(fasta, "w") as f:
        f.write(">chr1\n" + "".join(seq) + "\n")

    out = str(tmp_path / "strict")
    run_faba(["dartseq", "--bam", wt_path, "--control-bam", ct_path,
              "--output", out, "--genome", fasta])
    strict = pd.read_parquet(f"{out}.sites.parquet")
    assert strict["pos"].tolist() == [110]

    out2 = str(tmp_path / "relaxed")
    run_faba(["dartseq", "--bam", wt_path, "--control-bam", ct_path,
              "--output", out2, "--genome", fasta, "--no-check-r-site"])
    relaxed = pd.read_parquet(f"{out2}.sites.parquet")
    assert sorted(relaxed["pos"].tolist()) == [110, 410]


def test_dartseq_min_base_quality(tmp_path):
    """Low-phred conversions are sequencing errors: the default floor
    (20, dna_stat_map.rs) drops a site whose alt reads carry q=5."""
    rng = np.random.default_rng(0)
    cells = ["cellA", "cellB"]
    wt = _reads_for_site("a_", 100, n_conv=12, n_ref=8, cells=cells, rng=rng)
    low = _reads_for_site("b_", 400, n_conv=12, n_ref=8, cells=cells, rng=rng)
    for r in low:
        r["qual"] = 5
    ct = _reads_for_site("ca_", 100, n_conv=0, n_ref=20, cells=cells, rng=rng)
    ct += _reads_for_site("cb_", 400, n_conv=0, n_ref=20, cells=cells, rng=rng)
    wt_path, ct_path = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    write_bam(wt_path, [("chr1", 10000)], wt + low)
    write_bam(ct_path, [("chr1", 10000)], ct)

    res = run_dartseq(wt_path, ct_path)
    assert res.sites[:, 1].tolist() == [110]
    res0 = run_dartseq(wt_path, ct_path, min_baseq=0)
    assert sorted(res0.sites[:, 1].tolist()) == [110, 410]


def test_dartseq_valid_cells_filter(tmp_path):
    """--valid-cells: reads from uncalled barcodes are ambient and do
    not enter site tests or quantification."""
    rng = np.random.default_rng(0)
    # cellC carries ALL the conversions; restricting to A/B kills the site
    wt = _reads_for_site("a_", 100, n_conv=12, n_ref=8,
                         cells=["cellC"], rng=rng)
    wt += _reads_for_site("b_", 100, n_conv=0, n_ref=10,
                          cells=["cellA", "cellB"], rng=rng)
    ct = _reads_for_site("ca_", 100, n_conv=0, n_ref=20,
                         cells=["cellA", "cellB", "cellC"], rng=rng)
    wt_path, ct_path = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    write_bam(wt_path, [("chr1", 10000)], wt)
    write_bam(ct_path, [("chr1", 10000)], ct)

    full = run_dartseq(wt_path, ct_path)
    assert full.sites[:, 1].tolist() == [110]
    gated = run_dartseq(wt_path, ct_path, valid_cells={"cellA", "cellB"})
    assert len(gated.sites) == 0


def _atoi_reads(prefix, pos, n_edit, n_ref, cells, site_off=9, read_len=40):
    """Reads with an A->G edit at pos+site_off (A-to-I in reference space)."""
    reads = []
    for i in range(n_edit + n_ref):
        edit = i < n_edit
        md = f"{site_off}A{read_len - site_off - 1}" if edit else f"{read_len}"
        seq = list("A" * read_len)
        if edit:
            seq[site_off] = "G"
        reads.append(dict(
            name=f"{prefix}{i}", ref_id=0, pos=pos, seq="".join(seq),
            cigar=f"{read_len}M", cb=cells[i % len(cells)],
            ub=f"u{prefix}{i}", md=md,
        ))
    return reads


def test_dartseq_detect_atoi_confounder_mask(tmp_path):
    """--detect-atoi: an A->G edit inside the RAC triplet (at pos-1 of
    the called C) masks the m6A candidate as an A-to-I confounder."""
    import pandas as pd

    from legume_tpu.cli.main import run_faba

    rng = np.random.default_rng(0)
    cells = ["cellA", "cellB"]
    # m6A-like site at 110 + A->G editing at 109 (the triplet's A)
    wt = _reads_for_site("a_", 100, n_conv=12, n_ref=8, cells=cells, rng=rng)
    wt += _atoi_reads("e_", 100, n_edit=8, n_ref=4, cells=cells)
    # clean m6A site at 410, no editing nearby
    wt += _reads_for_site("b_", 400, n_conv=12, n_ref=8, cells=cells, rng=rng)
    ct = _reads_for_site("ca_", 100, n_conv=0, n_ref=20, cells=cells, rng=rng)
    ct += _reads_for_site("cb_", 400, n_conv=0, n_ref=20, cells=cells, rng=rng)
    wt_path, ct_path = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    write_bam(wt_path, [("chr1", 10000)], wt)
    write_bam(ct_path, [("chr1", 10000)], ct)

    out = str(tmp_path / "plain")
    run_faba(["dartseq", "--bam", wt_path, "--control-bam", ct_path,
              "--output", out])
    plain = pd.read_parquet(f"{out}.sites.parquet")
    assert sorted(plain["pos"].tolist()) == [110, 410]

    out2 = str(tmp_path / "masked")
    run_faba(["dartseq", "--bam", wt_path, "--control-bam", ct_path,
              "--output", out2, "--detect-atoi"])
    masked = pd.read_parquet(f"{out2}.sites.parquet")
    assert masked["pos"].tolist() == [410]
    amask = pd.read_parquet(f"{out2}.atoi_mask.sites.parquet")
    assert 109 in amask["pos"].tolist()

    # the emitted mask parquet round-trips through --atoi-mask
    out3 = str(tmp_path / "pre")
    run_faba(["dartseq", "--bam", wt_path, "--control-bam", ct_path,
              "--output", out3, "--atoi-mask",
              f"{out2}.atoi_mask.sites.parquet"])
    pre = pd.read_parquet(f"{out3}.sites.parquet")
    assert pre["pos"].tolist() == [410]


def test_gene_tag_filter_drops_disagreeing_conversions(tmp_path):
    """--gene-barcode-tag on the editing contrast (DartSeqCountArgs /
    bam_io.rs record_matches_gene): conversions carried by reads whose
    GX tag disagrees with the GFF gene at their locus are ambient and
    must not reach the site test; untagged reads drop unless
    --include-missing-barcode."""
    from legume_tpu.faba.dartseq import run_dartseq

    cells = ["c1", "c2"]
    gff = tmp_path / "genes.gff"
    gff.write_text(
        "chr1\tsrc\tgene\t1\t1000\t.\t+\t.\tID=gene:GA;Name=GeneA\n"
    )
    wt, ct = [], []
    for i in range(14):
        conv = i < 10
        md = "10C29" if conv else "40"
        seq = list("A" * 40)
        seq[10] = "T" if conv else "C"
        # reads 0-4: GX agrees (GeneA); 5-9: GX says GeneB (ambient,
        # not in the model at this locus); 10-13: unconverted coverage
        gx = "GeneA" if (i < 5 or i >= 10) else "GeneB"
        wt.append(dict(name=f"w{i}", ref_id=0, pos=100, seq="".join(seq),
                       cigar="40M", cb=cells[i % 2], ub=f"uw{i}", md=md,
                       gx=gx))
    for i in range(14):
        ct.append(dict(name=f"k{i}", ref_id=0, pos=100, seq="A" * 40,
                       cigar="40M", cb=cells[i % 2], ub=f"uk{i}", md="40",
                       gx="GeneA"))
    wt_path, ct_path = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    write_bam(wt_path, [("chr1", 5000)], wt)
    write_bam(ct_path, [("chr1", 5000)], ct)

    # unfiltered: all 10 conversions count
    res0 = run_dartseq(wt_path, ct_path, max_p=0.05, min_alt=3)
    assert res0.cell_counts.sum() == 10

    # GX filter: the 5 GeneB-tagged conversions drop
    res1 = run_dartseq(
        wt_path, ct_path, max_p=0.05, min_alt=3,
        gene_barcode_tag="GX", gff=str(gff),
    )
    assert res1.cell_counts.sum() == 5, res1.cell_counts.sum()

    # an untagged read's conversion needs --include-missing-barcode
    wt.append(dict(name="w14", ref_id=0, pos=100, seq="A" * 10 + "T" + "A" * 29,
                   cigar="40M", cb="c1", ub="uw14", md="10C29"))
    write_bam(wt_path, [("chr1", 5000)], wt)
    res2 = run_dartseq(
        wt_path, ct_path, max_p=0.05, min_alt=3,
        gene_barcode_tag="GX", gff=str(gff),
    )
    assert res2.cell_counts.sum() == 5
    res3 = run_dartseq(
        wt_path, ct_path, max_p=0.05, min_alt=3,
        gene_barcode_tag="GX", gff=str(gff), include_missing_barcode=True,
    )
    assert res3.cell_counts.sum() == 6


def test_gene_tag_filter_keeps_nonwinner_overlap(tmp_path):
    """ADVICE r4: at overlapping loci a read tagged with the
    non-GFF-winner gene must pass as long as that gene's interval
    covers the read (the reference's per-gene equality keying)."""
    from legume_tpu.faba.bam import read_bam
    from legume_tpu.faba.dartseq import filter_gene_tag
    from legume_tpu.faba.genes import parse_gff_genes

    gff = tmp_path / "genes.gff"
    gff.write_text(
        "chr1\tsrc\tgene\t1\t1000\t.\t+\t.\tID=gene:GA;Name=GeneA\n"
        "chr1\tsrc\tgene\t501\t1500\t.\t+\t.\tID=gene:GB;Name=GeneB\n"
    )
    reads = [
        # inside both genes, tagged with each in turn: both must pass
        dict(name="a", ref_id=0, pos=600, seq="A" * 20, cigar="20M",
             cb="c1", ub="u1", gx="GeneA"),
        dict(name="b", ref_id=0, pos=600, seq="A" * 20, cigar="20M",
             cb="c1", ub="u2", gx="GeneB"),
        # outside the tagged gene's span: must drop
        dict(name="c", ref_id=0, pos=1200, seq="A" * 20, cigar="20M",
             cb="c1", ub="u3", gx="GeneA"),
    ]
    path = str(tmp_path / "t.bam")
    write_bam(path, [("chr1", 5000)], reads)
    recs = read_bam(path, gene_tag="GX")
    model = parse_gff_genes(str(gff))
    kept = filter_gene_tag(recs, model)
    assert len(kept.pos) == 2 and set(kept.pos) == {600}
