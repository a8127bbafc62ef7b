"""faba BAM layer: the native BGZF/BAM reader round-trips fixtures
written by the pure-Python writer; gene counting recovers known
per-cell counts with UMI dedup (reference pattern 2/3)."""

import numpy as np
import pytest

from legume_tpu.faba.bam import read_bam, write_bam
from legume_tpu.faba.genes import count_genes, parse_gff_genes


@pytest.fixture(scope="module")
def tiny_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bam")
    path = str(tmp / "tiny.bam")
    refs = [("chr1", 10000), ("chr2", 5000)]
    reads = []
    # gene A: chr1:100-600, gene B: chr1:2000-2500, gene C: chr2:10-900
    layout = [
        ("cell1", "u1", 0, 150, 3),  # gene A
        ("cell1", "u1", 0, 160, 1),  # PCR duplicates of the same UMI
        ("cell1", "u2", 0, 2100, 2),  # gene B
        ("cell2", "u3", 0, 200, 1),  # gene A
        ("cell2", "u4", 1, 50, 2),  # gene C
        ("cell2", "u5", 0, 5000, 1),  # intergenic
    ]
    i = 0
    for cb, ub, rid, pos, copies in layout:
        for _ in range(copies):
            reads.append(
                dict(
                    name=f"r{i}", ref_id=rid, pos=pos, seq="ACGT" * 12,
                    cigar="48M", cb=cb, ub=ub,
                )
            )
            i += 1
    write_bam(path, refs, reads)

    gff = tmp / "genes.gff"
    gff.write_text(
        "chr1\tsrc\tgene\t101\t600\t.\t+\t.\tID=gene:GA;Name=GeneA\n"
        "chr1\tsrc\tgene\t2001\t2500\t.\t-\t.\tID=gene:GB;Name=GeneB\n"
        "chr2\tsrc\tgene\t11\t900\t.\t+\t.\tID=gene:GC;Name=GeneC\n"
    )
    return path, str(gff)


def test_bam_roundtrip(tiny_bam):
    path, _ = tiny_bam
    recs = read_bam(path)
    assert recs.ref_names == ["chr1", "chr2"]
    assert len(recs.pos) == 10
    assert set(recs.barcodes) == {"cell1", "cell2"}
    # CIGAR span: 48M from pos
    assert np.all(recs.end_pos - recs.pos == 48)
    assert np.all(recs.mapq == 60)


def test_gff_parse(tiny_bam):
    _, gff = tiny_bam
    model = parse_gff_genes(gff)
    assert model.names == ["GeneA", "GeneB", "GeneC"]
    assert model.start.tolist() == [100, 2000, 10]
    assert model.strand.tolist() == [1, -1, 1]


def test_count_genes_with_umi_dedup(tiny_bam):
    path, gff = tiny_bam
    counts, genes, barcodes = count_genes(path, gff)
    m = np.asarray(counts.todense())
    gi = {g: i for i, g in enumerate(genes)}
    ci = {c: i for i, c in enumerate(barcodes)}
    # cell1: GeneA 1 UMI (4 reads dedup to 1), GeneB 1 UMI (2 reads)
    assert m[gi["GeneA"], ci["cell1"]] == 1
    assert m[gi["GeneB"], ci["cell1"]] == 1
    # cell2: GeneA 1, GeneC 1
    assert m[gi["GeneA"], ci["cell2"]] == 1
    assert m[gi["GeneC"], ci["cell2"]] == 1
    # intergenic read not counted
    assert m.sum() == 4


def test_count_genes_no_dedup(tiny_bam):
    path, gff = tiny_bam
    counts, genes, barcodes = count_genes(path, gff, dedup_umi=False)
    m = np.asarray(counts.todense())
    gi = {g: i for i, g in enumerate(genes)}
    ci = {c: i for i, c in enumerate(barcodes)}
    assert m[gi["GeneA"], ci["cell1"]] == 4  # raw read count


def test_pileup_miami_figure(tiny_bam, tmp_path):
    """`faba pileup --miami` renders the mirrored figure: sites up,
    gene model middle, depth down (faba plot figure mode)."""
    import pandas as pd

    from legume_tpu.cli import main as cli

    path, gff = tiny_bam
    sites = tmp_path / "sites.parquet"
    pd.DataFrame({
        "chrom": ["chr1", "chr1", "chr1"],
        "pos": [150, 210, 2100],
        "stat": [3.0, 1.5, 2.0],
    }).to_parquet(sites)
    fig = tmp_path / "miami.pdf"
    cli.run_faba([
        "pileup", "--bam", path, "--sites", str(sites),
        "--output", str(tmp_path / "pu"),
        "--miami", str(fig), "--region", "chr1:50-2600", "--gff", gff,
    ])
    assert fig.exists() and fig.stat().st_size > 1000

    # faceted: one panel per cell type via --cell-membership
    memb = tmp_path / "memb.tsv"
    memb.write_text("cell1\ttypeA\ncell2\ttypeB\n")
    fig2 = tmp_path / "miami_facets.pdf"
    cli.run_faba([
        "pileup", "--bam", path, "--sites", str(sites),
        "--output", str(tmp_path / "pu2"),
        "--miami", str(fig2), "--region", "chr1:50-2600", "--gff", gff,
        "--cell-membership", str(memb),
    ])
    assert fig2.exists() and fig2.stat().st_size > fig.stat().st_size * 0.8


def test_gene_tag_keying_overrides_gff_overlap(tmp_path):
    """--gene-barcode-tag (CellRanger GX; DartSeqCountArgs
    gene_barcode_tag): on a read overlapping BOTH genes, GFF-overlap
    keying and the aligner's GX tag DISAGREE — GX must win where
    present; untagged reads keep the GFF fallback; a tag value absent
    from the model drops the read."""
    path = str(tmp_path / "gx.bam")
    refs = [("chr1", 10000)]
    # GeneA chr1:1-1000 and GeneB chr1:151-1000 OVERLAP. A read at
    # pos 200 (midpoint ~224) lands nearest-start GeneB by GFF overlap,
    # but the aligner assigned it to GeneA (exonic structure only the
    # aligner saw).
    reads = [
        dict(name="r0", ref_id=0, pos=200, seq="ACGT" * 12, cigar="48M",
             cb="cell1", ub="u1", gx="GeneA"),
        # untagged read in the same window -> GFF fallback (GeneB)
        dict(name="r1", ref_id=0, pos=200, seq="ACGT" * 12, cigar="48M",
             cb="cell1", ub="u2"),
        # tagged with a gene the model does not know -> dropped
        dict(name="r2", ref_id=0, pos=200, seq="ACGT" * 12, cigar="48M",
             cb="cell1", ub="u3", gx="NotAGene"),
    ]
    write_bam(path, refs, reads)
    gff = tmp_path / "genes.gff"
    gff.write_text(
        "chr1\tsrc\tgene\t1\t1000\t.\t+\t.\tID=gene:GA;Name=GeneA\n"
        "chr1\tsrc\tgene\t151\t1000\t.\t+\t.\tID=gene:GB;Name=GeneB\n"
    )

    # reader surfaces the interned tag
    recs = read_bam(path, gene_tag="GX")
    assert recs.gene_names is not None and "GeneA" in recs.gene_names
    assert (recs.gene_id >= 0).sum() == 2

    # without the tag: all three reads key to GeneB by GFF overlap
    counts_gff, genes, _ = count_genes(str(path), str(gff))
    a, b = genes.index("GeneA"), genes.index("GeneB")
    assert counts_gff[a].sum() == 0 and counts_gff[b].sum() == 3

    # with the tag: r0 re-keys to GeneA, r1 falls back to GeneB,
    # r2 (unknown tag value) drops
    counts_gx, genes2, _ = count_genes(
        str(path), str(gff), gene_barcode_tag="GX"
    )
    a2, b2 = genes2.index("GeneA"), genes2.index("GeneB")
    assert counts_gx[a2].sum() == 1, counts_gx.toarray()
    assert counts_gx[b2].sum() == 1, counts_gx.toarray()
