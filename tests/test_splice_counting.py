"""Spliced/unspliced gene counting (gene_count/splice.rs): CIGAR-N
junction reads and exon-contained reads are spliced; intron-overlap
reads are unspliced."""

import numpy as np

from legume_tpu.faba.bam import read_bam, write_bam
from legume_tpu.faba.genes import count_genes_spliced


def _gff(tmp_path):
    # gene 0..1000 with exons [0,200) and [800,1000) (intron 200..800)
    p = tmp_path / "g.gff"
    p.write_text(
        "chr1\tx\tgene\t1\t1000\t.\t+\t.\tID=gene:G1;Name=GENE1\n"
        "chr1\tx\texon\t1\t200\t.\t+\t.\tParent=gene:G1;Name=GENE1\n"
        "chr1\tx\texon\t801\t1000\t.\t+\t.\tParent=gene:G1;Name=GENE1\n"
    )
    return str(p)


def test_splice_classification(tmp_path):
    reads = [
        # junction read: 20M600N20M from 180 -> spans the intron, SPLICED
        dict(name="jx", ref_id=0, pos=180, seq="A" * 40, cigar="20M600N20M",
             cb="c1", ub="u1", md="40"),
        # exonic read fully inside exon 1: SPLICED
        dict(name="ex", ref_id=0, pos=50, seq="A" * 40, cigar="40M",
             cb="c1", ub="u2", md="40"),
        # intronic read at 400: UNSPLICED
        dict(name="in1", ref_id=0, pos=400, seq="A" * 40, cigar="40M",
             cb="c1", ub="u3", md="40"),
        # exon-intron boundary read starting 190: UNSPLICED
        dict(name="in2", ref_id=0, pos=190, seq="A" * 40, cigar="40M",
             cb="c2", ub="u4", md="40"),
    ]
    bam = str(tmp_path / "r.bam")
    write_bam(bam, [("chr1", 2000)], reads)

    recs = read_bam(bam)
    assert recs.has_skip is not None
    assert recs.has_skip.sum() == 1  # only the junction read
    # the junction read's reference span covers the intron
    jx = int(np.nonzero(recs.has_skip)[0][0])
    assert recs.end_pos[jx] - recs.pos[jx] == 640

    s, u, genes, barcodes = count_genes_spliced(bam, _gff(tmp_path))
    assert genes == ["GENE1"]
    assert s.sum() == 2  # jx + ex
    assert u.sum() == 2  # in1 + in2
    # per-cell: c1 has 1 unspliced, c2 has 1
    ci = {b: i for i, b in enumerate(barcodes)}
    assert u[0, ci["c1"]] == 1 and u[0, ci["c2"]] == 1
