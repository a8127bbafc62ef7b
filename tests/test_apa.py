"""faba apa: two PAS peaks with cell-type-specific usage must be
called and quantified."""

import numpy as np
import pytest

from legume_tpu.faba.apa import call_pas_peaks, run_apa
from legume_tpu.faba.bam import write_bam


def test_call_pas_peaks_clusters():
    ends = np.concatenate([500 + np.arange(8), 900 + np.arange(6), [1500]])
    peaks = call_pas_peaks(ends, peak_window=30, min_reads=5)
    assert len(peaks) == 2
    assert abs(peaks[0][0] - 503) <= 2
    assert abs(peaks[1][0] - 902) <= 2


def test_run_apa_two_sites(tmp_path):
    # gene on + strand 100-1200; proximal PAS ~ 600, distal ~ 1100
    reads = []
    i = 0
    # cellP uses the proximal site, cellD the distal
    for cell, end_target, n in [("cellP", 600, 10), ("cellD", 1100, 10), ("cellP", 1100, 2)]:
        for _ in range(n):
            start = end_target - 50 - (i % 4)
            reads.append(
                dict(
                    name=f"r{i}", ref_id=0, pos=start, seq="A" * (1100 - start if False else 50),
                    cigar=f"{50 + (i % 4)}M", cb=cell, ub=f"u{i}",
                )
            )
            i += 1
    path = str(tmp_path / "apa.bam")
    write_bam(path, [("chr1", 5000)], reads)
    gff = tmp_path / "g.gff"
    gff.write_text("chr1\tsrc\tgene\t101\t1200\t.\t+\t.\tID=gene:GX;Name=GeneX\n")

    res = run_apa(path, str(gff), min_reads=4, peak_window=40)
    assert len(res.site_names) == 2
    assert all(n.startswith("GeneX/apa/pas") for n in res.site_names)
    m = np.asarray(res.counts.todense())
    ci = {c: j for j, c in enumerate(res.barcodes)}
    # proximal site dominated by cellP, distal by cellD
    assert m[0, ci["cellP"]] >= 8
    assert m[1, ci["cellD"]] >= 8
    assert "GeneX" in res.distal_index
    assert 0.2 < res.distal_index["GeneX"] < 0.8

def test_snp_genotyper(tmp_path):
    """faba snp: het and hom-alt sites called with sensible genotypes."""
    from legume_tpu.faba.snp import call_snps

    reads = []
    i = 0
    # het site at 110 (ref A, alt G ~ 50% of 20 reads)
    # hom site at 310 (ref C, alt T ~ all of 16 reads)
    # noise site at 510 (1 alt of 20)
    specs = [
        (100, "A", "G", 10, 10),
        (300, "C", "T", 15, 1),
        (500, "A", "T", 1, 19),
    ]
    for start, ref, alt, n_alt, n_ref in specs:
        for j in range(n_alt + n_ref):
            has_alt = j < n_alt
            md = f"10{ref}29" if has_alt else "40"
            seq = list("C" * 40)
            seq[10] = alt if has_alt else ref
            reads.append(
                dict(name=f"r{i}", ref_id=0, pos=start, seq="".join(seq),
                     cigar="40M", cb="cell1", ub=f"u{i}", md=md)
            )
            i += 1
    path = str(tmp_path / "snp.bam")
    write_bam(path, [("chr1", 5000)], reads)
    calls = call_snps(path, min_depth=8, min_alt=2, min_qual=3.0)
    by_pos = {int(p): g for p, g in zip(calls.pos, calls.genotype)}
    assert by_pos.get(110) == "0/1", by_pos
    assert by_pos.get(310) == "1/1", by_pos
    assert 510 not in by_pos  # noise filtered


def test_apa_polya_tail_gate(tmp_path):
    """--polya-min-tail-length (CountApaArgs polya_* role): reads with
    untemplated soft-clip A tails pass the gate; internal-priming reads
    without a tail drop, removing their spurious PAS peak."""
    from legume_tpu.faba.apa import run_apa
    from legume_tpu.faba.bam import write_bam

    reads = []
    # true PAS at ~200: 30M + 10S all-A tails
    for i in range(8):
        reads.append(dict(
            name=f"t{i}", ref_id=0, pos=170, seq="C" * 30 + "A" * 10,
            cigar="30M10S", cb=f"cell{i % 2}", ub=f"u{i}",
        ))
    # internal priming at ~420: plain 30M, no tail
    for i in range(8):
        reads.append(dict(
            name=f"n{i}", ref_id=0, pos=390, seq="C" * 30,
            cigar="30M", cb=f"cell{i % 2}", ub=f"v{i}",
        ))
    bam = str(tmp_path / "r.bam")
    write_bam(bam, [("chr1", 10000)], reads)
    gff = tmp_path / "g.gff"
    gff.write_text("chr1\tx\tgene\t100\t600\t.\t+\t.\tgene_name=G1\n")

    ungated = run_apa(bam, str(gff), min_reads=4)
    gated = run_apa(bam, str(gff), min_reads=4, polya_min_tail_length=5)
    assert len(ungated.site_names) == 2
    assert len(gated.site_names) == 1
    assert "@200" in gated.site_names[0]


def test_apa_pdui_triplets(tmp_path):
    """compute_pdui: per-(gene, cell) distal usage fractions from the
    called PAS sites (CountApaArgs compute_pdui role)."""
    from legume_tpu.faba.apa import compute_pdui, run_apa
    from legume_tpu.faba.bam import write_bam

    reads = []
    # cell0 reads mostly proximal (~200); cell1 mostly distal (~400)
    for i in range(10):
        reads.append(dict(name=f"p{i}", ref_id=0, pos=170, seq="C" * 30,
                          cigar="30M", cb="cell0", ub=f"u{i}"))
    for i in range(2):
        reads.append(dict(name=f"px{i}", ref_id=0, pos=370, seq="C" * 30,
                          cigar="30M", cb="cell0", ub=f"w{i}"))
    for i in range(10):
        reads.append(dict(name=f"d{i}", ref_id=0, pos=370, seq="C" * 30,
                          cigar="30M", cb="cell1", ub=f"v{i}"))
    bam = str(tmp_path / "r.bam")
    write_bam(bam, [("chr1", 10000)], reads)
    gff = tmp_path / "g.gff"
    gff.write_text("chr1\tx\tgene\t100\t600\t.\t+\t.\tgene_name=G1\n")

    apa = run_apa(bam, str(gff), min_reads=2)
    genes, cells, pdui = compute_pdui(apa)
    tab = dict(zip(zip(genes, cells), pdui))
    assert tab[("G1", "cell0")] < 0.3
    assert tab[("G1", "cell1")] > 0.9


def test_apa_utr_bed_filter(tmp_path):
    """--utr-bed: molecules whose 3' end falls outside every UTR
    interval drop before peak calling (CountApaArgs utr_bed)."""
    from legume_tpu.faba.apa import run_apa
    from legume_tpu.faba.bam import write_bam

    reads = []
    for i in range(6):  # inside the UTR window
        reads.append(dict(name=f"a{i}", ref_id=0, pos=170, seq="C" * 30,
                          cigar="30M", cb="c0", ub=f"u{i}"))
    for i in range(6):  # outside any UTR
        reads.append(dict(name=f"b{i}", ref_id=0, pos=370, seq="C" * 30,
                          cigar="30M", cb="c0", ub=f"v{i}"))
    bam = str(tmp_path / "r.bam")
    write_bam(bam, [("chr1", 10000)], reads)
    gff = tmp_path / "g.gff"
    gff.write_text("chr1\tx\tgene\t100\t600\t.\t+\t.\tgene_name=G1\n")
    bed = tmp_path / "utr.bed"
    bed.write_text("chr1\t150\t250\n")

    full = run_apa(bam, str(gff), min_reads=3)
    utr = run_apa(bam, str(gff), min_reads=3, utr_bed=str(bed))
    assert len(full.site_names) == 2
    assert len(utr.site_names) == 1 and "@200" in utr.site_names[0]
