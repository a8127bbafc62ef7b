"""faba apa --method mixture (SCAPE EM) — planted-PAS recovery through
the CLI and the library API (VERDICT r2 item 3; reference
`faba/src/apa/{em,likelihood,pipeline}.rs`)."""

import numpy as np
import pandas as pd
import pytest

from legume_tpu.cli import faba_cli as cli
from legume_tpu.data.sparse_io import open_sparse_matrix
from legume_tpu.faba.bam import write_bam


@pytest.fixture()
def mixture_bam(tmp_path):
    """BAM with two planted PAS on a 1-block 3'UTR: proximal ~ 400,
    distal ~ 900 (genomic 0-based). cellP uses proximal, cellD distal;
    junction reads carry 14bp poly-A soft-clip tails."""
    reads = []
    i = 0
    rng = np.random.default_rng(5)
    for cell, theta, n in [("cellP", 400, 40), ("cellD", 900, 40),
                           ("cellP", 900, 6), ("cellD", 400, 6)]:
        for _ in range(n):
            rl = 40 + int(rng.integers(0, 6))
            start = theta - rl  # aligned span [start, theta)
            reads.append(dict(
                name=f"r{i}", ref_id=0, pos=start,
                seq="C" * rl + "A" * 14, cigar=f"{rl}M14S",
                cb=cell, ub=f"u{i}",
            ))
            i += 1
        # supporting SE reads (no tail) upstream of the site
        for _ in range(12):
            x = theta - 300 + int(rng.normal(0, 50))
            x = max(0, min(x, 940))
            reads.append(dict(
                name=f"r{i}", ref_id=0, pos=x, seq="C" * 45, cigar="45M",
                cb=cell, ub=f"u{i}",
            ))
            i += 1
    path = str(tmp_path / "mix.bam")
    write_bam(path, [("chr1", 5000)], reads)
    bed = tmp_path / "utr.bed"
    bed.write_text("chr1\t0\t1000\tGENE1\t0\t+\n")
    return path, str(bed), str(tmp_path)


def test_apa_mixture_cli_recovers_planted_sites(mixture_bam):
    bam, bed, tmp = mixture_bam
    out = f"{tmp}/apa"
    cli.run_faba([
        "apa", "--bam", bam, "--utr-bed", bed, "--output", out,
        "--mixture", "--min-reads", "5", "--min-fragments", "20",
        "--skip-gene-qc", "--row-nnz-cutoff", "1",
    ])
    ann = pd.read_parquet(f"{out}.apa_sites.parquet")
    assert len(ann) == 2, ann
    alphas = np.sort(ann["genomic_alpha"].to_numpy())
    assert abs(alphas[0] - 400) <= 25 and abs(alphas[1] - 900) <= 25, alphas

    # PDUI channel matrix: proximal row dominated by cellP
    be = open_sparse_matrix(f"{out}.apa.zarr")
    names = be.row_names()
    assert names == ["GENE1/apa/proximal", "GENE1/apa/distal"]
    m = np.asarray(be.read_columns_csc(np.arange(be.num_columns)).todense())
    ci = {c: j for j, c in enumerate(be.column_names())}
    assert m[0, ci["cellP"]] > m[1, ci["cellP"]]
    assert m[1, ci["cellD"]] > m[0, ci["cellD"]]

    # component matrix written under --mixture
    mix = open_sparse_matrix(f"{out}.apa_mixture.zarr")
    assert mix.num_rows == 2


def test_apa_mixture_fast_pdui_default(mixture_bam):
    """Without --mixture / --apa-em-pdui the fast bisect path runs and
    still yields the two channels (pipeline.rs:752-797)."""
    bam, bed, tmp = mixture_bam
    out = f"{tmp}/fast"
    cli.run_faba([
        "apa", "--bam", bam, "--utr-bed", bed, "--output", out,
        "--min-reads", "5", "--min-fragments", "20",
        "--skip-gene-qc", "--row-nnz-cutoff", "1",
    ])
    be = open_sparse_matrix(f"{out}.apa.zarr")
    assert be.num_rows == 2
    m = np.asarray(be.read_columns_csc(np.arange(be.num_columns)).todense())
    ci = {c: j for j, c in enumerate(be.column_names())}
    assert m[0, ci["cellP"]] > m[1, ci["cellP"]]
    assert m[1, ci["cellD"]] > m[0, ci["cellD"]]


def test_apa_mixture_masks_and_no_umi_dedup(mixture_bam, tmp_path):
    """--snp-mask drops the masked site; --no-umi-dedup counts
    fragments, not UMIs."""
    bam, bed, tmp = mixture_bam
    # mask the proximal site's position: only the distal survives ->
    # drop_single_component removes the gene entirely
    pd.DataFrame({"chrom": ["chr1"] * 9, "pos": list(range(396, 405))}).to_parquet(
        f"{tmp}/mask.parquet"
    )
    out = f"{tmp}/masked"
    cli.run_faba([
        "apa", "--bam", bam, "--utr-bed", bed, "--output", out,
        "--mixture", "--min-reads", "5", "--min-fragments", "20",
        "--skip-gene-qc", "--row-nnz-cutoff", "1",
        "--snp-mask", f"{tmp}/mask.parquet", "--drop-single-component",
    ])
    ann = pd.read_parquet(f"{out}.apa_sites.parquet")
    assert len(ann) == 0, ann


def test_apa_mixture_gff_cds_utr_derivation(tmp_path):
    """3'UTRs derive from CDS rows when three_prime_UTR rows are
    absent (the reference's codon-map route)."""
    from legume_tpu.faba.apa_mixture import build_utr_regions_from_gff

    gff = tmp_path / "g.gff"
    gff.write_text(
        "chr1\tsrc\tgene\t1\t2000\t.\t+\t.\tID=gene:GX\n"
        "chr1\tsrc\texon\t1\t800\t.\t+\t.\tParent=transcript:TX;gene_id=GX\n"
        "chr1\tsrc\texon\t1201\t2000\t.\t+\t.\tParent=transcript:TX;gene_id=GX\n"
        "chr1\tsrc\tCDS\t101\t800\t.\t+\t0\tParent=transcript:TX;gene_id=GX\n"
        "chr1\tsrc\tCDS\t1201\t1400\t.\t+\t0\tParent=transcript:TX;gene_id=GX\n"
        # minus-strand gene: UTR = exonic bases before the CDS start
        "chr2\tsrc\texon\t501\t1500\t.\t-\t.\tgene_id=GY\n"
        "chr2\tsrc\tCDS\t901\t1500\t.\t-\t0\tgene_id=GY\n"
    )
    regions = {r.name: r for r in build_utr_regions_from_gff(str(gff))}
    assert set(regions) == {"GX", "GY"}
    # GX: UTR = exon2 bases after CDS end 1400 -> [1400, 2000) 0-based
    assert regions["GX"].exons.tolist() == [[1400, 2000]]
    assert regions["GX"].utr_length == 600
    # GY (minus): UTR = exon bases before CDS start 900 (0-based)
    assert regions["GY"].exons.tolist() == [[500, 900]]
    assert regions["GY"].strand == -1


def test_spliced_offsets_roundtrip():
    from legume_tpu.faba.apa_mixture import UtrRegion

    utr = UtrRegion(
        chrom="c", strand=-1, name="g",
        exons=np.asarray([[100, 200], [300, 350]], np.int64),
    )
    assert utr.utr_length == 150
    # genomic 349 is the transcript's FIRST base on minus strand
    assert utr.spliced_offset(np.asarray([349]))[0] == 1
    assert utr.spliced_offset(np.asarray([100]))[0] == 150
    # inverse map round-trips
    for off in (1, 50, 51, 150):
        g = utr.genomic_from_spliced(off)
        assert utr.spliced_offset(np.asarray([g]))[0] == off
