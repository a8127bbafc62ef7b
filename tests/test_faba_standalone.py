"""Standalone `faba apa` / `faba snp` / `faba depth` CLI e2e
(COVERAGE known-gap closeout: these previously ran only inside
`faba all`; reference entries `faba/src/main.rs` Apa/Snp/Depth).

Each test is argv-in / files-out on a synthetic BAM with planted
structure the command must recover: two PAS clusters with known
proximal/distal usage, a heterozygous SNP at known VAF, and coverage
confined to the covered BED region.
"""

import numpy as np
import pandas as pd
import pytest

from legume_tpu.cli import main as cli
from legume_tpu.data.sparse_io import open_sparse_matrix
from legume_tpu.faba.bam import write_bam


@pytest.fixture(scope="module")
def standalone_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("faba_standalone")
    bam = str(tmp / "sa.bam")
    read_len = 48
    reads = []
    i = 0

    def add(pos, cb, *, md=None, seq=None, n=1):
        nonlocal i
        for _ in range(n):
            r = dict(
                name=f"r{i}", ref_id=0, pos=pos,
                seq=seq or ("A" * read_len), cigar=f"{read_len}M",
                cb=cb, ub=f"u{i}",
            )
            if md is not None:
                r["md"] = md
            reads.append(r)
            i += 1

    # ---- APA: gene A (+ strand, chr1:101-1200) with two PAS clusters:
    # proximal 3' ends near 400 (reads start 352), distal near 900
    # (reads start 852); proximal gets 6 molecules, distal 4.
    for k in range(6):
        add(352, ["cellA", "cellB"][k % 2])
    for k in range(4):
        add(852, ["cellA", "cellB"][k % 2])

    # ---- SNP: het site at chr1:2010 (10 after pos 2000) — 12 reads,
    # 6 alt (MD mismatch ref C read T), 6 ref. Distinct UMIs.
    alt_seq = list("A" * read_len)
    alt_seq[10] = "T"
    add(2000, "cellA", md=f"10C{read_len - 11}", seq="".join(alt_seq), n=6)
    add(2000, "cellB", md=f"{read_len}", n=6)

    write_bam(bam, [("chr1", 10000)], reads)

    gff = tmp / "genes.gff"
    gff.write_text(
        "chr1\tsrc\tgene\t101\t1200\t.\t+\t.\tID=gene:GA;Name=GeneA\n"
    )
    bed = tmp / "regions.bed"
    # region 1 covers the APA reads, region 2 is empty
    bed.write_text("chr1\t300\t1000\tcovered\nchr1\t5000\t6000\tempty\n")
    return bam, str(gff), str(bed), str(tmp)


def test_faba_apa_standalone(standalone_bam):
    bam, gff, _, tmp = standalone_bam
    out = f"{tmp}/apa"
    cli.run_faba([
        "apa", "--bam", bam, "--gff", gff, "--output", out,
        "--min-reads", "3",
    ])
    be = open_sparse_matrix(f"{out}.zarr")
    assert be.num_rows == 2  # proximal + distal PAS
    counts = np.asarray(be.read_columns_csc(np.arange(be.num_columns)).todense())
    # 6 proximal + 4 distal molecules total
    assert counts.sum() == 10
    dist = pd.read_parquet(f"{out}.distal.parquet")
    # distal usage = 4/10 for GeneA
    row = dist[dist["gene"] == "GeneA"]
    assert len(row) == 1
    assert abs(float(row["distal_usage"].iloc[0]) - 0.4) < 1e-6


def test_faba_snp_standalone(standalone_bam):
    bam, _, _, tmp = standalone_bam
    out = f"{tmp}/snp"
    cli.run_faba([
        "snp", "--bam", bam, "--output", out, "--min-depth", "8",
        "--min-alt-count", "2", "--min-coverage", "8", "--bulk",
    ])
    snps = pd.read_parquet(f"{out}/snp_sites.parquet")
    assert len(snps) == 1
    site = snps.iloc[0]
    assert site["chr"] == "chr1" and int(site["pos"]) == 2010
    assert site["ref_allele"] == "C" and site["alt_allele"] == "T"
    assert site["genotype"] == "0/1"  # VAF 0.5
    # A/T/G/C base counts: 6 T (alt) + 6 C (ref)
    assert int(site["count_t"]) == 6 and int(site["count_c"]) == 6
    assert float(site["gq"]) >= 20.0
    # het site enters the mask; VCF carries the same call
    mask = pd.read_parquet(f"{out}/snp_mask.parquet")
    assert list(zip(mask["chrom"], mask["pos"])) == [("chr1", 2010)]
    import gzip

    with gzip.open(f"{out}/snp_sites.vcf.gz", "rt") as f:
        lines = [ln for ln in f if not ln.startswith("#")]
    assert len(lines) == 1
    fields = lines[0].split("\t")
    assert fields[0] == "chr1" and int(fields[1]) == 2011  # 1-based
    assert fields[9].startswith("0/1:")


def test_faba_depth_standalone(standalone_bam):
    bam, _, bed, tmp = standalone_bam
    out = f"{tmp}/depth"
    cli.run_faba(["depth", "--bam", bam, "--bed", bed, "--output", out])
    be = open_sparse_matrix(f"{out}.zarr")
    assert be.num_rows == 2
    names = [str(n) for n in be.row_names()]
    cov = np.asarray(be.read_columns_csc(np.arange(be.num_columns)).todense())
    covered = names.index([n for n in names if "covered" in n or "300" in n][0])
    empty = 1 - covered
    assert cov[covered].sum() > 0
    assert cov[empty].sum() == 0
