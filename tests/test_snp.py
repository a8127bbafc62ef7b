"""faba snp: pileup genotyper end-to-end on synthetic BAMs
(`faba/src/snp/` parity — genotyper.rs MAP calls, pipeline.rs
discovery/force-call/merge, io.rs parquet/VCF/mask/BAF writers)."""

import gzip

import numpy as np
import pandas as pd
import pytest

from legume_tpu.faba.bam import write_bam
from legume_tpu.faba.snp import (
    GenotypeParams,
    build_snp_mask,
    call_genotypes,
    genotype_log_likelihoods,
    run_snp,
)

CELLS = ["cellA", "cellB"]


def _site_reads(prefix, ref_id, pos, ref, alt, n_alt, n_ref,
                *, read_len=40, off=10, qual=30):
    """Reads covering a site at pos+off; first n_alt carry ref->alt."""
    reads = []
    for i in range(n_alt + n_ref):
        is_alt = i < n_alt
        md = f"{off}{ref}{read_len - off - 1}" if is_alt else f"{read_len}"
        seq = list("A" * read_len)
        seq[off] = alt if is_alt else ref
        reads.append(
            dict(name=f"{prefix}{i}", ref_id=ref_id, pos=pos,
                 seq="".join(seq), cigar=f"{read_len}M",
                 cb=CELLS[i % 2], ub=f"u{prefix}{i}", md=md, qual=qual)
        )
    return reads


@pytest.fixture(scope="module")
def snp_bam(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("snp")
    reads = []
    # het: chr1:110, C>T, VAF 0.5
    reads += _site_reads("a", 0, 100, "C", "T", n_alt=6, n_ref=6)
    # hom-alt: chr1:510, G>A, VAF 1.0
    reads += _site_reads("b", 0, 500, "G", "A", n_alt=12, n_ref=0)
    # coverage with NO alt evidence at chr1:2010 (for force-calling 0/0)
    reads += _site_reads("d", 0, 2000, "T", "T", n_alt=0, n_ref=12)
    # het on chr2 (outside the chr1-only gene model)
    reads += _site_reads("f", 1, 100, "C", "T", n_alt=6, n_ref=6)
    bam = str(tmp / "batchX.bam")
    write_bam(bam, [("chr1", 10000), ("chr2", 5000)], reads)

    gff = tmp / "genes.gff"
    gff.write_text(
        "chr1\tsrc\tgene\t1\t5000\t.\t+\t.\tID=gene:G1;Name=G1\n"
    )
    return bam, str(gff), str(tmp)


def test_discovery_calls(snp_bam, tmp_path):
    bam, _, _ = snp_bam
    sites = run_snp([bam], str(tmp_path / "o"), bulk=True)
    df = pd.read_parquet(tmp_path / "o" / "snp_sites.parquet")
    assert list(df["chr"]) == ["chr1", "chr1", "chr2"]
    assert list(df["pos"]) == [110, 510, 110]
    a, b, f = df.iloc[0], df.iloc[1], df.iloc[2]
    assert a["ref_allele"] == "C" and a["alt_allele"] == "T"
    assert a["genotype"] == "0/1" and a["gq"] >= 20
    assert int(a["count_t"]) == 6 and int(a["count_c"]) == 6
    assert b["genotype"] == "1/1" and int(b["count_a"]) == 12
    assert f["genotype"] == "0/1"
    # the no-alt-evidence locus never becomes a discovery candidate
    assert 2010 not in set(df["pos"])
    # VCF mirror: contig lengths from the BAM header, 1-based POS
    with gzip.open(tmp_path / "o" / "snp_sites.vcf.gz", "rt") as fh:
        lines = fh.read().splitlines()
    assert "##contig=<ID=chr1,length=10000>" in lines
    body = [ln.split("\t") for ln in lines if not ln.startswith("#")]
    assert [(r[0], int(r[1])) for r in body] == [
        ("chr1", 111), ("chr1", 511), ("chr2", 111)]
    assert body[1][9].startswith("1/1:")
    # AD = ref,alt
    assert body[0][9].split(":")[2] == "6,6"


def test_gff_gates_sites_to_gene_bodies(snp_bam, tmp_path):
    bam, gff, _ = snp_bam
    sites = run_snp([bam], str(tmp_path / "g"), gff=gff, bulk=True)
    # chr2 has no gene: its het site is dropped (pipeline.rs *_by_gene)
    assert set(sites.chrom.tolist()) == {"chr1"}
    assert set(sites.pos.tolist()) == {110, 510}


def test_known_snps_force_call_and_merge(snp_bam, tmp_path):
    bam, _, _ = snp_bam
    vcf = tmp_path / "known.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr1\t111\trsA\tC\tT\t.\t.\t.\n"      # duplicates discovery
        "chr1\t2011\trsD\tT\tG\t.\t.\t.\n"     # coverage, no alt -> 0/0
        "chrM\t101\trsE\tA\tC\t.\t.\t.\n"      # contig absent -> ./.
        "chr1\t3011\trsIndel\tCT\tC\t.\t.\t.\n"  # indel: skipped
    )
    sites = run_snp([bam], str(tmp_path / "k"), known_snps=str(vcf))
    df = pd.read_parquet(tmp_path / "k" / "snp_sites.parquet")
    by_locus = {(r["chr"], r["pos"]): r for _, r in df.iterrows()}
    # one row per locus; discovery wins the tie at chr1:110 (rsid ".")
    assert len(df) == len(by_locus) == 5
    assert by_locus[("chr1", 110)]["rsid"] == "."
    d = by_locus[("chr1", 2010)]
    assert d["rsid"] == "rsD" and d["genotype"] == "0/0" and d["gq"] >= 20
    assert int(d["count_t"]) == 12  # all-ref pileup
    e = by_locus[("chrM", 100)]
    assert e["genotype"] == "./." and df["pos"].tolist().count(3010) == 0

    only = run_snp(
        [bam], str(tmp_path / "k2"), known_snps=str(vcf),
        skip_discovery=True,
    )
    assert len(only) == 3  # known sites only; rsid survives at chr1:110
    assert set(only.rsid.tolist()) == {"rsA", "rsD", "rsE"}


def test_snp_mask_min_vaf(snp_bam, tmp_path):
    bam, _, _ = snp_bam
    sites = run_snp([bam], str(tmp_path / "m"), bulk=True)
    plain = set(build_snp_mask(sites, 20.0, None))
    assert ("chr1", 110) in plain and ("chr1", 510) in plain
    # germline gate at v=0.6: het VAF 0.5 falls outside [0.6, 0.4] -> out;
    # hom-alt VAF 1.0 >= 0.4... (1-v) -> stays
    gated = set(build_snp_mask(sites, 20.0, 0.6))
    assert ("chr1", 110) not in gated and ("chr1", 510) in gated
    # the persisted mask parquet equals the default in-process mask
    mask_df = pd.read_parquet(tmp_path / "m" / "snp_mask.parquet")
    assert set(zip(mask_df["chrom"], mask_df["pos"])) == plain


def test_per_cell_baf_matrices(snp_bam, tmp_path):
    from legume_tpu.data.sparse_io import open_sparse_matrix

    bam, gff, _ = snp_bam
    run_snp([bam], str(tmp_path / "b"), gff=gff)
    be = open_sparse_matrix(tmp_path / "b" / "batchX_baf.zarr")
    rows = be.row_names()
    # alt/depth channel pairs, interleaved per locus (feature_name.rs)
    assert rows[:2] == ["chr1:110/baf/alt", "chr1:110/baf/depth"]
    assert set(be.column_names()) == set(CELLS)
    dense = be.read_columns_dense(np.arange(len(be.column_names())))
    alt, depth = dense[0::2], dense[1::2]
    # alt NESTS inside depth: alt <= depth everywhere
    assert np.all(alt <= depth)
    # het site: 6 alt reads split over the two cells; 12-read depth
    assert alt[0].sum() == 6 and depth[0].sum() == 12


def test_gene_type_filter_and_zip_output(snp_bam, tmp_path):
    from legume_tpu.data.sparse_io import open_sparse_matrix

    bam, _, root = snp_bam
    gff = tmp_path / "typed.gff"
    gff.write_text(
        "chr1\tsrc\tgene\t1\t300\t.\t+\t.\t"
        "ID=gene:G1;gene_biotype=protein_coding\n"
        "chr1\tsrc\tgene\t301\t5000\t.\t+\t.\t"
        "ID=gene:G2;gene_biotype=lncRNA\n"
    )
    sites = run_snp(
        [bam], str(tmp_path / "t"), gff=str(gff),
        gene_type="protein_coding", zip_output=True,
    )
    # only the protein_coding gene body (1-300) survives the filter
    assert set(sites.pos.tolist()) == {110}
    be = open_sparse_matrix(tmp_path / "t" / "batchX_baf.zarr.zip")
    assert be.row_names() == ["chr1:110/baf/alt", "chr1:110/baf/depth"]


def test_base_quality_gate(tmp_path):
    """baseq-failed alt bases leave BOTH numerator and denominator
    (dna_stat_map.rs:272 parity)."""
    reads = _site_reads("q", 0, 100, "C", "T", n_alt=6, n_ref=10, qual=10)
    bam = str(tmp_path / "lowq.bam")
    write_bam(bam, [("chr1", 10000)], reads)
    sites = run_snp(
        [bam], str(tmp_path / "o"), bulk=True,
        params=GenotypeParams(min_coverage=5, min_alt_count=1,
                              min_alt_freq=0.0),
        min_base_quality=20,
    )
    assert len(sites) == 0  # all alt evidence fails the phred gate
    ok = run_snp(
        [bam], str(tmp_path / "o2"), bulk=True, min_base_quality=0,
        params=GenotypeParams(min_coverage=5, min_alt_count=1,
                              min_alt_freq=0.0),
        use_base_quality=False,
    )
    assert len(ok) == 1 and ok.depth()[0] == 16


def test_multi_bam_merged_pileup_and_contig_check(snp_bam, tmp_path):
    bam, _, _ = snp_bam
    # second batch doubles the alt evidence at chr1:110
    reads = _site_reads("z", 0, 100, "C", "T", n_alt=6, n_ref=6)
    bam2 = str(tmp_path / "batchY.bam")
    write_bam(bam2, [("chr1", 10000), ("chr2", 5000)], reads)
    sites = run_snp([bam, bam2], str(tmp_path / "mm"), bulk=True)
    at = {(c, p): i for i, (c, p) in
          enumerate(zip(sites.chrom, sites.pos))}
    i = at[("chr1", 110)]
    assert sites.depth()[i] == 24
    assert sites.counts_of(sites.alt_allele)[i] == 12

    bad = str(tmp_path / "bad.bam")
    write_bam(bad, [("chrOTHER", 1000)],
              _site_reads("w", 0, 100, "C", "T", n_alt=2, n_ref=2))
    with pytest.raises(ValueError, match="contig dictionary"):
        run_snp([bam, bad], str(tmp_path / "x"), bulk=True)


def test_genotype_likelihood_math():
    """Constant-error GL model against hand computation
    (genotyper.rs compute_genotype_likelihoods)."""
    ll = genotype_log_likelihoods(np.array([8]), np.array([2]), 0.01)
    np.testing.assert_allclose(
        ll[0],
        [2 * np.log(0.01) + 8 * np.log(0.99),
         10 * np.log(0.5),
         8 * np.log(0.01) + 2 * np.log(0.99)],
    )
    gt, gq = call_genotypes(ll, GenotypeParams())
    assert gt[0] == 0 and gq[0] > 0  # 8 ref / 2 alt -> hom-ref MAP
