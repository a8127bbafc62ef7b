"""faba pwm / metagene / pileup site-context summaries."""

import numpy as np
import pytest

from legume_tpu.faba.bam import read_bam, write_bam
from legume_tpu.faba.context import (
    metagene_profile,
    pileup_at_sites,
    pwm_at_sites,
    read_fasta,
)
from legume_tpu.faba.genes import GeneModel


def test_read_fasta(tmp_path):
    fa = tmp_path / "r.fa"
    fa.write_text(">chr1 some desc\nACGTac\ngtACGT\n>chr2\nTTTT\n")
    seqs = read_fasta(str(fa))
    assert seqs == {"chr1": "ACGTACGTACGT", "chr2": "TTTT"}


def test_pwm_finds_planted_motif(tmp_path):
    """Sites planted in a GGACT context -> PWM consensus recovers it."""
    rng = np.random.default_rng(0)
    bases = np.array(list("ACGT"))
    seq = list(rng.choice(bases, 3000))
    sites = []
    for p in range(100, 2900, 100):
        seq[p - 2 : p + 3] = list("GGACT")  # site at the A (offset 0)
        sites.append(p)
    fasta = {"chr1": "".join(seq)}
    pwm = pwm_at_sites(fasta, ["chr1"] * len(sites), np.asarray(sites), flank=2)
    assert pwm.n_sites == len(sites)
    assert pwm.consensus == "GGACT"
    # planted positions are near-deterministic -> high information
    assert np.all(pwm.info_bits > 1.5)


def test_pwm_minus_strand_revcomp():
    fasta = {"c": "AAAAGGACTAAAA"}  # A of GGACT at index 6
    plus = pwm_at_sites(fasta, ["c"], np.asarray([6]), flank=2)
    minus = pwm_at_sites(
        fasta, ["c"], np.asarray([6]), flank=2, strand=np.asarray([-1])
    )
    assert plus.consensus == "GGACT"
    assert minus.consensus == "AGTCC"  # revcomp read 5'->3'


def test_metagene_concentrates_at_three_prime():
    """Sites planted at 90% of each gene span -> density peaks in the
    last bins; minus-strand genes flip correctly."""
    model = GeneModel(
        names=["g1", "g2"],
        chrom=np.asarray([0, 0]),
        start=np.asarray([0, 2000]),
        end=np.asarray([1000, 3000]),
        strand=np.asarray([1, -1], np.int8),
        chrom_names=["chr1"],
    )
    # g1 (+): site at 900 -> frac 0.9 ; g2 (-): site at 2100 -> frac 0.9
    prof = metagene_profile(
        model, ["chr1"], np.asarray([0, 0]), np.asarray([900, 2100]), bins=10
    )
    assert prof["n_assigned"] == 2
    assert prof["counts"][9] == 2
    assert prof["density"][9] == 1.0


def test_pileup_counts_mismatch_and_ref(tmp_path):
    reads = []
    # 10 reads covering pos 110; 4 carry C->T at 110
    for i in range(10):
        conv = i < 4
        md = "10C29" if conv else "40"
        seq = list("A" * 40)
        seq[10] = "T" if conv else "C"
        reads.append(
            dict(name=f"r{i}", ref_id=0, pos=100, seq="".join(seq),
                 cigar="40M", cb="c1", ub=f"u{i}", md=md)
        )
    path = str(tmp_path / "p.bam")
    write_bam(path, [("chr1", 1000)], reads)
    recs = read_bam(path)
    pu = pileup_at_sites(recs, np.asarray([0]), np.asarray([110]), flank=0)
    counts = pu["counts"][0]
    # 4 T mismatches; 6 matching covers in the ref channel
    assert counts[3] == 4  # T
    assert counts[4] == 6  # ref_match
    # with a fasta the ref channel folds into C
    fasta = {"chr1": "A" * 110 + "C" + "A" * 889}
    pu2 = pileup_at_sites(recs, np.asarray([0]), np.asarray([110]), flank=0, fasta=fasta)
    assert pu2["counts"][0][1] == 6  # C
    assert pu2["counts"][0][3] == 4  # T
    assert pu2["counts"][0][4] == 0
