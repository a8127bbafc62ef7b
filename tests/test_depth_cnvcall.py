"""faba depth + BED + cocoa CNV-on-residuals tests."""

import numpy as np
import pytest

from legume_tpu.cocoa.cnv_call import call_cnv_on_residuals
from legume_tpu.faba.bam import write_bam
from legume_tpu.faba.depth import depth_per_region, read_bed


def test_bed_and_depth(tmp_path):
    bed = tmp_path / "regions.bed"
    bed.write_text("chr1\t100\t300\tregA\nchr1\t1000\t1200\tregB\n")
    iv = read_bed(str(bed))
    assert iv.name == ["regA", "regB"]

    reads = []
    for i in range(6):
        reads.append(dict(name=f"a{i}", ref_id=0, pos=150, seq="A" * 40,
                          cigar="40M", cb="c1", ub=f"u{i}"))
    for i in range(3):
        reads.append(dict(name=f"b{i}", ref_id=0, pos=1050, seq="A" * 40,
                          cigar="40M", cb="c2", ub=f"v{i}"))
    path = str(tmp_path / "d.bam")
    write_bam(path, [("chr1", 5000)], reads)
    counts, names, barcodes = depth_per_region(path, iv)
    m = np.asarray(counts.todense())
    ci = {c: j for j, c in enumerate(barcodes)}
    assert m[0, ci["c1"]] == 6
    assert m[1, ci["c2"]] == 3
    assert m.sum() == 9


def test_cnv_on_residuals_finds_amplification():
    rng = np.random.default_rng(0)
    d, i = 500, 4
    shared = rng.gamma(3, 1, d)
    indv = np.tile(shared[:, None], (1, i)) * np.exp(rng.normal(0, 0.1, (d, i)))
    # individual 2 has a 2x amplified genomic block (genes 200-300)
    indv[200:300, 2] *= 2.0
    res = call_cnv_on_residuals(indv, shared, genes_per_bin=20)
    amp_bins = np.unique(res.bin_of_gene[200:300])
    other_bins = np.setdiff1d(np.arange(res.states.shape[1]), amp_bins)
    # gain state (index 2) called in the amplified region of indv 2
    assert (res.states[2, amp_bins] == 2).mean() > 0.6
    assert (res.states[2, other_bins] == 2).mean() < 0.2
    # clean individual mostly neutral
    assert (res.states[0] == 1).mean() > 0.8
