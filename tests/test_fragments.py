"""from-fragments ATAC builder tests."""

import gzip

import numpy as np

from legume_tpu.data.builders import from_fragments


def _write_fragments(path, rows):
    with gzip.open(path, "wt") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")


def test_fragments_to_tiles(tmp_path):
    frags = str(tmp_path / "frags.tsv.gz")
    _write_fragments(
        frags,
        [
            ("chr1", 100, 300, "bc1", 2),
            ("chr1", 150, 350, "bc2"),
            ("chr1", 6000, 6200, "bc1"),
            ("chr2", 50, 250, "bc2"),
        ],
    )
    be = from_fragments(frags, str(tmp_path / "atac.zarr"), tile_size=5000)
    assert be.num_columns == 2
    assert be.num_rows == 3  # chr1 tile0, chr1 tile1, chr2 tile0
    dense = np.asarray(be.read_columns_csc([0, 1]).todense())
    names = be.row_names()
    t0 = names.index("chr1:0-5000")
    assert dense[t0].sum() == 3  # 2 + 1
    assert "chr1:5000-10000" in names and "chr2:0-5000" in names


def test_fragments_to_peaks(tmp_path):
    frags = str(tmp_path / "frags.tsv.gz")
    _write_fragments(
        frags,
        [
            ("chr1", 100, 200, "bc1"),  # in peak A
            ("chr1", 900, 1000, "bc1"),  # outside peaks
            ("chr1", 5100, 5200, "bc2"),  # in peak B
        ],
    )
    bed = tmp_path / "peaks.bed"
    bed.write_text("chr1\t50\t400\nchr1\t5000\t5400\n")
    be = from_fragments(frags, str(tmp_path / "p.zarr"), peaks_bed=str(bed))
    assert be.num_rows == 2
    dense = np.asarray(be.read_columns_csc([0, 1]).todense())
    assert dense.sum() == 2  # the outside-peak fragment dropped
    assert be.row_names() == ["chr1:50-400", "chr1:5000-5400"]
