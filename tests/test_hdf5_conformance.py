"""Byte-layout conformance against the reference HDF5 store format
(VERDICT r3 missing #2 / next-round item 3).

No Rust engine exists in this image, so both directions are checked
with an INDEPENDENT verifier in this file: raw h5py low-level chunk IO
plus a direct ctypes call into the system libblosc — none of the
legume H5Backend code runs on the verifying side.

Reference layout being verified (data-beans/src/sparse_backend/hdf5.rs):
- nrow/ncol/nnz are ROOT FILE ATTRIBUTES (hdf5.rs:204-214 reads ONLY
  attrs, scalar usize);
- 1-D datasets /by_{column,row}/{data,indices,indptr} with f32 data
  and u64 indices/indptr (hdf5.rs:784-803,925-944);
- each compressed with the standard HDF5 blosc filter id 32001,
  blosclz, clevel 5, byte shuffle (hdf5.rs:15 COMPRESSION_LEVEL=5,
  `.blosc_blosclz(5, true)`);
- chunks of ~1 MiB, min 8192 elements, capped at nelem
  (utilities/io_helpers.rs:104-116 chunk_elems);
- /row_names, /column_names as var-len UTF-8 string datasets
  (hdf5.rs:445-507 VarLenUnicode).
"""

import ctypes

import numpy as np
import pytest
import scipy.sparse as sp

h5py = pytest.importorskip("h5py")

try:
    _blosc = ctypes.CDLL("libblosc.so.1")
except OSError:  # pragma: no cover - present in this image
    _blosc = None

pytestmark = pytest.mark.skipif(_blosc is None, reason="libblosc missing")

BLOSC_ID = 32001

REF_DTYPES = {
    "by_column/data": np.float32,
    "by_column/indices": np.uint64,
    "by_column/indptr": np.uint64,
    "by_row/data": np.float32,
    "by_row/indices": np.uint64,
    "by_row/indptr": np.uint64,
}


def _raw_blosc_decompress(raw: bytes, nbytes: int) -> bytes:
    out = ctypes.create_string_buffer(max(nbytes, 1))
    m = _blosc.blosc_decompress_ctx(
        ctypes.c_char_p(raw), out, ctypes.c_size_t(nbytes), ctypes.c_int(1)
    )
    assert m == nbytes, f"independent blosc decode failed (rc={m})"
    return out.raw[:nbytes]


def _raw_blosc_compress(data: bytes, typesize: int) -> bytes:
    dst = ctypes.create_string_buffer(len(data) + 16)
    n = _blosc.blosc_compress_ctx(
        ctypes.c_int(5), ctypes.c_int(1), ctypes.c_size_t(typesize),
        ctypes.c_size_t(len(data)), ctypes.c_char_p(data), dst,
        ctypes.c_size_t(len(dst)), b"blosclz", ctypes.c_size_t(0),
        ctypes.c_int(1),
    )
    assert n > 0
    return dst.raw[:n]


def _make_counts(d=700, n=300, seed=0):
    m = sp.random(d, n, 0.08, random_state=seed, format="csc", dtype=np.float32)
    m.data[:] = np.round(m.data * 9) + 1
    m.sum_duplicates()
    return m


# ---------------------------------------------------------------------------
# direction 1: our writer -> independent reference-style reader
# ---------------------------------------------------------------------------


def test_h5_write_side_reference_layout(tmp_path):
    from legume_tpu.data.sparse_io import create_sparse_from_csc

    csc = _make_counts()
    d, n = csc.shape
    path = str(tmp_path / "ours.h5")
    create_sparse_from_csc(
        csc, path,
        row_names=[f"gene{i}" for i in range(d)],
        column_names=[f"cell{j}" for j in range(n)],
    )

    csr = csc.tocsr()
    expect = {
        "by_column/data": csc.data.astype(np.float32),
        "by_column/indices": csc.indices.astype(np.uint64),
        "by_column/indptr": csc.indptr.astype(np.uint64),
        "by_row/data": csr.data.astype(np.float32),
        "by_row/indices": csr.indices.astype(np.uint64),
        "by_row/indptr": csr.indptr.astype(np.uint64),
    }

    with h5py.File(path, "r") as f:
        # hdf5.rs:204-214 reads shape ONLY from root attrs
        assert int(f.attrs["nrow"]) == d
        assert int(f.attrs["ncol"]) == n
        assert int(f.attrs["nnz"]) == csc.nnz
        for a in ("nrow", "ncol", "nnz"):
            assert np.issubdtype(np.asarray(f.attrs[a]).dtype, np.unsignedinteger)

        for key, want in expect.items():
            ds = f[key]
            assert ds.dtype == REF_DTYPES[key], key
            plist = ds.id.get_create_plist()
            filters = [plist.get_filter(i) for i in range(plist.get_nfilters())]
            blosc_filters = [fl for fl in filters if fl[0] == BLOSC_ID]
            assert len(blosc_filters) == 1, f"{key}: blosc filter missing"
            cd = blosc_filters[0][2]
            assert cd[4] == 5 and cd[5] == 1 and cd[6] == 0, (
                f"{key}: cd_values {cd} != (clevel5, byte-shuffle, blosclz)"
            )
            # chunk_elems parity (io_helpers.rs:111-116)
            itemsize = ds.dtype.itemsize
            want_chunk = min(max((1 << 20) // itemsize, 8192), max(len(want), 1))
            assert ds.chunks == (want_chunk,), key

            # decode every chunk with libblosc DIRECTLY (what the
            # reference's filter does) and check the frame really is
            # blosclz (header flags bits 5-7 == 0)
            got = np.empty(len(want), dtype=ds.dtype)
            chunk = ds.chunks[0]
            for c0 in range(0, ds.shape[0], chunk):
                mask, raw = ds.id.read_direct_chunk((c0,))
                assert mask == 0, f"{key}: filter not applied on chunk {c0}"
                assert (raw[2] >> 5) == 0, f"{key}: compressor != blosclz"
                assert raw[3] == itemsize, f"{key}: header typesize"
                buf = np.frombuffer(
                    _raw_blosc_decompress(raw, chunk * itemsize), ds.dtype
                )
                valid = min(chunk, len(want) - c0)
                got[c0 : c0 + valid] = buf[:valid]
            np.testing.assert_array_equal(got, want, err_msg=key)

        # names: var-len UTF-8 strings (hdf5.rs VarLenUnicode)
        for key, pref, count in (("row_names", "gene", d),
                                 ("column_names", "cell", n)):
            ds = f[key]
            info = h5py.check_string_dtype(ds.dtype)
            assert info is not None and info.length is None, key
            vals = [s.decode() if isinstance(s, bytes) else s for s in ds[...]]
            assert vals == [f"{pref}{i}" for i in range(count)]


# ---------------------------------------------------------------------------
# direction 2: independent reference-style writer -> our reader
# ---------------------------------------------------------------------------


def _write_reference_style(path, csc, row_names, column_names):
    """Lay the file out the way hdf5-metno+blosc does: root attrs only
    for shape (no size datasets), blosc-32001 filtered chunked
    datasets written via raw pre-compressed chunks, VarLenUnicode
    names. Built with h5py low-level API + direct libblosc — no legume
    code."""
    csr = csc.tocsr()
    d, n = csc.shape
    arrays = {
        "by_column/data": csc.data.astype(np.float32),
        "by_column/indices": csc.indices.astype(np.uint64),
        "by_column/indptr": csc.indptr.astype(np.uint64),
        "by_row/data": csr.data.astype(np.float32),
        "by_row/indices": csr.indices.astype(np.uint64),
        "by_row/indptr": csr.indptr.astype(np.uint64),
    }
    with h5py.File(path, "w") as f:
        f.attrs.create("nrow", np.uint64(d), dtype=np.uint64)
        f.attrs.create("ncol", np.uint64(n), dtype=np.uint64)
        f.attrs.create("nnz", np.uint64(csc.nnz), dtype=np.uint64)
        for key, arr in arrays.items():
            gname, _, dname = key.rpartition("/")
            grp = f.require_group(gname)
            itemsize = arr.dtype.itemsize
            chunk = min(max((1 << 20) // itemsize, 8192), max(len(arr), 1))
            dcpl = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
            dcpl.set_chunk((chunk,))
            dcpl.set_filter(
                BLOSC_ID, h5py.h5z.FLAG_OPTIONAL,
                (2, 2, itemsize, chunk * itemsize, 5, 1, 0),
            )
            space = h5py.h5s.create_simple((len(arr),))
            tid = h5py.h5t.py_create(arr.dtype, logical=True)
            did = h5py.h5d.create(grp.id, dname.encode(), tid, space, dcpl=dcpl)
            ds = h5py.Dataset(did)
            for c0 in range(0, len(arr), chunk):
                block = arr[c0 : c0 + chunk]
                if len(block) < chunk:
                    padded = np.zeros(chunk, dtype=arr.dtype)
                    padded[: len(block)] = block
                    block = padded
                ds.id.write_direct_chunk(
                    (c0,),
                    _raw_blosc_compress(
                        np.ascontiguousarray(block).tobytes(), itemsize
                    ),
                    filter_mask=0,
                )
        f.create_dataset(
            "row_names", data=np.asarray(row_names, dtype=h5py.string_dtype())
        )
        f.create_dataset(
            "column_names",
            data=np.asarray(column_names, dtype=h5py.string_dtype()),
        )


def test_h5_read_side_reference_written(tmp_path):
    from legume_tpu.data.sparse_io import open_sparse_matrix

    csc = _make_counts(d=900, n=240, seed=3)  # >1 chunk for f32 at 8192 floor
    d, n = csc.shape
    path = str(tmp_path / "ref.h5")
    _write_reference_style(
        path, csc,
        [f"g{i}" for i in range(d)], [f"c{j}" for j in range(n)],
    )

    be = open_sparse_matrix(path)
    assert (be.num_rows, be.num_columns, be.num_nonzeros) == (d, n, csc.nnz)
    got = be.read_columns_csc(np.arange(n))
    np.testing.assert_allclose(
        np.asarray(got.todense()), np.asarray(csc.todense())
    )
    assert be.row_names() == [f"g{i}" for i in range(d)]
    assert be.column_names() == [f"c{j}" for j in range(n)]
    # ranged row reads exercise the partial-chunk decode path
    rows = be.read_rows_csr(np.asarray([0, 5, d - 1]))
    np.testing.assert_allclose(
        np.asarray(rows.todense()),
        np.asarray(csc.tocsr()[[0, 5, d - 1]].todense()),
    )


def test_h5_multi_chunk_roundtrip(tmp_path):
    """Arrays longer than one chunk (u64 floor 8192 elems) round-trip
    through our writer AND re-open path, with ranged reads crossing
    chunk boundaries."""
    from legume_tpu.data.sparse_io import create_sparse_from_csc, open_sparse_matrix

    rng = np.random.default_rng(7)
    d, n = 40, 3000
    dens = sp.csc_matrix(rng.poisson(1.2, size=(d, n)).astype(np.float32))
    dens.eliminate_zeros()
    assert dens.nnz > 8192 * 2  # multiple u64 chunks
    path = str(tmp_path / "big.h5")
    create_sparse_from_csc(dens, path)
    be = open_sparse_matrix(path)
    cols = np.arange(1000, 2500)
    np.testing.assert_allclose(
        np.asarray(be.read_columns_csc(cols).todense()),
        np.asarray(dens[:, cols].todense()),
    )
