"""Sparse count-matrix storage engine (data-beans equivalent).

On-disk layout matches the reference exactly (`data-beans/README.md:5-20`):

    (root)
        nrow, ncol, nnz                     [1] uint64
        by_column/{data f32, indices u64, indptr u64}   # CSC
        by_row/{data f32, indices u64, indptr u64}      # CSR
        row_names, column_names             string arrays

Both CSC and CSR copies are stored so either axis streams fast —
the same dual-copy trade the reference makes (`sparse_io/traits.rs:46`).

Backends:
- ``ZarrBackend``: zarr v3 directory via tensorstore (zstd level 5,
  mirroring `sparse_backend/zarr.rs:41`). The default.
- ``H5Backend``: HDF5 via h5py (feature-parity with the reference's
  `hdf5-metno` backend, `sparse_backend/hdf5.rs`).
- ``MemoryBackend``: scipy CSC in RAM (test fixtures, small runs).

Matrix orientation follows the reference: rows = features/genes (D),
columns = cells (N). `read_columns_csc(cols)` returns a scipy
`csc_matrix` of shape [D, len(cols)].
"""

from __future__ import annotations

import abc
import json
import logging
import os
from pathlib import Path
from typing import Iterable, Sequence

import numpy as np
import scipy.sparse as sp

_log = logging.getLogger(__name__)

_CHUNK = 1 << 20  # elements per chunk, mirroring MTX_STREAM_BLOCK (zarr.rs:48)
_ZSTD_LEVEL = 5  # COMPRESSION_LEVEL (zarr.rs:41)


# ----------------------------------------------------------------------------
# tensorstore helpers
# ----------------------------------------------------------------------------


def _ts():
    import tensorstore as ts

    return ts


def _zarr3_spec(path: str, key: str, *, shape=None, dtype=None, create=False, chunk=_CHUNK):
    spec = {
        "driver": "zarr3",
        "kvstore": {"driver": "file", "path": os.path.join(path, key.lstrip("/"))},
    }
    if create:
        spec["metadata"] = {
            "shape": list(shape),
            "data_type": dtype,
            "chunk_grid": {
                "name": "regular",
                "configuration": {"chunk_shape": [min(chunk, max(int(shape[0]), 1))]},
            },
            "codecs": [
                {"name": "bytes", "configuration": {"endian": "little"}},
                {"name": "zstd", "configuration": {"level": _ZSTD_LEVEL}},
            ],
        }
        spec["create"] = True
        spec["delete_existing"] = True
    return spec


def _zarr3_write(path: str, key: str, arr: np.ndarray, dtype: str):
    ts = _ts()
    store = ts.open(_zarr3_spec(path, key, shape=arr.shape, dtype=dtype, create=True)).result()
    store[...].write(arr).result()


def _zarr3_open(path: str, key: str):
    ts = _ts()
    return ts.open(_zarr3_spec(path, key)).result()


def write_zarr_group_metadata(
    path: str, attributes: dict | None = None, *, key: str = ""
):
    """Zarr v3 GROUP metadata (`zarr.json`) at `path/key`. The
    reference's opener reads the matrix shape from ROOT-GROUP
    attributes — `Group::open(store, "/")` then `attributes()["nrow"]`
    etc. (`sparse_backend/zarr.rs:500-524`) — and bails without them,
    so every store we write carries them (`initialize_backend` +
    `record_mtx_shape`, zarr.rs:611-650)."""
    doc: dict = {"zarr_format": 3, "node_type": "group"}
    if attributes:
        doc["attributes"] = attributes
    target = Path(path) / key.lstrip("/") / "zarr.json" if key else Path(path) / "zarr.json"
    target.parent.mkdir(parents=True, exist_ok=True)
    target.write_text(json.dumps(doc, indent=1))


def read_zarr_group_attributes(path: str, key: str = "") -> dict | None:
    target = Path(path) / key.lstrip("/") / "zarr.json" if key else Path(path) / "zarr.json"
    if not target.exists():
        return None
    try:
        doc = json.loads(target.read_text())
    except Exception:
        return None
    if doc.get("node_type") != "group":
        return None
    return doc.get("attributes", {})


def _write_zarr_shape_metadata(path: str, d: int, n: int, nnz: int):
    """Root + subgroup group nodes with the reference's shape attrs."""
    write_zarr_group_metadata(
        path, {"nrow": int(d), "ncol": int(n), "nnz": int(nnz)}
    )
    write_zarr_group_metadata(path, key="by_column")
    write_zarr_group_metadata(path, key="by_row")


def _names_path(path: str, key: str) -> Path:
    return Path(path) / f"{key}.names.txt"


def _write_names(path: str, key: str, names: Sequence[str]):
    """String arrays: tensorstore zarr3 has no vlen-string codec, so names
    live as a plain one-per-line text object inside the store directory
    (readable by any tool; the reference's data is a string array at the
    same key, `zarr.rs:799-801`)."""
    _names_path(path, key).write_text("\n".join(str(n) for n in names) + "\n")


def _read_names(path: str, key: str) -> list[str] | None:
    p = _names_path(path, key)
    if not p.exists():
        return None
    return p.read_text().rstrip("\n").split("\n")


# ----------------------------------------------------------------------------
# Backend interface
# ----------------------------------------------------------------------------


class SparseBackend(abc.ABC):
    """The `SparseIo` trait equivalent (`sparse_io/traits.rs:46-866`),
    reduced to the access patterns the TPU engine actually streams:
    column (cell) slabs as CSC, row (gene) slabs as CSR, names, shape."""

    @property
    @abc.abstractmethod
    def num_rows(self) -> int: ...

    @property
    @abc.abstractmethod
    def num_columns(self) -> int: ...

    @property
    @abc.abstractmethod
    def num_nonzeros(self) -> int: ...

    @abc.abstractmethod
    def read_columns_csc(self, columns: Sequence[int] | np.ndarray) -> sp.csc_matrix:
        """[D, len(columns)] CSC slab."""

    @abc.abstractmethod
    def read_rows_csr(self, rows: Sequence[int] | np.ndarray) -> sp.csr_matrix:
        """[len(rows), N] CSR slab."""

    @abc.abstractmethod
    def row_names(self) -> list[str]: ...

    @abc.abstractmethod
    def column_names(self) -> list[str]: ...

    @abc.abstractmethod
    def register_row_names(self, names: Sequence[str]): ...

    @abc.abstractmethod
    def register_column_names(self, names: Sequence[str]): ...

    # ---- shared conveniences -------------------------------------------

    @property
    def shape(self) -> tuple[int, int]:
        return (self.num_rows, self.num_columns)

    def read_columns_dense(self, columns) -> np.ndarray:
        return np.asarray(self.read_columns_csc(columns).todense())

    def read_column_range_csc(self, lb: int, ub: int) -> sp.csc_matrix:
        return self.read_columns_csc(np.arange(lb, ub))

    def column_block_sizes(self, block_size: int) -> list[tuple[int, int]]:
        """Half-open [lb, ub) column jobs, mirroring
        `generate_minibatch_intervals` (matrix-util utils)."""
        n = self.num_columns
        return [(lb, min(lb + block_size, n)) for lb in range(0, n, block_size)]

    def column_nnz(self) -> np.ndarray | None:
        """Per-column nonzero counts from metadata where cheap (None
        lets callers fall back); drives nnz-balanced multi-host shards."""
        return None


def _to_csc(
    rows: np.ndarray, cols: np.ndarray, vals: np.ndarray, shape: tuple[int, int]
) -> sp.csc_matrix:
    m = sp.coo_matrix((vals, (rows, cols)), shape=shape).tocsc()
    m.sum_duplicates()
    return m


class MemoryBackend(SparseBackend):
    """In-memory backend over scipy CSC+CSR (tests, sims, small data)."""

    def __init__(self, csc: sp.csc_matrix, row_names=None, column_names=None):
        self._csc = csc.tocsc()
        self._csr = csc.tocsr()
        d, n = csc.shape
        self._row_names = list(row_names) if row_names else [f"r{i}" for i in range(d)]
        self._col_names = list(column_names) if column_names else [f"c{j}" for j in range(n)]

    @property
    def num_rows(self):
        return self._csc.shape[0]

    @property
    def num_columns(self):
        return self._csc.shape[1]

    @property
    def num_nonzeros(self):
        return int(self._csc.nnz)

    def read_columns_csc(self, columns):
        return self._csc[:, np.asarray(columns, dtype=np.int64)]

    def read_rows_csr(self, rows):
        return self._csr[np.asarray(rows, dtype=np.int64), :]

    def column_nnz(self):
        return np.diff(self._csc.indptr).astype(np.int64)

    def row_names(self):
        return self._row_names

    def column_names(self):
        return self._col_names

    def register_row_names(self, names):
        assert len(names) == self.num_rows
        self._row_names = list(names)

    def register_column_names(self, names):
        assert len(names) == self.num_columns
        self._col_names = list(names)


class _CompressedFileBackend(SparseBackend):
    """Shared logic for on-disk dual-CSC/CSR backends: indptr vectors are
    cached in memory on open (traits.rs:845-848); data/indices stream."""

    def __init__(self, path: str):
        self.path = str(path)
        self._col_indptr: np.ndarray | None = None
        self._row_indptr: np.ndarray | None = None
        self._shape: tuple[int, int, int] | None = None

    # -- subclass primitives ---------------------------------------------

    @abc.abstractmethod
    def _read_array(self, key: str, lb: int = 0, ub: int | None = None) -> np.ndarray: ...

    @abc.abstractmethod
    def _write_array(self, key: str, arr: np.ndarray, dtype: str): ...

    @abc.abstractmethod
    def _read_name_list(self, key: str) -> list[str] | None: ...

    @abc.abstractmethod
    def _write_name_list(self, key: str, names: Sequence[str]): ...

    # -- writing ----------------------------------------------------------

    def record_csc(self, csc: sp.csc_matrix):
        csc = csc.tocsc()
        csc.sum_duplicates()
        csr = csc.tocsr()
        d, n = csc.shape
        self._write_array("nrow", np.asarray([d], dtype=np.uint64), "uint64")
        self._write_array("ncol", np.asarray([n], dtype=np.uint64), "uint64")
        self._write_array("nnz", np.asarray([csc.nnz], dtype=np.uint64), "uint64")
        self._write_array("by_column/data", csc.data.astype(np.float32), "float32")
        self._write_array("by_column/indices", csc.indices.astype(np.uint64), "uint64")
        self._write_array("by_column/indptr", csc.indptr.astype(np.uint64), "uint64")
        self._write_array("by_row/data", csr.data.astype(np.float32), "float32")
        self._write_array("by_row/indices", csr.indices.astype(np.uint64), "uint64")
        self._write_array("by_row/indptr", csr.indptr.astype(np.uint64), "uint64")
        self._write_shape_metadata(d, n, int(csc.nnz))
        self._shape = (d, n, int(csc.nnz))
        self._col_indptr = csc.indptr.astype(np.int64)
        self._row_indptr = csr.indptr.astype(np.int64)

    def _write_shape_metadata(self, d: int, n: int, nnz: int):
        """Format-specific shape bookkeeping beyond the size arrays
        (zarr: the reference's ROOT-GROUP attributes)."""

    def _read_shape_metadata(self) -> tuple[int, int, int] | None:
        return None

    # -- reading ----------------------------------------------------------

    def _load_shape(self):
        if self._shape is None:
            # root-group attributes first (the ONLY place a store
            # written by the reference engine records its shape,
            # zarr.rs:611-650); our own stores also carry size arrays
            shape = self._read_shape_metadata()
            if shape is None:
                d = int(self._read_array("nrow")[0])
                n = int(self._read_array("ncol")[0])
                z = int(self._read_array("nnz")[0])
                shape = (d, n, z)
            self._shape = shape
        return self._shape

    @property
    def num_rows(self):
        return self._load_shape()[0]

    @property
    def num_columns(self):
        return self._load_shape()[1]

    @property
    def num_nonzeros(self):
        return self._load_shape()[2]

    def _column_indptr(self) -> np.ndarray:
        if self._col_indptr is None:
            self._col_indptr = self._read_array("by_column/indptr").astype(np.int64)
        return self._col_indptr

    def _row_indptr_vec(self) -> np.ndarray:
        if self._row_indptr is None:
            self._row_indptr = self._read_array("by_row/indptr").astype(np.int64)
        return self._row_indptr

    def column_nnz(self):
        return np.diff(self._column_indptr()).astype(np.int64)

    def _read_compressed_slabs(
        self, axis_keys: tuple[str, str], indptr: np.ndarray, idx: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Gather (data, indices, out_indptr) for the requested slots,
        coalescing adjacent slots into one ranged read per contiguous run."""
        data_key, idx_key = axis_keys
        starts = indptr[idx]
        ends = indptr[idx + 1]
        counts = ends - starts
        out_indptr = np.zeros(len(idx) + 1, dtype=np.int64)
        np.cumsum(counts, out=out_indptr[1:])
        total = int(out_indptr[-1])
        data = np.empty(total, dtype=np.float32)
        indices = np.empty(total, dtype=np.int64)
        if total == 0:
            return data, indices, out_indptr
        # coalesce contiguous runs: sorted streaming reads dominate, so
        # most requests collapse into a handful of big ranged reads
        i = 0
        k = len(idx)
        while i < k:
            j = i
            while j + 1 < k and starts[j + 1] == ends[j]:
                j += 1
            lb, ub = int(starts[i]), int(ends[j])
            if ub > lb:
                o_lb = int(out_indptr[i])
                o_ub = o_lb + (ub - lb)
                data[o_lb:o_ub] = self._read_array(data_key, lb, ub)
                indices[o_lb:o_ub] = self._read_array(idx_key, lb, ub).astype(np.int64)
            i = j + 1
        return data, indices, out_indptr

    def read_columns_csc(self, columns):
        idx = np.asarray(columns, dtype=np.int64)
        d = self.num_rows
        data, indices, indptr = self._read_compressed_slabs(
            ("by_column/data", "by_column/indices"), self._column_indptr(), idx
        )
        return sp.csc_matrix((data, indices, indptr), shape=(d, len(idx)))

    def read_rows_csr(self, rows):
        idx = np.asarray(rows, dtype=np.int64)
        n = self.num_columns
        data, indices, indptr = self._read_compressed_slabs(
            ("by_row/data", "by_row/indices"), self._row_indptr_vec(), idx
        )
        return sp.csr_matrix((data, indices, indptr), shape=(len(idx), n))

    def row_names(self):
        names = self._read_name_list("row_names")
        if names is None:
            _log.warning(
                "%s: no row names registered; using placeholder r0..r%d "
                "(downstream gene-name joins will not match)",
                self.path, self.num_rows - 1,
            )
            return [f"r{i}" for i in range(self.num_rows)]
        return names

    def column_names(self):
        names = self._read_name_list("column_names")
        if names is None:
            _log.warning(
                "%s: no column names registered; using placeholder c0..c%d",
                self.path, self.num_columns - 1,
            )
            return [f"c{j}" for j in range(self.num_columns)]
        return names

    def register_row_names(self, names):
        assert len(names) == self.num_rows, "row name length mismatch"
        self._write_name_list("row_names", names)

    def register_column_names(self, names):
        assert len(names) == self.num_columns, "column name length mismatch"
        self._write_name_list("column_names", names)


class ZarrBackend(_CompressedFileBackend):
    """Zarr v3 directory store via tensorstore (default backend,
    `sparse_backend/zarr.rs:66`).

    Names are read/written as zarr v3 string arrays at the reference's
    keys (`/row_names`, `/column_names`; `zarr.rs:799-801`) so stores
    interoperate with the reference engine in both directions; a
    sidecar `.names.txt` is kept as a human-readable mirror and as the
    fallback for stores written before the string-array path existed."""

    def _read_array(self, key, lb=0, ub=None):
        store = _zarr3_open(self.path, key)
        if ub is None:
            return np.asarray(store[...].read().result())
        return np.asarray(store[lb:ub].read().result())

    def _write_array(self, key, arr, dtype):
        _zarr3_write(self.path, key, np.ascontiguousarray(arr), dtype)

    def _read_name_list(self, key):
        from .zarr_strings import read_string_array

        names = read_string_array(self.path, key)
        if names is not None:
            return names
        return _read_names(self.path, key)

    def _write_name_list(self, key, names):
        from .zarr_strings import write_string_array

        write_string_array(self.path, key, [str(n) for n in names])
        _write_names(self.path, key, names)

    def _write_shape_metadata(self, d, n, nnz):
        _write_zarr_shape_metadata(self.path, d, n, nnz)

    def _read_shape_metadata(self):
        attrs = read_zarr_group_attributes(self.path)
        if attrs and all(k in attrs for k in ("nrow", "ncol", "nnz")):
            return (int(attrs["nrow"]), int(attrs["ncol"]), int(attrs["nnz"]))
        return None


class H5Backend(_CompressedFileBackend):
    """HDF5 backend via h5py (`sparse_backend/hdf5.rs` parity).

    Conformance with the reference writer/reader:
    - datasets are chunked ~1 MiB (min 8192 elems, capped at nelem;
      `utilities/io_helpers.rs:104-116` chunk_elems) and compressed with
      the standard HDF5 blosc filter (id 32001), blosclz clevel 5, byte
      shuffle (`hdf5.rs:15,779-801`). No blosc HDF5 plugin exists in
      this image, so chunks are compressed/decompressed through the
      system libblosc (`data/blosc_codec.py`) and moved with
      write_direct_chunk/read_direct_chunk; the resulting file is
      bit-compatible with what hdf5-metno+blosc reads and writes.
    - nrow/ncol/nnz live in ROOT FILE ATTRIBUTES (`hdf5.rs:204-214`
      reads ONLY attrs) — the size datasets are kept as our own
      redundant fallback.
    """

    def _file(self, mode="r"):
        import h5py

        return h5py.File(self.path, mode)

    @staticmethod
    def _chunk_elems(nelem: int, elem_bytes: int) -> int:
        """io_helpers.rs:111-116: ~1 MiB target, >=8192 elems, <=nelem."""
        return min(max((1024 * 1024) // max(elem_bytes, 1), 8192), max(nelem, 1))

    @staticmethod
    def _blosc_filter_index(ds) -> int | None:
        """Position of the blosc filter in the dataset's pipeline."""
        from . import blosc_codec

        plist = ds.id.get_create_plist()
        for i in range(plist.get_nfilters()):
            if plist.get_filter(i)[0] == blosc_codec.BLOSC_H5_FILTER_ID:
                return i
        return None

    def _read_array(self, key, lb=0, ub=None):
        from . import blosc_codec

        with self._file("r") as f:
            ds = f[key]
            fi = self._blosc_filter_index(ds)
            if fi is None or ds.chunks is None:
                return np.asarray(ds[...] if ub is None else ds[lb:ub])
            # blosc-compressed (ours or reference-written): decode raw
            # chunks ourselves — libhdf5 here has no blosc plugin
            n = ds.shape[0]
            lo = int(lb)
            hi = n if ub is None else min(int(ub), n)
            if hi <= lo:
                return np.empty(0, dtype=ds.dtype)
            chunk = int(ds.chunks[0])
            out = np.empty(hi - lo, dtype=ds.dtype)
            itemsize = ds.dtype.itemsize
            for c0 in range((lo // chunk) * chunk, hi, chunk):
                mask, raw = ds.id.read_direct_chunk((c0,))
                if mask & (1 << fi):  # filter skipped for this chunk
                    buf = np.frombuffer(raw, dtype=ds.dtype)
                else:
                    buf = np.frombuffer(blosc_codec.decompress(raw), dtype=ds.dtype)
                # edge chunks decode to the FULL chunk size (HDF5 pads
                # before filtering); slice to the valid region
                valid = min(chunk, n - c0)
                s0 = max(lo, c0)
                s1 = min(hi, c0 + valid)
                out[s0 - lo : s1 - lo] = buf[s0 - c0 : s1 - c0]
            return out

    def _write_array(self, key, arr, dtype):
        import h5py

        from . import blosc_codec

        arr = np.asarray(arr)
        with self._file("a") as f:
            if key in f:
                del f[key]
            if not blosc_codec.available():
                f.create_dataset(
                    key, data=arr, compression="gzip", compression_opts=4,
                    chunks=(min(_CHUNK, max(len(arr), 1)),),
                )
                return
            grp_path, _, name = key.rpartition("/")
            grp = f.require_group(grp_path) if grp_path else f["/"]
            n = len(arr)
            itemsize = arr.dtype.itemsize
            chunk = self._chunk_elems(n, itemsize)
            dcpl = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
            dcpl.set_chunk((chunk,))
            cd = (
                blosc_codec.FILTER_BLOSC_VERSION,
                blosc_codec.BLOSC_VERSION_FORMAT,
                itemsize,
                chunk * itemsize,
                blosc_codec.CLEVEL,
                blosc_codec.SHUFFLE_BYTE,
                blosc_codec.COMPCODE_BLOSCLZ,
            )
            dcpl.set_filter(
                blosc_codec.BLOSC_H5_FILTER_ID, h5py.h5z.FLAG_OPTIONAL, cd
            )
            space = h5py.h5s.create_simple((max(n, 0),))
            tid = h5py.h5t.py_create(arr.dtype, logical=True)
            did = h5py.h5d.create(
                grp.id, name.encode(), tid, space, dcpl=dcpl
            )
            ds = h5py.Dataset(did)
            for c0 in range(0, n, chunk):
                block = arr[c0 : c0 + chunk]
                if len(block) < chunk:  # HDF5 filters run on FULL chunks
                    pad = np.zeros(chunk, dtype=arr.dtype)
                    pad[: len(block)] = block
                    block = pad
                ds.id.write_direct_chunk(
                    (c0,),
                    blosc_codec.compress(
                        np.ascontiguousarray(block).tobytes(), itemsize
                    ),
                    filter_mask=0,
                )

    def _write_shape_metadata(self, d, n, nnz):
        # the reference reads shape ONLY from root attrs (hdf5.rs:204-214)
        with self._file("a") as f:
            for k, v in (("nrow", d), ("ncol", n), ("nnz", nnz)):
                if k in f.attrs:
                    del f.attrs[k]
                f.attrs.create(k, np.uint64(v), dtype=np.uint64)

    def _read_shape_metadata(self):
        with self._file("r") as f:
            a = f.attrs
            if all(k in a for k in ("nrow", "ncol", "nnz")):
                return (int(a["nrow"]), int(a["ncol"]), int(a["nnz"]))
        return None

    def _read_name_list(self, key):
        with self._file("r") as f:
            if key not in f:
                return None
            return [s.decode() if isinstance(s, bytes) else str(s) for s in f[key][...]]

    def _write_name_list(self, key, names):
        import h5py

        with self._file("a") as f:
            if key in f:
                del f[key]
            f.create_dataset(key, data=np.asarray(names, dtype=h5py.string_dtype()))


# ----------------------------------------------------------------------------
# Factory (sparse_io/factory.rs:27,63 equivalent)
# ----------------------------------------------------------------------------


def _backend_kind(path: str) -> str:
    p = str(path)
    if p.endswith((".h5", ".hdf5")):
        return "h5"
    return "zarr"


def create_sparse_from_triplets(
    rows: np.ndarray,
    cols: np.ndarray,
    vals: np.ndarray,
    shape: tuple[int, int],
    path: str | os.PathLike,
    row_names: Sequence[str] | None = None,
    column_names: Sequence[str] | None = None,
) -> SparseBackend:
    """Build a backend from COO triplets
    (`create_sparse_from_triplets_owned`, factory.rs:63)."""
    csc = _to_csc(
        np.asarray(rows, dtype=np.int64),
        np.asarray(cols, dtype=np.int64),
        np.asarray(vals, dtype=np.float32),
        shape,
    )
    return create_sparse_from_csc(csc, path, row_names, column_names)


def create_sparse_from_csc(
    csc: sp.spmatrix,
    path: str | os.PathLike,
    row_names: Sequence[str] | None = None,
    column_names: Sequence[str] | None = None,
) -> SparseBackend:
    path = str(path)
    if path.endswith(".zarr.zip"):
        # write into a sibling working directory, then archive it
        # (the reference's prepare_output/finalize_output pair,
        # zarr_io.rs:120-151)
        work = path + ".working"
        create_sparse_from_csc(csc, work, row_names, column_names)
        finalize_zarr_zip(work, path)
        return open_sparse_matrix(path)
    kind = _backend_kind(path)
    backend: _CompressedFileBackend
    if kind == "h5":
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        if Path(path).exists():
            Path(path).unlink()
        backend = H5Backend(path)
    else:
        Path(path).mkdir(parents=True, exist_ok=True)
        backend = ZarrBackend(path)
    backend.record_csc(csc.tocsc())
    if row_names is not None:
        backend.register_row_names(row_names)
    if column_names is not None:
        backend.register_column_names(column_names)
    return backend


class StreamingCscWriter:
    """Bounded-memory backend construction from column slabs
    (`data-beans` streaming CSC append + CSR rebuild, SURVEY.md
    section 2.2 `zarr.rs` slab path).

    `append(csc_slab)` spills each slab's COO arrays to disk; nothing
    is held across slabs. `finalize()` makes two kinds of streaming
    passes: one sequential pass assembling `by_column/{data, indices,
    indptr}` via partial tensorstore writes, then gene-chunked passes
    over the spilled slabs to assemble `by_row` (each pass keeps only
    one gene-chunk's entries in memory — O(nnz_chunk), not O(nnz)).

    Usage:
        w = StreamingCscWriter(path, n_rows, row_names=...)
        for slab in blocks: w.append(slab)
        backend = w.finalize(column_names=...)
    """

    def __init__(
        self,
        path: str | os.PathLike,
        n_rows: int,
        *,
        row_names: Sequence[str] | None = None,
        gene_chunk: int = 8192,
    ):
        self.path = str(path)
        self.n_rows = int(n_rows)
        self.row_names = row_names
        self.gene_chunk = int(gene_chunk)
        self._spill = Path(self.path + ".spill")
        self._spill.mkdir(parents=True, exist_ok=True)
        self._n_slabs = 0
        self._n_cols = 0
        self._nnz = 0
        self._row_counts = np.zeros(self.n_rows, np.int64)
        self._col_indptr_parts: list[np.ndarray] = [np.zeros(1, np.int64)]

    def append(self, csc_slab: sp.spmatrix):
        slab = sp.csc_matrix(csc_slab)
        if slab.shape[0] != self.n_rows:
            raise ValueError(f"slab rows {slab.shape[0]} != {self.n_rows}")
        i = self._n_slabs
        np.save(self._spill / f"data{i}.npy", slab.data.astype(np.float32))
        np.save(self._spill / f"indices{i}.npy", slab.indices.astype(np.int64))
        self._col_indptr_parts.append(
            slab.indptr[1:].astype(np.int64) + self._nnz
        )
        self._row_counts += np.bincount(
            slab.indices, minlength=self.n_rows
        ).astype(np.int64)
        self._n_slabs += 1
        self._n_cols += slab.shape[1]
        self._nnz += slab.nnz

    def _create(self, key: str, n: int, dtype: str):
        ts = _ts()
        return ts.open(
            _zarr3_spec(self.path, key, shape=(max(n, 1),), dtype=dtype, create=True)
        ).result()

    def finalize(
        self, column_names: Sequence[str] | None = None
    ) -> SparseBackend:
        import shutil

        Path(self.path).mkdir(parents=True, exist_ok=True)
        # scalars
        _zarr3_write(self.path, "nrow", np.asarray([self.n_rows], np.uint64), "uint64")
        _zarr3_write(self.path, "ncol", np.asarray([self._n_cols], np.uint64), "uint64")
        _zarr3_write(self.path, "nnz", np.asarray([self._nnz], np.uint64), "uint64")
        _write_zarr_shape_metadata(self.path, self.n_rows, self._n_cols, self._nnz)

        # ---- by_column: one sequential pass over the slabs ---------------
        data_st = self._create("by_column/data", self._nnz, "float32")
        idx_st = self._create("by_column/indices", self._nnz, "uint64")
        off = 0
        for i in range(self._n_slabs):
            d = np.load(self._spill / f"data{i}.npy")
            r = np.load(self._spill / f"indices{i}.npy")
            if len(d):
                data_st[off : off + len(d)].write(d).result()
                idx_st[off : off + len(d)].write(r.astype(np.uint64)).result()
            off += len(d)
        _zarr3_write(
            self.path, "by_column/indptr",
            np.concatenate(self._col_indptr_parts).astype(np.uint64), "uint64",
        )

        # ---- by_row: gene-chunked passes ---------------------------------
        row_indptr = np.zeros(self.n_rows + 1, np.int64)
        np.cumsum(self._row_counts, out=row_indptr[1:])
        rdata_st = self._create("by_row/data", self._nnz, "float32")
        ridx_st = self._create("by_row/indices", self._nnz, "uint64")
        # chunk boundaries bounded by NNZ, not gene count: a short-fat
        # matrix must not collapse into one O(nnz) chunk
        max_chunk_nnz = 1 << 22
        bounds = [0]
        while bounds[-1] < self.n_rows:
            glb = bounds[-1]
            gub = min(glb + self.gene_chunk, self.n_rows)
            # shrink until the chunk's nnz fits the budget
            while gub > glb + 1 and row_indptr[gub] - row_indptr[glb] > max_chunk_nnz:
                gub = glb + max(1, (gub - glb) // 2)
            bounds.append(gub)
        for glb, gub in zip(bounds[:-1], bounds[1:]):
            base = row_indptr[glb]
            chunk_nnz = row_indptr[gub] - base
            if chunk_nnz == 0:
                continue
            cd = np.empty(chunk_nnz, np.float32)
            cc = np.empty(chunk_nnz, np.int64)
            cr = np.empty(chunk_nnz, np.int64)
            fill = (row_indptr[glb:gub] - base).copy()
            col_off = 0
            for i in range(self._n_slabs):
                d = np.load(self._spill / f"data{i}.npy")
                r = np.load(self._spill / f"indices{i}.npy")
                ptr = np.concatenate(
                    [
                        [0],
                        self._col_indptr_parts[i + 1]
                        - (self._col_indptr_parts[i][-1] if i > 0 else 0),
                    ]
                )
                sel = (r >= glb) & (r < gub)
                if sel.any():
                    # column id of each selected entry within this slab
                    cols_local = np.searchsorted(
                        ptr, np.nonzero(sel)[0], side="right"
                    ) - 1
                    rs = r[sel] - glb
                    order = np.argsort(rs, kind="stable")
                    rs, ds = rs[order], d[sel][order]
                    cs = (cols_local[order] + col_off).astype(np.int64)
                    # scatter into per-row runs (slabs arrive in column
                    # order, so stable row-sort keeps columns sorted)
                    counts = np.bincount(rs, minlength=gub - glb)
                    pos = fill[rs] + np.arange(len(rs)) - np.repeat(
                        np.cumsum(np.concatenate([[0], counts[:-1]])), counts
                    )
                    cd[pos] = ds
                    cc[pos] = cs
                    cr[pos] = rs
                    fill += counts
                col_off += len(ptr) - 1
            rdata_st[base : base + chunk_nnz].write(cd).result()
            ridx_st[base : base + chunk_nnz].write(cc.astype(np.uint64)).result()
        _zarr3_write(
            self.path, "by_row/indptr", row_indptr.astype(np.uint64), "uint64"
        )

        shutil.rmtree(self._spill, ignore_errors=True)
        backend = ZarrBackend(self.path)
        if self.row_names is not None:
            backend.register_row_names(self.row_names)
        if column_names is not None:
            backend.register_column_names(column_names)
        return backend


def open_sparse_matrix(path: str | os.PathLike) -> SparseBackend:
    """Open an existing backend by sniffing the path
    (`open_sparse_matrix`, factory.rs:27). `.zarr.zip` archives
    (zarr.rs zip-store flavor) are extracted once into a sibling cache
    directory and served read-only from there."""
    path = str(path)
    if not Path(path).exists():
        raise FileNotFoundError(path)
    if path.endswith(".zarr.zip"):
        return ZarrBackend(_extract_zarr_zip(path))
    if _backend_kind(path) == "h5":
        return H5Backend(path)
    return ZarrBackend(path)


def finalize_zarr_zip(working_dir: str, zip_path: str) -> str:
    """Archive a working `.zarr` directory as a `.zarr.zip` store
    (zarr_io.rs:139 `finalize_zarr_output`). Entries live under a
    `<stem>/` prefix — `foo.zarr.zip` nests `foo.zarr/...` — matching
    the layout `detect_zip_zarr_prefix` (zarr_io.rs:30) probes first,
    so archives round-trip with the reference engine. Chunk payloads
    are STORED, not deflated: they're already codec-compressed, and a
    stored entry keeps random-access reads (the zip-store adapter's
    whole point) cheap."""
    import shutil
    import zipfile

    working = Path(working_dir)
    stem = Path(zip_path).name
    stem = stem[: -len(".zip")] if stem.endswith(".zip") else stem
    if Path(zip_path).exists():
        Path(zip_path).unlink()
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_STORED) as zf:
        for p in sorted(working.rglob("*")):
            if p.is_file():
                zf.write(p, f"{stem}/{p.relative_to(working)}")
    shutil.rmtree(working)
    return zip_path


def _extract_zarr_zip(path: str) -> str:
    """Unpack a .zarr.zip archive next to itself ({path}.extracted/),
    reusing the extraction when it is newer than the archive."""
    import zipfile

    dest = Path(path + ".extracted")
    marker = dest / ".extract_ok"
    if not (marker.exists() and marker.stat().st_mtime >= Path(path).stat().st_mtime):
        if dest.exists():
            import shutil

            shutil.rmtree(dest)
        dest.mkdir(parents=True)
        with zipfile.ZipFile(path) as zf:
            zf.extractall(dest)
        marker.touch()
    # archives may nest the store under a single top-level dir; the
    # store root is recognizable by its "nrow" array (our stores) or a
    # root group zarr.json carrying the shape attrs (reference stores)
    def _is_root(p: Path) -> bool:
        if (p / "nrow").exists():
            return True
        attrs = read_zarr_group_attributes(str(p))
        return bool(attrs) and "nrow" in attrs

    if not _is_root(dest):
        for d in dest.iterdir():
            if d.is_dir() and _is_root(d):
                return str(d)
    return str(dest)
