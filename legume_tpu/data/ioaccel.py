"""ctypes bindings for the native IO accelerators
(`native/ioaccel.cpp`): MatrixMarket body parsing and ATAC-fragments
tokenization as compiled C loops (the reference's ingestion is
compiled Rust end to end; the C path wins at many-GB inputs where
Python per-line overhead accumulates).

Builders call `mtx_triplet_chunks` / `fragment_chunks` when the shared
object builds, falling back to the pure-Python paths otherwise.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_SO_PATH = _NATIVE_DIR / "libioaccel.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    src = _NATIVE_DIR / "ioaccel.cpp"
    try:
        if not _SO_PATH.exists() or _SO_PATH.stat().st_mtime < src.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 str(src), "-o", str(_SO_PATH), "-lz"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(_SO_PATH))
    except Exception as e:  # no compiler / build failure -> python fallback
        log.info("ioaccel unavailable (%s); using python parsers", e)
        return None
    lib.mtx_open.restype = ctypes.c_void_p
    lib.mtx_open.argtypes = [ctypes.c_char_p]
    lib.mtx_dims.argtypes = [ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int64)] * 3
    lib.mtx_next_chunk.restype = ctypes.c_long
    lib.mtx_next_chunk.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.mtx_close.argtypes = [ctypes.c_void_p]
    lib.frag_open.restype = ctypes.c_void_p
    lib.frag_open.argtypes = [ctypes.c_char_p]
    lib.frag_next_chunk.restype = ctypes.c_long
    lib.frag_next_chunk.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
    ]
    for fn in ("frag_num_chroms", "frag_num_barcodes"):
        getattr(lib, fn).restype = ctypes.c_long
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    for fn in ("frag_chrom", "frag_barcode"):
        getattr(lib, fn).restype = ctypes.c_char_p
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.frag_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def mtx_triplet_chunks(path: str, chunk: int = 1 << 22):
    """Yields (dims, None) first, then (rows, cols, vals) 0-based
    triplet chunks from a (possibly gzipped) MatrixMarket file."""
    lib = _load()
    if lib is None:
        raise RuntimeError("ioaccel unavailable")
    h = lib.mtx_open(str(path).encode())
    if not h:
        raise IOError(f"cannot parse MTX header: {path}")
    try:
        nr = ctypes.c_int64()
        nc = ctypes.c_int64()
        nz = ctypes.c_int64()
        lib.mtx_dims(h, ctypes.byref(nr), ctypes.byref(nc), ctypes.byref(nz))
        yield (int(nr.value), int(nc.value), int(nz.value)), None
        rows = np.empty(chunk, np.int64)
        cols = np.empty(chunk, np.int64)
        vals = np.empty(chunk, np.float32)
        while True:
            n = lib.mtx_next_chunk(
                h, chunk,
                rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
            if n < 0:
                raise IOError(f"MTX parse error in {path}")
            if n == 0:
                break
            yield rows[:n].copy(), cols[:n].copy(), vals[:n].copy()
    finally:
        lib.mtx_close(h)


def fragment_chunks(path: str, chunk: int = 1 << 20):
    """Yields (chrom_id, start, end, barcode_id, count, chroms_so_far)
    tuples, then a final dict {"chroms": [...], "barcodes": [...]}
    after EOF. `chroms_so_far` covers every id in the chunk (the
    interner grows monotonically), so peak lookup works mid-stream."""
    lib = _load()
    if lib is None:
        raise RuntimeError("ioaccel unavailable")
    h = lib.frag_open(str(path).encode())
    if not h:
        raise IOError(f"cannot open fragments: {path}")
    try:
        cid = np.empty(chunk, np.int64)
        start = np.empty(chunk, np.int64)
        end = np.empty(chunk, np.int64)
        bid = np.empty(chunk, np.int64)
        cnt = np.empty(chunk, np.int32)
        while True:
            n = lib.frag_next_chunk(
                h, chunk,
                cid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                start.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                end.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                bid.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if n <= 0:
                break
            chroms_now = [
                lib.frag_chrom(h, i).decode()
                for i in range(lib.frag_num_chroms(h))
            ]
            yield (
                cid[:n].copy(), start[:n].copy(), end[:n].copy(),
                bid[:n].copy(), cnt[:n].copy(), chroms_now,
            )
        chroms = [
            lib.frag_chrom(h, i).decode() for i in range(lib.frag_num_chroms(h))
        ]
        barcodes = [
            lib.frag_barcode(h, i).decode() for i in range(lib.frag_num_barcodes(h))
        ]
        yield {"chroms": chroms, "barcodes": barcodes}
    finally:
        lib.frag_close(h)
