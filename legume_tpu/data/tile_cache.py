"""Ingest-time tile cache for the Pallas SpMM path.

The tiled Mosaic kernel (`ops/pallas_kernels.py`) is ~2.3x the XLA
segment path on-chip, but its host-side bucketing used to run on every
projection call, which kept the XLA path the default. This module
persists the bucketed layout next to the backend (`{path}/tile_cache/`)
so the hot path loads device-ready arrays: raw values are stored and
transformed (log1p) on device.

Cache layout:
    {backend}/tile_cache/meta.json   block_size, tile constants, shape
    {backend}/tile_cache/blk00000.npz  gi/cj/new/lr/lc/vv/ncols per block

Invalidation: meta records (num_rows, num_columns, nnz, block_size,
TILE_G, TILE_C, ENTRY_CHUNK); any mismatch at load time ignores the
cache.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np

from ..ops.pallas_kernels import ENTRY_CHUNK, TILE_C, TILE_G, prepare_tiles

log = logging.getLogger(__name__)

_VERSION = 1


def _cache_dir(backend_path: str) -> Path:
    p = Path(str(backend_path).rstrip("/"))
    if p.is_dir():
        return p / "tile_cache"
    return p.parent / (p.name + ".tile_cache")


def build_tile_cache(backend_path: str, *, block_size: int = 8192) -> int:
    """Bucket every column block once and persist the device-ready
    arrays (`data-beans tile-cache`). Returns the number of blocks."""
    from .sparse_io import open_sparse_matrix

    be = open_sparse_matrix(backend_path)
    cdir = _cache_dir(backend_path)
    cdir.mkdir(parents=True, exist_ok=True)
    n_blocks = 0
    for idx, (lb, ub) in enumerate(be.column_block_sizes(block_size)):
        csc = be.read_column_range_csc(lb, ub)
        coo = csc.tocoo()
        tiles = prepare_tiles(
            coo.row.astype(np.int64), coo.col.astype(np.int64),
            coo.data.astype(np.float32), ncols=csc.shape[1],
        )
        if tiles is None:
            tiles = {"gi": np.zeros(0, np.int32), "cj": np.zeros(0, np.int32),
                     "new": np.zeros(0, np.int32),
                     "lr": np.zeros((0, ENTRY_CHUNK, 1), np.int32),
                     "lc": np.zeros((0, ENTRY_CHUNK, 1), np.int32),
                     "vv": np.zeros((0, ENTRY_CHUNK, 1), np.float32),
                     "ncols": np.int64(csc.shape[1])}
        np.savez_compressed(cdir / f"blk{idx:05d}.npz", **tiles)
        n_blocks += 1
    meta = {
        "version": _VERSION,
        "block_size": int(block_size),
        "tile_g": TILE_G,
        "tile_c": TILE_C,
        "entry_chunk": ENTRY_CHUNK,
        "num_rows": int(be.num_rows),
        "num_columns": int(be.num_columns),
        "nnz": int(be.num_nonzeros),
        "n_blocks": n_blocks,
    }
    (cdir / "meta.json").write_text(json.dumps(meta, indent=2))
    log.info("tile-cache: %d blocks under %s", n_blocks, cdir)
    return n_blocks


class TileCache:
    """Read side: validates meta against the backend and serves
    per-block device-ready tile dicts."""

    def __init__(self, cdir: Path, meta: dict):
        self.cdir = cdir
        self.meta = meta

    @classmethod
    def load(cls, backend_path: str, *, block_size: int) -> "TileCache | None":
        cdir = _cache_dir(backend_path)
        mpath = cdir / "meta.json"
        if not mpath.exists():
            return None
        try:
            meta = json.loads(mpath.read_text())
        except Exception:
            return None
        from .sparse_io import open_sparse_matrix

        be = open_sparse_matrix(backend_path)
        want = {
            "version": _VERSION, "block_size": int(block_size),
            "tile_g": TILE_G, "tile_c": TILE_C, "entry_chunk": ENTRY_CHUNK,
            "num_rows": int(be.num_rows), "num_columns": int(be.num_columns),
            "nnz": int(be.num_nonzeros),
        }
        if any(meta.get(k) != v for k, v in want.items()):
            log.info("tile-cache at %s is stale; ignoring", cdir)
            return None
        return cls(cdir, meta)

    @property
    def n_blocks(self) -> int:
        return int(self.meta["n_blocks"])

    def block(self, idx: int) -> dict:
        with np.load(self.cdir / f"blk{idx:05d}.npz") as z:
            return {k: z[k] for k in z.files}
