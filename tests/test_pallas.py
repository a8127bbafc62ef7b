"""Pallas SpMM kernel vs the XLA segment-sum reference (interpreter
mode on the CPU mesh)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data.visitors import csc_to_coo_block
from legume_tpu.ops.pallas_kernels import CHUNK, coo_project_pallas
from legume_tpu.ops.sparse import project_block


def test_pallas_projection_matches_xla():
    rng = np.random.default_rng(0)
    d, n, k = 300, 200, 16
    m = sp.random(d, n, density=0.1, format="csc", random_state=1)
    blk = csc_to_coo_block(m, pad_to=CHUNK)
    basis = rng.normal(size=(d, k)).astype(np.float32)

    want = np.asarray(
        project_block(
            jnp.asarray(basis),
            jnp.asarray(blk.row_ids),
            jnp.asarray(blk.col_ids),
            jnp.asarray(blk.vals),
            ncols=blk.ncols,
        )
    )
    got = np.asarray(
        coo_project_pallas(
            jnp.asarray(basis),
            jnp.asarray(blk.row_ids),
            jnp.asarray(blk.col_ids),
            jnp.asarray(blk.vals),
            ncols=blk.ncols,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_multi_chunk():
    rng = np.random.default_rng(2)
    d, n, k = 100, 64, 8
    m = sp.random(d, n, density=0.8, format="csc", random_state=3)
    blk = csc_to_coo_block(m, pad_to=2 * CHUNK)
    basis = rng.normal(size=(d, k)).astype(np.float32)
    got = np.asarray(
        coo_project_pallas(
            jnp.asarray(basis),
            jnp.asarray(blk.row_ids),
            jnp.asarray(blk.col_ids),
            jnp.asarray(blk.vals),
            ncols=blk.ncols,
            interpret=True,
        )
    )
    want = np.asarray(m.T.todense()) @ basis
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_tiled_kernel_matches_segment_sum():
    """Mosaic-legal tiled one-hot SpMM == XLA segment-sum projection
    (interpret mode on CPU; the real-chip run is in roofline_bench)."""
    import jax.numpy as jnp

    from legume_tpu.ops.pallas_kernels import project_block_tiled
    from legume_tpu.ops.sparse import project_block

    rng = np.random.default_rng(3)
    d, k, ncols, nnz = 500, 48, 700, 20_000
    basis = rng.standard_normal((d, k)).astype(np.float32)
    rows = rng.integers(0, d, nnz)
    cols = np.sort(rng.integers(0, ncols, nnz))
    vals = rng.random(nnz).astype(np.float32)

    want = np.asarray(
        project_block(
            jnp.asarray(basis), jnp.asarray(rows.astype(np.int32)),
            jnp.asarray(cols.astype(np.int32)), jnp.asarray(vals), ncols=ncols,
        )
    )
    got = np.asarray(
        project_block_tiled(basis, rows, cols, vals, ncols=ncols, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_tiled_kernel_handles_empty_tiles_and_padding():
    from legume_tpu.ops.pallas_kernels import project_block_tiled

    rng = np.random.default_rng(4)
    d, k, ncols = 300, 16, 600
    basis = rng.standard_normal((d, k)).astype(np.float32)
    # all nonzeros land in the LAST cell tile; early tiles must be zero
    rows = rng.integers(0, d, 500)
    cols = rng.integers(520, 600, 500)
    vals = np.ones(500, np.float32)
    # plus COO padding slots (col == ncols) that must be dropped
    rows = np.concatenate([rows, np.zeros(12, np.int64)])
    cols = np.concatenate([cols, np.full(12, ncols)])
    vals = np.concatenate([vals, np.ones(12, np.float32)])
    out = np.asarray(
        project_block_tiled(basis, rows, cols, vals, ncols=ncols, interpret=True)
    )
    assert np.all(out[:512] == 0)
    assert np.abs(out[520:]).sum() > 0


def test_projection_pallas_dispatch_matches(monkeypatch):
    """LEGUME_PALLAS=1 routes project_columns through the tiled kernel
    and agrees with the XLA path."""
    import scipy.sparse as sp

    from legume_tpu.data.sparse_io import MemoryBackend
    from legume_tpu.ops import random_projection as rp

    rng = np.random.default_rng(5)
    dense = rng.poisson(1.0, (120, 400)).astype(np.float32)
    be = MemoryBackend(sp.csc_matrix(dense))
    _, want = rp.project_columns(be, 24, block_size=128, seed=3)
    monkeypatch.setenv("LEGUME_PALLAS", "1")
    _, got = rp.project_columns(be, 24, block_size=128, seed=3)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_tile_cache_projection_matches_xla(tmp_path, monkeypatch):
    """Ingest-time tile cache: LEGUME_PALLAS=1 projection through the
    cached tiles must match the XLA segment path (interpret mode on
    CPU), including per-cell norms and multi-block concatenation."""
    from legume_tpu.cli import main as cli
    from legume_tpu.data.tile_cache import TileCache, build_tile_cache
    from legume_tpu.ops import random_projection as rp
    from legume_tpu.senna.topic import load_data_vec

    out = str(tmp_path / "sim")
    cli.run_sim([
        "topic", "--rows", "120", "--cols", "700", "--factors", "3",
        "--depth", "800", "--output", out,
    ])
    path = f"{out}.zarr"
    nb = build_tile_cache(path, block_size=256)  # 3 blocks
    assert nb == 3
    assert TileCache.load(path, block_size=256) is not None
    assert TileCache.load(path, block_size=512) is None  # param mismatch

    vec = load_data_vec([path])
    basis_ref, proj_ref = rp.project_columns(vec, 8, block_size=256, seed=7)
    monkeypatch.setenv("LEGUME_PALLAS", "1")
    calls = []
    orig_block = TileCache.block
    monkeypatch.setattr(TileCache, "block", lambda self, i: calls.append(i) or orig_block(self, i))
    basis_c, proj_c = rp.project_columns(vec, 8, block_size=256, seed=7)
    assert calls == [0, 1, 2], "cache path not taken"
    np.testing.assert_allclose(basis_c, basis_ref, rtol=1e-6)
    np.testing.assert_allclose(proj_c, proj_ref, rtol=2e-3, atol=2e-3)


def test_collapse_block_tiled_matches_xla():
    """Tiled collapse kernel (interpret mode) == sparse.collapse_block
    including discard-slot padding and multi-tile gene axes."""
    import jax.numpy as jnp

    from legume_tpu.ops.pallas_kernels import collapse_block_tiled
    from legume_tpu.ops.sparse import collapse_block

    rng = np.random.default_rng(3)
    d, n, g, nnz = 300, 500, 7, 4000
    rows = rng.integers(0, d, nnz)
    cols = np.concatenate([rng.integers(0, n, nnz - 50), np.full(50, n)])  # pad
    vals = rng.gamma(1.0, 1.0, nnz).astype(np.float32)
    seg = np.concatenate([rng.integers(0, g, n), [g]]).astype(np.int32)

    ref = np.asarray(collapse_block(
        jnp.asarray(rows.astype(np.int32)), jnp.asarray(cols.astype(np.int32)),
        jnp.asarray(vals), jnp.asarray(seg), num_genes=d, num_groups=g,
    ))
    out = collapse_block_tiled(
        rows, cols, vals, seg, ncols=n, num_genes=d, num_groups=g,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    # group-tiled: huge group counts still work
    seg_big = np.concatenate([rng.integers(0, 5000, n), [5000]]).astype(np.int32)
    ref_big = np.asarray(collapse_block(
        jnp.asarray(rows.astype(np.int32)), jnp.asarray(cols.astype(np.int32)),
        jnp.asarray(vals), jnp.asarray(seg_big), num_genes=d, num_groups=5000,
    ))
    out_big = collapse_block_tiled(
        rows, cols, vals, seg_big, ncols=n, num_genes=d, num_groups=5000,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out_big), ref_big, rtol=1e-5, atol=1e-5)


def test_collect_basic_stats_pallas_matches_xla(monkeypatch):
    """LEGUME_PALLAS=1 collect_basic_stats (tiled collapse kernel in
    interpret mode) == the XLA scan path, incl. per-batch planes."""
    import scipy.sparse as sp

    from legume_tpu.data.sparse_io import MemoryBackend
    from legume_tpu.ops.collapse import collect_basic_stats

    rng = np.random.default_rng(5)
    csc = sp.random(150, 400, 0.15, format="csc", random_state=2,
                    dtype=np.float32)
    be = MemoryBackend(csc)
    groups = rng.integers(0, 6, 400)
    batches = rng.integers(0, 2, 400)
    ref = collect_basic_stats(be, groups, 6, num_batches=2, batches=batches,
                              block_size=128)
    monkeypatch.setenv("LEGUME_PALLAS", "1")
    out = collect_basic_stats(be, groups, 6, num_batches=2, batches=batches,
                              block_size=128)
    np.testing.assert_allclose(out.observed_sum_ds, ref.observed_sum_ds,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out.observed_sum_db, ref.observed_sum_db,
                               rtol=1e-5, atol=1e-5)
