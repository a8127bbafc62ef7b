"""Bounded-memory ingestion (VERDICT round-1 item 5): the external
column sorter + StreamingCscWriter reproduce the bulk layout exactly,
keep resident nonzeros bounded by the chunk budget, and a >cap build
succeeds in a subprocess under RLIMIT_AS where the in-memory path
cannot."""

import os
import resource
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest
import scipy.io as sio
import scipy.sparse as sp

from legume_tpu.data.builders import from_fragments, from_mtx, from_mtx_streaming
from legume_tpu.data.sparse_io import open_sparse_matrix
from legume_tpu.data.spill import TripletSpillSorter, build_streaming_from_triplet_chunks


def test_mtx_streaming_matches_bulk(tmp_path):
    rng = np.random.default_rng(0)
    d, n, nnz = 80, 300, 3000
    m = sp.coo_matrix(
        (
            rng.poisson(2.0, nnz) + 1.0,
            (rng.integers(0, d, nnz), rng.integers(0, n, nnz)),
        ),
        shape=(d, n),
    )
    mtx = tmp_path / "m.mtx"
    sio.mmwrite(mtx, m)
    bulk = from_mtx(str(mtx), str(tmp_path / "bulk.zarr"), streaming=False)
    stream = from_mtx_streaming(
        str(mtx), str(tmp_path / "st.zarr"), chunk_nnz=500, slab_cols=37
    )
    a = np.asarray(bulk.read_columns_csc(np.arange(n)).todense())
    b = np.asarray(stream.read_columns_csc(np.arange(n)).todense())
    np.testing.assert_allclose(a, b)
    br = np.asarray(stream.read_rows_csr(np.arange(d)).todense())
    np.testing.assert_allclose(br, a)


def test_sorter_bounds_resident_nnz(tmp_path):
    rng = np.random.default_rng(1)
    d, n = 50, 4000
    total = 200_000
    chunk = 10_000

    def chunks():
        for _ in range(total // chunk):
            yield (
                rng.integers(0, d, chunk),
                rng.integers(0, n, chunk),
                np.ones(chunk, np.float32),
            )

    backend, sorter = build_streaming_from_triplet_chunks(
        chunks(), str(tmp_path / "big.zarr"),
        n_rows=d, n_cols=n, chunk_nnz=chunk, slab_cols=256,
    )
    assert sorter.total_nnz == total
    # duplicates collapse, so nnz <= total but the mass is conserved
    got = np.asarray(backend.read_columns_csc(np.arange(n)).todense())
    assert got.sum() == total
    # the bounded-memory contract: never more than ~2 chunk budgets of
    # triplets resident (one pending chunk, or one merged output slab)
    assert sorter.peak_resident_nnz <= 2 * chunk, sorter.peak_resident_nnz


def test_fragments_streaming_build(tmp_path):
    rng = np.random.default_rng(2)
    lines = []
    for i in range(5000):
        c = f"chr{rng.integers(1, 3)}"
        s = int(rng.integers(0, 100_000))
        lines.append(f"{c}\t{s}\t{s + 80}\tBC{rng.integers(0, 40):03d}\t1")
    frag = tmp_path / "frags.tsv"
    frag.write_text("\n".join(lines) + "\n")
    be = from_fragments(str(frag), str(tmp_path / "fr.zarr"), tile_size=5000)
    assert be.num_columns == 40
    dense = np.asarray(be.read_columns_csc(np.arange(40)).todense())
    assert dense.sum() == 5000


def test_streaming_build_under_memory_cap(tmp_path):
    """Build a backend whose raw triplets exceed an RLIMIT_AS cap that
    the streaming path fits comfortably (SURVEY section 7: 1M-cell
    ingestion must not materialize the matrix)."""
    script = tmp_path / "build.py"
    script.write_text(textwrap.dedent(f"""
        import resource, sys
        # 1.25 GiB address-space cap: numpy+scipy baseline ~400 MB; an
        # in-memory build of 30M triplets needs the 600 MB arrays plus
        # argsort and CSC conversion copies (~1.5 GB on top), far over
        cap = (1 << 30) + (1 << 28)  # 1.25 GiB
        resource.setrlimit(resource.RLIMIT_AS, (cap, cap))
        import numpy as np
        from legume_tpu.data.spill import build_streaming_from_triplet_chunks

        d, n = 2000, 200_000
        chunk, n_chunks = 1_000_000, 30
        rng = np.random.default_rng(0)

        def chunks():
            for _ in range(n_chunks):
                yield (
                    rng.integers(0, d, chunk),
                    rng.integers(0, n, chunk),
                    np.ones(chunk, np.float32),
                )

        backend, sorter = build_streaming_from_triplet_chunks(
            chunks(), r"{tmp_path}/cap.zarr",
            n_rows=d, n_cols=n, chunk_nnz=chunk, slab_cols=8192,
        )
        assert sorter.total_nnz == chunk * n_chunks
        assert backend.num_columns == n
        col = np.asarray(backend.read_columns_csc(np.arange(5)).todense())
        assert col.shape == (d, 5)
        print("CAP_BUILD_OK", sorter.peak_resident_nnz)
    """))
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    out = subprocess.run(
        [sys.executable, str(script)], env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "CAP_BUILD_OK" in out.stdout
