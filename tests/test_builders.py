"""Builder/exporter round-trips (data-beans handlers; reference
pattern 2 integration-test style)."""

import gzip

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data.builders import (
    from_h5ad,
    from_mtx,
    merge_backends,
    subset_backend,
    to_h5ad,
    to_mtx,
)
from legume_tpu.data.sparse_io import create_sparse_from_csc, open_sparse_matrix


@pytest.fixture()
def dense():
    rng = np.random.default_rng(0)
    return rng.poisson(1.0, size=(30, 50)).astype(np.float32)


def test_h5ad_roundtrip(tmp_path, dense):
    be_path = str(tmp_path / "a.zarr")
    create_sparse_from_csc(
        sp.csc_matrix(dense), be_path,
        [f"g{i}" for i in range(30)], [f"c{j}" for j in range(50)],
    )
    h5ad = str(tmp_path / "a.h5ad")
    to_h5ad(be_path, h5ad)
    be2 = from_h5ad(h5ad, str(tmp_path / "b.zarr"))
    np.testing.assert_allclose(
        np.asarray(be2.read_columns_csc(np.arange(50)).todense()), dense
    )
    assert be2.row_names()[:2] == ["g0", "g1"]
    assert be2.column_names()[-1] == "c49"


def test_mtx_roundtrip(tmp_path, dense):
    be_path = str(tmp_path / "a.zarr")
    create_sparse_from_csc(
        sp.csc_matrix(dense), be_path,
        [f"g{i}" for i in range(30)], [f"c{j}" for j in range(50)],
    )
    to_mtx(be_path, str(tmp_path / "mex"))
    # decompress the mtx for scipy mmread
    mtx_gz = tmp_path / "mex.matrix.mtx.gz"
    mtx = tmp_path / "mex.matrix.mtx"
    mtx.write_bytes(gzip.decompress(mtx_gz.read_bytes()))
    be2 = from_mtx(
        str(mtx), str(tmp_path / "c.zarr"),
        rows_file=str(tmp_path / "mex.features.tsv.gz"),
        cols_file=str(tmp_path / "mex.barcodes.tsv.gz"),
    )
    np.testing.assert_allclose(
        np.asarray(be2.read_columns_csc(np.arange(50)).todense()), dense
    )
    assert be2.row_names()[0] == "g0"


def test_subset_and_merge(tmp_path, dense):
    be_path = str(tmp_path / "a.zarr")
    create_sparse_from_csc(
        sp.csc_matrix(dense), be_path,
        [f"g{i}" for i in range(30)], [f"c{j}" for j in range(50)],
    )
    sub = subset_backend(
        be_path, str(tmp_path / "sub.zarr"),
        columns=np.asarray([0, 5, 10]), rows=np.asarray([1, 2]),
    )
    assert sub.shape == (2, 3)
    np.testing.assert_allclose(
        np.asarray(sub.read_columns_csc([0, 1, 2]).todense()),
        dense[[1, 2]][:, [0, 5, 10]],
    )

    merged = merge_backends([be_path, be_path], str(tmp_path / "m.zarr"))
    assert merged.shape == (30, 100)
    np.testing.assert_allclose(
        np.asarray(merged.read_columns_csc(np.arange(100)).todense()),
        np.concatenate([dense, dense], axis=1),
    )
