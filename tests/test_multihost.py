"""Multi-host sharded sufficient-stat reduction on the virtual
8-device mesh: the psum'd result must equal the single-device sums."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from legume_tpu.parallel.mesh import make_mesh
from legume_tpu.parallel.multihost import collapse_stats_sharded, shard_coo_by_cells


def test_sharded_collapse_matches_dense():
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    rng = np.random.default_rng(0)
    d, n, s_groups = 50, 800, 6
    dense = rng.poisson(1.5, size=(d, n)).astype(np.float32)
    groups = rng.integers(0, s_groups, n).astype(np.int32)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    rows, cols, vals, segs = shard_coo_by_cells(sp.csc_matrix(dense), groups, n_dev)
    got = collapse_stats_sharded(
        mesh, rows, cols, vals, segs, num_genes=d, num_groups=s_groups
    )

    want = np.zeros((d, s_groups), np.float32)
    for g in range(s_groups):
        want[:, g] = dense[:, groups == g].sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_collapse_observed_multihost_from_backend(tmp_path):
    """zarr backend -> per-device column shards -> psum reduction
    matches the dense groupby (the topic pipeline's multi-host path)."""
    import scipy.sparse as sp

    from legume_tpu.data.sparse_io import create_sparse_from_csc, open_sparse_matrix
    from legume_tpu.parallel.mesh import make_mesh
    from legume_tpu.parallel.multihost import collapse_observed_multihost

    rng = np.random.default_rng(0)
    d, n, s = 40, 200, 6
    dense = rng.poisson(1.0, (d, n)).astype(np.float32)
    groups = rng.integers(0, s, n)
    create_sparse_from_csc(
        sp.csc_matrix(dense), str(tmp_path / "be"),
        [f"g{i}" for i in range(d)], [f"c{j}" for j in range(n)],
    )
    vec = open_sparse_matrix(str(tmp_path / "be"))
    mesh = make_mesh()  # all 8 virtual devices on the data axis
    got = collapse_observed_multihost(vec, groups, mesh, block_size=64)
    want = np.zeros((d, s))
    for j in range(n):
        want[:, groups[j]] += dense[:, j]
    np.testing.assert_allclose(got, want, rtol=1e-5)
