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
