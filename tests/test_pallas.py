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
