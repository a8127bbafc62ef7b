"""Pinto link-community tests: synthetic spatial domains must be
segmented (reference pattern 3; `pinto lc` on Xenium-style data)."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.pinto.lc import (
    edge_profiles,
    fit_link_community,
    spatial_knn_edges,
)


@pytest.fixture(scope="module")
def spatial_sim():
    """Two spatial domains with distinct expression programs."""
    rng = np.random.default_rng(0)
    n_per, d = 400, 60
    # domain 0 at left, domain 1 at right
    coords = np.concatenate(
        [
            rng.uniform([0, 0], [1, 1], size=(n_per, 2)),
            rng.uniform([1.2, 0], [2.2, 1], size=(n_per, 2)),
        ]
    )
    domain = np.repeat([0, 1], n_per)
    beta = np.full((2, d), 0.3)
    beta[0, : d // 2] = 3.0  # domain-0 genes
    beta[1, d // 2 :] = 3.0  # domain-1 genes
    lam = beta[domain] * 4.0
    y = rng.poisson(lam).astype(np.float32).T  # [D, N]
    return MemoryBackend(sp.csc_matrix(y)), coords, domain


def test_spatial_knn_edges(spatial_sim):
    be, coords, domain = spatial_sim
    edges = spatial_knn_edges(coords, k=8)
    assert edges.shape[1] == 2
    assert (edges[:, 0] < edges[:, 1]).all()
    # the vast majority of edges connect same-domain cells (domains are
    # spatially separated)
    same = (domain[edges[:, 0]] == domain[edges[:, 1]]).mean()
    assert same > 0.95


def test_edge_profiles_sum_endpoints(spatial_sim):
    be, coords, _ = spatial_sim
    edges = spatial_knn_edges(coords, k=4)[:50]
    prof = edge_profiles(be, edges)
    dense = be.read_columns_dense(np.arange(be.num_columns)).T  # [N, D]
    want = dense[edges[:, 0]] + dense[edges[:, 1]]
    np.testing.assert_allclose(np.asarray(prof.todense()), want, rtol=1e-5)


def test_link_community_recovers_domains(spatial_sim):
    be, coords, domain = spatial_sim
    res = fit_link_community(
        be, coords, n_communities=4, knn=8, n_sweeps=20, n_greedy=5, seed=7
    )
    assert res.propensity.shape == (800, 4)
    np.testing.assert_allclose(res.propensity.sum(1), 1.0, rtol=1e-4)
    assert np.all(np.isfinite(res.entropy))
    # dominant community per cell should align with the spatial domain:
    # compute best-case accuracy over community -> domain maps
    top = res.propensity.argmax(1)
    acc = 0.0
    for c in range(4):
        cells = top == c
        if cells.sum() == 0:
            continue
        maj = np.bincount(domain[cells]).argmax()
        acc += (domain[cells] == maj).sum()
    acc /= len(domain)
    assert acc > 0.9, acc
    # objective improves across sweeps
    assert res.scores_trace[-1] > res.scores_trace[0]


def test_lc_etm_segments_domains(spatial_sim):
    from legume_tpu.pinto.lc_etm import fit_lc_etm

    be, coords, domain = spatial_sim
    res = fit_lc_etm(
        be, coords, n_communities=4, knn=6, window=32, embed_dim=16,
        epochs=30, minibatch=128,
    )
    assert res.propensity.shape == (800, 4)
    np.testing.assert_allclose(res.propensity.sum(1), 1.0, rtol=1e-3)
    assert res.loss_trace[-1] < res.loss_trace[0]
    top = res.propensity.argmax(1)
    acc = 0
    for c in np.unique(top):
        cells = top == c
        acc += np.bincount(domain[cells]).max()
    assert acc / len(domain) > 0.85, acc / len(domain)
