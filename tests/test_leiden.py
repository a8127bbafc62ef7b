"""Leiden community detection: refinement-phase guarantees.

Reference: `leiden/src/lib.rs` (CWTS port, Traag et al. 2019). The
defining Leiden property is that refinement yields well-connected —
hence internally connected — communities; Louvain has a documented
badly-connected-community failure mode (Traag 2019 fig. 2)."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.ops.leiden import leiden_clustering


def _planted_graph():
    """A random graph instance on which Louvain (refine=False,
    modularity, seed=1) returns an internally disconnected community;
    found by search, pinned as a regression fixture."""
    rng = np.random.default_rng(36)
    n = int(rng.integers(20, 60))
    p = float(rng.uniform(0.05, 0.25))
    a = (rng.random((n, n)) < p).astype(float)
    a = np.triu(a, 1)
    return sp.csr_matrix(a + a.T)


def _all_connected(adj, memb):
    adj = sp.csr_matrix(adj)
    for c in np.unique(memb):
        idx = np.where(memb == c)[0]
        if len(idx) == 1:
            continue
        ncomp, _ = sp.csgraph.connected_components(
            adj[np.ix_(idx, idx)], directed=False
        )
        if ncomp > 1:
            return False
    return True


def test_louvain_mode_produces_disconnected_community_on_planted_graph():
    # the fixture is only meaningful if the Louvain failure mode fires
    adj = _planted_graph()
    res = leiden_clustering(adj, seed=1, refine=False, objective="modularity")
    assert not _all_connected(adj, res.membership)


def test_leiden_refinement_yields_connected_communities_on_planted_graph():
    adj = _planted_graph()
    res = leiden_clustering(adj, seed=1, refine=True, objective="modularity")
    assert _all_connected(adj, res.membership)
    # and does not pay for it in quality
    louvain = leiden_clustering(adj, seed=1, refine=False, objective="modularity")
    assert res.quality >= louvain.quality - 1e-9


@pytest.mark.parametrize("objective,resolution", [("modularity", 1.0), ("cpm", 0.1)])
def test_leiden_connectivity_guarantee_random_battery(objective, resolution):
    bad = 0
    for seed in range(12):
        rng = np.random.default_rng(seed + 500)
        n = int(rng.integers(30, 90))
        p = float(rng.uniform(0.04, 0.2))
        a = (rng.random((n, n)) < p) * rng.random((n, n))
        a = np.triu(a, 1)
        adj = sp.csr_matrix(a + a.T)
        res = leiden_clustering(
            adj, seed=seed, refine=True, objective=objective, resolution=resolution
        )
        if not _all_connected(adj, res.membership):
            bad += 1
    assert bad == 0


def test_leiden_two_cliques_bridge():
    n = 8
    a = np.zeros((2 * n, 2 * n))
    a[:n, :n] = 1
    a[n:, n:] = 1
    np.fill_diagonal(a, 0)
    a[0, n] = a[n, 0] = 0.1
    res = leiden_clustering(sp.csr_matrix(a), seed=0)
    assert res.n_communities == 2
    # the two cliques are exactly the communities
    memb = res.membership
    assert len(set(memb[:n])) == 1 and len(set(memb[n:])) == 1
    assert memb[0] != memb[n]


def test_leiden_deterministic_under_seed():
    adj = _planted_graph()
    a = leiden_clustering(adj, seed=7).membership
    b = leiden_clustering(adj, seed=7).membership
    assert np.array_equal(a, b)
