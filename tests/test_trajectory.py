"""Pseudotime + archetypal analysis tests."""

import numpy as np
import pytest

from legume_tpu.ops.archetypal import fit_archetypes
from legume_tpu.ops.principal_graph import fit_principal_tree, pseudotime


def test_pseudotime_orders_linear_trajectory():
    rng = np.random.default_rng(0)
    t = np.sort(rng.uniform(0, 1, 300))
    x = np.stack([t * 4, np.sin(t * 3)], 1) + rng.normal(0, 0.05, (300, 2))
    pg = pseudotime(x.astype(np.float32), n_nodes=20, root_cell=0, seed=1)
    # pseudotime should correlate strongly with the true ordering
    corr = np.corrcoef(pg.pseudotime, t)[0, 1]
    assert corr > 0.95, corr
    assert pg.pseudotime.min() >= 0 and pg.pseudotime.max() <= 1


def test_principal_tree_is_tree():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(200, 3)).astype(np.float32)
    nodes, adj = fit_principal_tree(x, n_nodes=15, seed=0)
    k = nodes.shape[0]
    assert adj.sum() / 2 == k - 1  # tree edge count
    assert np.allclose(adj, adj.T)


def test_branching_labels():
    rng = np.random.default_rng(2)
    # Y-shaped data: stem + two arms
    t = rng.uniform(0, 1, 100)
    stem = np.stack([t, np.zeros_like(t)], 1)
    arm1 = np.stack([1 + t, t], 1)
    arm2 = np.stack([1 + t, -t], 1)
    x = (np.concatenate([stem, arm1, arm2]) + rng.normal(0, 0.03, (300, 2))).astype(
        np.float32
    )
    pg = pseudotime(x, n_nodes=24, root_cell=int(np.argmin(x[:100, 0])), seed=3)
    # at least 3 branch segments (stem + 2 arms)
    n_branches = len(np.unique(pg.branch[pg.branch >= 0]))
    assert n_branches >= 3, n_branches


def test_archetypes_recover_corners():
    rng = np.random.default_rng(3)
    corners = np.asarray([[0, 0], [4, 0], [0, 4]], np.float32)
    w = rng.dirichlet(np.ones(3) * 0.4, size=400).astype(np.float32)
    x = w @ corners + rng.normal(0, 0.05, (400, 2)).astype(np.float32)
    z, a, b = fit_archetypes(x, 3, n_iter=400, seed=0)
    np.testing.assert_allclose(a.sum(1), 1.0, atol=1e-4)
    # each true corner has a nearby archetype
    for c in corners:
        assert np.min(np.linalg.norm(z - c, axis=1)) < 0.8, (z, c)
