"""hsblock hierarchical SBM: planted partition recovery."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.ops.hsblock import hsblock_clustering


def test_hsblock_recovers_planted_blocks():
    rng = np.random.default_rng(0)
    sizes = [80, 80, 80, 80]
    n = sum(sizes)
    truth = np.repeat(np.arange(4), 80)
    p_in, p_out = 0.15, 0.01
    p = np.where(truth[:, None] == truth[None, :], p_in, p_out)
    a = (rng.random((n, n)) < p).astype(np.float64)
    a = np.triu(a, 1)
    a = a + a.T
    res = hsblock_clustering(sp.csr_matrix(a), max_depth=3, min_size=20, seed=1)
    assert res.membership.max() + 1 >= 3  # found hierarchical structure
    # clustering aligns with the planted blocks
    acc = 0
    for c in np.unique(res.membership):
        cells = res.membership == c
        acc += np.bincount(truth[cells]).max()
    acc /= n
    assert acc > 0.9, acc
    # bit-paths form a valid binary hierarchy (distinct paths)
    assert len(set(res.tree_paths)) == len(res.tree_paths)


def test_hsblock_no_split_on_random_graph():
    rng = np.random.default_rng(2)
    n = 120
    a = (rng.random((n, n)) < 0.05).astype(np.float64)
    a = np.triu(a, 1)
    a = a + a.T
    res = hsblock_clustering(sp.csr_matrix(a), max_depth=3, min_size=20, seed=0)
    # an Erdos-Renyi graph should not shatter into many communities
    assert res.membership.max() + 1 <= 3


def test_bhc_merges_same_program_profiles():
    from legume_tpu.ops.bhc import bhc_cluster

    rng = np.random.default_rng(0)
    d = 40
    progs = np.full((3, d), 1.0)
    progs[0, :13] = 20.0
    progs[1, 13:26] = 20.0
    progs[2, 26:] = 20.0
    # 4 profiles per program
    profiles = np.concatenate(
        [rng.poisson(progs[t] * 10, size=(4, d)) for t in range(3)]
    ).astype(np.float64)
    res = bhc_cluster(profiles, alpha=0.5)
    truth = np.repeat(np.arange(3), 4)
    # same-program profiles merge together
    acc = 0
    for c in np.unique(res.labels):
        acc += np.bincount(truth[res.labels == c]).max()
    assert acc / 12 > 0.9, (res.labels, truth)
    assert 2 <= res.n_clusters <= 5
