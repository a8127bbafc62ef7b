"""DC-Poisson refinement: noisy labels over block-structured counts
must be cleaned up (reference `data-beans-alg/tests/refine_multilevel.rs`
pattern)."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.ops.dc_poisson import knn_candidates, refine_with_candidates


@pytest.fixture(scope="module")
def blocky():
    rng = np.random.default_rng(0)
    e, m, k = 300, 60, 3
    true = np.repeat(np.arange(k), e // k)
    rates = np.full((k, m), 0.5)
    for b in range(k):
        rates[b, b * 20 : (b + 1) * 20] = 8.0
    y = rng.poisson(rates[true]).astype(np.float32)
    return sp.csr_matrix(y), true


def test_refine_recovers_blocks(blocky):
    profiles, true = blocky
    rng = np.random.default_rng(1)
    noisy = true.copy()
    flip = rng.random(len(true)) < 0.4
    noisy[flip] = rng.integers(0, 3, flip.sum())
    res = refine_with_candidates(profiles, noisy, 3, num_gibbs=5, num_greedy=5, seed=2)
    # label-permutation-invariant accuracy
    acc = 0
    for b in range(3):
        cells = res.labels == b
        if cells.sum():
            acc += np.bincount(true[cells]).max()
    acc /= len(true)
    assert acc > 0.97, acc
    assert res.score_trace[-1] >= res.score_trace[0]


def test_refine_respects_candidates(blocky):
    profiles, true = blocky
    labels = true.copy()
    # candidates restricted to own block only -> nothing can move
    cand = np.zeros((len(true), 3), bool)
    cand[np.arange(len(true)), labels] = True
    res = refine_with_candidates(
        profiles, labels, 3, candidates=cand, num_gibbs=0, num_greedy=3
    )
    np.testing.assert_array_equal(res.labels, labels)


def test_knn_candidates_cover_own_block(blocky):
    profiles, true = blocky
    rng = np.random.default_rng(3)
    proj = np.asarray(profiles.todense()) @ rng.normal(size=(60, 8))
    cand = knn_candidates(proj.astype(np.float32), true, 3, knn=5)
    assert cand[np.arange(len(true)), true].all()
