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


def test_sweep_delta_matches_brute_force():
    """The blocked Jacobi sweep's argmax must equal the brute-force
    collapsed-score argmax (gibbs.rs evaluate_delta_for_target parity;
    uniform tree params make the pairwise and tree-aggregated scores
    differ only by constants)."""
    import jax
    import jax.numpy as jnp
    from scipy.special import gammaln

    import legume_tpu.ops.hsblock as H

    rng = np.random.default_rng(1)
    n, k = 15, 4
    a = np.triu((rng.random((n, n)) < 0.4) * rng.integers(1, 4, (n, n)), 1).astype(float)
    adj = a + a.T
    labels = rng.integers(0, k, n)

    def full_score(lab):
        onehot = np.eye(k)[lab]
        e_vc = adj @ onehot
        edge = onehot.T @ e_vc
        edge -= np.diag(np.diag(edge) / 2)
        vol = adj.sum(1) @ onehot
        tot = np.outer(vol, vol)
        np.fill_diagonal(tot, np.diag(tot) / 2)
        iu = np.triu_indices(k)
        return float(
            (gammaln(1.0 + edge[iu]) - (1.0 + edge[iu]) * np.log(1.0 + tot[iu])).sum()
        )

    base = full_score(labels)
    want = np.zeros((n, k))
    for v in range(n):
        for t in range(k):
            lab2 = labels.copy()
            lab2[v] = t
            want[v, t] = full_score(lab2) - base

    coo = sp.coo_matrix(sp.triu(sp.csr_matrix(adj), 1))
    src = np.concatenate([coo.row, coo.col]).astype(np.int32)
    dst = np.concatenate([coo.col, coo.row]).astype(np.int32)
    w = np.concatenate([coo.data, coo.data]).astype(np.float32)
    new, _, _ = H._sweep(
        jax.random.key(0), jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w),
        jnp.asarray(adj.sum(1).astype(np.float32)),
        jnp.asarray(labels.astype(np.int32)),
        jnp.ones((k, k)), jnp.ones((k, k)),
        k=k, n=n, dc=True, sample=False,
    )
    np.testing.assert_array_equal(np.asarray(new), want.argmax(1))
