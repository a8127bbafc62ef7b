"""Hierarchical stochastic block model clustering
(`hsblock` crate equivalent: binary tree + Gamma-Poisson collapsed
Gibbs with degree correction, `hsblock/src/lib.rs:1-40`,
`inference.rs:80`).

TPU formulation: the tree grows by recursive bisection. Each split
initializes two groups from the leading spectral direction of the
subgraph and refines them with the blocked DC-Poisson sweeps of
`legume_tpu.ops.dc_poisson` applied to adjacency rows — the plug-in
score `s(v, k) = sum_u A_vu log(edges[k -> u]) - deg_v log(vol_k)` is
the degree-corrected SBM conditional. A split is kept only if it
improves the Poisson block log-likelihood (the model-selection role of
the reference's tree prior).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp

from .dc_poisson import refine_with_candidates


def _block_loglik(adj: sp.csr_matrix, labels: np.ndarray, k: int) -> float:
    """Poisson block log-likelihood with degree correction (up to
    label-independent constants): sum_kb e_kb log(e_kb / (vol_k vol_b))."""
    n = adj.shape[0]
    onehot = sp.csr_matrix(
        (np.ones(n), (np.arange(n), labels)), shape=(n, k)
    )
    e_kb = np.asarray((onehot.T @ adj @ onehot).todense(), np.float64)
    vol = np.asarray(adj.sum(1)).ravel() @ onehot.toarray()
    with np.errstate(divide="ignore", invalid="ignore"):
        t = e_kb * (np.log(np.maximum(e_kb, 1e-12)) - np.log(np.outer(vol, vol) + 1e-12))
    return float(np.nansum(t))


@dataclass
class HsblockResult:
    membership: np.ndarray  # [N] leaf community
    tree_paths: list  # per community, the bit-path from the root
    loglik: float


def hsblock_clustering(
    adjacency: sp.spmatrix,
    *,
    max_depth: int = 4,
    min_size: int = 20,
    num_gibbs: int = 5,
    num_greedy: int = 5,
    mdl_factor: float = 1.0,
    seed: int = 0,
) -> HsblockResult:
    adj = sp.csr_matrix(adjacency, dtype=np.float64)
    adj = (adj + adj.T) / 2.0
    n = adj.shape[0]
    labels = np.zeros(n, np.int64)
    paths = {0: ""}
    rng = np.random.default_rng(seed)

    for depth in range(max_depth):
        next_label = labels.max() + 1
        changed = False
        for c in list(np.unique(labels)):
            members = np.nonzero(labels == c)[0]
            if len(members) < 2 * min_size:
                continue
            sub = adj[members][:, members]
            # spectral-ish init: leading eigenvector sign of the
            # degree-normalized adjacency
            deg = np.maximum(np.asarray(sub.sum(1)).ravel(), 1e-12)
            v = rng.standard_normal(len(members))
            for _ in range(20):
                v = sub @ (v / deg) - v.mean()
                nv = np.linalg.norm(v)
                if nv < 1e-12:
                    break
                v /= nv
            init = (v > 0).astype(np.int64)
            if init.sum() < min_size or (1 - init).sum() < min_size:
                continue
            res = refine_with_candidates(
                sub, init, 2, num_gibbs=num_gibbs, num_greedy=num_greedy,
                seed=seed + depth * 1000 + int(c),
            )
            split = res.labels
            if split.sum() < min_size or (1 - split).sum() < min_size:
                continue
            base = _block_loglik(sub, np.zeros(len(members), np.int64), 1)
            gain = _block_loglik(sub, split, 2) - base
            # MDL penalty: n_c membership bits + 3 extra rate params
            # (the model-selection role of the reference's tree prior)
            n_edges = max(float(sub.sum()) / 2.0, 1.0)
            penalty = mdl_factor * (
                len(members) * np.log(2.0) + 1.5 * np.log(n_edges)
            )
            if gain > penalty:
                labels[members[split == 1]] = next_label
                paths[next_label] = paths.get(c, "") + "1"
                paths[c] = paths.get(c, "") + "0"
                next_label += 1
                changed = True
        if not changed:
            break

    uniq, dense = np.unique(labels, return_inverse=True)
    return HsblockResult(
        membership=dense,
        tree_paths=[paths.get(int(u), "") for u in uniq],
        loglik=_block_loglik(adj, dense, len(uniq)),
    )
