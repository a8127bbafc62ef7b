"""Leiden community detection (`leiden` crate equivalent — itself a port
of the CWTS Java implementation; `leiden/src/lib.rs`).

Host-side numpy implementation of the Leiden algorithm (Traag et al.
2019): fast local moving -> refinement within communities ->
aggregation, iterated until stable. Supports the CPM and modularity
quality functions the reference exposes. Deterministic under `seed`.

The device side builds the kNN graph (`ops.knn` + `knn_graph`); the
irregular greedy sweeps stay on host — the same split the survey
prescribes for irregular graph work (SURVEY.md section 2.6).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp


@dataclass
class LeidenResult:
    membership: np.ndarray  # [N] community ids, dense
    quality: float
    n_communities: int


def _quality(adj, membership, resolution, total_w, objective):
    """CPM or modularity quality of a partition."""
    comm = membership
    # sum of edge weights inside communities
    rows, cols = adj.nonzero()
    internal = adj.data[comm[rows] == comm[cols]].sum() / 2.0
    sizes = np.bincount(comm)
    if objective == "cpm":
        return internal - resolution * (sizes * (sizes - 1) / 2.0).sum()
    deg = np.asarray(adj.sum(axis=1)).ravel()
    comm_deg = np.bincount(comm, weights=deg)
    m = total_w
    return internal / m - resolution * ((comm_deg / (2.0 * m)) ** 2).sum()


def _local_move(adj: sp.csr_matrix, membership, node_w, resolution, rng, objective, total_w):
    """Queue-based fast local moving; returns True if anything moved."""
    n = adj.shape[0]
    deg = np.asarray(adj.sum(axis=1)).ravel()
    comm_w = np.bincount(membership, weights=node_w, minlength=n).astype(np.float64)
    comm_deg = np.bincount(membership, weights=deg, minlength=n).astype(np.float64)

    order = rng.permutation(n)
    in_queue = np.ones(n, bool)
    queue = list(order)
    indptr, indices, data = adj.indptr, adj.indices, adj.data
    moved_any = False
    two_m = max(2.0 * total_w, 1e-30)

    while queue:
        v = queue.pop(0)
        in_queue[v] = False
        c_old = membership[v]
        # edge weight from v to each neighboring community
        nbr = indices[indptr[v] : indptr[v + 1]]
        wts = data[indptr[v] : indptr[v + 1]]
        self_mask = nbr != v
        nbr, wts = nbr[self_mask], wts[self_mask]
        if len(nbr) == 0:
            continue
        cand = membership[nbr]
        # aggregate weights per candidate community
        uniq, inv = np.unique(cand, return_inverse=True)
        w_to = np.bincount(inv, weights=wts)

        comm_w[c_old] -= node_w[v]
        comm_deg[c_old] -= deg[v]
        w_to_old = w_to[uniq == c_old].sum()

        if objective == "cpm":
            gains = w_to - resolution * node_w[v] * comm_w[uniq]
            gain_old = w_to_old - resolution * node_w[v] * comm_w[c_old]
        else:  # modularity
            gains = w_to / total_w - resolution * deg[v] * comm_deg[uniq] / (two_m * total_w) * 2.0
            gain_old = (
                w_to_old / total_w
                - resolution * deg[v] * comm_deg[c_old] / (two_m * total_w) * 2.0
            )

        best = int(np.argmax(gains))
        if gains[best] > gain_old + 1e-12 and uniq[best] != c_old:
            c_new = int(uniq[best])
            membership[v] = c_new
            comm_w[c_new] += node_w[v]
            comm_deg[c_new] += deg[v]
            moved_any = True
            # re-enqueue neighbors not in c_new
            for u in nbr[membership[nbr] != c_new]:
                if not in_queue[u]:
                    in_queue[u] = True
                    queue.append(u)
        else:
            comm_w[c_old] += node_w[v]
            comm_deg[c_old] += deg[v]
    return moved_any


def _compact(membership):
    _, dense = np.unique(membership, return_inverse=True)
    return dense.astype(np.int64)


def _aggregate(adj: sp.csr_matrix, membership, node_w):
    k = membership.max() + 1
    n = adj.shape[0]
    proj = sp.csr_matrix(
        (np.ones(n), (np.arange(n), membership)), shape=(n, k)
    )
    agg = (proj.T @ adj @ proj).tocsr()
    agg_w = np.bincount(membership, weights=node_w, minlength=k)
    return agg, agg_w


def leiden_clustering(
    adjacency: sp.spmatrix,
    *,
    resolution: float = 1.0,
    objective: str = "modularity",
    max_iter: int = 10,
    seed: int = 0,
) -> LeidenResult:
    """Cluster a symmetric weighted adjacency (no self loops needed)."""
    adj = sp.csr_matrix(adjacency, dtype=np.float64)
    adj = (adj + adj.T) / 2.0  # symmetrize
    n = adj.shape[0]
    rng = np.random.default_rng(seed)
    total_w = adj.sum() / 2.0
    if total_w <= 0:
        return LeidenResult(np.zeros(n, np.int64), 0.0, 1)

    membership = np.arange(n)
    node_w = np.ones(n)

    # hierarchy: local move + aggregate until stable
    cur_adj, cur_w = adj, node_w
    levels = []  # per-level membership of aggregated nodes
    for _ in range(max_iter):
        memb = np.arange(cur_adj.shape[0])
        moved = _local_move(cur_adj, memb, cur_w, resolution, rng, objective, total_w)
        memb = _compact(memb)
        levels.append(memb)
        if not moved or memb.max() + 1 == cur_adj.shape[0]:
            break
        cur_adj, cur_w = _aggregate(cur_adj, memb, cur_w)

    # flatten hierarchy
    membership = levels[0]
    for memb in levels[1:]:
        membership = memb[membership]
    membership = _compact(membership)

    q = _quality(adj, membership, resolution, total_w, objective)
    return LeidenResult(
        membership=membership, quality=float(q), n_communities=int(membership.max() + 1)
    )


def knn_adjacency(
    coords: np.ndarray, k: int = 15, *, mode: str = "fuzzy", chunk: int = 4096
) -> sp.csr_matrix:
    """Symmetric kNN graph over latent coordinates with exponential /
    fuzzy kernels (`matrix-util/src/knn_graph.rs` equivalent; kNN on
    device)."""
    from .knn import knn_within

    n = coords.shape[0]
    d, i = knn_within(coords, min(k, n - 1), chunk=chunk)
    rows = np.repeat(np.arange(n), d.shape[1])
    cols = i.ravel()
    if mode == "binary":
        vals = np.ones(len(rows))
    else:
        # exp kernel scaled by per-point median distance
        sigma = np.maximum(np.median(d, axis=1, keepdims=True), 1e-12)
        vals = np.exp(-d / sigma).ravel()
    adj = sp.csr_matrix((vals, (rows, cols)), shape=(n, n))
    return ((adj + adj.T) / 2.0).tocsr()
