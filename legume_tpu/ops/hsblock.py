"""Hierarchical stochastic block model clustering
(`hsblock` crate parity: fixed binary tree with O(1) LCA, Gamma-Poisson
COLLAPSED Gibbs with degree correction, `hsblock/src/inference.rs:80`,
`gibbs.rs`, `model.rs`, `btree.rs`).

Model (model.rs): each leaf-cluster PAIR (ci, cj) has a Poisson rate
with a Gamma(a0, b0) prior taken from the pair's LOWEST COMMON ANCESTOR
tree node; the collapsed marginal at one pair is

    S(a0, b0, edge, total) = a0 ln b0 + lgamma(a0 + edge) - lgamma(a0)
                             - (a0 + edge) ln(b0 + total)

with edge = block edge mass and total = vol_ci * vol_cj (degree
corrected; /2 on the diagonal).

TPU formulation: the reference's sequential vertex sweep
(`evaluate_delta_for_target`, gibbs.rs:347) becomes a BLOCKED Jacobi
sweep — with block stats frozen, the move delta of every (vertex,
target) pair reduces to per-pair score differences on the two affected
rows of the [K, K] edge/total planes, all computable from e_vc (vertex
-> cluster edge mass, ONE segment-sum) as dense [N, K, K] lgamma
algebra; labels then Gumbel-sample (Gibbs) or argmax (greedy) in
parallel. A bottom-up sibling-merge pass afterwards plays the tree
prior's Occam role explicitly: children of an internal node merge when
the collapsed tree score improves.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..utils.prng import DEFAULT_PROJECTION_SEED


def lca_nodes(k: int) -> np.ndarray:
    """[K, K] heap index of the LCA tree node of each leaf pair
    (btree.rs:82; leaf c has heap index K + c)."""
    out = np.zeros((k, k), np.int64)
    for i in range(k):
        for j in range(k):
            a, b = k + i, k + j
            while a != b:
                if a > b:
                    a >>= 1
                else:
                    b >>= 1
            out[i, j] = a
    return out


@partial(jax.jit, static_argnames=("k", "n", "dc", "sample"))
def _sweep(
    key,
    src: jax.Array,  # [E2] directed edge endpoints (both directions)
    dst: jax.Array,
    w: jax.Array,
    deg: jax.Array,  # [N]
    labels: jax.Array,  # [N]
    a0_kk: jax.Array,  # [K, K] Gamma shape at each pair's LCA node
    b0_kk: jax.Array,
    *,
    k: int,
    n: int,
    dc: bool,
    sample: bool,
):
    lgamma = jax.scipy.special.gammaln

    def score(a0, b0, edge, total):
        return (
            a0 * jnp.log(b0)
            + lgamma(a0 + edge)
            - lgamma(a0)
            - (a0 + edge) * jnp.log(b0 + total)
        )

    onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)  # [N, K]
    # e_vc[v, c] = edge mass from v into cluster c (one segment-sum)
    flat = src.astype(jnp.int32) * k + labels[dst].astype(jnp.int32)
    e = jax.ops.segment_sum(w, flat, num_segments=n * k).reshape(n, k)
    vol = deg @ onehot  # [K]
    size = onehot.sum(0)
    edge = onehot.T @ e  # [K, K]; within-block mass counted twice
    edge = edge - jnp.diag(jnp.diag(edge) / 2.0)

    def totals(vol_i, vol_j, size_i, size_j, diag_mask):
        if dc:
            t = vol_i * vol_j
        else:
            t = size_i * size_j
        return jnp.where(diag_mask, t / 2.0, t)

    eye = jnp.eye(k, dtype=bool)
    tot_old = totals(vol[:, None], vol[None, :], size[:, None], size[None, :], eye)
    s_old_kk = score(a0_kk, b0_kk, edge, tot_old)  # [K, K]

    s_lab = labels  # [N]
    deg_v = deg  # [N]
    e_vs = jnp.take_along_axis(e, s_lab[:, None], axis=1)[:, 0]  # [N] mass into own

    oh_s = onehot  # [N, K] indicator of own cluster

    # ---- t-rows: pairs (t, c) for every candidate t -------------------
    # new edge: edge[t, c] + e[v, c], with the (t, s) column corrected by
    # -e[v, t] (v's edges to t leave the (s, t) pair) — gibbs.rs:384-398
    newT = edge[None, :, :] + e[:, None, :]  # [N, K_t, K_c]
    newT = newT - e[:, :, None] * oh_s[:, None, :]
    vol_t_new = vol[None, :] + deg_v[:, None]  # [N, K_t]
    size_t_new = size[None, :] + 1.0
    # the c side loses v's mass at c==s AND gains it at c==t (the
    # diagonal of the [K_t, K_c] plane) — missing the diagonal term
    # makes every within-target total stale
    vol_c3 = (
        vol[None, None, :]
        - deg_v[:, None, None] * oh_s[:, None, :]
        + deg_v[:, None, None] * eye[None, :, :]
    )
    size_c3 = size[None, None, :] - oh_s[:, None, :] + eye[None, :, :]
    totT = totals(
        vol_t_new[:, :, None], vol_c3,
        size_t_new[:, :, None], size_c3,
        eye[None, :, :],
    )
    a3 = a0_kk[None, :, :]
    b3 = b0_kk[None, :, :]
    dT = (score(a3, b3, newT, totT) - s_old_kk[None, :, :]).sum(axis=2)  # [N, K_t]

    # ---- s-rows: pairs (s, c), t-independent; subtract naive c==t ------
    edge_s = edge[s_lab]  # [N, K_c] row s of edge per vertex
    new_s = edge_s - e  # [N, K_c] (diag c==s: -e[v,s] — matches ref)
    vol_s_new = vol[s_lab] - deg_v  # [N]
    size_s_new = size[s_lab] - 1.0
    diag_s = oh_s.astype(bool)  # c == s positions
    tot_s = totals(
        vol_s_new[:, None], vol[None, :] * jnp.ones((1, k)),
        size_s_new[:, None], size[None, :] * jnp.ones((1, k)),
        diag_s,
    )
    # (s, s) diagonal uses vol_s_new on BOTH sides
    tot_s = jnp.where(
        diag_s,
        (vol_s_new[:, None] ** 2 if dc else size_s_new[:, None] ** 2) / 2.0,
        tot_s,
    )
    a_s = a0_kk[s_lab]  # [N, K_c]
    b_s = b0_kk[s_lab]
    ds_terms = score(a_s, b_s, new_s, tot_s) - score(a_s, b_s, edge_s, tot_old[s_lab])
    ds_base = ds_terms.sum(axis=1)  # [N]
    # remove the naive (s, c==t) term per candidate t (the correct (s,t)
    # pair value lives in the t-row via its c==s column)
    delta = dT + ds_base[:, None] - ds_terms
    # moving to own cluster = no-op
    delta = jnp.where(oh_s.astype(bool), 0.0, delta)

    if sample:
        g = jax.random.gumbel(key, delta.shape)
        new_labels = jnp.argmax(delta + g, axis=1)
    else:
        new_labels = jnp.argmax(delta, axis=1)
    return new_labels.astype(labels.dtype), edge, tot_old


def _tree_score(edge, tot, a0_kk, b0_kk, lca_kk, n_nodes):
    """Aggregate pair stats to tree nodes and score (model.rs
    tree_score_cpu via stats.aggregate_to_tree)."""
    from scipy.special import gammaln

    k = edge.shape[0]
    iu = np.triu_indices(k)
    node_edge = np.zeros(n_nodes + 1)
    node_tot = np.zeros(n_nodes + 1)
    np.add.at(node_edge, lca_kk[iu], edge[iu])
    np.add.at(node_tot, lca_kk[iu], tot[iu])
    a0 = np.zeros(n_nodes + 1)
    b0 = np.zeros(n_nodes + 1)
    a0[lca_kk[iu]] = a0_kk[iu]
    b0[lca_kk[iu]] = b0_kk[iu]
    live = a0 > 0
    return float(
        np.sum(
            a0[live] * np.log(b0[live])
            + gammaln(a0[live] + node_edge[live])
            - gammaln(a0[live])
            - (a0[live] + node_edge[live]) * np.log(b0[live] + node_tot[live])
        )
    )


@dataclass
class HsblockResult:
    membership: np.ndarray  # [N] dense community labels
    tree_paths: list  # per community, the bit-path from the root
    loglik: float


def hsblock_clustering(
    adjacency: sp.spmatrix,
    *,
    max_depth: int = 4,
    min_size: int = 0,  # kept for API compat; merging handles small leaves
    num_gibbs: int = 20,
    num_greedy: int = 10,
    degree_corrected: bool = True,
    a0: float = 1.0,
    b0: float = 1.0,
    edge_scale: float = 1.0,
    seed: int = DEFAULT_PROJECTION_SEED,
) -> HsblockResult:
    """Collapsed Gibbs HSBM over K = 2^(max_depth-1) tree leaves
    (inference.rs:80 `iterate`), then a bottom-up sibling-merge pass
    keeping only score-improving splits (the tree prior's Occam role)."""
    adj = sp.csr_matrix(adjacency, dtype=np.float64)
    adj = (adj + adj.T) / 2.0
    n = adj.shape[0]
    k = 1 << (max_depth - 1)
    lca_kk = lca_nodes(k)
    a0_kk = np.full((k, k), a0)
    b0_kk = np.full((k, k), b0)

    coo = sp.coo_matrix(sp.triu(adj, 1))
    # both directions so e_vc covers every vertex's incident mass
    src = np.concatenate([coo.row, coo.col]).astype(np.int32)
    dst = np.concatenate([coo.col, coo.row]).astype(np.int32)
    w = np.concatenate([coo.data, coo.data]).astype(np.float32) * edge_scale
    deg = np.asarray(adj.sum(1)).ravel().astype(np.float32) * edge_scale

    key = jax.random.key(seed & 0x7FFFFFFF)
    key, k_init = jax.random.split(key)
    labels = jax.random.randint(k_init, (n,), 0, k, dtype=jnp.int32)
    src_j, dst_j, w_j = jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w)
    deg_j = jnp.asarray(deg)
    a_j, b_j = jnp.asarray(a0_kk, jnp.float32), jnp.asarray(b0_kk, jnp.float32)

    prev = None
    for sweep in range(num_gibbs + num_greedy):
        key, ks = jax.random.split(key)
        labels, edge_j, tot_j = _sweep(
            ks, src_j, dst_j, w_j, deg_j, labels, a_j, b_j,
            k=k, n=n, dc=degree_corrected, sample=sweep < num_gibbs,
        )
        if sweep >= num_gibbs:
            lab_np = np.asarray(labels)
            if prev is not None and np.array_equal(prev, lab_np):
                break
            prev = lab_np
    lab = np.asarray(labels).astype(np.int64)

    # ---- bottom-up sibling merges (Occam pass) ------------------------
    def stats_of(lab_arr, leaf_of):
        ll = leaf_of[lab_arr]
        onehot = np.zeros((n, k))
        onehot[np.arange(n), ll] = 1.0
        e_vc = adj @ onehot
        edge = onehot.T @ e_vc
        edge -= np.diag(np.diag(edge) / 2.0)
        vol = deg.astype(np.float64) @ onehot
        size = onehot.sum(0)
        if degree_corrected:
            tot = np.outer(vol, vol)
        else:
            tot = np.outer(size, size)
        np.fill_diagonal(tot, np.diag(tot) / 2.0)
        return edge, tot

    n_nodes = 2 * k - 1
    leaf_of = np.arange(k)
    for level in range(max_depth - 1):
        stride = 1 << (level + 1)
        for left in range(0, k, stride):
            right = left + (stride >> 1)
            la, lb = leaf_of[left], leaf_of[right]
            if la == lb:
                continue
            edge_m, tot_m = stats_of(lab, leaf_of)
            s_split = _tree_score(edge_m, tot_m, a0_kk, b0_kk, lca_kk, n_nodes)
            merged = leaf_of.copy()
            merged[merged == lb] = la
            edge_2, tot_2 = stats_of(lab, merged)
            s_merge = _tree_score(edge_2, tot_2, a0_kk, b0_kk, lca_kk, n_nodes)
            if s_merge >= s_split:
                leaf_of = merged
    lab = leaf_of[lab]

    uniq, dense = np.unique(lab, return_inverse=True)
    paths = [format(int(u), f"0{max(max_depth - 1, 1)}b") for u in uniq]
    edge_f, tot_f = stats_of(dense, np.arange(k))
    return HsblockResult(
        membership=dense,
        tree_paths=paths,
        loglik=_tree_score(edge_f, tot_f, a0_kk, b0_kk, lca_kk, n_nodes),
    )
