"""Principal graphs + pseudotime (matrix-util `principal_curve.rs` /
`principal_graph.rs` (SimplePPT) + `branching.rs` equivalents —
`senna pseudotime`, faba lineage).

SimplePPT (Mao et al. 2015): alternate (1) soft cell->node
responsibilities, (2) node positions solving a tree-regularized least
squares `(diag(R^T 1) + lam L) C = R^T X`, (3) MST refresh over node
distances. Steps 1-2 are dense device linear algebra; the MST is tiny
host work (Prim over K x K).

Pseudotime: geodesic distance from a root node along the fitted tree;
branch labels from the tree's degree->3 vertices.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from scipy.sparse.csgraph import minimum_spanning_tree, shortest_path


@dataclass
class PrincipalGraph:
    nodes: np.ndarray  # [K, d]
    edges: np.ndarray  # [K, K] adjacency (0/1 tree)
    cell_to_node: np.ndarray  # [N]
    pseudotime: np.ndarray  # [N]
    branch: np.ndarray  # [N] branch labels


@jax.jit
def _responsibilities(x, c, sigma):
    d2 = jnp.sum((x[:, None, :] - c[None, :, :]) ** 2, -1)
    return jax.nn.softmax(-d2 / jnp.maximum(sigma, 1e-8), axis=1)


def fit_principal_tree(
    x: np.ndarray,
    n_nodes: int = 50,
    *,
    lam: float = 1.0,
    sigma: float = 0.1,
    n_iter: int = 30,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (node positions [K, d], tree adjacency [K, K])."""
    from .kmeans import kmeans

    x = np.asarray(x, np.float32)
    k = min(n_nodes, max(x.shape[0] // 3, 2))
    c, _ = kmeans(x, k, seed=seed)

    x_j = jnp.asarray(x)
    scale = float(np.var(x)) * sigma

    for _ in range(n_iter):
        # MST over current node distances
        d2 = ((c[:, None] - c[None, :]) ** 2).sum(-1)
        mst = minimum_spanning_tree(sp.csr_matrix(np.sqrt(d2))).toarray()
        adj = ((mst > 0) | (mst.T > 0)).astype(np.float64)
        lap = np.diag(adj.sum(1)) - adj

        r = np.asarray(_responsibilities(x_j, jnp.asarray(c), scale))  # [N, K]
        mass = r.sum(0)
        a = np.diag(mass) + lam * lap
        b = r.T @ x
        c = np.linalg.solve(a, b).astype(np.float32)

    d2 = ((c[:, None] - c[None, :]) ** 2).sum(-1)
    mst = minimum_spanning_tree(sp.csr_matrix(np.sqrt(d2))).toarray()
    adj = ((mst > 0) | (mst.T > 0)).astype(np.float64)
    return c, adj


def pseudotime(
    x: np.ndarray,
    *,
    n_nodes: int = 50,
    root_cell: int | None = None,
    root_node: int | None = None,  # PseudotimeArgs root_node
    lam: float = 1.0,
    sigma: float = 0.1,
    n_iter: int = 30,
    seed: int = 0,
) -> PrincipalGraph:
    """Fit the tree, root it, and order cells (`senna pseudotime`;
    branching.rs branch labels at degree >= 3 vertices)."""
    nodes, adj = fit_principal_tree(
        x, n_nodes, lam=lam, sigma=sigma, n_iter=n_iter, seed=seed
    )
    k = nodes.shape[0]

    d2 = ((np.asarray(x)[:, None] - nodes[None]) ** 2).sum(-1)
    cell_to_node = d2.argmin(1)

    # root: explicit node id > node nearest the root cell > a tree leaf
    deg = adj.sum(1)
    if root_node is not None:
        root = int(root_node) % k
    elif root_cell is not None:
        root = int(cell_to_node[root_cell])
    else:
        leaves = np.nonzero(deg <= 1)[0]
        root = int(leaves[0]) if len(leaves) else 0

    w = np.sqrt(((nodes[:, None] - nodes[None]) ** 2).sum(-1)) * adj
    dist = shortest_path(sp.csr_matrix(w), indices=root)
    pt = dist[cell_to_node]
    finite = np.isfinite(pt)
    pt[~finite] = np.nanmax(np.where(finite, pt, np.nan)) if finite.any() else 0.0

    # branch labels: cut the tree at branching vertices; each resulting
    # subtree segment is one branch
    branch_nodes = np.nonzero(deg >= 3)[0]
    cut = adj.copy()
    for bnode in branch_nodes:
        cut[bnode, :] = 0
        cut[:, bnode] = 0
    from scipy.sparse.csgraph import connected_components

    _, comp = connected_components(sp.csr_matrix(cut), directed=False)
    comp[branch_nodes] = -1
    branch = comp[cell_to_node]

    return PrincipalGraph(
        nodes=nodes,
        edges=adj,
        cell_to_node=cell_to_node,
        pseudotime=(pt / max(pt.max(), 1e-12)).astype(np.float32),
        branch=branch,
    )
