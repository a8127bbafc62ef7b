"""`pinto prop` — re-cluster edge latents and `pinto dsvd` — cell-pair
shared/difference SVD (pinto/src equivalents).

- `edge_prop_clustering`: project spatial-edge expression profiles
  (JL basis), cluster them with leiden/kmeans, and return per-cell
  propensities — the light-weight alternative to the full link
  community model.
- `pair_dsvd`: for spatial cell pairs, rSVD of the concatenated
  [shared | difference] profile ((x_i + x_j)/2 | |x_i - x_j|) — the
  dsvd embedding of interacting pairs.
"""

from __future__ import annotations

import logging

import numpy as np
import scipy.sparse as sp

from ..ops.kmeans import kmeans
from ..ops.leiden import knn_adjacency, leiden_clustering
from ..ops.rsvd import rsvd
from ..utils.prng import DEFAULT_PROJECTION_SEED, key_from_seed

log = logging.getLogger(__name__)


def edge_prop_clustering(
    data,
    coords: np.ndarray,
    *,
    method: str = "kmeans",
    n_clusters: int = 10,
    proj_dim: int = 30,
    knn: int = 8,
    resolution: float = 1.0,
    seed: int = DEFAULT_PROJECTION_SEED,
):
    """Returns (edge_labels, edges, propensity [N, K])."""
    import jax.numpy as jnp

    from ..ops.random_projection import project_columns
    from .lc import edge_profiles, spatial_knn_edges

    edges = spatial_knn_edges(coords, knn)
    profiles = edge_profiles(data, edges)  # [E, D]
    basis, _ = project_columns(data, proj_dim, seed=seed)
    z = np.log1p(np.asarray(profiles.todense())) @ np.asarray(basis)  # [E, K]
    z = (z - z.mean(0)) / np.maximum(z.std(0), 1e-8)

    if method == "kmeans":
        _, labels = kmeans(z.astype(np.float32), n_clusters, seed=seed & 0x7FFFFFFF)
        k = n_clusters
    else:
        adj = knn_adjacency(z.astype(np.float32), k=15)
        res = leiden_clustering(adj, resolution=resolution, seed=seed & 0x7FFFFFFF)
        labels = res.membership
        k = res.n_communities

    n = data.num_columns
    prop = np.zeros((n, k))
    np.add.at(prop, edges[:, 0], np.eye(k)[labels])
    np.add.at(prop, edges[:, 1], np.eye(k)[labels])
    prop = prop / np.maximum(prop.sum(1, keepdims=True), 1.0)
    return labels, edges, prop.astype(np.float32)


def pair_dsvd(
    data,
    coords: np.ndarray,
    *,
    rank: int = 16,
    knn: int = 8,
    seed: int = DEFAULT_PROJECTION_SEED,
):
    """Shared/difference SVD over spatial pairs: returns
    (pair_factors [E, rank], shared_basis, diff_basis, edges)."""
    import jax.numpy as jnp

    from .lc import spatial_knn_edges

    edges = spatial_knn_edges(coords, knn)
    x = data.read_columns_csc(np.arange(data.num_columns)).T.tocsr()  # [N, D]
    xi = np.log1p(np.asarray(x[edges[:, 0]].todense()))
    xj = np.log1p(np.asarray(x[edges[:, 1]].todense()))
    shared = (xi + xj) / 2.0
    diff = np.abs(xi - xj)
    both = np.concatenate([shared, diff], axis=1)  # [E, 2D]
    both = both - both.mean(0, keepdims=True)
    u, s, vt = rsvd(jnp.asarray(both.astype(np.float32)), rank, key=key_from_seed(seed, 31))
    d = x.shape[1]
    return (
        np.asarray(u * np.asarray(s)),
        np.asarray(vt)[:, :d],
        np.asarray(vt)[:, d:],
        edges,
    )
