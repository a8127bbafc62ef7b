"""`pinto lc-etm` — indexed-VAE link community
(`pinto` lc-etm subcommand equivalent): the masked embedded-topic
model applied to spatial-edge expression profiles. Edge latent topics
ARE the link communities; per-cell propensity aggregates incident-edge
topic proportions.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..models.indexed import (
    IndexedData,
    MaskedTopicModel,
    MaskedTrainConfig,
    encode_all,
    train_masked,
)
from ..utils.prng import DEFAULT_PROJECTION_SEED

log = logging.getLogger(__name__)


@dataclass
class LcEtmResult:
    edge_theta: np.ndarray  # [E, K]
    propensity: np.ndarray  # [N, K]
    edges: np.ndarray
    loss_trace: list


def fit_lc_etm(
    data,
    coords: np.ndarray,
    *,
    n_communities: int = 10,
    knn: int = 8,
    window: int = 64,
    embed_dim: int = 32,
    epochs: int = 60,
    minibatch: int = 256,
    seed: int = DEFAULT_PROJECTION_SEED,
) -> LcEtmResult:
    from .lc import edge_profiles, spatial_knn_edges

    edges = spatial_knn_edges(coords, knn)
    profiles = edge_profiles(data, edges).tocsr()  # [E, D]
    e, d = profiles.shape

    # top-K window per EDGE (edges are the "cells" of the indexed model)
    ids = np.full((e, window), d, np.int32)
    vals = np.zeros((e, window), np.float32)
    for i in range(e):
        row = profiles.getrow(i)
        if row.nnz == 0:
            continue
        order = np.argsort(-row.data)[:window]
        k = len(order)
        ids[i, :k] = row.indices[order]
        vals[i, :k] = row.data[order]
    counts = np.zeros(d + 1, np.float64)
    np.add.at(counts, ids.reshape(-1), 1.0)
    freq = counts / max(counts[:d].sum(), 1.0)
    data_idx = IndexedData(
        ids=ids, vals=vals,
        log_q=np.log(np.maximum(freq, 1e-12)).astype(np.float32),
        n_genes=d,
    )

    model = MaskedTopicModel(
        n_genes=d, n_topics=n_communities, embed_dim=embed_dim
    )
    variables, trace, _eval_loss = train_masked(
        model, data_idx,
        MaskedTrainConfig(epochs=epochs, minibatch=minibatch, seed=seed & 0x7FFFFFFF),
    )
    log_theta = encode_all(model, variables, data_idx)
    theta = np.exp(log_theta)

    n = data.num_columns
    prop = np.zeros((n, n_communities))
    np.add.at(prop, edges[:, 0], theta)
    np.add.at(prop, edges[:, 1], theta)
    prop = prop / np.maximum(prop.sum(1, keepdims=True), 1e-12)
    return LcEtmResult(
        edge_theta=theta, propensity=prop.astype(np.float32), edges=edges,
        loss_trace=trace,
    )
