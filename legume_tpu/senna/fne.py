"""`senna fne` — feature-network embedding from an edge list
(`senna/src/fne.rs` equivalent).

Embeds graph nodes from weighted edges with the same expected-NCE
machinery as bge: the "counts" matrix is the (symmetrized) adjacency,
both sides share one embedding table. Deterministic, dense-matmul hot
loop (embedding/nce.py design notes).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ..models.losses import log_sigmoid

log = logging.getLogger(__name__)


@dataclass
class FneResult:
    embedding: np.ndarray  # [N, H]
    bias: np.ndarray
    names: list
    losses: list


def fit_fne(
    edges: Sequence[tuple],  # (src, dst[, weight]) node names or indices
    *,
    embedding_dim: int = 32,
    epochs: int = 500,
    learning_rate: float = 0.05,
    n_negatives: float = 5.0,
    neg_alpha: float = 0.75,
    seed: int = 0,
) -> FneResult:
    # build the node registry + symmetric weighted adjacency
    names: dict = {}
    src, dst, w = [], [], []
    for e in edges:
        a, b = e[0], e[1]
        wt = float(e[2]) if len(e) > 2 else 1.0
        ia = names.setdefault(a, len(names))
        ib = names.setdefault(b, len(names))
        src.append(ia)
        dst.append(ib)
        w.append(wt)
    n = len(names)
    adj = sp.coo_matrix((w, (src, dst)), shape=(n, n))
    adj = (adj + adj.T).tocsr()
    counts = jnp.asarray(np.asarray(adj.todense(), np.float32))

    q = np.asarray(adj.sum(0)).ravel() ** neg_alpha
    q = jnp.asarray((q / max(q.sum(), 1e-30)).astype(np.float32))
    m = counts.sum(axis=1)

    key = jax.random.key(seed)
    params = {
        "e": 0.1 * jax.random.normal(key, (n, embedding_dim)),
        "b": jnp.zeros(n),
    }
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    def loss_fn(p, data):
        c, qq, mm = data
        scores = p["e"] @ p["e"].T + p["b"][None, :] + p["b"][:, None]
        pos = c * log_sigmoid(scores)
        neg = (n_negatives * mm[:, None] * qq[None, :]) * log_sigmoid(-scores)
        return -(pos.sum() + neg.sum()) / jnp.maximum(c.sum(), 1.0)

    # chunked epoch scan (utils/scan_train.py); adjacency rides as an
    # argument, not a baked closure constant
    def fne_step(carry, data, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, data)
        updates, opt_state = optimizer.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), loss

    from ..utils.scan_train import fold_epochs

    (params, opt_state), ls = fold_epochs(
        fne_step, (params, opt_state), (counts, q, m), epochs,
        cache_key=("fne", learning_rate, n_negatives),
    )
    losses = ls[::50].tolist()

    inv = [None] * n
    for k, v in names.items():
        inv[v] = k
    return FneResult(
        embedding=np.asarray(params["e"]),
        bias=np.asarray(params["b"]),
        names=inv,
        losses=losses,
    )
