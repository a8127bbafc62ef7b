"""Degree-corrected Poisson cluster refinement
(data-beans-alg `dc_poisson.rs` equivalent).

Score of placing entity e in block k (Poisson plug-in MAP, up to a
constant; dc_poisson.rs:404-420):

    s(e, k) = sum_g y_eg log(gene_sum[k, g] + eps)
              - size_e log(size_sum[k] + M eps)

The reference runs sequential/Jacobi sweeps with incremental
`delta_move` bookkeeping on the host. Here each sweep is one blocked
device pass (the Jacobi `sweep_jacobi` strategy, which the reference
already validates as a parallel schedule): refresh block sufficient
stats by segment-sum from the current labels, score ALL entities
against ALL blocks in one sparse-gather pass, then Gumbel-sample
(Gibbs) or argmax (greedy) — restricted to per-entity candidate sets
(the BBKNN proposer's role, refine_multilevel.rs:117).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

LOG_EPS = 1e-8


@partial(jax.jit, static_argnames=("k", "n_entities", "n_features", "sample"))
def _dc_sweep(
    key,
    row_e: jax.Array,  # [nnz] entity of each nonzero
    col_g: jax.Array,  # [nnz] feature
    vals: jax.Array,
    size_e: jax.Array,  # [E] size factors
    labels: jax.Array,  # [E]
    cand_mask: jax.Array,  # [E, K] bool allowed blocks
    *,
    k: int,
    n_entities: int,
    n_features: int,
    sample: bool,
):
    lab_nz = labels[row_e]
    flat = lab_nz.astype(jnp.int32) * n_features + col_g
    gene_sum = jax.ops.segment_sum(vals, flat, num_segments=k * n_features).reshape(
        k, n_features
    )
    size_sum = jax.ops.segment_sum(size_e, labels, num_segments=k)

    log_gene = jnp.log(gene_sum + LOG_EPS)  # [K, M]
    log_size = -jnp.log(size_sum + n_features * LOG_EPS)  # [K]

    contrib = log_gene.T[col_g] * vals[:, None]  # [nnz, K]
    scores = jax.ops.segment_sum(contrib, row_e, num_segments=n_entities)
    scores = scores + size_e[:, None] * log_size[None, :]
    scores = jnp.where(cand_mask, scores, -jnp.inf)

    if sample:
        g = jax.random.gumbel(key, scores.shape)
        new = jnp.argmax(scores + g, axis=1)
    else:
        new = jnp.argmax(scores, axis=1)
    return new.astype(jnp.int32), scores


@dataclass
class RefineResult:
    labels: np.ndarray
    n_moves_per_sweep: list
    score_trace: list


def refine_with_candidates(
    profiles: sp.spmatrix,  # [E, M] entity x feature counts
    labels: np.ndarray,
    k: int,
    *,
    candidates: np.ndarray | None = None,  # [E, K] bool, None = all
    size_factors: np.ndarray | None = None,
    num_gibbs: int = 10,
    num_greedy: int = 5,
    seed: int = 0,
) -> RefineResult:
    """Refine entity block labels (refine_with_candidates,
    dc_poisson.rs:917; Jacobi schedule)."""
    coo = sp.coo_matrix(profiles)
    e, m = coo.shape
    row = jnp.asarray(coo.row.astype(np.int32))
    col = jnp.asarray(coo.col.astype(np.int32))
    vals = jnp.asarray(coo.data.astype(np.float32))
    size = (
        jnp.asarray(np.asarray(size_factors, np.float32))
        if size_factors is not None
        else jnp.asarray(np.asarray(profiles.sum(1)).ravel().astype(np.float32))
    )
    cand = (
        jnp.asarray(candidates)
        if candidates is not None
        else jnp.ones((e, k), bool)
    )

    lab = jnp.asarray(np.asarray(labels, np.int32))
    key = jax.random.key(seed)
    moves, trace = [], []
    for sweep in range(num_gibbs + num_greedy):
        key, ks = jax.random.split(key)
        new, scores = _dc_sweep(
            ks, row, col, vals, size, lab, cand,
            k=k, n_entities=e, n_features=m, sample=sweep < num_gibbs,
        )
        moves.append(int(jnp.sum(new != lab)))
        chosen = jnp.take_along_axis(scores, new[:, None].astype(jnp.int32), 1)
        trace.append(float(jnp.sum(jnp.where(jnp.isfinite(chosen), chosen, 0.0))))
        lab = new
        if sweep >= num_gibbs and moves[-1] == 0:
            break
    return RefineResult(
        labels=np.asarray(lab), n_moves_per_sweep=moves, score_trace=trace
    )


def knn_candidates(
    proj_nk: np.ndarray, labels: np.ndarray, k_blocks: int, *, knn: int = 10
) -> np.ndarray:
    """BBKNN-style candidate proposer (refine_multilevel.rs:117): each
    entity may move to its own block or any block among its kNN
    neighbors' blocks."""
    from .knn import knn_within

    _, idx = knn_within(np.asarray(proj_nk, np.float32), knn)
    e = len(labels)
    cand = np.zeros((e, k_blocks), bool)
    cand[np.arange(e), labels] = True
    nbr_labels = labels[idx]  # [E, knn]
    cand[np.repeat(np.arange(e), idx.shape[1]), nbr_labels.ravel()] = True
    return cand
