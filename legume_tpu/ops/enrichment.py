"""Annotation statistics (`enrichment` crate equivalent;
SURVEY.md section 2.3: weighted-KS GSEA `es.rs`, permutation null
`null.rs`, BH FDR `fdr.rs`, marker-based cell-type scoring).

The enrichment score sweep vectorizes as cumulative sums over the
ranked gene axis; permutations vmap on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

UNASSIGNED_LABEL = "Unassigned"  # enrichment/src/lib.rs:35


@partial(jax.jit, static_argnames=())
def _es_curve(scores_sorted_desc: jax.Array, in_set: jax.Array, p: float = 1.0):
    """Weighted-KS enrichment score (GSEA; es.rs): genes pre-ranked by
    score desc, `in_set` a 0/1 mask in that order."""
    w = jnp.abs(scores_sorted_desc) ** p * in_set
    nr = jnp.maximum(w.sum(), 1e-30)
    n_miss = jnp.maximum((1.0 - in_set).sum(), 1.0)
    hit = jnp.cumsum(w) / nr
    miss = jnp.cumsum(1.0 - in_set) / n_miss
    dev = hit - miss
    i_max = jnp.argmax(jnp.abs(dev))
    return dev[i_max]


def enrichment_score(scores: np.ndarray, gene_set_mask: np.ndarray, p: float = 1.0) -> float:
    order = np.argsort(-scores)
    return float(
        _es_curve(jnp.asarray(scores[order]), jnp.asarray(gene_set_mask[order], jnp.float32), p)
    )


def gsea_permutation_pvalue(
    scores: np.ndarray,
    gene_set_mask: np.ndarray,
    *,
    n_permutations: int = 1000,
    seed: int = 0,
) -> tuple[float, float, float]:
    """(ES, normalized ES, permutation p) with the Efron-Tibshirani
    restandardized null (null.rs): permute set membership, vmapped."""
    order = np.argsort(-scores)
    s = jnp.asarray(scores[order])
    mask = jnp.asarray(gene_set_mask[order], jnp.float32)
    es = _es_curve(s, mask)

    key = jax.random.key(seed)
    perms = jax.vmap(lambda k: _es_curve(s, jax.random.permutation(k, mask)))(
        jax.random.split(key, n_permutations)
    )
    perms = np.asarray(perms)
    es_f = float(es)
    same_sign = perms[np.sign(perms) == np.sign(es_f)]
    if len(same_sign) == 0:
        p = 1.0 / (n_permutations + 1)
        nes = es_f
    else:
        p = (np.sum(np.abs(same_sign) >= abs(es_f)) + 1) / (len(same_sign) + 1)
        nes = es_f / max(np.abs(same_sign).mean(), 1e-30)
    return es_f, float(nes), float(p)


def bh_fdr(pvalues: np.ndarray) -> np.ndarray:
    """Benjamini-Hochberg adjusted q-values (fdr.rs)."""
    p = np.asarray(pvalues, np.float64)
    n = len(p)
    order = np.argsort(p)
    ranked = p[order] * n / (np.arange(n) + 1)
    q = np.minimum.accumulate(ranked[::-1])[::-1]
    out = np.empty(n)
    out[order] = np.clip(q, 0, 1)
    return out


def treebh(
    pvalues: dict[str, float],
    ontology,
    *,
    alpha: float = 0.05,
) -> dict[str, float]:
    """TreeBH hierarchical FDR over an ontology DAG
    (enrichment `treebh.rs`; Bogomolov et al. 2021).

    Tests proceed root-to-leaf: a term is tested only if all its
    parents were rejected; the per-level BH budget is alpha scaled by
    the fraction of rejected parents. Returns adjusted q-values (1.0
    for never-tested terms)."""
    # group terms by depth (longest path to a root)
    depth: dict[str, int] = {}

    def get_depth(t):
        if t in depth:
            return depth[t]
        parents = ontology.parents.get(t, ())
        d = 0 if not parents else 1 + max(get_depth(p) for p in parents)
        depth[t] = d
        return d

    for t in pvalues:
        get_depth(t)
    max_d = max(depth.values(), default=0)

    q_out = {t: 1.0 for t in pvalues}
    rejected: set = set()
    alpha_level = alpha
    for d in range(max_d + 1):
        terms = [t for t in pvalues if depth[t] == d]
        # eligible: roots, or at least one rejected parent
        elig = [
            t
            for t in terms
            if d == 0
            or any(p in rejected for p in ontology.parents.get(t, ()))
        ]
        if not elig:
            continue
        p = np.asarray([pvalues[t] for t in elig])
        q = bh_fdr(p)
        for t, qv in zip(elig, q):
            q_out[t] = float(qv)
            if qv <= alpha_level:
                rejected.add(t)
    return q_out


def annotate_by_markers(
    mean_profiles: np.ndarray,  # [K, D] cluster/topic mean expression
    gene_names: list[str],
    marker_sets: dict[str, list[str]],
    *,
    min_score: float = 0.0,
) -> tuple[list[str], np.ndarray]:
    """Marker-panel annotation: per cluster, score each label's marker
    set by the mean z-scored expression of its genes; assign argmax or
    UNASSIGNED (enrichment marker core + `annotate-by-enrichment`)."""
    name_to_idx = {str(g).lower(): i for i, g in enumerate(gene_names)}
    prof = np.asarray(mean_profiles, np.float64)
    z = (prof - prof.mean(0, keepdims=True)) / np.maximum(prof.std(0, keepdims=True), 1e-8)

    labels = list(marker_sets)
    scores = np.full((prof.shape[0], len(labels)), -np.inf)
    for li, lab in enumerate(labels):
        ids = [name_to_idx[m.lower()] for m in marker_sets[lab] if m.lower() in name_to_idx]
        if not ids:
            continue
        scores[:, li] = z[:, ids].mean(axis=1)
    best = scores.argmax(1)
    out = [
        labels[b] if scores[i, b] > min_score else UNASSIGNED_LABEL
        for i, b in enumerate(best)
    ]
    return out, scores
