"""Frozen-embedding cell-type annotation
(graph-embedding-util `type_annotation.rs:1-48` equivalent).

Type signature = L2-normalized (weighted) centroid of the type's
marker FEATURE embeddings; per-cell score = cosine(cell embedding,
signature); calibration = permutation z-score against signatures built
from random same-size marker sets (the permutation-moment z of the
reference). Assignment takes the best calibrated score, or
UNASSIGNED below `min_z`.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..ops.enrichment import UNASSIGNED_LABEL

log = logging.getLogger(__name__)


@dataclass
class TypeAnnotation:
    labels: list
    scores: np.ndarray  # [N, T] cosine scores
    zscores: np.ndarray  # [N, T] permutation-calibrated


def annotate_by_projection(
    cell_emb: np.ndarray,  # [N, H]
    feat_emb: np.ndarray,  # [D, H] frozen feature embeddings
    gene_names: list,
    marker_sets: dict,
    *,
    n_permutations: int = 100,
    min_z: float = 2.0,
    seed: int = 0,
) -> TypeAnnotation:
    rng = np.random.default_rng(seed)
    name_to_idx = {str(g).lower(): i for i, g in enumerate(gene_names)}
    d, h = feat_emb.shape
    fe = feat_emb / np.maximum(np.linalg.norm(feat_emb, axis=1, keepdims=True), 1e-9)
    ce = cell_emb / np.maximum(np.linalg.norm(cell_emb, axis=1, keepdims=True), 1e-9)

    def signature(ids):
        c = fe[ids].mean(0)
        return c / max(np.linalg.norm(c), 1e-9)

    types = list(marker_sets)
    scores = np.zeros((len(ce), len(types)), np.float32)
    z = np.zeros_like(scores)
    for t, ty in enumerate(types):
        ids = [name_to_idx[m.lower()] for m in marker_sets[ty] if m.lower() in name_to_idx]
        if not ids:
            scores[:, t] = -np.inf
            continue
        s = ce @ signature(np.asarray(ids))
        # permutation null: random same-size marker sets
        null = np.stack(
            [ce @ signature(rng.choice(d, len(ids), replace=False)) for _ in range(n_permutations)],
            axis=1,
        )
        mu, sd = null.mean(1), np.maximum(null.std(1), 1e-9)
        scores[:, t] = s
        z[:, t] = (s - mu) / sd

    best = z.argmax(1)
    labels = [
        types[b] if z[i, b] >= min_z else UNASSIGNED_LABEL for i, b in enumerate(best)
    ]
    return TypeAnnotation(labels=labels, scores=scores, zscores=z)
