"""`senna resolve-embedding-space` — map embeddings from different
runs into one shared space (graph-embedding-util `resolve_embedding`
equivalent).

Anchored orthogonal Procrustes: runs share (a subset of) features;
each run's feature embedding is rotated/scaled onto the reference
run's via the SVD solution, and the same transform carries that run's
cell embeddings into the shared space.
"""

from __future__ import annotations

import numpy as np


def procrustes_transform(
    source: np.ndarray, target: np.ndarray, *, allow_scale: bool = True
) -> tuple[np.ndarray, float]:
    """(R, s): orthogonal map + scale minimizing ||s A R - B||_F for
    centered A, B."""
    a = source - source.mean(0)
    b = target - target.mean(0)
    u, sv, vt = np.linalg.svd(a.T @ b)
    r = u @ vt
    s = sv.sum() / max((a * a).sum(), 1e-12) if allow_scale else 1.0
    return r, float(s)


def resolve_embedding_spaces(
    runs: list[dict],
    *,
    reference: int = 0,
    allow_scale: bool = True,
) -> list[dict]:
    """Each run: {"feat_names", "e_feat" [D_r, H], optional "e_cell"}.
    Returns runs with aligned embeddings (reference unchanged)."""
    ref = runs[reference]
    ref_pos = {n: i for i, n in enumerate(ref["feat_names"])}

    out = []
    for i, run in enumerate(runs):
        if i == reference:
            out.append(dict(run))
            continue
        shared = [
            (j, ref_pos[n]) for j, n in enumerate(run["feat_names"]) if n in ref_pos
        ]
        if len(shared) < run["e_feat"].shape[1] + 1:
            raise ValueError(f"run {i}: too few shared features to resolve")
        src_idx, ref_idx = map(np.asarray, zip(*shared))
        r, s = procrustes_transform(
            run["e_feat"][src_idx], ref["e_feat"][ref_idx], allow_scale=allow_scale
        )
        mu_src = run["e_feat"][src_idx].mean(0)
        mu_ref = ref["e_feat"][ref_idx].mean(0)
        xform = lambda e: (e - mu_src) @ r * s + mu_ref
        aligned = dict(run)
        aligned["e_feat"] = xform(run["e_feat"])
        if run.get("e_cell") is not None:
            aligned["e_cell"] = xform(run["e_cell"])
        out.append(aligned)
    return out
