"""Second-order model-X knockoffs (matrix-util `knockoff.rs` +
chickpea's GhostKnockoff FDR filter, `chickpea/src/p2g/knockoff.rs`).

Equi-correlated construction: for standardized X with correlation S,
knockoffs satisfy cov([X, X~]) = [[S, S - diag(s)], [S - diag(s), S]]
with s_j = min(1, 2 lambda_min(S)). Sampling is Gaussian conditional —
dense matmuls + one Cholesky, all device-friendly.

`knockoff_filter` computes the Barber-Candes threshold on feature
statistics W (e.g. |beta_j| - |beta~_j|).
"""

from __future__ import annotations

import numpy as np


def second_order_knockoffs(
    x: np.ndarray, *, seed: int = 0, eps: float = 1e-4, s_method: str = "equi"
) -> np.ndarray:
    """Gaussian second-order knockoffs. `eps` is the correlation ridge
    (chickpea --ko-ridge); `s_method` picks the diag(s) construction
    (chickpea --ko-s KoSMethod): "equi" equicorrelated closed form, or
    "me" maximum-entropy s via projected gradient ascent on
    log det(2 diag(s) - diag(s) Sigma^-1 diag(s)). "mvr" currently
    falls back to "me" with a warning (both trade the equi ceiling for
    per-feature s; ME is the entropy flavor)."""
    import logging

    rng = np.random.default_rng(seed)
    n, p = x.shape
    xs = (x - x.mean(0)) / np.maximum(x.std(0), 1e-8)
    s_corr = np.corrcoef(xs, rowvar=False)
    s_corr = (s_corr + s_corr.T) / 2 + eps * np.eye(p)

    lam_min = float(np.linalg.eigvalsh(s_corr)[0])
    s_diag = np.full(p, min(1.0, 2.0 * max(lam_min, 0.0)) * (1 - eps))
    if s_method in ("me", "mvr"):
        if s_method == "mvr":
            logging.getLogger(__name__).warning(
                "knockoffs: s-method 'mvr' approximated by 'me'"
            )
        sinv_full = np.linalg.inv(s_corr)
        s_v = s_diag.copy()
        hi = 2.0 * max(lam_min, 1e-8) * (1 - eps)
        lr = 0.1 * hi
        for _ in range(100):
            # d/ds log det(2S - S Sinv S) with S = diag(s):
            # grad_i = [M^-1 (2I - 2 Sinv S)]_{ii}, M = 2S - S Sinv S
            m = 2 * np.diag(s_v) - (s_v[:, None] * sinv_full) * s_v[None, :]
            m = (m + m.T) / 2 + 1e-10 * np.eye(p)
            try:
                minv = np.linalg.inv(m)
            except np.linalg.LinAlgError:
                break
            grad = np.diag(minv @ (2 * np.eye(p) - 2 * sinv_full * s_v[None, :]))
            s_v = np.clip(s_v + lr * grad, 1e-8, hi)
        s_diag = s_v

    sinv = np.linalg.inv(s_corr)
    # conditional mean: X (I - Sinv diag(s)); conditional cov:
    # 2 diag(s) - diag(s) Sinv diag(s)
    mean = xs @ (np.eye(p) - sinv * s_diag[None, :])
    cov = 2 * np.diag(s_diag) - (s_diag[:, None] * sinv) * s_diag[None, :]
    cov = (cov + cov.T) / 2 + eps * np.eye(p)
    chol = np.linalg.cholesky(cov)
    return mean + rng.standard_normal((n, p)) @ chol.T


def knockoff_filter(w: np.ndarray, fdr: float = 0.1, *, offset: int = 1) -> tuple[float, np.ndarray]:
    """Barber-Candes threshold: smallest t with
    (offset + #{W <= -t}) / #{W >= t} <= fdr. Returns (threshold,
    selected mask)."""
    w = np.asarray(w, np.float64)
    ts = np.sort(np.abs(w[w != 0]))
    for t in ts:
        num = offset + np.sum(w <= -t)
        den = max(np.sum(w >= t), 1)
        if num / den <= fdr:
            return float(t), w >= t
    return float("inf"), np.zeros_like(w, bool)
