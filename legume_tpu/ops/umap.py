"""UMAP layout via edge-sampled SGD on device
(matrix-util `umap.rs:26-100` equivalent; used by `senna layout`).

The whole optimization is one jitted `lax.scan`: each step samples a
fixed-size batch of positive edges (probability ~ fuzzy weight) plus
uniform negatives, computes the UMAP attractive/repulsive gradients,
and scatter-adds the updates — batched VPU work instead of the
per-edge host loop the reference runs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


INIT_SCALE = 10.0  # pca.rs INIT_SCALE: UMAP SGD clamps steps at +-4
_JITTER_FRAC = 1e-4  # uwot scale_and_jitter


def pc_scores(x: np.ndarray, rank: int, skip: int = 1) -> np.ndarray:
    """Principal-component scores with the `skip` leading axes dropped
    (matrix-util pca.rs:47 `pc_scores`). No centering pass: on the
    nonnegative rows this pipeline lays out (topic simplices,
    unit-normalized latents) every row loads positively on the first
    singular vector, so that axis IS the mean profile — dropping it
    de-means without materializing a centered copy. Pass skip=0 for
    already-centered data."""
    x = np.asarray(x, np.float32)
    want = min(rank + skip, min(x.shape))
    if rank <= 0 or want <= skip:
        raise ValueError(
            f"no components left: {x.shape} data, rank={rank}, skip={skip}"
        )
    u, s, _ = np.linalg.svd(x, full_matrices=False)
    keep = min(u.shape[1] - skip, rank)
    return u[:, skip : skip + keep] * s[skip : skip + keep]


def init_2d_from_scores(scores: np.ndarray, seed: int = 0) -> np.ndarray:
    """[N, 2] SGD init from the leading two PC scores, rescaled so the
    largest |coordinate| is INIT_SCALE, plus a small jitter
    (pca.rs `init_2d_from_scores`). The jitter matters: two points at
    identical scores sit at exactly zero distance where the attractive
    gradient vanishes and the repulsive one has no direction — the
    pair could never separate."""
    rng = np.random.default_rng(seed)
    if scores.shape[1] < 2:
        return rng.uniform(-INIT_SCALE, INIT_SCALE, (scores.shape[0], 2)).astype(
            np.float32
        )
    emb = np.asarray(scores[:, :2], np.float32)
    m = np.abs(emb).max()
    if m < 1e-8:
        return rng.uniform(-INIT_SCALE, INIT_SCALE, (scores.shape[0], 2)).astype(
            np.float32
        )
    emb = emb / m * INIT_SCALE
    emb += rng.normal(0.0, _JITTER_FRAC * INIT_SCALE, emb.shape)
    return emb.astype(np.float32)


def _fit_ab(min_dist: float, spread: float) -> tuple[float, float]:
    """Least-squares fit of the (a, b) rational curve to the target
    membership function (standard UMAP procedure)."""
    from scipy.optimize import curve_fit

    x = np.linspace(0, 3 * spread, 300)
    y = np.where(x < min_dist, 1.0, np.exp(-(x - min_dist) / spread))
    f = lambda x, a, b: 1.0 / (1.0 + a * x ** (2 * b))
    (a, b), _ = curve_fit(f, x, y, p0=[1.0, 1.0], maxfev=10000)
    return float(a), float(b)


def fuzzy_edges(
    coords: np.ndarray, k: int = 15, *, chunk: int = 4096
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """kNN -> smoothed exponential membership weights; returns
    (src [E], dst [E], weight [E]) symmetrized by fuzzy union."""
    from .knn import knn_within

    n = coords.shape[0]
    d, idx = knn_within(coords.astype(np.float32), min(k, n - 1), chunk=chunk)
    rho = d[:, :1]  # distance to nearest neighbor
    sigma = np.maximum(d.mean(axis=1, keepdims=True) - rho, 1e-3)
    w = np.exp(-np.maximum(d - rho, 0.0) / sigma)
    src = np.repeat(np.arange(n), idx.shape[1])
    dst = idx.ravel()
    import scipy.sparse as sp

    g = sp.csr_matrix((w.ravel(), (src, dst)), shape=(n, n))
    g = g + g.T - g.multiply(g.T)  # fuzzy union
    coo = g.tocoo()
    keep = coo.row < coo.col
    return coo.row[keep], coo.col[keep], coo.data[keep].astype(np.float32)


@partial(jax.jit, static_argnames=("n_steps", "batch", "n_points"))
def _umap_sgd(
    key,
    emb0: jax.Array,  # [N, 2]
    src: jax.Array,
    dst: jax.Array,
    probs: jax.Array,
    *,
    n_steps: int,
    batch: int,
    n_points: int,
    a: float,
    b: float,
    lr0: float = 1.0,
    neg_per_pos: int = 5,
):
    e = src.shape[0]

    def step(carry, inp):
        emb, = carry
        i, k = inp
        lr = lr0 * (1.0 - i / n_steps)
        k1, k2 = jax.random.split(k)
        eidx = jax.random.choice(k1, e, (batch,), p=probs)
        s, t = src[eidx], dst[eidx]
        # attractive
        diff = emb[s] - emb[t]
        d2 = jnp.sum(diff * diff, -1, keepdims=True)
        grad_coef = (-2.0 * a * b * d2 ** (b - 1.0)) / (1.0 + a * d2**b)
        g = jnp.clip(grad_coef * diff, -4.0, 4.0)
        emb = emb.at[s].add(lr * g)
        emb = emb.at[t].add(-lr * g)
        # repulsive: uniform negatives for each positive's source
        neg = jax.random.randint(k2, (batch, neg_per_pos), 0, n_points)
        diff_n = emb[s][:, None, :] - emb[neg]
        d2n = jnp.sum(diff_n * diff_n, -1, keepdims=True)
        rep = (2.0 * b) / ((0.001 + d2n) * (1.0 + a * d2n**b))
        gn = jnp.clip(rep * diff_n, -4.0, 4.0)
        emb = emb.at[s].add(lr * gn.sum(1))
        return (emb,), None

    keys = jax.random.split(key, n_steps)
    (emb,), _ = jax.lax.scan(step, (emb0,), (jnp.arange(n_steps), keys))
    return emb


def umap(
    x: np.ndarray,
    *,
    n_neighbors: int = 15,
    min_dist: float = 0.1,
    spread: float = 1.0,
    n_epochs: int = 200,
    batch: int = 4096,
    seed: int = 0,
    kernel: str = "umap",
    pcs: int = 0,
) -> np.ndarray:
    """2D UMAP embedding of [N, D] points.

    kernel="tumap" uses the uwot::tumap a=b=1 kernel 1/(1+d^2)
    (umap.rs:54): more spread, and the layout faba's lineage view runs
    (lineage/layout.rs:126). pcs>0 builds BOTH the kNN graph and the
    SGD init on `pc_scores(x, pcs, skip=1)` — neighbours on X_pca and
    a PCA seed, with the nonnegative mean axis dropped
    (lineage/layout.rs:94-99)."""
    n = x.shape[0]
    if pcs > 0:
        graph_feats = pc_scores(x, pcs, 1)
        emb0 = init_2d_from_scores(graph_feats, seed)
    else:
        graph_feats = x
        xc = x - x.mean(0)
        u, s, vt = np.linalg.svd(xc, full_matrices=False)
        emb0 = init_2d_from_scores(u[:, :2] * s[:2], seed)
    src, dst, w = fuzzy_edges(np.asarray(graph_feats, np.float32), n_neighbors)
    a, b = (1.0, 1.0) if kernel == "tumap" else _fit_ab(min_dist, spread)

    probs = w / w.sum()
    n_steps = max(1, n_epochs * max(len(src) // batch, 1))
    emb = _umap_sgd(
        jax.random.key(seed),
        jnp.asarray(emb0, jnp.float32),
        jnp.asarray(src),
        jnp.asarray(dst),
        jnp.asarray(probs),
        n_steps=min(n_steps, 2000),
        batch=min(batch, max(len(src), 8)),
        n_points=n,
        a=a,
        b=b,
    )
    return np.asarray(emb)
