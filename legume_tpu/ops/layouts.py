"""t-SNE and PHATE 2-D layouts (`senna/src/postprocess/fit_layout_*.rs`
equivalents; UMAP lives in `ops/umap.py`).

The reference runs layouts over PSEUDOBULK coordinates (hundreds to a
few thousand points), so the exact O(N^2) formulations are the right
TPU design: both become dense [N, N] matrix programs — softmax rows,
matmuls, and a `lax.scan` descent loop — that XLA tiles onto the MXU
with zero irregular memory traffic, instead of the CPU Barnes-Hut
quadtrees the usual implementations need at million-point scale.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["tsne", "phate"]


def _pairwise_sq_dists(x):
    s = jnp.sum(x * x, axis=1)
    d2 = s[:, None] + s[None, :] - 2.0 * (x @ x.T)
    return jnp.maximum(d2, 0.0)


@partial(jax.jit, static_argnames=("n_iter",))
def _calibrate_p(d2, perplexity, n_iter=40):
    """Per-row binary search for the Gaussian bandwidth matching the
    target perplexity; returns the symmetrized, normalized P."""
    n = d2.shape[0]
    target = jnp.log(perplexity)
    d2 = d2.at[jnp.arange(n), jnp.arange(n)].set(jnp.inf)

    def entropy_row(beta, row):
        p = jnp.exp(-row * beta)
        sum_p = jnp.maximum(p.sum(), 1e-12)
        # diagonal carries row=inf, p=0; select before multiplying so
        # inf * 0 never materializes as NaN
        rp = jnp.where(jnp.isfinite(row), row * p, 0.0)
        h = jnp.log(sum_p) + beta * jnp.sum(rp) / sum_p
        return h, p / sum_p

    def bisect(row):
        def step(carry, _):
            lo, hi, beta = carry
            h, _ = entropy_row(beta, row)
            too_high = h > target  # entropy too high -> increase beta
            lo = jnp.where(too_high, beta, lo)
            hi = jnp.where(too_high, hi, beta)
            beta = jnp.where(
                jnp.isinf(hi), beta * 2.0, 0.5 * (lo + hi)
            )
            return (lo, hi, beta), None

        (lo, hi, beta), _ = jax.lax.scan(
            step, (0.0, jnp.inf, 1.0), None, length=n_iter
        )
        _, p = entropy_row(beta, row)
        return p

    p = jax.vmap(bisect)(d2)
    p = jnp.where(jnp.isfinite(p), p, 0.0)
    p = (p + p.T) / (2.0 * n)
    return jnp.maximum(p, 1e-12)


def tsne(
    x: np.ndarray,
    *,
    perplexity: float = 30.0,
    n_iter: int = 500,
    exaggeration: float = 12.0,
    exaggerate_for: int = 120,
    learning_rate: float | None = None,
    seed: int = 0,
) -> np.ndarray:
    """Exact t-SNE to 2-D (van der Maaten & Hinton 2008): KL(P || Q)
    descent with momentum and early exaggeration, one `lax.scan`."""
    x = jnp.asarray(np.asarray(x, np.float32))
    n = x.shape[0]
    perplexity = min(perplexity, max((n - 1) / 3.0, 2.0))
    p = _calibrate_p(_pairwise_sq_dists(x), perplexity)
    eta = learning_rate if learning_rate is not None else max(n / exaggeration, 50.0)

    key = jax.random.key(seed)
    y0 = jax.random.normal(key, (n, 2)) * 1e-2

    @partial(jax.jit, static_argnames=("steps",))
    def run(y0, p, *, steps):
        def grad(y, p_eff):
            d2 = _pairwise_sq_dists(y)
            w = 1.0 / (1.0 + d2)
            w = w.at[jnp.arange(n), jnp.arange(n)].set(0.0)
            q = jnp.maximum(w / jnp.maximum(w.sum(), 1e-12), 1e-12)
            coef = (p_eff - q) * w  # [N, N]
            return 4.0 * ((jnp.diag(coef.sum(1)) - coef) @ y)

        def step(carry, t):
            y, vel, gains = carry
            p_eff = jnp.where(t < exaggerate_for, p * exaggeration, p)
            g = grad(y, p_eff)
            mom = jnp.where(t < exaggerate_for, 0.5, 0.8)
            same_sign = jnp.sign(g) == jnp.sign(vel)
            gains = jnp.clip(
                jnp.where(same_sign, gains * 0.8, gains + 0.2), 0.01, 10.0
            )
            vel = mom * vel - eta * gains * g
            y = y + vel
            y = y - y.mean(0, keepdims=True)
            return (y, vel, gains), None

        (y, _, _), _ = jax.lax.scan(
            step, (y0, jnp.zeros_like(y0), jnp.ones_like(y0)),
            jnp.arange(steps),
        )
        return y

    with jax.default_matmul_precision("highest"):
        return np.asarray(run(y0, p, steps=n_iter))


def phate(
    x: np.ndarray,
    *,
    knn: int = 5,
    decay: float = 40.0,
    t: int | str = "auto",
    n_iter: int = 300,
    seed: int = 0,
) -> np.ndarray:
    """PHATE to 2-D (Moon et al. 2019): alpha-decay kernel on adaptive
    kNN bandwidths -> t-step diffusion -> log-potential distances ->
    classical MDS init + metric-MDS (SGD) refinement."""
    x = np.asarray(x, np.float32)
    n = x.shape[0]
    knn = min(knn, n - 1)

    d2 = np.asarray(_pairwise_sq_dists(jnp.asarray(x)))
    d = np.sqrt(d2)
    # adaptive bandwidth: distance to the knn-th neighbor
    sigma = np.maximum(np.sort(d, axis=1)[:, knn], 1e-8)
    # (d/sigma)^decay spans hundreds of orders of magnitude for far
    # pairs; compute in float64 with a clamp so the kernel underflows
    # to exactly 0 instead of overflowing
    ratio = np.minimum((d / sigma[:, None]).astype(np.float64), 50.0)
    k = np.exp(-(ratio**decay))
    k = 0.5 * (k + k.T)
    p = k / np.maximum(k.sum(1, keepdims=True), 1e-12)

    if t == "auto":
        # von Neumann entropy knee: pick the first t where the entropy
        # drop flattens (cheap proxy scan over powers)
        evals = np.abs(np.linalg.eigvals(p))
        evals = np.sort(evals)[::-1]
        ent = []
        ts = list(range(1, 31))
        for tt in ts:
            lam = evals**tt
            lam = lam / max(lam.sum(), 1e-12)
            ent.append(float(-(lam * np.log(np.maximum(lam, 1e-30))).sum()))
        drops = -np.diff(ent)
        t_pick = int(ts[int(np.argmax(drops < 0.05 * max(drops.max(), 1e-12)))])
        t = max(t_pick, 2)

    pt = np.linalg.matrix_power(p, int(t))
    pot = -np.log(np.maximum(pt, 1e-12))  # potential coordinates
    pd = pot @ pot.T
    s = np.diag(pd)
    pd = np.sqrt(np.maximum(s[:, None] + s[None, :] - 2.0 * pd, 0.0))
    # normalize to O(1) so the float32 (and TPU bfloat16-matmul)
    # refinement below stays well-conditioned
    pd = (pd / max(pd.mean(), 1e-12)).astype(np.float32)

    # classical MDS init
    j = np.eye(n) - 1.0 / n
    b = -0.5 * j @ (pd**2) @ j
    w, v = np.linalg.eigh(b)
    idx = np.argsort(w)[::-1][:2]
    y0 = (v[:, idx] * np.sqrt(np.maximum(w[idx], 0.0))).astype(np.float32)

    # metric MDS refinement: stress majorization by gradient descent
    target = jnp.asarray(pd)

    @partial(jax.jit, static_argnames=("steps",))
    def refine(y0, *, steps):
        def stress_grad(y):
            d2y = _pairwise_sq_dists(y)
            dy = jnp.sqrt(jnp.maximum(d2y, 1e-12))
            diff = dy - target
            coef = diff / dy
            coef = coef.at[jnp.arange(n), jnp.arange(n)].set(0.0)
            g = 4.0 * ((jnp.diag(coef.sum(1)) - coef) @ y) / (n * n)
            return g, jnp.sum(diff**2)

        def step(carry, _):
            y, lr = carry
            g, s = stress_grad(y)
            y = y - lr * g
            return (y, lr), s

        (y, _), s = jax.lax.scan(step, (y0, jnp.float32(n * 0.5)), None, length=steps)
        return y, s

    with jax.default_matmul_precision("highest"):
        y, _ = refine(jnp.asarray(y0), steps=n_iter)
    return np.asarray(y)
