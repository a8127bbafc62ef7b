"""Archetypal analysis (matrix-util `archetypal.rs` equivalent).

X ~ A Z with Z = B X: archetypes are convex combinations of data
points, and each point a convex combination of archetypes (Cutler &
Breiman 1994). Fitted by alternating projected-gradient steps on the
two simplex-constrained factors — all dense matmuls, jitted.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _project_simplex(v):
    """Euclidean projection of each row onto the probability simplex."""
    k = v.shape[-1]
    u = jnp.sort(v, axis=-1)[..., ::-1]
    css = jnp.cumsum(u, axis=-1) - 1.0
    ind = jnp.arange(1, k + 1)
    cond = u - css / ind > 0
    rho = jnp.sum(cond, axis=-1, keepdims=True)
    theta = jnp.take_along_axis(css, rho - 1, axis=-1) / rho
    return jnp.maximum(v - theta, 0.0)


def fit_archetypes(
    x: np.ndarray, k: int, *, n_iter: int = 200, seed: int = 0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (archetypes Z [K, D], weights A [N, K], B [K, N])."""
    rng = np.random.default_rng(seed)
    n, d = x.shape
    x_j = jnp.asarray(x, jnp.float32)
    a = jnp.asarray(rng.dirichlet(np.ones(k), size=n).astype(np.float32))
    b = jnp.asarray(rng.dirichlet(np.ones(n), size=k).astype(np.float32))

    @jax.jit
    def step(a, b):
        z = b @ x_j
        # A-step: projected gradient on ||A Z - X||
        ga = (a @ z - x_j) @ z.T
        a = _project_simplex(a - ga / jnp.maximum(jnp.sum(z * z), 1e-8))
        # B-step: projected gradient on ||A (B X) - X||
        z = b @ x_j
        gb = a.T @ (a @ z - x_j) @ x_j.T
        b = _project_simplex(b - gb / jnp.maximum(jnp.sum(x_j * x_j) * jnp.sum(a * a), 1e-8))
        return a, b

    for _ in range(n_iter):
        a, b = step(a, b)
    z = np.asarray(b @ x_j)
    return z, np.asarray(a), np.asarray(b)
