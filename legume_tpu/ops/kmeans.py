"""Device k-means (matrix-util `clustering.rs` kmeans equivalent).

kmeans++ seeding + Lloyd iterations entirely on device: the assignment
step is one [N, K] distance matmul (MXU) + argmin, the update step a
segment-sum — the same shapes as the kNN kernel. Deterministic under a
threefry key.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k",))
def _plus_plus_init(key: jax.Array, x: jax.Array, *, k: int) -> jax.Array:
    """kmeans++ seeding."""
    n = x.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def body(i, carry):
        centers, key = carry
        d2 = jnp.min(
            jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, -1)
            + jnp.where(jnp.arange(k)[None, :] < i, 0.0, jnp.inf),
            axis=1,
        )
        key, kc = jax.random.split(key)
        probs = d2 / jnp.maximum(d2.sum(), 1e-30)
        idx = jax.random.choice(kc, n, p=probs)
        return centers.at[i].set(x[idx]), key

    centers, _ = jax.lax.fori_loop(1, k, body, (centers0, key))
    return centers


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_fit(
    key: jax.Array, x: jax.Array, *, k: int, iters: int = 50
) -> tuple[jax.Array, jax.Array]:
    """Returns (centers [k, D], labels [N])."""
    centers = _plus_plus_init(key, x, k=k)
    x_sq = jnp.sum(x * x, axis=1, keepdims=True)

    def assign(centers):
        c_sq = jnp.sum(centers * centers, axis=1)
        d2 = x_sq - 2.0 * (x @ centers.T) + c_sq[None, :]
        return jnp.argmin(d2, axis=1)

    def body(_, centers):
        labels = assign(centers)
        sums = jax.ops.segment_sum(x, labels, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones(x.shape[0]), labels, num_segments=k)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # keep empty clusters where they were
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = jax.lax.fori_loop(0, iters, body, centers)
    return centers, assign(centers)


def kmeans(x: np.ndarray, k: int, *, iters: int = 50, seed: int = 0):
    key = jax.random.key(seed)
    centers, labels = kmeans_fit(key, jnp.asarray(x, jnp.float32), k=k, iters=iters)
    return np.asarray(centers), np.asarray(labels)
