"""Randomized SVD on device (matrix-util `dmatrix_rsvd.rs:186-214`
equivalent).

Halko-Martinsson-Tropp randomized range finder with power iterations —
three tall-skinny matmuls per iteration, all MXU-friendly. Used by
binary cell sorting (`random_projection.rs:535`), the svd embedding
path (`senna svd`), and chickpea's ATAC embedding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("rank", "oversample", "power_iters"))
def rsvd(
    x: jax.Array,
    rank: int,
    *,
    key: jax.Array,
    oversample: int = 10,
    power_iters: int = 2,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Truncated SVD of `x` [M, N]: returns (U [M,k], S [k], Vt [k,N])."""
    m, n = x.shape
    k = min(rank + oversample, min(m, n))
    omega = jax.random.normal(key, (n, k), dtype=x.dtype)
    y = x @ omega  # [M, k]
    q, _ = jnp.linalg.qr(y)
    for _ in range(power_iters):
        z = x.T @ q
        q, _ = jnp.linalg.qr(x @ z)
    b = q.T @ x  # [k, N]
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = q @ ub
    return u[:, :rank], s[:rank], vt[:rank, :]
