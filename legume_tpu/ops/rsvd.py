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
def _rsvd_project(
    x: jax.Array,
    rank: int,
    *,
    key: jax.Array,
    oversample: int = 10,
    power_iters: int = 2,
) -> jax.Array:
    """Device part of rSVD: the randomized range finder + the small
    projected matrix B = Q^T X. The big matmuls/QRs run on the MXU."""
    m, n = x.shape
    k = min(rank + oversample, min(m, n))
    omega = jax.random.normal(key, (n, k), dtype=x.dtype)
    y = x @ omega  # [M, k]
    q, _ = jnp.linalg.qr(y)
    for _ in range(power_iters):
        z = x.T @ q
        q, _ = jnp.linalg.qr(x @ z)
    b = q.T @ x  # [k, N]
    return q, b


def rsvd(
    x: jax.Array,
    rank: int,
    *,
    key: jax.Array,
    oversample: int = 10,
    power_iters: int = 2,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Truncated SVD of `x` [M, N]: returns (U [M,k], S [k], Vt [k,N]).

    The range finder runs on device; the final [k x N] dense SVD runs
    on host LAPACK — it is tiny, and XLA:TPU's SVD lowering compiles a
    very expensive iterative kernel that dominated wall-clock through
    the tunnel for no benefit.
    """
    import numpy as np

    q, b = _rsvd_project(
        x, rank, key=key, oversample=oversample, power_iters=power_iters
    )
    ub, s, vt = np.linalg.svd(np.asarray(b), full_matrices=False)
    u = np.asarray(q) @ ub
    return (
        jnp.asarray(u[:, :rank]),
        jnp.asarray(s[:rank]),
        jnp.asarray(vt[:rank, :]),
    )
