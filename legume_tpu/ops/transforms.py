"""Variance-stabilized, batch-adjusted, outlier-robust value transforms.

TPU-native re-implementation of the unified encoder input transform
shared by every encoder in the reference
(`candle-util/src/value_transform.rs:68-173`):

    clean = y / max(x0 * mu, EPS_DIV)        # multiplicative batch/gene-mean null
    a     = 2 sqrt(clean + 3/8)              # Anscombe stabilize
    r     = a - mean_g(a)                    # per-cell center
    s_g   = K * std_n(r) + eps               # per-gene clip scale
    out   = s_g * tanh(r / s_g)              # soft winsorize

Everything is elementwise + row/col reductions, so XLA fuses the whole
transform into the encoder's first matmul's producer; no Pallas needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TANH_K = 4.0
EPS = 1e-6
EPS_DIV = 0.1


def anscombe(t: jax.Array) -> jax.Array:
    """`2 sqrt(t + 3/8)` (value_transform.rs:106-110)."""
    return 2.0 * jnp.sqrt(t + 0.375)


def count_rate_clean(
    values: jax.Array,
    values_null: jax.Array | None = None,
    values_mean: jax.Array | None = None,
) -> jax.Array:
    """Divide by the composed multiplicative null, floored at EPS_DIV
    (value_transform.rs:150-173)."""
    divisor = None
    if values_null is not None and values_mean is not None:
        divisor = values_null * values_mean
    elif values_null is not None:
        divisor = values_null
    elif values_mean is not None:
        divisor = values_mean
    if divisor is None:
        return values
    return values / jnp.clip(divisor, EPS_DIV, None)


def anscombe_lite(
    values: jax.Array,
    values_null: jax.Array | None = None,
    values_mean: jax.Array | None = None,
) -> jax.Array:
    """Anscombe of the cleaned count rate (value_transform.rs:133-139)."""
    return anscombe(count_rate_clean(values, values_null, values_mean))


def anscombe_residual(
    y_nf: jax.Array,
    x0_nf: jax.Array | None = None,
    mu_f: jax.Array | None = None,
) -> jax.Array:
    """Full encoder-input transform (value_transform.rs:68-102).

    `y_nf` is [N, D] non-negative counts; `x0_nf` an optional per-cell
    multiplicative batch residual with the same shape; `mu_f` an
    optional per-feature mean rate broadcast over rows ([D] or [1, D]).
    """
    a = anscombe(count_rate_clean(y_nf, x0_nf, mu_f))
    r = a - jnp.mean(a, axis=-1, keepdims=True)
    std_1f = jnp.sqrt(jnp.var(r, axis=0, keepdims=True) + EPS)
    scale_1f = TANH_K * std_1f
    return scale_1f * jnp.tanh(r / scale_1f)
