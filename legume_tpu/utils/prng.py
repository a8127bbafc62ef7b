"""Deterministic seeding utilities.

The reference is bit-deterministic through pinned seeds (SURVEY.md
section 4.6): the projection basis seed `DEFAULT_PROJECTION_SEED`
(`data-beans-alg/src/random_projection.rs:41`) and a `mix_seed` helper
(`matrix-util/src/rand_util.rs`). We keep the same constants so
identically-configured runs of this engine are reproducible by
construction (threefry keys are counter-based and order-independent).
"""

from __future__ import annotations

import jax

# "PROJPROJ" — same pinned basis seed as the reference
# (random_projection.rs:41); any fixed JL draw is a valid projection.
DEFAULT_PROJECTION_SEED: int = 0x50524F4A_50524F4A


def mix_seed(base: int, salt: int) -> int:
    """Mix a base seed with a salt (splitmix64-style finalizer).

    Stable across platforms; used to derive per-subsystem seeds from a
    single CLI `--seed` the way the reference derives per-batch HNSW
    seeds from `KNN_SEED` (`matrix-util/src/knn/backend.rs:16-33`).
    """
    x = (base ^ (salt * 0x9E3779B97F4A7C15)) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return (x ^ (x >> 31)) & 0xFFFFFFFFFFFFFFFF


def key_from_seed(seed: int, salt: int | None = None) -> jax.Array:
    """A threefry key from a (possibly 64-bit) seed."""
    if salt is not None:
        seed = mix_seed(seed, salt)
    return jax.random.key(seed & 0x7FFFFFFFFFFFFFFF)
