"""Device mesh + sharding layer.

This layer is NEW capability relative to the reference, which is
single-node rayon + one GPU (SURVEY.md section 2.7: "Distributed
communication backend: absent"). The TPU design from the survey's
north star:

- cells (the data axis) shard across devices/hosts as `dp`;
- the gene axis stays replicated for training, or shards as `tp` for
  the separable elementwise fits (collapse optimize, HVG);
- sufficient statistics and gradients merge via `psum`/`all_gather`
  inserted by XLA from sharding annotations over ICI.

Everything routes through `jax.sharding.Mesh` + NamedSharding so the
same code runs on 1 chip, a v5e-8 slice, or a virtual
`--xla_force_host_platform_device_count` CPU mesh in tests.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
GENE_AXIS = "tp"


def make_mesh(
    n_devices: int | None = None, *, gene_parallel: int = 1
) -> Mesh:
    """A (dp[, tp]) mesh over the first `n_devices` devices."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    devs = np.asarray(devs[:n])
    if gene_parallel > 1:
        assert n % gene_parallel == 0
        return Mesh(
            devs.reshape(n // gene_parallel, gene_parallel), (DATA_AXIS, GENE_AXIS)
        )
    return Mesh(devs.reshape(n), (DATA_AXIS,))


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Rows (cells) split over dp, everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def gene_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Rows (genes) split over tp when present, else dp (separable
    elementwise fits shard on whatever axis exists)."""
    axis = GENE_AXIS if GENE_AXIS in mesh.axis_names else DATA_AXIS
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rows(mesh: Mesh, arr: jax.Array | np.ndarray) -> jax.Array:
    """Place an array with its leading axis split over dp (pads are the
    caller's job: leading dim must divide by mesh dp size)."""
    return jax.device_put(arr, data_sharding(mesh, np.ndim(arr)))
