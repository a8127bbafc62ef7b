"""Velocity-oriented lineage: pseudotime direction follows the flow."""

import numpy as np

from legume_tpu.embedding.lineage import velocity_oriented_lineage


def _trajectory(n=300, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 1, n))
    # curved 2-D path with noise
    pts = np.stack([t * 4.0, np.sin(t * 3.0)], 1)
    pts += rng.normal(scale=0.08, size=pts.shape)
    # velocity = tangent of the path, pointing forward in t
    vel = np.stack([np.full(n, 4.0), 3.0 * np.cos(t * 3.0)], 1)
    vel += rng.normal(scale=0.2, size=vel.shape)
    return pts.astype(np.float32), vel.astype(np.float32), t


def test_pseudotime_follows_velocity():
    pts, vel, t = _trajectory()
    lin = velocity_oriented_lineage(pts, vel, n_nodes=15, seed=0)
    r = np.corrcoef(lin.pseudotime, t)[0, 1]
    assert r > 0.9, r
    # most cells' velocity agrees with the inferred flow direction
    assert (lin.consistency > 0).mean() > 0.8


def test_reversed_velocity_flips_root():
    pts, vel, t = _trajectory(seed=1)
    fwd = velocity_oriented_lineage(pts, vel, n_nodes=15, seed=0)
    rev = velocity_oriented_lineage(pts, -vel, n_nodes=15, seed=0)
    r_fwd = np.corrcoef(fwd.pseudotime, t)[0, 1]
    r_rev = np.corrcoef(rev.pseudotime, t)[0, 1]
    assert r_fwd > 0.9 and r_rev < -0.9, (r_fwd, r_rev)
