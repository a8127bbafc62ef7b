"""tsne/phate layouts preserve cluster structure (fit_layout_*.rs)."""

import numpy as np
import pytest

from legume_tpu.ops.layouts import phate, tsne


def _blobs(n_per=60, d=20, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=6.0, size=(3, d))
    x = np.concatenate(
        [c + rng.normal(scale=1.0, size=(n_per, d)) for c in centers]
    ).astype(np.float32)
    labels = np.repeat(np.arange(3), n_per)
    return x, labels


def _knn_purity(y, labels, k=10):
    d2 = ((y[:, None] - y[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nbr = np.argsort(d2, axis=1)[:, :k]
    return (labels[nbr] == labels[:, None]).mean()


def test_tsne_separates_blobs():
    x, labels = _blobs()
    y = tsne(x, perplexity=20, n_iter=300, seed=0)
    assert y.shape == (180, 2)
    assert np.isfinite(y).all()
    assert _knn_purity(y, labels) > 0.95


def test_phate_separates_blobs():
    x, labels = _blobs(seed=1)
    y = phate(x, knn=5, n_iter=200)
    assert y.shape == (180, 2)
    assert np.isfinite(y).all()
    assert _knn_purity(y, labels) > 0.9


def test_phate_trajectory_orders_points():
    # a 1-D trajectory in 10-D: PHATE's diffusion potential should
    # lay it out so euclidean order in 2-D tracks the path order
    rng = np.random.default_rng(2)
    t = np.linspace(0, 1, 150)
    x = (np.outer(t, rng.normal(size=10)) + rng.normal(scale=0.05, size=(150, 10))).astype(np.float32)
    y = phate(x, knn=5, n_iter=200)
    # distance from the start point should correlate with t
    d0 = np.linalg.norm(y - y[0], axis=1)
    r = np.corrcoef(d0, t)[0, 1]
    assert abs(r) > 0.8, r
