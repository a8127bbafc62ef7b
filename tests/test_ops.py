"""Streaming ops tests: projection, kNN, collapse (SURVEY.md section 2.3
parity; synthetic-recovery style per reference test pattern 3)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.ops import collapse as clp
from legume_tpu.ops import knn as knn_ops
from legume_tpu.ops import random_projection as rp
from legume_tpu.ops import sparse as sparse_ops
from legume_tpu.ops.rsvd import rsvd
from legume_tpu.utils.prng import key_from_seed


@pytest.fixture(scope="module")
def backend():
    rng = np.random.default_rng(3)
    d, n = 60, 500
    dense = rng.poisson(1.0, size=(d, n)).astype(np.float32)
    return MemoryBackend(sp.csc_matrix(dense)), dense


def test_project_block_matches_dense(backend):
    be, dense = backend
    d, n = dense.shape
    k = 8
    basis, proj_kn = rp.project_columns(be, k, block_size=128, seed=11)
    assert basis.shape == (d, k)
    assert proj_kn.shape == (k, n)
    # manual: log1p, column L2 norm, project, per-cell z-score
    x = np.log1p(dense)
    x = x / np.maximum(np.linalg.norm(x, axis=0, keepdims=True), 1e-8)
    manual = (basis.T @ x).T  # [n, k]
    mu = manual.mean(1, keepdims=True)
    sd = manual.std(1, keepdims=True)
    manual = (manual - mu) / np.where(sd > 0, sd, 1.0)
    if manual.max() > 4 or manual.min() < -4:
        manual = np.clip(manual, -4, 4)
        mu = manual.mean(1, keepdims=True)
        sd = manual.std(1, keepdims=True)
        manual = (manual - mu) / np.where(sd > 0, sd, 1.0)
    np.testing.assert_allclose(proj_kn.T, manual, rtol=2e-3, atol=2e-3)


def test_projection_deterministic(backend):
    be, _ = backend
    b1, p1 = rp.project_columns(be, 6, seed=42)
    b2, p2 = rp.project_columns(be, 6, seed=42)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(b1, b2)
    b3, _ = rp.project_columns(be, 6, seed=43)
    assert not np.allclose(b1, b3)


def test_binary_sort_codes(backend):
    be, _ = backend
    _, proj = rp.project_columns(be, 8, seed=1)
    codes = rp.binary_sort_columns(proj, 3)
    assert codes.min() >= 0 and codes.max() < 8
    groups, s = rp.compact_group_codes(codes)
    assert s <= 8 and groups.max() == s - 1


def test_rsvd_reconstructs_low_rank():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(100, 5)).astype(np.float32)
    b = rng.normal(size=(5, 80)).astype(np.float32)
    x = jnp.asarray(a @ b)
    u, s, vt = rsvd(x, 5, key=key_from_seed(0))
    np.testing.assert_allclose(
        np.asarray(u * s @ vt), np.asarray(x), atol=1e-2, rtol=1e-2
    )


def test_knn_exact_matches_bruteforce():
    rng = np.random.default_rng(5)
    pts = rng.normal(size=(300, 10)).astype(np.float32)
    d, i = knn_ops.knn_within(pts, 5, chunk=128)
    # brute force
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want_i = np.argsort(d2, axis=1)[:, :5]
    want_d = np.sqrt(np.take_along_axis(d2, want_i, 1))
    np.testing.assert_allclose(np.sort(d, 1), np.sort(want_d, 1), rtol=1e-3, atol=1e-3)
    # indices may differ only on exact ties
    assert (np.sort(i, 1) == np.sort(want_i, 1)).mean() > 0.99


def test_matched_neighbors_cross_batch_only():
    rng = np.random.default_rng(6)
    pts = rng.normal(size=(200, 4)).astype(np.float32)
    batches = (np.arange(200) % 3 == 0).astype(np.int32)  # 2 batches
    idx, dist, valid = knn_ops.matched_neighbors_across_batches(pts, batches, 2, 4)
    assert idx.shape == (200, 4)
    assert valid.all()
    # every match lands in the OTHER batch
    for j in range(200):
        assert np.all(batches[idx[j]] != batches[j])


def test_collapse_basic_sums(backend):
    be, dense = backend
    n = dense.shape[1]
    rng = np.random.default_rng(1)
    groups = rng.integers(0, 7, n).astype(np.int32)
    stat = clp.collect_basic_stats(be, groups, 7)
    want = np.zeros((dense.shape[0], 7), np.float32)
    for s in range(7):
        want[:, s] = dense[:, groups == s].sum(1)
    np.testing.assert_allclose(stat.observed_sum_ds, want, rtol=1e-5)
    np.testing.assert_allclose(stat.size_s, np.bincount(groups, minlength=7))


def test_collapse_optimize_recovers_means(backend):
    """Single-batch closed form: posterior mean ~ group mean of counts."""
    be, dense = backend
    n = dense.shape[1]
    groups = (np.arange(n) % 4).astype(np.int32)
    stat = clp.collect_basic_stats(be, groups, 4)
    out = clp.optimize(stat, num_iter=10)
    got = np.asarray(out.mu_observed.mean())
    for s in range(4):
        cells = groups == s
        want = (1.0 + dense[:, cells].sum(1)) / (1.0 + cells.sum())
        np.testing.assert_allclose(got[:, s], want, rtol=1e-4)
    assert out.mu_adjusted is None  # single batch -> no batch planes


def test_collapse_batched_descent_converges():
    """Two batches with a known multiplicative batch effect: the
    adjusted mean should track biology, delta the batch fold change
    (synthetic-recovery; reference pattern 3)."""
    rng = np.random.default_rng(9)
    d, n = 40, 2000
    mu_true = rng.gamma(2.0, 1.0, size=(d, 1))
    batch = (np.arange(n) % 2).astype(np.int32)
    delta_true = np.ones((d, 2))
    delta_true[: d // 2, 1] = 3.0  # first half of genes inflated in batch 1
    lam = mu_true * delta_true[:, batch]
    y = rng.poisson(lam).astype(np.float32)
    be = MemoryBackend(sp.csc_matrix(y))

    groups = np.zeros(n, np.int32)  # one pseudobulk
    stat = clp.collect_basic_stats(be, groups, 1, num_batches=2, batches=batch)

    basis, proj = rp.project_columns(be, 8, seed=3)
    stat = clp.collect_matched_stats(
        be, groups, 1, batch, 2, proj.T.copy(), knn=8, cell_block=512, gene_chunk=32
    )
    # merge observed into same stat object
    stat2 = clp.collect_basic_stats(be, groups, 1, num_batches=2, batches=batch)
    stat.observed_sum_ds = stat2.observed_sum_ds
    stat.size_s = stat2.size_s
    stat.observed_sum_db = stat2.observed_sum_db
    stat.n_bs = stat2.n_bs

    out = clp.optimize(stat, num_iter=50)
    assert out.mu_adjusted is not None and out.delta is not None
    assert np.all(np.isfinite(np.asarray(out.mu_adjusted.mean())))
    # delta should detect the inflated genes in batch 1 vs batch 0
    delta = np.asarray(out.delta.mean())
    inflated = delta[: d // 2, 1] / delta[: d // 2, 0]
    clean = delta[d // 2 :, 1] / delta[d // 2 :, 0]
    assert np.median(inflated) > 1.5 * np.median(clean)


def test_merge_stat_aggregates():
    stat = clp.CollapsedStat.zeros(5, 4, 2)
    stat.observed_sum_ds[:] = 1.0
    stat.size_s[:] = 2.0
    coarse = clp.merge_stat(stat, np.asarray([0, 0, 1, 1]), 2)
    np.testing.assert_allclose(coarse.observed_sum_ds, 2.0)
    np.testing.assert_allclose(coarse.size_s, 4.0)


def test_densify_block_roundtrip():
    m = sp.random(30, 50, density=0.3, format="csc", random_state=2)
    from legume_tpu.data.visitors import csc_to_coo_block

    blk = csc_to_coo_block(m)
    dense = np.asarray(
        sparse_ops.densify_block(
            jnp.asarray(blk.row_ids),
            jnp.asarray(blk.col_ids),
            jnp.asarray(blk.vals),
            ncols=blk.ncols,
            num_genes=30,
        )
    )
    np.testing.assert_allclose(dense, np.asarray(m.todense()).T, rtol=1e-5)


def test_feature_coarsening_roundtrip():
    from legume_tpu.ops.feature_coarsening import compute_feature_coarsening

    rng = np.random.default_rng(0)
    d, s = 200, 30
    # feature blocks with distinct profiles
    base = rng.gamma(2, 1, size=(10, s))
    profile = base[np.arange(d) % 10] * rng.uniform(0.8, 1.2, (d, s))
    fc = compute_feature_coarsening(profile, 32, seed=1)
    assert fc.num_coarse <= 64
    assert fc.fine_to_coarse.shape == (d,)

    data_nd = rng.poisson(2.0, size=(7, d)).astype(np.float32)
    agg = fc.aggregate_columns_nd(data_nd)
    assert agg.shape == (7, fc.num_coarse)
    np.testing.assert_allclose(agg.sum(1), data_nd.sum(1), rtol=1e-5)

    ds = rng.random((d, 5)).astype(np.float32)
    agg_rows = fc.aggregate_rows_ds(ds)
    np.testing.assert_allclose(agg_rows.sum(0), ds.sum(0), rtol=1e-5)

    log_dict = np.log(rng.dirichlet(np.ones(fc.num_coarse), size=3).T + 1e-12)
    expanded = fc.expand_log_dict_dk(log_dict)
    assert expanded.shape == (d, 3)
    # expanded dictionary still normalizes over fine features
    np.testing.assert_allclose(np.exp(expanded).sum(0), 1.0, rtol=1e-4)


def test_col_ids_from_counts_matches_host_expansion():
    """Device col-id expansion == the CooBlock lazy host property,
    including the all-padding and empty-column edge cases."""
    import scipy.sparse as sp

    from legume_tpu.data.visitors import csc_to_coo_block
    from legume_tpu.ops.sparse import col_ids_from_counts

    rng = np.random.default_rng(3)
    m = sp.random(30, 17, density=0.2, random_state=3, format="csc")
    m.data[:] = rng.poisson(2.0, m.nnz) + 1
    # force an empty column
    m = m.tolil()
    m[:, 5] = 0
    m = m.tocsc()
    blk = csc_to_coo_block(m, pad_to=256)

    dev = np.asarray(
        col_ids_from_counts(
            jnp.asarray(blk.col_counts), cap=len(blk.row_ids), ncols=blk.ncols
        )
    )
    np.testing.assert_array_equal(dev, blk.col_ids)
    # padding lands in the discard segment
    assert (dev[blk.nnz:] == blk.ncols).all()

    # all-padding block (zero counts)
    zero = np.asarray(
        col_ids_from_counts(jnp.zeros(17, jnp.int32), cap=64, ncols=17)
    )
    assert (zero == 17).all()


def test_knn_search_tiled_matches_oneshot(monkeypatch):
    """The points-axis-tiled top-k (engaged when the [C, N] plane would
    blow the HBM budget, e.g. 1M-cell match caches) returns the same
    neighbors as the one-shot plane."""
    import legume_tpu.ops.knn as knn_mod

    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (3000, 12)).astype(np.float32)
    q = rng.normal(0, 1, (257, 12)).astype(np.float32)
    mask = rng.random(3000) < 0.7

    d0, i0 = knn_mod.knn_search(q, pts, 7, chunk=128, mask=mask)
    monkeypatch.setattr(knn_mod, "_TOPK_PLANE_BUDGET", 64 * 1024)
    d1, i1 = knn_mod.knn_search(q, pts, 7, chunk=128, mask=mask)
    np.testing.assert_allclose(np.sort(d0, 1), np.sort(d1, 1), atol=1e-4)
    # same neighbor sets (tie order may differ)
    for a, b in zip(i0, i1):
        assert set(a) == set(b)
