"""Multi-host sharded sufficient-stat reduction.

Three layers (VERDICT round-1 item 1; SURVEY.md section 2.7/5):
- virtual 8-device mesh: psum'd result equals single-device sums;
- nnz-balanced shard planner properties;
- per-process READ ISOLATION: with a simulated process view, each
  process touches only its own devices' column ranges, and the
  partials sum to the global answer;
- a true multi-process run (jax.distributed over localhost) lives in
  `test_multiprocess.py`.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax

from legume_tpu.parallel.mesh import make_mesh
from legume_tpu.parallel.multihost import (
    collapse_observed_multihost,
    collapse_stats_sharded,
    column_nnz,
    plan_column_shards,
    shard_coo_by_cells,
)


def test_sharded_collapse_matches_dense():
    if len(jax.devices()) < 2:
        pytest.skip("needs the virtual multi-device mesh")
    rng = np.random.default_rng(0)
    d, n, s_groups = 50, 800, 6
    dense = rng.poisson(1.5, size=(d, n)).astype(np.float32)
    groups = rng.integers(0, s_groups, n).astype(np.int32)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    rows, cols, vals, segs = shard_coo_by_cells(sp.csc_matrix(dense), groups, n_dev)
    got = collapse_stats_sharded(
        mesh, rows, cols, vals, segs, num_genes=d, num_groups=s_groups
    )

    want = np.zeros((d, s_groups), np.float32)
    for g in range(s_groups):
        want[:, g] = dense[:, groups == g].sum(1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_plan_column_shards_balances_nnz():
    rng = np.random.default_rng(1)
    # heavy head: first 10% of columns hold most nnz
    nnz = np.concatenate([rng.integers(50, 100, 100), rng.integers(0, 5, 900)])
    bounds = plan_column_shards(nnz, 8)
    assert bounds[0] == 0 and bounds[-1] == len(nnz)
    assert np.all(np.diff(bounds) >= 0)
    per = np.asarray([nnz[bounds[s] : bounds[s + 1]].sum() for s in range(8)])
    # balanced: no shard above 2x the mean (uniform split would be ~5x)
    assert per.max() <= 2.0 * per.mean()
    uniform = np.linspace(0, len(nnz), 9).astype(int)
    per_u = np.asarray([nnz[uniform[s] : uniform[s + 1]].sum() for s in range(8)])
    assert per.max() < per_u.max()


def test_collapse_observed_multihost_from_backend(tmp_path):
    """zarr backend -> per-device nnz-balanced column shards -> psum
    reduction matches the dense groupby (the topic pipeline's
    multi-host path); explicit num_groups keeps empty trailing
    pseudobulks in the plane."""
    from legume_tpu.data.sparse_io import create_sparse_from_csc, open_sparse_matrix

    rng = np.random.default_rng(0)
    d, n, s = 40, 200, 6
    dense = rng.poisson(1.0, (d, n)).astype(np.float32)
    groups = rng.integers(0, s, n)
    create_sparse_from_csc(
        sp.csc_matrix(dense), str(tmp_path / "be"),
        [f"g{i}" for i in range(d)], [f"c{j}" for j in range(n)],
    )
    vec = open_sparse_matrix(str(tmp_path / "be"))
    assert column_nnz(vec).sum() == vec.num_nonzeros
    mesh = make_mesh()  # all 8 virtual devices on the data axis
    got = collapse_observed_multihost(vec, groups, mesh, block_size=64)
    want = np.zeros((d, s))
    for j in range(n):
        want[:, groups[j]] += dense[:, j]
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # explicit num_groups: trailing empty groups stay allocated
    got2 = collapse_observed_multihost(
        vec, groups, mesh, num_groups=s + 3, block_size=64
    )
    assert got2.shape == (d, s + 3)
    np.testing.assert_allclose(got2[:, :s], want, rtol=1e-5)
    assert np.all(got2[:, s:] == 0)


def test_process_local_read_isolation(tmp_path):
    """Simulated 2-process view over the 8-device mesh: each process
    reads ONLY its own devices' column ranges and the partials sum to
    the global pseudobulk plane."""
    from legume_tpu.data.sparse_io import create_sparse_from_csc, open_sparse_matrix

    rng = np.random.default_rng(2)
    d, n, s = 30, 300, 5
    dense = rng.poisson(1.0, (d, n)).astype(np.float32)
    groups = rng.integers(0, s, n)
    create_sparse_from_csc(
        sp.csc_matrix(dense), str(tmp_path / "be"),
        [f"g{i}" for i in range(d)], [f"c{j}" for j in range(n)],
    )
    vec = open_sparse_matrix(str(tmp_path / "be"))
    mesh = make_mesh()
    n_dev = len(jax.devices())
    bounds = plan_column_shards(column_nnz(vec), n_dev)

    partials, all_ranges = [], []
    for p in range(2):
        read_log: list = []
        part = collapse_observed_multihost(
            vec, groups, mesh,
            num_groups=s, block_size=32,
            process_index=p, num_processes=2, read_log=read_log,
        )
        # isolation: all reads inside this process's device bounds
        lo = int(bounds[p * (n_dev // 2)])
        hi = int(bounds[(p + 1) * (n_dev // 2)])
        for lb, ub in read_log:
            assert lo <= lb and ub <= hi, (p, lb, ub, lo, hi)
        all_ranges.extend(read_log)
        partials.append(part)

    # coverage: the two processes' reads tile [0, n) without overlap
    all_ranges.sort()
    cur = 0
    for lb, ub in all_ranges:
        assert lb == cur
        cur = ub
    assert cur == n

    want = np.zeros((d, s))
    for j in range(n):
        want[:, groups[j]] += dense[:, j]
    np.testing.assert_allclose(partials[0] + partials[1], want, rtol=1e-5)


def test_bge_phase1_dp_sharded_matches_unsharded():
    """fit_bge(mesh=...) shards the [P, D] planes over dp and replicates
    the feature side; with row padding to the dp size the padded rows
    carry zero counts + zero mass, so the fit must match the unsharded
    run up to reduction-order float noise."""
    from legume_tpu.embedding.nce import NceConfig, fit_bge

    rng = np.random.default_rng(3)
    p, d, k = 37, 60, 3  # p NOT divisible by 8: exercises row padding
    beta = np.full((k, d), 0.2)
    for t in range(k):
        beta[t, t * 20 : (t + 1) * 20] = 3.0
    pb_counts = rng.poisson(beta[np.arange(p) % k] * 20).astype(np.float32)

    cfg = NceConfig(embedding_dim=6, epochs=200, learning_rate=0.05, seed=7)
    plain = fit_bge([pb_counts], config=cfg)
    mesh = make_mesh()  # 8 virtual devices on dp
    sharded = fit_bge([pb_counts], config=cfg, mesh=mesh)

    assert sharded.pb_embeddings[0].shape == (p, 6)  # padding sliced off
    np.testing.assert_allclose(
        sharded.e_feat, plain.e_feat, atol=5e-3
    )
    np.testing.assert_allclose(
        sharded.pb_embeddings[0], plain.pb_embeddings[0], atol=5e-3
    )
    assert abs(sharded.phase1_losses[-1] - plain.phase1_losses[-1]) < 1e-3


def test_mixed_trainer_dp_sharded_matches_unsharded():
    """MixedTrainer(mesh=...) dp-shards each level's padded rows and
    replicates params/opt state; identical PRNG stream -> the fit must
    match the unsharded trainer up to reduction-order float noise."""
    from legume_tpu.models.decoders import NbTopicDecoder
    from legume_tpu.models.encoders import LogSoftmaxEncoder
    from legume_tpu.models.train import LevelData, MixedTrainer, TrainConfig

    rng = np.random.default_rng(5)
    p, d, k = 53, 40, 4  # p NOT divisible by 8: exercises dp row padding
    x = rng.poisson(2.0, (p, d)).astype(np.float32)
    lvl = [LevelData(input=x, input_null=None)]
    cfg = TrainConfig(epochs=20, minibatch_size=16, learning_rate=0.01, seed=3)

    def fit(mesh):
        enc = LogSoftmaxEncoder(n_topics=k, layers=(16,))
        dec = NbTopicDecoder(n_features=d, n_topics=k)
        trainer = MixedTrainer(enc, [dec], cfg, mesh=mesh)
        variables, _, scores = trainer.train(lvl, jax.random.key(11))
        z = trainer.encode(variables, x)
        return z, scores

    z_plain, s_plain = fit(None)
    z_dp, s_dp = fit(make_mesh())

    assert z_dp.shape == (p, k)
    np.testing.assert_allclose(z_dp, z_plain, atol=2e-3)
    np.testing.assert_allclose(
        s_dp.llik[-1], s_plain.llik[-1], rtol=1e-4, atol=1e-4
    )
