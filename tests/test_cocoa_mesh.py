"""cocoa dp over the virtual 8-device mesh: the match-cache build
shards the query axis, the replay collector shards the EXPOSURE
(permutation) axis — the mesh analog of the reference's rayon
permutation loop (`cocoa/src/run_diff.rs:361`). Equality against the
single-device path on every sufficient-stat plane, plus the persisted
match cache roundtrip."""

import numpy as np
import pytest

from legume_tpu.cocoa.collapse import (
    MatchCache,
    build_match_cache,
    collect_cocoa_stat_multi,
    load_match_cache,
    match_cache_file,
    match_cache_key,
    save_match_cache,
)
from legume_tpu.cocoa.sim import simulate_one
from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.ops import random_projection as rp
from legume_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup():
    sim = simulate_one(
        n_genes=60, n_indv=8, cells_per_indv=30, n_causal=8,
        pve_exposure_gene=0.5, depth=2000, seed=11,
    )
    be = MemoryBackend(sim.counts)
    _, proj_kn = rp.project_columns(be, 12, seed=1)
    proj_nk = proj_kn.T.copy()
    n = sim.counts.shape[1]
    rng = np.random.default_rng(0)
    z = rng.dirichlet(np.ones(3), size=n).astype(np.float32)
    pb = (np.arange(n) % 4).astype(np.int64)
    cache = build_match_cache(proj_nk, sim.cell_indv, 8, knn=4)
    rng2 = np.random.default_rng(7)
    perms = [rng2.permutation(sim.exposure) for _ in range(5)]
    exposures_ti = np.stack([sim.exposure] + perms)  # T=6: pads to 8
    return sim, be, proj_nk, z, pb, cache, exposures_ti


def test_match_cache_mesh_matches_single_device(setup):
    sim, _, proj_nk, *_ = setup
    mesh = make_mesh(8)
    a = build_match_cache(proj_nk, sim.cell_indv, 8, knn=4)
    b = build_match_cache(proj_nk, sim.cell_indv, 8, knn=4, mesh=mesh)
    np.testing.assert_array_equal(a.idx, b.idx)
    np.testing.assert_allclose(a.dist, b.dist, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(a.valid, b.valid)


def test_replay_collector_mesh_matches_single_device(setup):
    sim, be, _, z, pb, cache, exposures_ti = setup
    mesh = make_mesh(8)
    ref = collect_cocoa_stat_multi(
        be, z, sim.cell_indv, pb, 4, exposures_ti, cache
    )
    got = collect_cocoa_stat_multi(
        be, z, sim.cell_indv, pb, 4, exposures_ti, cache, mesh=mesh
    )
    assert len(ref) == len(got) == exposures_ti.shape[0]
    for s_ref, s_got in zip(ref, got):
        for plane in ("y1_sum_kdp", "y0_sum_kdp", "y1_sum_kdi",
                      "size_kp", "size_kip"):
            np.testing.assert_allclose(
                getattr(s_got, plane), getattr(s_ref, plane),
                rtol=2e-4, atol=1e-4, err_msg=plane,
            )


def test_replay_collector_mesh_uneven_t_chunking(setup):
    # T=6 over 8 devices with a forced t_chunk smaller than n_dev:
    # chunks pad with exposure-0 replays that must NOT leak into output
    sim, be, _, z, pb, cache, exposures_ti = setup
    mesh = make_mesh(8)
    ref = collect_cocoa_stat_multi(
        be, z, sim.cell_indv, pb, 4, exposures_ti, cache
    )
    got = collect_cocoa_stat_multi(
        be, z, sim.cell_indv, pb, 4, exposures_ti, cache, mesh=mesh,
        t_chunk=3,
    )
    assert len(got) == exposures_ti.shape[0]
    for s_ref, s_got in zip(ref, got):
        np.testing.assert_allclose(
            s_got.y0_sum_kdp, s_ref.y0_sum_kdp, rtol=2e-4, atol=1e-4
        )


def test_match_cache_persistence_roundtrip(tmp_path, setup):
    sim, _, proj_nk, *_ = setup
    cache = build_match_cache(proj_nk, sim.cell_indv, 8, knn=4)
    key = match_cache_key(len(sim.cell_indv), 4, 8, 12, 42, sim.cell_indv)
    path = match_cache_file(str(tmp_path), key)
    save_match_cache(cache, path)
    got = load_match_cache(path)
    assert isinstance(got, MatchCache)
    np.testing.assert_array_equal(got.idx, cache.idx)
    np.testing.assert_allclose(got.dist, cache.dist)
    np.testing.assert_array_equal(got.valid, cache.valid)
    np.testing.assert_array_equal(got.matched_indv, cache.matched_indv)
    # a different knn yields a different key -> no false reuse
    other = match_cache_key(len(sim.cell_indv), 5, 8, 12, 42, sim.cell_indv)
    assert other != key
    assert load_match_cache(match_cache_file(str(tmp_path), other)) is None


def test_knn_search_mesh_and_tail_padding():
    from legume_tpu.ops.knn import knn_search

    rng = np.random.default_rng(3)
    pts = rng.normal(size=(203, 9)).astype(np.float32)
    q = rng.normal(size=(77, 9)).astype(np.float32)
    d_ref, i_ref = knn_search(q, pts, 6, chunk=32)  # tail chunk pads
    d_one, i_one = knn_search(q, pts, 6, chunk=4096)
    np.testing.assert_array_equal(i_ref, i_one)
    np.testing.assert_allclose(d_ref, d_one, rtol=1e-5, atol=1e-6)
    mesh = make_mesh(8)
    d_m, i_m = knn_search(q, pts, 6, chunk=32, mesh=mesh)
    np.testing.assert_array_equal(i_m, i_one)
    np.testing.assert_allclose(d_m, d_one, rtol=1e-5, atol=1e-6)
