"""CoCoA counterfactual DE tests — synthetic recovery under the
simulate-one DAG (reference pattern 3; `cocoa/README.md` null/causal
DAGs)."""

import numpy as np
import pytest

from legume_tpu.cocoa.collapse import build_match_cache, collect_cocoa_stat
from legume_tpu.cocoa.sim import simulate_one
from legume_tpu.cocoa.stat import (
    compute_exposure_contrast,
    estimate_parameters,
    remove_exposure_effect_from_topic_proportions,
    z_to_pvalue,
)
from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.ops import random_projection as rp


@pytest.fixture(scope="module")
def cocoa_setup():
    sim = simulate_one(
        n_genes=80, n_indv=12, cells_per_indv=40, n_causal=10,
        pve_exposure_gene=0.6, depth=4000, seed=3,
    )
    be = MemoryBackend(sim.counts)
    _, proj_kn = rp.project_columns(be, 16, seed=1)
    proj_nk = proj_kn.T.copy()
    n = sim.counts.shape[1]
    z = np.ones((n, 1), np.float32)
    pb = (np.arange(n) % 4).astype(np.int64)
    cache = build_match_cache(proj_nk, sim.cell_indv, 12, knn=5)
    stat = collect_cocoa_stat(be, z, sim.cell_indv, pb, 4, sim.exposure, cache)
    return sim, be, z, pb, cache, stat


def test_match_cache_respects_individuals(cocoa_setup):
    sim, _, _, _, cache, _ = cocoa_setup
    # matches never come from the query's own individual
    own = sim.cell_indv[:, None] == cache.matched_indv
    assert not np.any(own & cache.valid)


def test_cocoa_stat_shapes_and_mass(cocoa_setup):
    sim, be, z, pb, cache, stat = cocoa_setup
    d, n = sim.counts.shape
    assert stat.y1_sum_kdp.shape == (1, d, 4)
    assert stat.y0_sum_kdp.shape == (1, d, 4)
    assert stat.y1_sum_kdi.shape == (1, d, 12)
    # every cell has at least one opposite-exposure match here, so y1
    # mass equals total counts
    np.testing.assert_allclose(
        stat.y1_sum_kdp.sum(), sim.counts.sum(), rtol=1e-4
    )
    np.testing.assert_allclose(stat.size_kp.sum(), n, rtol=1e-6)
    np.testing.assert_allclose(stat.size_kip.sum(), n, rtol=1e-6)
    assert stat.y0_sum_kdp.sum() > 0


def test_cocoa_recovers_causal_genes(cocoa_setup):
    sim, _, _, _, _, stat = cocoa_setup
    params = estimate_parameters(stat, n_opt_iter=60)
    effect = compute_exposure_contrast(params, sim.exposure)
    assert np.all(np.isfinite(effect))
    # signed effects should correlate with true beta on causal genes
    causal = sim.causal_genes
    corr = np.corrcoef(effect[causal], sim.beta[causal])[0, 1]
    assert corr > 0.5, corr
    # causal genes should have larger |effect| than null genes
    assert np.abs(effect[causal]).mean() > 2.0 * np.abs(effect[~causal]).mean()


def test_permutation_replay_changes_effect(cocoa_setup):
    sim, be, z, pb, cache, stat = cocoa_setup
    params = estimate_parameters(stat, n_opt_iter=30)
    effect = compute_exposure_contrast(params, sim.exposure)
    rng = np.random.default_rng(0)
    perm = rng.permutation(sim.exposure)
    stat_p = collect_cocoa_stat(be, z, sim.cell_indv, pb, 4, perm, cache)
    params_p = estimate_parameters(stat_p, n_opt_iter=30)
    effect_p = compute_exposure_contrast(params_p, perm)
    causal = sim.causal_genes
    # permuted effects should be much weaker on causal genes
    assert np.abs(effect[causal]).mean() > 1.5 * np.abs(effect_p[causal]).mean()


def test_collider_fix_removes_group_shift():
    rng = np.random.default_rng(1)
    n, k, n_indv = 400, 3, 8
    cell_indv = np.repeat(np.arange(n_indv), n // n_indv)
    exposure = (np.arange(n_indv) % 2).astype(np.int64)
    z = rng.dirichlet(np.ones(k), size=n).astype(np.float32)
    # inject an exposure-driven composition shift
    z[exposure[cell_indv] == 1, 0] *= 3.0
    z /= z.sum(1, keepdims=True)
    z_adj, max_shift = remove_exposure_effect_from_topic_proportions(
        z, cell_indv, exposure
    )
    z_adj /= z_adj.sum(1, keepdims=True)
    # per-individual mean log proportions should now be balanced
    def group_gap(zz):
        lz = np.log(np.maximum(zz, 1e-30))
        m1 = lz[exposure[cell_indv] == 1].mean(0)
        m0 = lz[exposure[cell_indv] == 0].mean(0)
        return np.abs(m1 - m0).max()

    assert group_gap(z_adj) < 0.3 * group_gap(z)
    assert max_shift.max() > 0


def test_z_to_pvalue():
    np.testing.assert_allclose(z_to_pvalue(np.asarray([0.0])), 1.0)
    np.testing.assert_allclose(z_to_pvalue(np.asarray([1.96])), 0.05, atol=5e-3)


def test_collider_sim_has_collider_structure():
    from legume_tpu.cocoa.sim import simulate_collider

    sim = simulate_collider(n_genes=60, n_indv=12, cells_per_indv=40, seed=2)
    assert sim.counts.shape == (60, 480)
    assert sim.cell_type.max() < 3
    # exposure shifts cell-type composition (the X -> A edge)
    comp = np.zeros((2, 3))
    for xval in (0, 1):
        cells = sim.exposure[sim.cell_indv] == xval
        comp[xval] = np.bincount(sim.cell_type[cells], minlength=3) / max(cells.sum(), 1)
    assert np.abs(comp[1] - comp[0]).max() > 0.05


def test_multi_replay_matches_single_collect(cocoa_setup):
    """collect_cocoa_stat_multi (one gathered pass, device scan over
    exposure assignments) reproduces per-exposure collect_cocoa_stat
    on every plane, including the observed row and size stats."""
    from legume_tpu.cocoa.collapse import collect_cocoa_stat_multi

    sim, be, z, pb, cache, stat = cocoa_setup
    rng = np.random.default_rng(7)
    perms = [rng.permutation(sim.exposure) for _ in range(2)]
    exposures_ti = np.stack([sim.exposure] + perms)
    stats = collect_cocoa_stat_multi(
        be, z, sim.cell_indv, pb, 4, exposures_ti, cache, cell_block=256
    )
    assert len(stats) == 3
    singles = [stat] + [
        collect_cocoa_stat(be, z, sim.cell_indv, pb, 4, e, cache)
        for e in perms
    ]
    for got, want in zip(stats, singles):
        np.testing.assert_allclose(got.y1_sum_kdp, want.y1_sum_kdp, rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(got.y0_sum_kdp, want.y0_sum_kdp, rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(got.y1_sum_kdi, want.y1_sum_kdi, rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(got.size_kp, want.size_kp, rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(got.size_kip, want.size_kip, rtol=2e-4, atol=1e-3)


def test_multi_replay_grouped_dispatch_equality(cocoa_setup):
    """r5 grouped-dispatch path (G blocks scanned inside one program;
    the dispatch-count fix for the proxy host-pool ratchet): tiny
    cell_block forces many FULL blocks through _acc/_apply_blocks
    _grouped plus a ragged tail through the single-block fns — the
    stats must match the one-block-per-call run exactly."""
    from legume_tpu.cocoa.collapse import collect_cocoa_stat_multi

    sim, be, z, pb, cache, stat = cocoa_setup
    rng = np.random.default_rng(3)
    perms = [rng.permutation(sim.exposure) for _ in range(2)]
    exposures_ti = np.stack([sim.exposure] + perms)
    n = z.shape[0]
    want = collect_cocoa_stat_multi(
        be, z, sim.cell_indv, pb, 4, exposures_ti, cache, cell_block=n
    )
    # 32-cell blocks: n // 32 full blocks group (default G=8) + tail
    got = collect_cocoa_stat_multi(
        be, z, sim.cell_indv, pb, 4, exposures_ti, cache, cell_block=32
    )
    assert n // 32 >= 2  # the grouped path actually engages
    for g, w in zip(got, want):
        np.testing.assert_allclose(g.y0_sum_kdp, w.y0_sum_kdp, rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(g.y1_sum_kdp, w.y1_sum_kdp, rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(g.y1_sum_kdi, w.y1_sum_kdi, rtol=2e-4, atol=1e-3)
        np.testing.assert_allclose(g.size_kp, w.size_kp, rtol=2e-4, atol=1e-3)
