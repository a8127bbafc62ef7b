"""Joint-embedding NCE engine tests: topic-structured pseudobulks must
yield feature embeddings that separate the topic programs, and phase-2
cell embeddings must cluster by topic (reference pattern 3)."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.embedding.nce import NceConfig, fit_bge


@pytest.fixture(scope="module")
def structured():
    rng = np.random.default_rng(0)
    d, n_pb, k = 120, 40, 3
    # pb-level topic structure: each pb dominated by one program
    beta = np.full((k, d), 0.2)
    for t in range(k):
        beta[t, t * 40 : (t + 1) * 40] = 3.0
    pb_topic = np.arange(n_pb) % k
    pb_counts = rng.poisson(beta[pb_topic] * 20).astype(np.float32)

    # cells from the same programs
    n_cells = 300
    cell_topic = np.arange(n_cells) % k
    y = rng.poisson(beta[cell_topic] * 10).astype(np.float32)  # [N, D]
    be = MemoryBackend(sp.csc_matrix(y.T))
    return pb_counts, be, pb_topic, cell_topic


def test_bge_phase1_loss_decreases(structured):
    pb_counts, _, _, _ = structured
    res = fit_bge(
        [pb_counts],
        config=NceConfig(embedding_dim=8, epochs=300, learning_rate=0.05),
    )
    assert res.phase1_losses[-1] < res.phase1_losses[0]
    assert res.e_feat.shape == (120, 8)
    assert np.all(np.isfinite(res.e_feat))


def test_bge_feature_embeddings_separate_programs(structured):
    pb_counts, be, pb_topic, cell_topic = structured
    res = fit_bge(
        [pb_counts],
        data=be,
        config=NceConfig(
            embedding_dim=8, epochs=500, learning_rate=0.05, phase2_epochs=150
        ),
    )
    # program-mean feature embeddings should be mutually distant
    prog = np.stack([res.e_feat[t * 40 : (t + 1) * 40].mean(0) for t in range(3)])
    prog_n = prog / np.maximum(np.linalg.norm(prog, axis=1, keepdims=True), 1e-9)
    cos = prog_n @ prog_n.T
    off = cos[np.triu_indices(3, 1)]
    assert np.all(off < 0.9), cos

    # phase-2 cell embeddings cluster by topic: nearest-centroid accuracy
    e = res.e_cell / np.maximum(np.linalg.norm(res.e_cell, axis=1, keepdims=True), 1e-9)
    cent = np.stack([e[cell_topic == t].mean(0) for t in range(3)])
    pred = (e @ cent.T).argmax(1)
    acc = (pred == cell_topic).mean()
    assert acc > 0.9, acc


def test_bge_multilevel_axes(structured):
    pb_counts, _, _, _ = structured
    coarse = pb_counts[:10]
    res = fit_bge(
        [pb_counts, coarse],
        config=NceConfig(embedding_dim=4, epochs=100),
    )
    assert len(res.pb_embeddings) == 2
    assert res.pb_embeddings[0].shape == (40, 4)
    assert res.pb_embeddings[1].shape == (10, 4)


def test_gene_chunked_phase1_matches_dense():
    """gene_chunk > 0 computes the SAME objective/gradients as the
    dense pass (chunk padding carries zero counts + zero q), so the
    fitted embeddings agree."""
    rng = np.random.default_rng(0)
    p, d, h = 30, 50, 6
    counts = rng.poisson(1.0, (p, d)).astype(np.float32)
    dense = fit_bge([counts], config=NceConfig(embedding_dim=h, epochs=150, seed=2))
    chunked = fit_bge(
        [counts],
        config=NceConfig(embedding_dim=h, epochs=150, seed=2, gene_chunk=16),
    )
    assert chunked.e_feat.shape == (d, h)
    # same seeds + same math -> near-identical trajectories
    np.testing.assert_allclose(chunked.e_feat, dense.e_feat, atol=2e-3)
    np.testing.assert_allclose(
        chunked.pb_embeddings[0], dense.pb_embeddings[0], atol=2e-3
    )


def test_bge_stratified_negatives_suppress_batch_axis():
    """Batch-stratified negatives (loss/mod.rs:4-8): a purely technical
    batch signature — genes elevated in batch-1 rows across ALL
    programs — should earn much less embedding signal under per-batch
    marginals than under the global marginal, because within a batch
    those genes are also the highest-probability negatives."""
    rng = np.random.default_rng(1)
    d, n_pb, k = 90, 60, 3
    beta = np.full((k, d), 0.2)
    for t in range(k):
        beta[t, t * 20 : (t + 1) * 20] = 3.0
    pb_topic = np.arange(n_pb) % k
    batches = (np.arange(n_pb) // (n_pb // 2)).astype(np.int32)  # 2 batches
    lam = beta[pb_topic] * 20
    lam[batches == 1, 60:90] *= 6.0  # technical genes, batch 1 only
    pb_counts = rng.poisson(lam).astype(np.float32)

    cfg = NceConfig(embedding_dim=8, epochs=400, learning_rate=0.05, seed=3)
    glob = fit_bge([pb_counts], config=cfg)
    strat = fit_bge([pb_counts], config=cfg, pb_batches=[batches])

    def batch_sep(res):
        # how linearly separable the batches are in the pb embedding:
        # distance between batch centroids / mean within-batch spread
        e = res.pb_embeddings[0]
        c0, c1 = e[batches == 0].mean(0), e[batches == 1].mean(0)
        spread = 0.5 * (
            np.linalg.norm(e[batches == 0] - c0, axis=1).mean()
            + np.linalg.norm(e[batches == 1] - c1, axis=1).mean()
        )
        return np.linalg.norm(c0 - c1) / max(spread, 1e-9)

    s_glob, s_strat = batch_sep(glob), batch_sep(strat)
    assert s_strat < 0.7 * s_glob, (s_glob, s_strat)

    # biology survives: program centroids still mutually distant
    prog = np.stack(
        [strat.e_feat[t * 20 : (t + 1) * 20].mean(0) for t in range(3)]
    )
    pn = prog / np.maximum(np.linalg.norm(prog, axis=1, keepdims=True), 1e-9)
    off = (pn @ pn.T)[np.triu_indices(3, 1)]
    assert np.all(off < 0.9), off


def test_bge_feature_qc_drops_flat_genes():
    """HVG feature QC (feature_qc.rs): flat housekeeping genes fall at/
    below the dispersion trend and get zero embedding rows; structured
    genes survive.  The majority guard keeps all genes when most would
    drop."""
    rng = np.random.default_rng(2)
    d_var, d_flat = 30, 70
    n_pb, k = 80, 3
    beta = np.full((k, d_var), 0.2)
    for t in range(k):
        beta[t, t * 10 : (t + 1) * 10] = 3.0
    pb_topic = np.arange(n_pb) % k
    var_part = rng.poisson(beta[pb_topic] * 20)
    # flat Poisson genes spanning a range of means anchor the trend at ~0
    flat_means = np.exp(rng.uniform(np.log(2), np.log(50), d_flat))
    flat_part = rng.poisson(np.tile(flat_means, (n_pb, 1)))
    counts = np.concatenate([var_part, flat_part], 1).astype(np.float32)

    res = fit_bge(
        [counts],
        config=NceConfig(embedding_dim=6, epochs=100, feature_qc=True),
    )
    norms = np.linalg.norm(res.e_feat, axis=1)
    # flat genes: mostly dropped (exactly zero rows)
    assert (norms[d_var:] == 0).mean() > 0.5, (norms[d_var:] == 0).mean()
    # structured genes: mostly kept
    assert (norms[:d_var] > 0).mean() > 0.8, (norms[:d_var] > 0).mean()

    # degenerate guard: all-flat data keeps everything rather than
    # dropping >=95% on trend-fit noise
    from legume_tpu.ops.gene_stats import hvg_feature_qc

    flat_only = rng.poisson(np.full((n_pb, 100), 5.0)).astype(np.float32)
    keep = hvg_feature_qc(flat_only)
    assert keep.all() or keep.mean() >= 0.05


def test_bge_bfloat16_compute_matches_f32_structure(structured):
    """compute_dtype="bfloat16" halves the [P, D]-plane HBM traffic (the
    TPU-idiomatic hot-loop dtype); params/optimizer/reductions stay f32,
    so the fitted structure must match the f32 run: same program
    separation, near-identical converged loss."""
    pb_counts, _, _, _ = structured
    cfg32 = NceConfig(embedding_dim=8, epochs=300, learning_rate=0.05, seed=5)
    cfg16 = NceConfig(
        embedding_dim=8, epochs=300, learning_rate=0.05, seed=5,
        compute_dtype="bfloat16",
    )
    r32 = fit_bge([pb_counts], config=cfg32)
    r16 = fit_bge([pb_counts], config=cfg16)
    assert r16.e_feat.dtype == np.float32  # outputs stay f32
    assert np.all(np.isfinite(r16.e_feat))
    # converged loss parity: bf16 rounding must not change the optimum
    assert abs(r16.phase1_losses[-1] - r32.phase1_losses[-1]) < 0.02, (
        r16.phase1_losses[-1], r32.phase1_losses[-1],
    )
    # same program geometry: per-program centroids separate identically
    def prog_cos(res):
        prog = np.stack(
            [res.e_feat[t * 40 : (t + 1) * 40].mean(0) for t in range(3)]
        )
        pn = prog / np.maximum(np.linalg.norm(prog, axis=1, keepdims=True), 1e-9)
        return (pn @ pn.T)[np.triu_indices(3, 1)]

    np.testing.assert_allclose(prog_cos(r16), prog_cos(r32), atol=0.1)
