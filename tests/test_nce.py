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
