"""Indexed top-K masked topic model tests (masked_topic path;
SURVEY.md section 2.4 indexed subsystem)."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.models.indexed import (
    IndexedData,
    MaskedTopicModel,
    MaskedTrainConfig,
    build_topk_windows,
    encode_all,
    train_masked,
)


@pytest.fixture(scope="module")
def topic_backend():
    rng = np.random.default_rng(0)
    d, n, k = 100, 400, 3
    beta = rng.dirichlet(np.ones(d) * 0.1, size=k)
    topic = np.arange(n) % k
    lam = 200.0 * beta[topic]
    y = rng.poisson(lam).astype(np.float32)
    return MemoryBackend(sp.csc_matrix(y.T)), topic


def test_topk_windows(topic_backend):
    be, _ = topic_backend
    data = build_topk_windows(be, 16, block_size=128)
    assert data.ids.shape == (400, 16)
    dense = be.read_columns_dense(np.arange(400)).T
    # window values match the true top counts per cell
    for j in [0, 57, 399]:
        row = dense[j]
        valid = data.ids[j] < 100
        np.testing.assert_allclose(
            np.sort(data.vals[j][valid])[::-1],
            np.sort(row[np.argsort(-row)[: valid.sum()]])[::-1],
            rtol=1e-5,
        )
    assert np.isfinite(data.log_q).all()


def test_masked_training_and_latent(topic_backend):
    be, topic = topic_backend
    data = build_topk_windows(be, 16, block_size=128)
    model = MaskedTopicModel(n_genes=100, n_topics=3, embed_dim=16, hidden=32)
    variables, trace = train_masked(
        model, data,
        MaskedTrainConfig(epochs=60, minibatch=100, learning_rate=3e-3, union_size=128),
    )
    assert trace[-1] < trace[0], trace[:3] + trace[-3:]
    log_theta = encode_all(model, variables, data)
    assert np.all(np.isfinite(log_theta))
    np.testing.assert_allclose(np.exp(log_theta).sum(-1), 1.0, rtol=1e-3)
    # latent centroids differ across true topics
    theta = np.exp(log_theta)
    cent = np.stack([theta[topic == t].mean(0) for t in range(3)])
    spread = np.linalg.norm(cent[:, None] - cent[None, :], axis=-1)
    assert spread[np.triu_indices(3, 1)].mean() > 0.05
