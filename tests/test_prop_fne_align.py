"""pinto prop/dsvd, senna fne, and shared-row alignment tests."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.data.vec import read_data_on_shared_rows
from legume_tpu.pinto.prop import edge_prop_clustering, pair_dsvd
from legume_tpu.senna.fne import fit_fne


def test_shared_row_union_alignment():
    a = MemoryBackend(
        sp.csc_matrix(np.arange(6, dtype=np.float32).reshape(2, 3)),
        row_names=["g1", "g2"],
    )
    b = MemoryBackend(
        sp.csc_matrix(np.ones((2, 2), np.float32) * 7),
        row_names=["g2", "g3"],
    )
    vec = read_data_on_shared_rows([a, b], mode="union")
    assert vec.row_names() == ["g1", "g2", "g3"]
    assert vec.shape == (3, 5)
    dense = vec.read_columns_dense(np.arange(5))
    # backend a has no g3 -> zeros; backend b has no g1 -> zeros
    np.testing.assert_allclose(dense[2, :3], 0.0)
    np.testing.assert_allclose(dense[0, 3:], 0.0)
    np.testing.assert_allclose(dense[1, 3:], 7.0)

    inter = read_data_on_shared_rows([a, b], mode="intersection")
    assert inter.row_names() == ["g2"]


def test_fne_embeds_communities():
    # two cliques loosely connected: embeddings should separate them
    edges = []
    for grp, nodes in enumerate([list("abcde"), list("vwxyz")]):
        for i, u in enumerate(nodes):
            for v in nodes[i + 1 :]:
                edges.append((u, v, 5.0))
    edges.append(("a", "v", 0.5))
    res = fit_fne(edges, embedding_dim=4, epochs=400, seed=0)
    assert res.embedding.shape == (10, 4)
    e = res.embedding / np.maximum(
        np.linalg.norm(res.embedding, axis=1, keepdims=True), 1e-9
    )
    idx = {n: i for i, n in enumerate(res.names)}
    within = np.mean([e[idx["a"]] @ e[idx[x]] for x in "bcde"])
    across = np.mean([e[idx["a"]] @ e[idx[x]] for x in "vwxyz"])
    assert within > across + 0.3, (within, across)


@pytest.fixture(scope="module")
def spatial_backend():
    rng = np.random.default_rng(0)
    n_per, d = 150, 40
    coords = np.concatenate(
        [rng.uniform(0, 1, (n_per, 2)), rng.uniform([2, 0], [3, 1], (n_per, 2))]
    )
    dom = np.repeat([0, 1], n_per)
    beta = np.full((2, d), 0.3)
    beta[0, : d // 2] = 3.0
    beta[1, d // 2 :] = 3.0
    y = rng.poisson(beta[dom] * 5).astype(np.float32).T
    return MemoryBackend(sp.csc_matrix(y)), coords, dom


def test_edge_prop_clustering(spatial_backend):
    be, coords, dom = spatial_backend
    labels, edges, prop = edge_prop_clustering(
        be, coords, method="kmeans", n_clusters=4, proj_dim=12, knn=6
    )
    assert prop.shape == (300, 4)
    np.testing.assert_allclose(prop.sum(1), 1.0, rtol=1e-4)
    # dominant edge community aligns with spatial domain
    top = prop.argmax(1)
    acc = 0
    for c in np.unique(top):
        cells = top == c
        acc += np.bincount(dom[cells]).max()
    assert acc / 300 > 0.9


def test_pair_dsvd_shapes(spatial_backend):
    be, coords, _ = spatial_backend
    factors, shared_basis, diff_basis, edges = pair_dsvd(be, coords, rank=6, knn=5)
    assert factors.shape == (len(edges), 6)
    assert shared_basis.shape == (6, 40)
    assert diff_basis.shape == (6, 40)
    assert np.all(np.isfinite(factors))


def test_cage_embeds_spatial_domains(spatial_backend):
    from legume_tpu.pinto.cage import fit_cage

    be, coords, dom = spatial_backend
    res = fit_cage(
        be, coords, embedding_dim=6, knn=6, proj_dim=10, epochs=300, seed=3
    )
    assert res.embedding.shape == (300, 6)
    e = res.embedding / np.maximum(
        np.linalg.norm(res.embedding, axis=1, keepdims=True), 1e-9
    )
    # a graph embedding promises LOCAL structure: connected pairs are
    # far more similar than random pairs
    rng2 = np.random.default_rng(0)
    edge_sim = (e[res.edges[:, 0]] * e[res.edges[:, 1]]).sum(1).mean()
    ri = rng2.integers(0, 300, 2000)
    rj = rng2.integers(0, 300, 2000)
    rand_sim = (e[ri] * e[rj]).sum(1)[ri != rj].mean()
    assert edge_sim > rand_sim + 0.3, (edge_sim, rand_sim)
    # and the activity gate kept a same-program edge majority
    same_edge = dom[res.edges[:, 0]] == dom[res.edges[:, 1]]
    assert same_edge.mean() > 0.9
