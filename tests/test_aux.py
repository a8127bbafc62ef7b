"""Auxiliary subsystem tests: QC, UMAP, enrichment, gene stats."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data.qc import compute_cell_qc
from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.ops.enrichment import (
    annotate_by_markers,
    bh_fdr,
    enrichment_score,
    gsea_permutation_pvalue,
)
from legume_tpu.ops.gene_stats import (
    DispersionTrend,
    nb_fisher_weights,
    select_hvg_streaming,
    streaming_gene_stats,
)
from legume_tpu.ops.umap import init_2d_from_scores, pc_scores, umap


def test_cell_qc_stats():
    rng = np.random.default_rng(0)
    d, n = 30, 100
    y = rng.poisson(2.0, size=(d, n)).astype(np.float32)
    names = [f"g{i}" for i in range(d - 2)] + ["MT-CO1", "MT-ND1"]
    be = MemoryBackend(sp.csc_matrix(y), row_names=names)
    qc = compute_cell_qc(be, block_size=32)
    np.testing.assert_allclose(qc.total, y.sum(0), rtol=1e-5)
    np.testing.assert_allclose(qc.n_genes, (y > 0).sum(0), rtol=1e-5)
    want_mito = y[-2:].sum(0) / np.maximum(y.sum(0), 1)
    np.testing.assert_allclose(qc.mito_frac, want_mito, rtol=1e-4)
    keep = qc.keep_mask(min_total=1, nmads=5)
    assert keep.mean() > 0.8  # poisson data has few outliers
    assert "median_total" in qc.report()


def test_hvg_selects_variable_genes():
    rng = np.random.default_rng(1)
    d, n = 50, 400
    # baseline: mildly overdispersed genes at varied means, so the NB
    # dispersion trend has genuine support (the real-data regime)
    base_mu = rng.gamma(4.0, 1.0, size=(d, 1))
    lam = base_mu * rng.gamma(5.0, 0.2, size=(d, n))  # phi ~ 0.2
    hv = [3, 17, 40]
    # highly variable genes: strongly bimodal rates (excess dispersion)
    lam[hv] = base_mu[hv] * np.where(rng.random((len(hv), n)) < 0.5, 0.05, 4.0)
    y = rng.poisson(lam).astype(np.float32)
    be = MemoryBackend(sp.csc_matrix(y))
    stats = streaming_gene_stats(be, block_size=128)
    np.testing.assert_allclose(stats.mean, y.mean(1), rtol=1e-4)
    sel = select_hvg_streaming(be, 3, block_size=128)
    assert set(sel.tolist()) == set(hv), sel


def test_fisher_weights_downweight_housekeeping():
    rng = np.random.default_rng(2)
    d, n = 40, 300
    lam = np.full((d, n), 1.0)
    lam[:5] = 50.0  # high-mean overdispersed housekeeping
    y = rng.poisson(lam * rng.gamma(2, 0.5, size=(d, n))).astype(np.float32)
    be = MemoryBackend(sp.csc_matrix(y))
    w = nb_fisher_weights(be)
    assert w.shape == (d,)
    assert np.all((w > 0) & (w <= 1))
    assert w[:5].mean() < w[5:].mean()  # housekeeping downweighted


def test_dispersion_trend_poisson_limit():
    # pure Poisson data -> phi_hat <= 0 mostly -> trend ~ 0 dispersion
    rng = np.random.default_rng(3)
    mu = rng.gamma(3, 1, 200)
    var = mu.copy()  # Poisson: var = mean
    t = DispersionTrend.fit(mu, var)
    assert np.all(t.phi_at(mu) < 1e-3) or t.num_fit < 2


def test_umap_separates_clusters():
    rng = np.random.default_rng(4)
    a = rng.normal(0, 0.3, size=(100, 5))
    b = rng.normal(4, 0.3, size=(100, 5))
    x = np.concatenate([a, b]).astype(np.float32)
    emb = umap(x, n_neighbors=10, n_epochs=60, seed=0)
    assert emb.shape == (200, 2)
    assert np.all(np.isfinite(emb))
    ca, cb = emb[:100].mean(0), emb[100:].mean(0)
    within = np.linalg.norm(emb[:100] - ca, axis=1).mean()
    between = np.linalg.norm(ca - cb)
    assert between > 2.0 * within, (between, within)


def test_enrichment_score_sign():
    rng = np.random.default_rng(5)
    scores = rng.normal(size=200)
    mask = np.zeros(200)
    top = np.argsort(-scores)[:20]
    mask[top] = 1.0  # set = top-scoring genes -> strongly positive ES
    es = enrichment_score(scores, mask)
    assert es > 0.5
    es_rand = enrichment_score(scores, rng.permutation(mask))
    assert abs(es_rand) < abs(es)


def test_gsea_permutation_pvalue():
    rng = np.random.default_rng(6)
    scores = rng.normal(size=150)
    mask = np.zeros(150)
    mask[np.argsort(-scores)[:15]] = 1.0
    es, nes, p = gsea_permutation_pvalue(scores, mask, n_permutations=200, seed=0)
    assert p < 0.05
    mask_r = np.zeros(150)
    mask_r[rng.choice(150, 15, replace=False)] = 1.0
    _, _, p_r = gsea_permutation_pvalue(scores, mask_r, n_permutations=200, seed=0)
    assert p_r > 0.05


def test_bh_fdr_monotone():
    p = np.asarray([0.001, 0.01, 0.02, 0.5, 0.9])
    q = bh_fdr(p)
    assert np.all(q >= p - 1e-12)
    assert q[0] < 0.01 and q[-1] > 0.8


def test_annotate_by_markers():
    genes = ["CD3D", "CD3E", "MS4A1", "CD79A", "LYZ", "CD14"]
    profiles = np.asarray(
        [
            [5.0, 4.0, 0.1, 0.1, 0.2, 0.1],  # T cells
            [0.1, 0.2, 6.0, 5.0, 0.1, 0.1],  # B cells
            [0.2, 0.1, 0.1, 0.2, 7.0, 6.0],  # monocytes
        ]
    )
    markers = {
        "T cell": ["CD3D", "CD3E"],
        "B cell": ["MS4A1", "CD79A"],
        "Monocyte": ["LYZ", "CD14"],
    }
    labels, scores = annotate_by_markers(profiles, genes, markers)
    assert labels == ["T cell", "B cell", "Monocyte"]


def test_cell_annotations_and_frozen_features(tmp_path):
    """auxiliary-data parity: cell -> individual loader with aligned
    output (cell_annotations.rs), frozen-feature intersection with
    composite-name resolution (frozen_features.rs), bundled panel."""
    import pandas as pd

    from legume_tpu.data.knowledge import (
        bundled_panel,
        load_frozen_features,
        read_cell_annotations,
    )

    f = tmp_path / "ann.tsv"
    f.write_text("#hdr\ncellA\tind1\ncellB\tind2\ncellC\tind1\n")
    ann = read_cell_annotations(str(f))
    assert ann.individual_ids == ["ind1", "ind2"]
    out = ann.to_column_aligned(["cellB", "cellX", "cellA"], missing="NA")
    assert out == ["ind2", "NA", "ind1"]

    emb = tmp_path / "fe.parquet"
    pd.DataFrame(
        {
            "gene": ["ENSG000001_TGFB1", "CD19", "ACTB"],
            "h0": [1.0, 2.0, 3.0],
            "h1": [4.0, 5.0, 6.0],
        }
    ).to_parquet(emb)
    ff = load_frozen_features(str(emb), ["tgfb1", "MS4A1", "cd19"])
    # TGFB1 resolves through the composite name; MS4A1 is unmatched
    assert ff.keep_target_indices.tolist() == [0, 2]
    np.testing.assert_allclose(ff.e_feat[:, 0], [1.0, 2.0])
    assert ff.h == 2

    panel = bundled_panel("blood")
    assert "CD3D" in panel["markers"]["T_cell"]
    assert panel["label_cl"]["NK_cell"].startswith("CL:")


def test_masked_topic_frozen_rho_stays_fixed(tmp_path):
    """--frozen-features pins matched rho rows across training."""
    import scipy.sparse as sp

    from legume_tpu.data.sparse_io import MemoryBackend
    from legume_tpu.models.indexed import (
        MaskedTopicModel, MaskedTrainConfig, build_topk_windows, train_masked,
    )

    rng = np.random.default_rng(0)
    d, n = 40, 200
    dense = rng.poisson(1.5, (d, n)).astype(np.float32)
    vec = MemoryBackend(sp.csc_matrix(dense))
    data = build_topk_windows(vec, 16)
    h = 8
    init = 0.1 * rng.standard_normal((d + 1, h)).astype(np.float32)
    mask = np.zeros(d + 1, np.float32)
    mask[:20] = 1.0  # first 20 genes frozen
    model = MaskedTopicModel(n_genes=d, n_topics=3, embed_dim=h)
    variables, _, _ = train_masked(
        model, data,
        MaskedTrainConfig(
            epochs=5, minibatch=64,
            frozen_rho_init=init, frozen_rho_mask=mask,
        ),
    )
    rho = np.asarray(variables["params"]["rho"])
    np.testing.assert_allclose(rho[:20], init[:20], atol=1e-6)
    assert np.abs(rho[20:d] - init[20:d]).max() > 1e-4  # unmatched trained


def test_stratified_null_kills_abundance_bias():
    """qmatrix with stratify=True: a panel of high-abundance but
    otherwise RANDOM genes must not look enriched, while the uniform
    null inflates it (gene_strata.rs / GOseq fix)."""
    from legume_tpu.ops.enrichment import geneset_topic_qmatrix

    rng = np.random.default_rng(0)
    k, d = 3, 400
    # abundance spans 4 orders of magnitude; topics share it
    abundance = 10 ** rng.uniform(-2, 2, d)
    beta = np.log(abundance[None, :] * rng.uniform(0.8, 1.2, (k, d)))
    genes = [f"g{i}" for i in range(d)]
    top = np.argsort(-abundance)[:80]
    panel = {"abundant_random": [genes[i] for i in rng.choice(top, 25, replace=False)]}
    q_u = geneset_topic_qmatrix(
        beta, genes, panel, n_perm=200, stratify=False, seed=1
    )
    q_s = geneset_topic_qmatrix(
        beta, genes, panel, n_perm=200, stratify=True, seed=1
    )
    # uniform null: strongly inflated; stratified: calibrated
    assert np.abs(q_u["z"]).max() > 3.0, q_u["z"]
    assert np.abs(q_s["z"]).max() < 2.5, q_s["z"]


def test_marker_bootstrap_support_and_abstention():
    from legume_tpu.ops.enrichment import UNASSIGNED_LABEL, marker_bootstrap

    rng = np.random.default_rng(1)
    d = 120
    genes = [f"g{i}" for i in range(d)]
    prof = rng.normal(0, 0.2, (2, d))
    # cluster 0: strong coherent signal for label A's whole panel
    prof[0, :10] += 3.0
    sets = {
        "A": genes[:10],
        # B's panel: one huge-outlier gene + junk — unstable under
        # with-replacement resampling
        "B": [genes[50]] + genes[100:115],
    }
    prof[1, 50] += 6.0
    out = marker_bootstrap(
        prof, genes, sets, n_boot=60, support_threshold=0.9, seed=2
    )
    assert out["base_annotation"][0] == "A"
    assert out["annotation"][0] == "A"
    assert out["cluster_label_support"][0] > 0.9
    # cluster 1's call rides one gene: support collapses, abstains
    assert out["cluster_label_support"][1] < 0.9
    assert out["annotation"][1] == UNASSIGNED_LABEL


def test_compute_specificity_modes():
    from legume_tpu.ops.enrichment import compute_specificity

    p = np.asarray([[1.0, 3.0], [-2.0, 2.0], [0.0, 0.0]])
    raw = compute_specificity(p, "raw")
    np.testing.assert_allclose(raw, p)
    sx = compute_specificity(p, "simplex")
    np.testing.assert_allclose(sx[0], [0.25, 0.75])
    np.testing.assert_allclose(sx[1], [0.0, 1.0])  # negatives clipped
    np.testing.assert_allclose(sx[2], [0.0, 0.0])  # zero row stays zero
    ab = compute_specificity(p, "abs")
    np.testing.assert_allclose(ab[1], [0.5, 0.5])


def test_label_cells_projection():
    from legume_tpu.ops.enrichment import UNASSIGNED_LABEL, label_cells

    theta = np.asarray([[0.9, 0.1], [0.1, 0.9], [0.0, 0.0]])
    q = np.asarray([[5.0, 0.0], [0.0, 3.0]])  # topic0 -> A, topic1 -> B
    post, labels, conf = label_cells(theta, q, ["A", "B"])
    assert labels == ["A", "B", UNASSIGNED_LABEL]
    assert conf[0] > 0.9 and conf[2] == 0.0
    np.testing.assert_allclose(post.sum(1)[:2], 1.0)


def test_pc_scores_uncentered_skip_matches_centered():
    """matrix-util pca/tests.rs pattern: on nonnegative rows, the
    uncentered SVD's leading axis carries the mean profile, so
    `pc_scores(x, k, skip=1)` spans the same directions as explicit
    centering with skip=0."""
    rng = np.random.default_rng(3)
    x = rng.dirichlet([2, 2, 2, 2, 2], 200).astype(np.float32)
    dropped = pc_scores(x, 2, 1)
    explicit = pc_scores(x - x.mean(0), 2, 0)
    # same subspace up to sign/rotation: canonical correlations ~ 1
    qa, _ = np.linalg.qr(dropped)
    qb, _ = np.linalg.qr(explicit)
    sv = np.linalg.svd(qa.T @ qb, compute_uv=False)
    assert sv.min() > 0.95, sv
    with np.testing.assert_raises(ValueError):
        pc_scores(x, 0, 1)


def test_tumap_pcs_layout_separates_and_jitters():
    """t-UMAP kernel (a=b=1) with PC graph/init (lineage/layout.rs:94-126):
    separates planted simplex clusters, and the init jitter keeps
    duplicate points apart."""
    rng = np.random.default_rng(0)
    a = rng.dirichlet([8, 1, 1, 1], 120)
    b = rng.dirichlet([1, 1, 8, 1], 120)
    x = np.vstack([a, b]).astype(np.float32)
    emb = umap(x, kernel="tumap", pcs=3, n_epochs=60, seed=1)
    gap = np.linalg.norm(emb[:120].mean(0) - emb[120:].mean(0))
    within = max(emb[:120].std(), emb[120:].std())
    assert np.isfinite(emb).all() and gap / within > 1.5
    # duplicate rows get distinct init coordinates (pca.rs JITTER_FRAC)
    dup = np.ones((5, 3), np.float32)
    init = init_2d_from_scores(dup, seed=0)
    assert len({tuple(r) for r in np.round(init, 9).tolist()}) == 5
