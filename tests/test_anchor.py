"""Anchor prior: Gram-Schmidt vertex selection + simplex prior
(`senna/src/topic/anchor_prior.rs` parity; reference test pattern —
pure archetype rows must be picked)."""

import numpy as np

from legume_tpu.senna.anchor import AnchorPrior, gram_schmidt_anchors, zscore_columns


def test_gram_schmidt_picks_pure_vertices():
    rng = np.random.default_rng(0)
    # 3 archetypes + mixtures: picks must be the pure rows (anchor_common
    # test expectation)
    pure = np.eye(3) * 10.0
    mixes = rng.dirichlet(np.ones(3), size=12) @ pure
    x = np.vstack([pure, mixes])
    picked = sorted(gram_schmidt_anchors(x, 3))
    assert picked == [0, 1, 2], picked


def test_anchor_prior_simplex_and_init():
    rng = np.random.default_rng(1)
    d, p, k = 40, 12, 4
    mu = rng.gamma(2.0, 1.0, (d, p)).astype(np.float32)
    prior = AnchorPrior.from_pseudobulk(mu, k)
    assert prior.anchor_weight_gk.shape == (d, k)
    np.testing.assert_allclose(prior.anchor_weight_gk.sum(0), 1.0, rtol=1e-4)
    assert len(set(prior.anchor_pb_idx.tolist())) == k
    # init logits softmax back to the prior
    import jax

    logits = prior.init_logits()
    sm = np.asarray(jax.nn.softmax(logits, axis=-1))  # [K, D]
    np.testing.assert_allclose(sm, prior.anchor_weight_gk.T, atol=1e-4)


def test_zscore_columns_degenerate():
    x = np.ones((5, 3))
    z = zscore_columns(x)
    assert np.all(z == 0)
