"""Encoder/decoder/trainer contract tests (candle-util parity;
SURVEY.md section 2.4). Includes the latent-contract and
grad-clip-nonfinite regression patterns (reference patterns 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from legume_tpu.models.decoders import (
    MultinomTopicDecoder,
    NbTopicDecoder,
    PoissonTopicDecoder,
)
from legume_tpu.models.encoders import GaussianEncoder, LogSoftmaxEncoder
from legume_tpu.models.train import (
    LevelData,
    MixedTrainer,
    TrainConfig,
    clip_by_global_norm_nonfinite_guard,
)


@pytest.fixture(scope="module")
def toy_counts():
    rng = np.random.default_rng(0)
    # 3-topic structured counts so training can actually reduce loss
    d, n, k = 40, 160, 3
    beta = rng.dirichlet(np.ones(d) * 0.2, size=k)  # [K, D]
    theta = rng.dirichlet(np.ones(k), size=n)  # [N, K]
    lam = 80.0 * (theta @ beta)
    return rng.poisson(lam).astype(np.float32)  # [N, D]


def test_encoder_outputs_simplex(toy_counts):
    enc = LogSoftmaxEncoder(n_topics=3, layers=(16, 8))
    key = jax.random.key(0)
    variables = enc.init({"params": key, "reparam": key}, jnp.asarray(toy_counts[:8]), None, train=True)
    (log_z, kl), _ = enc.apply(
        variables,
        jnp.asarray(toy_counts[:8]),
        None,
        train=True,
        rngs={"reparam": key},
        mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.exp(log_z).sum(-1), 1.0, rtol=1e-4)
    assert np.all(np.asarray(kl) >= 0)


def test_encoder_eval_is_deterministic(toy_counts):
    enc = LogSoftmaxEncoder(n_topics=3, layers=(16, 8))
    key = jax.random.key(1)
    variables = enc.init({"params": key, "reparam": key}, jnp.asarray(toy_counts[:8]), None, train=True)
    a, _ = enc.apply(variables, jnp.asarray(toy_counts[:8]), None, train=False)
    b, _ = enc.apply(variables, jnp.asarray(toy_counts[:8]), None, train=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("cls", [MultinomTopicDecoder, NbTopicDecoder, PoissonTopicDecoder])
def test_decoder_llik_finite(toy_counts, cls):
    dec = cls(n_features=40, n_topics=3)
    key = jax.random.key(2)
    log_z = jax.nn.log_softmax(jax.random.normal(key, (8, 3)))
    variables = dec.init(key, log_z, jnp.asarray(toy_counts[:8]))
    recon, llik = dec.apply(variables, log_z, jnp.asarray(toy_counts[:8]))
    assert np.all(np.isfinite(np.asarray(llik)))
    assert recon.shape == (8, 40)
    # multinomial recon rows are probabilities
    if cls is MultinomTopicDecoder:
        np.testing.assert_allclose(np.asarray(recon).sum(-1), 1.0, rtol=1e-3)


def test_nonfinite_guard_skips_step():
    """grad_clip_nonfinite regression (candle-util/tests/
    grad_clip_nonfinite.rs): an Inf grad must produce a ZERO update."""
    init_fn, update_fn = clip_by_global_norm_nonfinite_guard(1.0)
    grads = {"w": jnp.asarray([jnp.inf, 1.0]), "b": jnp.asarray([0.5])}
    updates, _ = update_fn(grads, init_fn(grads))
    assert float(jnp.abs(updates["w"]).max()) == 0.0
    assert float(jnp.abs(updates["b"]).max()) == 0.0
    # finite grads pass through with norm clipping
    grads = {"w": jnp.asarray([3.0, 4.0]), "b": jnp.asarray([0.0])}
    updates, _ = update_fn(grads, init_fn(grads))
    norm = float(jnp.sqrt(sum(jnp.sum(u**2) for u in jax.tree.leaves(updates))))
    assert norm <= 1.0 + 1e-5


def test_train_mixed_decreases_loss(toy_counts):
    enc = LogSoftmaxEncoder(n_topics=3, layers=(32, 16))
    dec = MultinomTopicDecoder(n_features=40, n_topics=3)
    cfg = TrainConfig(epochs=30, minibatch_size=64, learning_rate=5e-3, seed=0)
    trainer = MixedTrainer(enc, [dec], cfg)
    level = LevelData(input=toy_counts, input_null=None)
    variables, _, scores = trainer.train([level])
    # ELBO improves: llik (per count) strictly higher late than early
    early = np.mean(scores.llik[:5])
    late = np.mean(scores.llik[-5:])
    assert late > early, (early, late)
    # latent is a simplex in log space (latent_contract regression:
    # senna/tests/latent_contract.rs — must go through softmax head)
    log_z = trainer.encode(variables, toy_counts)
    np.testing.assert_allclose(np.exp(log_z).sum(-1), 1.0, rtol=1e-3)
    assert np.all(np.isfinite(log_z))


def test_train_multilevel_shared_encoder(toy_counts):
    enc = LogSoftmaxEncoder(n_topics=3, layers=(16,))
    decs = [
        MultinomTopicDecoder(n_features=40, n_topics=3),
        MultinomTopicDecoder(n_features=40, n_topics=3),
    ]
    cfg = TrainConfig(epochs=3, minibatch_size=32, seed=1)
    trainer = MixedTrainer(enc, decs, cfg)
    levels = [
        LevelData(input=toy_counts[:100], input_null=None),
        LevelData(input=toy_counts[100:], input_null=None),
    ]
    variables, _, scores = trainer.train(levels)
    assert len(scores.llik) == 3
    assert np.all(np.isfinite(scores.llik))


def test_gaussian_encoder_latent(toy_counts):
    enc = GaussianEncoder(n_latent=5, layers=(16,))
    key = jax.random.key(3)
    v = enc.init({"params": key, "reparam": key}, jnp.asarray(toy_counts[:8]), None, train=True)
    z, kl = enc.apply(v, jnp.asarray(toy_counts[:8]), None, train=False)
    assert z.shape == (8, 5)
    assert np.all(np.isfinite(np.asarray(z)))


def test_train_multi_decoder_weighted(toy_counts):
    """Multi-modality: two decoders on one z, weighted llik sum
    (train_mixed_multi_decoder parity)."""
    enc = LogSoftmaxEncoder(n_topics=3, layers=(16,))
    decs = [
        [
            MultinomTopicDecoder(n_features=40, n_topics=3),
            PoissonTopicDecoder(n_features=40, n_topics=3),
        ]
    ]
    cfg = TrainConfig(epochs=5, minibatch_size=32, seed=2)
    trainer = MixedTrainer(enc, decs, cfg, decoder_weights=[1.0, 0.5])
    variables, _, scores = trainer.train(
        [LevelData(input=toy_counts, input_null=None)]
    )
    assert len(scores.llik) == 5
    assert np.all(np.isfinite(scores.llik))


def test_joint_topic_multimodal():
    """joint-topic: two modalities share cells and one topic posterior
    (train_joint.rs parity via target slices)."""
    from legume_tpu.data.sim import simulate_multimodal
    from legume_tpu.data.sparse_io import MemoryBackend
    from legume_tpu.senna.joint import JointTopicArgs, fit_joint_topic

    mm = simulate_multimodal(rows_per_modality=(60, 30), cols=300, factors=3, seed=4)
    mods = [MemoryBackend(c) for c in mm.counts]
    out = fit_joint_topic(
        mods,
        JointTopicArgs(
            n_topics=3, encoder_layers=(32,), epochs=40, minibatch_size=32,
            proj_dim=12, sort_dim=5, iter_opt=10, decoder="multinomial",
        ),
    )
    theta = out["pb_latent"]
    np.testing.assert_allclose(theta.sum(1), 1.0, rtol=1e-3)
    assert np.all(np.isfinite(out["scores"].llik))
    assert out["slices"] == [(0, 60), (60, 90)]


def test_iaf_encoder_trains(toy_counts):
    """IAF posterior encoder: trains under the same contract and
    produces a valid simplex latent (softmax_iaf.rs)."""
    from legume_tpu.models.encoders import IafSoftmaxEncoder

    enc = IafSoftmaxEncoder(n_topics=3, layers=(16,), n_flows=2)
    dec = MultinomTopicDecoder(n_features=40, n_topics=3)
    cfg = TrainConfig(epochs=15, minibatch_size=64, learning_rate=5e-3, seed=4)
    trainer = MixedTrainer(enc, [dec], cfg)
    variables, _, scores = trainer.train([LevelData(input=toy_counts, input_null=None)])
    assert np.all(np.isfinite(scores.llik))
    assert np.mean(scores.llik[-3:]) > np.mean(scores.llik[:3])
    log_z = trainer.encode(variables, toy_counts)
    np.testing.assert_allclose(np.exp(log_z).sum(-1), 1.0, rtol=1e-3)


def test_delta_topic_decoder_chains_modalities():
    """DeltaTopicDecoder (delta_topic.rs): zero-init deltas make all
    modalities start at the base dictionary; training moves modality 2
    away while modality 1 stays anchored to the shared base."""
    import jax
    import jax.numpy as jnp

    from legume_tpu.models.decoders import DeltaTopicDecoder

    rng = np.random.default_rng(0)
    n, d, k, m = 16, 30, 3, 2
    dec = DeltaTopicDecoder(n_features=d, n_topics=k, n_modalities=m)
    log_z = jnp.asarray(np.log(rng.dirichlet(np.ones(k), n) + 1e-9), jnp.float32)
    x = jnp.asarray(rng.poisson(2.0, (n, m * d)).astype(np.float32))
    variables = dec.init(jax.random.key(0), log_z, x)
    recon, llik = dec.apply(variables, log_z, x)
    assert recon.shape == (n, m * d) and np.isfinite(np.asarray(llik)).all()
    # zero deltas -> the two modalities reconstruct identically
    r = np.asarray(recon)
    np.testing.assert_allclose(r[:, :d], r[:, d:], rtol=1e-5)
    lb = np.asarray(dec.apply(variables, method="get_dictionary"))
    np.testing.assert_allclose(np.exp(lb).sum(0), 1.0, rtol=1e-4)


def test_bipartite_decoder_likelihoods():
    import jax
    import jax.numpy as jnp

    from legume_tpu.models.decoders import BipartiteDecoder

    rng = np.random.default_rng(1)
    n, d, k = 12, 20, 4
    log_z = jnp.asarray(np.log(rng.dirichlet(np.ones(k), n) + 1e-9), jnp.float32)
    x = jnp.asarray(rng.poisson(1.0, (n, d)).astype(np.float32))
    for fam in ("block", "symmetric", "poisson"):
        dec = BipartiteDecoder(n_features=d, n_topics=k, likelihood=fam)
        variables = dec.init(jax.random.key(0), log_z, x)
        scores, llik = dec.apply(variables, log_z, x)
        assert scores.shape == (n, d)
        assert np.isfinite(np.asarray(llik)).all(), fam


def test_joint_encoder_per_modality_trunks():
    """LogSoftmaxJointEncoder (joint_softmax.rs:8-110): separate trunk
    per modality slice, latents and KLs sum. Check shapes, simplex
    output, and that each modality's parameters exist independently."""
    import jax
    import jax.numpy as jnp

    from legume_tpu.models.encoders import LogSoftmaxJointEncoder

    enc = LogSoftmaxJointEncoder(n_topics=4, layers=(16,), n_features=(30, 5))
    x = jnp.asarray(np.random.default_rng(0).poisson(2.0, (12, 35)), jnp.float32)
    variables = enc.init(
        {"params": jax.random.key(0), "reparam": jax.random.key(1)},
        x, train=True,
    )
    mods = variables["params"]
    assert "mod0" in mods and "mod1" in mods
    (log_z, kl), _ = enc.apply(
        variables, x, train=True,
        rngs={"reparam": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    assert log_z.shape == (12, 4) and np.isfinite(np.asarray(log_z)).all()
    np.testing.assert_allclose(np.exp(np.asarray(log_z)).sum(1), 1.0, rtol=1e-4)
    assert kl.shape == (12,) and float(kl.mean()) >= 0.0
    # eval heads: variances ADD across modalities (not lnvars)
    mu, lnvar = enc.apply(
        variables, x, train=False, method=enc.latent_gaussian_params
    )
    assert mu.shape == (12, 4) and np.isfinite(np.asarray(lnvar)).all()
