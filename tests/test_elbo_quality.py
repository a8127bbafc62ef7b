"""ELBO quality gate — the local stand-in for the BASELINE "ELBO
parity vs Rust CPU reference" target (BASELINE.md): on data generated
from a known topic model, the fitted per-count log-likelihood must
close most of the gap between a topic-less baseline and the TRUE
generative parameters' log-likelihood."""

import jax
import numpy as np
import pytest

from legume_tpu.data.sim import simulate_topic
from legume_tpu.models.decoders import MultinomTopicDecoder
from legume_tpu.models.encoders import LogSoftmaxEncoder
from legume_tpu.models.train import LevelData, MixedTrainer, TrainConfig


def test_fitted_llik_approaches_true_model():
    sim = simulate_topic(rows=150, cols=800, factors=4, batches=1, depth=3000, seed=9)
    y = np.asarray(sim.counts.todense()).T.astype(np.float32)  # [N, D]

    # true multinomial rates per cell: p = (beta theta) normalized over genes
    rate = sim.beta @ sim.theta.T  # [D, N]
    p_true = (rate / rate.sum(0, keepdims=True)).T  # [N, D]
    llik_true = float((y * np.log(p_true + 1e-12)).sum() / y.sum())

    # topic-less baseline: one shared gene distribution
    p0 = y.sum(0) / y.sum()
    llik_null = float((y * np.log(p0 + 1e-12)[None, :]).sum() / y.sum())

    enc = LogSoftmaxEncoder(n_topics=4, layers=(64, 32))
    dec = MultinomTopicDecoder(n_features=150, n_topics=4)
    cfg = TrainConfig(epochs=120, minibatch_size=128, learning_rate=5e-3, seed=0)
    trainer = MixedTrainer(enc, [dec], cfg)
    _, _, scores = trainer.train([LevelData(input=y, input_null=None)], jax.random.key(0))
    llik_fit = float(np.mean(scores.llik[-10:]))

    gap_closed = (llik_fit - llik_null) / (llik_true - llik_null)
    assert llik_true > llik_null  # sim sanity
    assert gap_closed > 0.75, (llik_null, llik_fit, llik_true, gap_closed)
