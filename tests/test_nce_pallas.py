"""Fused NCE epoch kernel vs value_and_grad of the XLA loss
(interpreter mode on CPU; the real-chip A/B lives in bench notes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from legume_tpu.embedding.nce import AxisSide, FeatSide, _expected_nce_loss
from legume_tpu.embedding.nce_pallas import nce_epoch_grads, pick_tile_d


def _pad_inputs(counts, q, dtype="float32"):
    p, d = counts.shape
    p_pad = -(-p // 8) * 8
    d_pad = -(-d // 128) * 128
    c_pad = np.zeros((p_pad, d_pad), np.float32)
    c_pad[:p, :d] = counts
    q_pad = np.zeros((1, d_pad), np.float32)
    q_pad[0, :d] = q
    m_pad = c_pad.sum(axis=1, keepdims=True).astype(np.float32)
    return (
        jnp.asarray(c_pad).astype(jnp.dtype(dtype)),
        jnp.asarray(q_pad),
        jnp.asarray(m_pad),
        d_pad,
    )


@pytest.mark.parametrize("ridge", [0.0, 0.01])
def test_fused_epoch_matches_value_and_grad(ridge):
    rng = np.random.default_rng(0)
    p, d, h = 37, 200, 16  # deliberately unaligned P and D
    counts = rng.poisson(1.0, (p, d)).astype(np.float32)
    q = counts.sum(0) ** 0.75
    q = (q / q.sum()).astype(np.float32)
    k_neg = 5.0

    feat = FeatSide(
        e_feat=jnp.asarray(0.1 * rng.normal(size=(d, h)), jnp.float32),
        b_feat=jnp.asarray(0.01 * rng.normal(size=d), jnp.float32),
    )
    axis = AxisSide(
        e=jnp.asarray(0.1 * rng.normal(size=(p, h)), jnp.float32),
        b=jnp.asarray(0.01 * rng.normal(size=p), jnp.float32),
    )
    m = counts.sum(axis=1)

    def xla_loss(params):
        f, a = params
        return _expected_nce_loss(
            f, a, jnp.asarray(counts), jnp.asarray(q), jnp.asarray(m),
            k_neg=k_neg, ridge=ridge,
        )

    want_loss, (gf, ga) = jax.value_and_grad(xla_loss)((feat, axis))

    c_pad, q_pad, m_pad, d_pad = _pad_inputs(counts, q)
    ef_pad = jnp.pad(feat.e_feat, ((0, d_pad - d), (0, 0)))
    bf_pad = jnp.pad(feat.b_feat, (0, d_pad - d))
    total = jnp.asarray(counts.sum(), jnp.float32)
    got = nce_epoch_grads(
        ef_pad, bf_pad, axis.e, axis.b, c_pad, q_pad, m_pad,
        k_neg=k_neg, total=total, ridge=ridge, d_real=d, interpret=True,
    )
    loss, g_ef, g_bf, g_ea, g_ba = got

    np.testing.assert_allclose(float(loss), float(want_loss), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(g_ef)[:d], np.asarray(gf.e_feat), rtol=1e-4, atol=1e-6
    )
    # padded gene rows must receive exactly the ridge-free zero grad
    np.testing.assert_allclose(np.asarray(g_ef)[d:], 0.0, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(g_bf)[:d], np.asarray(gf.b_feat), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_ea), np.asarray(ga.e), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_ba), np.asarray(ga.b), rtol=1e-4, atol=1e-6
    )


def test_fused_epoch_bf16_counts_close_to_f32():
    rng = np.random.default_rng(1)
    p, d, h = 16, 256, 8
    counts = rng.poisson(2.0, (p, d)).astype(np.float32)
    q = np.full(d, 1.0 / d, np.float32)
    ef = jnp.asarray(0.1 * rng.normal(size=(d, h)), jnp.float32)
    bf = jnp.zeros(d)
    ea = jnp.asarray(0.1 * rng.normal(size=(p, h)), jnp.float32)
    ba = jnp.zeros(p)
    total = jnp.asarray(counts.sum(), jnp.float32)

    outs = {}
    for dt in ("float32", "bfloat16"):
        c_pad, q_pad, m_pad, _ = _pad_inputs(counts, q, dtype=dt)
        outs[dt] = nce_epoch_grads(
            ef, bf, ea, ba, c_pad, q_pad, m_pad,
            k_neg=5.0, total=total, interpret=True,
        )
    # bf16 counts round (~0.4% rel above 256); small integer counts
    # here are exact, so only the score-path rounding differs
    np.testing.assert_allclose(
        float(outs["bfloat16"][0]), float(outs["float32"][0]), rtol=1e-2
    )


def test_fit_bge_pallas_path_matches_xla():
    """End-to-end: fit_bge(use_pallas=True) (interpret mode on CPU)
    must track the XLA path — same PRNG, same per-epoch gradients up
    to float reassociation."""
    from legume_tpu.embedding.nce import NceConfig, fit_bge

    rng = np.random.default_rng(2)
    p, d = 21, 150  # unaligned on purpose
    counts = rng.poisson(1.5, (p, d)).astype(np.float32)
    kw = dict(embedding_dim=6, epochs=40, learning_rate=0.05, seed=3)
    plain = fit_bge([counts], config=NceConfig(**kw, use_pallas=False))
    fused = fit_bge([counts], config=NceConfig(**kw, use_pallas=True))

    assert fused.e_feat.shape == plain.e_feat.shape
    np.testing.assert_allclose(fused.e_feat, plain.e_feat, atol=2e-4)
    np.testing.assert_allclose(
        fused.pb_embeddings[0], plain.pb_embeddings[0], atol=2e-4
    )
    np.testing.assert_allclose(
        fused.phase1_losses, plain.phase1_losses, rtol=1e-4, atol=1e-5
    )


def test_pick_tile_d_budget():
    assert pick_tile_d(2688, 34048, 2) in (256, 512)
    assert pick_tile_d(8, 128, 4) == 128
    # absurd P: nothing fits
    assert pick_tile_d(2_000_000, 512, 4) is None
