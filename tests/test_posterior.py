"""bge posterior ESS + selection-pass tests."""

import numpy as np
import pytest

from legume_tpu.embedding.posterior import pb_posterior_ess, selection_pass


def test_pb_posterior_recovers_embedding():
    rng = np.random.default_rng(0)
    p, d, h = 16, 120, 2
    feat = rng.normal(0, 0.8, size=(d, h)).astype(np.float32)
    feat_b = np.full(d, -1.0, np.float32)
    e_true = rng.normal(0, 0.8, size=(p, h)).astype(np.float32)
    eta = e_true @ feat.T + feat_b[None, :]
    y = rng.poisson(np.exp(eta)).astype(np.float32)

    out = pb_posterior_ess(y, feat, feat_b, num_samples=150, burn_in=50, seed=1)
    # posterior mean embedding correlates with truth per dim (up to noise)
    for hh in range(h):
        corr = np.corrcoef(out["e_mean"][:, hh], e_true[:, hh])[0, 1]
        assert corr > 0.8, (hh, corr)
    assert np.all(np.isfinite(out["lnpdf"]))
    assert np.median(out["ess"]) > 10


def test_selection_pass_keeps_informative_dims():
    """Construct counts consistent with the NCE optimum
    (score = log(c / (k q m))) so the fitted bilinear scores ARE the
    truth; gates must stay on for score-carrying dims and fall to the
    prior on dims the scores never use."""
    rng = np.random.default_rng(1)
    p, d, h = 20, 80, 4
    k_neg = 5.0
    feat = np.zeros((d, h), np.float32)
    feat[:, :2] = rng.normal(0, 1.0, size=(d, 2))
    feat[:, 2:] = rng.normal(0, 1.0, size=(d, 2))  # present but unused dims
    axis = np.zeros((p, h), np.float32)
    axis[:, :2] = rng.normal(0, 1.0, size=(p, 2))
    s0 = axis @ feat.T  # only dims 0-1 contribute

    # invert the NCE optimum c = k q m exp(score) SELF-CONSISTENTLY:
    # the pb bias absorbs the per-row normalizer so rowsums(c) = m
    q = np.full(d, 1.0 / d)
    m = np.full(p, 2000.0)
    axis_b = -np.log(k_neg * (q[None, :] * np.exp(s0)).sum(1))
    scores = s0 + axis_b[:, None]
    counts = (k_neg * q[None, :] * m[:, None] * np.exp(scores)).astype(np.float32)
    np.testing.assert_allclose(counts.sum(1), m, rtol=1e-4)

    gates = selection_pass(
        feat, np.zeros(d, np.float32), axis, axis_b.astype(np.float32), counts,
        n_sweeps=2, prior_logit=-1.0, k_neg=k_neg, q_marginal=q, seed=2,
    )
    assert gates.shape == (d, h)
    # informative dims keep far more gate mass than unused dims, which
    # fall to the prior rate sigmoid(-1) ~ 0.27
    assert gates[:, :2].mean() > 0.6, gates.mean(0)
    assert gates[:, 2:].mean() < 0.45, gates.mean(0)


def test_pb_gibbs_recovers_sparse_loadings():
    """Alternating pb_gibbs (posterior/pb_gibbs): per-(gene, dim) PIPs
    separate active from null loadings, pb embeddings track truth, and
    diagnostics cover EVERY anchor."""
    from legume_tpu.embedding.posterior import pb_gibbs

    rng = np.random.default_rng(0)
    d, p, h = 40, 12, 2
    z_true = np.zeros((d, h))
    active = rng.random((d, h)) < 0.3
    z_true[active] = rng.normal(0, 1.2, active.sum())
    e_pb = rng.normal(0, 1.0, (p, h))
    eta = e_pb @ z_true.T + 0.5
    y = rng.poisson(np.exp(np.clip(eta, -8, 8))).astype(np.float64)

    res = pb_gibbs(
        y, z_true + rng.normal(0, 0.3, z_true.shape),  # noisy warm start
        np.full(d, 0.5), e_pb + rng.normal(0, 0.3, e_pb.shape), np.zeros(p),
        n_sweeps=12, burnin=4, transitions_per_dim=2,
        stick_alpha=2.0, seed=1,
    )
    # PIP separates active from inactive loadings
    auc_num, auc_den = 0, 0
    for dim in range(h):
        on, off = res.pip[active[:, dim], dim], res.pip[~active[:, dim], dim]
        for a in on:
            for b in off:
                auc_den += 1
                auc_num += (a > b) + 0.5 * (a == b)
    auc = auc_num / max(auc_den, 1)
    assert auc > 0.75, f"pip AUC {auc:.2f}"
    assert res.rhat.shape == (p,) and res.ess.shape == (p,)
    assert np.isfinite(res.sigma2_trace).all()
    # pb means track truth (sign/rotation-free via correlation of scores)
    s_true = (e_pb @ z_true.T).ravel()
    s_est = (res.e_pb_mean @ res.e_feat_mean.T).ravel()
    r = np.corrcoef(s_true, s_est)[0, 1]
    assert r > 0.8, f"score correlation {r:.2f}"


def test_hyper_primitives():
    from legume_tpu.embedding.posterior import HalfCauchyVar, ibp_pi0, sample_pi0

    rng = np.random.default_rng(0)
    hv = HalfCauchyVar(1.0)
    # with many effects of variance 4, draws concentrate near 4
    n = 4000
    x = rng.normal(0, 2.0, n)
    draws = [hv.sample((x**2).sum(), n, rng) for _ in range(50)]
    assert 3.0 < np.median(draws) < 5.5, np.median(draws)
    pi = ibp_pi0(2.0, 5)
    assert np.all(np.diff(pi) > 0) and 0 < pi[0] < pi[-1] < 1
    p0 = sample_pi0(90, 100, 9, 1, rng)
    assert 0.7 < p0 < 1.0


def test_two_layer_annotation_merges_nested_types():
    """Nested fine types collapse onto one coarse group when the cells
    only resolve two directions (type_annotation.rs two-layer)."""
    from legume_tpu.embedding.type_annotation import annotate_two_layer

    rng = np.random.default_rng(1)
    h, d = 6, 60
    # two real directions; genes load one of them
    dirs = np.linalg.qr(rng.standard_normal((h, h)))[0][:2]
    gene_dir = np.repeat([0, 1], d // 2)
    feat = dirs[gene_dir] + 0.15 * rng.standard_normal((d, h))
    # cells: two populations along the two directions
    n = 200
    cell_pop = np.repeat([0, 1], n // 2)
    cells = dirs[cell_pop] + 0.15 * rng.standard_normal((n, h))
    genes = [f"g{i}" for i in range(d)]
    markers = {
        "T Naive": [f"g{i}" for i in range(0, 10)],
        "T Memory": [f"g{i}" for i in range(10, 20)],
        "B Naive": [f"g{i}" for i in range(30, 40)],
        "B Memory": [f"g{i}" for i in range(40, 50)],
    }
    # resolution is the documented granularity knob (type_annotation.rs
    # TypeAnnotationArgs: "smaller communities -> more coarse groups");
    # at modularity 1.0 this 200-cell graph over-splits each population
    # into similar-size siblings and the types legitimately land on
    # different peaks. (The old default-resolution pass relied on a
    # doubled-resolution bug in the pre-refinement local-move rule.)
    res = annotate_two_layer(
        cells, feat, genes, markers, knn=10, n_permutations=60, min_z=1.0,
        seed=0, resolution=0.5,
    )
    # the two T subtypes merge, the two B subtypes merge, never across
    assert res.group_of_type["T Naive"] == res.group_of_type["T Memory"]
    assert res.group_of_type["B Naive"] == res.group_of_type["B Memory"]
    assert res.group_of_type["T Naive"] != res.group_of_type["B Naive"]
    assert res.group_of_type["T Naive"].startswith("T")
    # coarse labels align with the true populations
    coarse = np.asarray(res.coarse_labels, dtype=object)
    t_frac = (coarse[cell_pop == 0] == res.group_of_type["T Naive"]).mean()
    b_frac = (coarse[cell_pop == 1] == res.group_of_type["B Naive"]).mean()
    assert t_frac > 0.8 and b_frac > 0.8, (t_frac, b_frac)
    # hub calls agree with community majorities
    assert len(res.hub_calls) >= 1
    # term-ORA path
    res2 = annotate_two_layer(
        cells, feat, genes, markers, knn=10, n_permutations=30, min_z=1.0,
        term_genes={"immune cell": [f"g{i}" for i in range(0, 20)]}, seed=0,
    )
    assert res2.term_ora is not None and len(res2.term_ora) >= 1


def test_gem_gibbs_recovers_velocity_deviation():
    """Two-gate splice posterior: genes with a REAL delta shift on the
    unspliced track get high delta_pip; static genes do not; a
    u-only gene is flagged unidentified (splice.rs semantics)."""
    from legume_tpu.embedding.posterior import gem_gibbs

    rng = np.random.default_rng(3)
    p, d, h = 40, 60, 4
    beta = rng.normal(0, 0.5, (d, h)).astype(np.float32)
    delta_true = np.zeros((d, h), np.float32)
    moving = np.arange(10)
    delta_true[moving] = rng.normal(0, 1.0, (len(moving), h))
    ep = rng.normal(0, 0.5, (p, h)).astype(np.float32)
    bs = np.full(d, -0.5, np.float32)
    bu = np.full(d, -1.0, np.float32)
    bp = np.zeros(p, np.float32)
    eta_s = ep @ beta.T + bs[None] + bp[:, None]
    eta_u = ep @ (beta + delta_true).T + bu[None] + bp[:, None]
    s_counts = rng.poisson(np.exp(np.clip(eta_s, -8, 5)) * 20).astype(np.float32)
    u_counts = rng.poisson(np.exp(np.clip(eta_u, -8, 5)) * 20).astype(np.float32)
    s_counts[:, 59] = 0.0  # u-only gene: delta unidentified

    res = gem_gibbs(
        s_counts, u_counts, beta, np.zeros_like(delta_true), bs, bu,
        ep, bp, n_sweeps=15, burnin=5, seed=4,
    )
    assert not res.delta_identified[59]
    assert res.delta_identified[:59].all()
    pip_moving = res.delta_pip[moving].mean()
    static = np.arange(20, 55)
    pip_static = res.delta_pip[static].mean()
    assert pip_moving > pip_static + 0.3, (pip_moving, pip_static)
    # recovered deviations correlate with truth on the moving genes
    r = np.corrcoef(
        res.delta_mean[moving].ravel(), delta_true[moving].ravel()
    )[0, 1]
    assert r > 0.6, r
    # nested gates: delta on implies beta on (averaged pips respect it)
    assert np.all(res.delta_pip <= res.beta_pip + 1e-6)


def _mesh(n):
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()[:n]), ("dp",))


def test_pb_gibbs_mesh_single_device_exact():
    """The dp-sharded program on a 1-device mesh is the SAME program
    (mask of ones, no padding) — results must match the unsharded path
    bit-for-bit."""
    from legume_tpu.embedding.posterior import pb_gibbs

    rng = np.random.default_rng(0)
    d, p, h = 30, 8, 2
    z = rng.normal(0, 1.0, (d, h))
    ep = rng.normal(0, 1.0, (p, h))
    y = rng.poisson(np.exp(np.clip(ep @ z.T, -6, 6))).astype(np.float64)
    kw = dict(n_sweeps=6, burnin=2, transitions_per_dim=1, seed=3)
    a = pb_gibbs(y, z, np.zeros(d), ep, np.zeros(p), **kw)
    b = pb_gibbs(y, z, np.zeros(d), ep, np.zeros(p), mesh=_mesh(1), **kw)
    np.testing.assert_allclose(a.e_feat_mean, b.e_feat_mean, atol=1e-5)
    np.testing.assert_allclose(a.e_pb_mean, b.e_pb_mean, atol=1e-5)
    np.testing.assert_allclose(a.pip, b.pip, atol=1e-6)


def test_pb_gibbs_dp_sharded_recovers():
    """pb_gibbs over the full 8-device dp mesh (anchor axis sharded,
    P NOT divisible by 8 so the masked-padding path runs): the sampler
    still separates active loadings and tracks pb truth, and outputs
    come back at the UNPADDED shapes."""
    from legume_tpu.embedding.posterior import pb_gibbs

    rng = np.random.default_rng(0)
    d, p, h = 40, 12, 2  # p=12 pads to 16 on the 8-device mesh
    z_true = np.zeros((d, h))
    active = rng.random((d, h)) < 0.3
    z_true[active] = rng.normal(0, 1.2, active.sum())
    e_pb = rng.normal(0, 1.0, (p, h))
    eta = e_pb @ z_true.T + 0.5
    y = rng.poisson(np.exp(np.clip(eta, -8, 8))).astype(np.float64)

    res = pb_gibbs(
        y, z_true + rng.normal(0, 0.3, z_true.shape),
        np.full(d, 0.5), e_pb + rng.normal(0, 0.3, e_pb.shape), np.zeros(p),
        n_sweeps=12, burnin=4, transitions_per_dim=2,
        stick_alpha=2.0, seed=1, mesh=_mesh(8),
    )
    assert res.e_pb_mean.shape == (p, h)
    assert res.b_pb_mean.shape == (p,)
    assert res.rhat.shape == (p,) and res.ess.shape == (p,)
    auc_num, auc_den = 0, 0
    for dim in range(h):
        on, off = res.pip[active[:, dim], dim], res.pip[~active[:, dim], dim]
        for a in on:
            for b in off:
                auc_den += 1
                auc_num += (a > b) + 0.5 * (a == b)
    auc = auc_num / max(auc_den, 1)
    assert auc > 0.75, f"pip AUC {auc:.2f}"
    s_true = (e_pb @ z_true.T).ravel()
    s_est = (res.e_pb_mean @ res.e_feat_mean.T).ravel()
    r = np.corrcoef(s_true, s_est)[0, 1]
    assert r > 0.8, f"score correlation {r:.2f}"


def test_gem_gibbs_dp_sharded_recovers():
    """gem_gibbs on the 8-device dp mesh (P=36 pads to 40, exercising
    the masked-padding path): velocity pips still separate moving from
    static genes — the same regime the unsharded recovery test uses."""
    from legume_tpu.embedding.posterior import gem_gibbs

    rng = np.random.default_rng(3)
    p, d, h = 36, 60, 4
    beta = rng.normal(0, 0.5, (d, h)).astype(np.float32)
    delta_true = np.zeros((d, h), np.float32)
    moving = np.arange(10)
    delta_true[moving] = rng.normal(0, 1.0, (len(moving), h))
    ep = rng.normal(0, 0.5, (p, h)).astype(np.float32)
    bs = np.full(d, -0.5, np.float32)
    bu = np.full(d, -1.0, np.float32)
    bp = np.zeros(p, np.float32)
    eta_s = ep @ beta.T + bs[None] + bp[:, None]
    eta_u = ep @ (beta + delta_true).T + bu[None] + bp[:, None]
    s_counts = rng.poisson(np.exp(np.clip(eta_s, -8, 5)) * 20).astype(np.float32)
    u_counts = rng.poisson(np.exp(np.clip(eta_u, -8, 5)) * 20).astype(np.float32)

    res = gem_gibbs(
        s_counts, u_counts, beta, np.zeros_like(delta_true), bs, bu,
        ep, bp, n_sweeps=15, burnin=5, seed=4, mesh=_mesh(8),
    )
    assert res.e_pb_mean.shape == (p, h)
    pip_moving = res.delta_pip[moving].mean()
    pip_static = res.delta_pip[20:55].mean()
    assert pip_moving > pip_static + 0.25, (pip_moving, pip_static)
    assert np.all(res.delta_pip <= res.beta_pip + 1e-6)


def test_pb_posterior_ess_dp_sharded():
    """pb_posterior_ess over the 8-device mesh (P=14 pads to 16): the
    per-anchor chains are shard-local; recovery holds and outputs come
    back unpadded."""
    rng = np.random.default_rng(0)
    p, d, h = 14, 100, 2
    feat = rng.normal(0, 0.8, size=(d, h)).astype(np.float32)
    feat_b = np.full(d, -1.0, np.float32)
    e_true = rng.normal(0, 0.8, size=(p, h)).astype(np.float32)
    y = rng.poisson(np.exp(e_true @ feat.T + feat_b[None, :])).astype(np.float32)

    out = pb_posterior_ess(
        y, feat, feat_b, num_samples=150, burn_in=50, seed=1, mesh=_mesh(8)
    )
    assert out["e_mean"].shape == (p, h)
    for hh in range(h):
        corr = np.corrcoef(out["e_mean"][:, hh], e_true[:, hh])[0, 1]
        assert corr > 0.75, (hh, corr)
    assert np.all(np.isfinite(out["lnpdf"]))
