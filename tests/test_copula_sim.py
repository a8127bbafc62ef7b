"""Reference-conditioned NB-copula simulator (data-beans-sim copula/)."""

import numpy as np
import scipy.sparse as sp

from legume_tpu.data.sim import simulate_from_reference


def _reference(g=30, n=800, seed=0):
    """Two anticorrelated gene programs + NB noise."""
    rng = np.random.default_rng(seed)
    t = rng.uniform(0, 1, n)
    mu = np.zeros((g, n))
    mu[:10] = 5.0 * t + 0.5  # program A rises
    mu[10:20] = 5.0 * (1 - t) + 0.5  # program B falls
    mu[20:] = 2.0
    r = 2.0  # NB dispersion
    counts = rng.negative_binomial(r, r / (r + mu))
    return sp.csc_matrix(counts.astype(np.float32))


def test_copula_preserves_marginals_and_correlation():
    ref = _reference()
    sim, params = simulate_from_reference(ref, n_cells=800, rank=5, seed=1)
    assert sim.shape == (30, 800)
    x_ref = np.asarray(ref.todense())
    x_sim = np.asarray(sim.todense())
    # per-gene means track the reference
    # (the NB quantile push-forward is not exactly mean-preserving,
    # so near-1 rather than exact)
    r = np.corrcoef(x_ref.mean(1), x_sim.mean(1))[0, 1]
    assert r > 0.95, r
    # overdispersion carried through: sim var exceeds Poisson
    hi = x_sim.mean(1) > 2
    assert np.all(x_sim.var(1)[hi] > 1.2 * x_sim.mean(1)[hi])
    # gene-gene dependence: programs A and B anticorrelate in the sim
    a = x_sim[:10].sum(0)
    b = x_sim[10:20].sum(0)
    assert np.corrcoef(a, b)[0, 1] < -0.3
    # within-program positive correlation at the level the reference
    # itself shows (~0.17 — per-gene NB noise dominates single pairs)
    assert np.corrcoef(x_sim[0], x_sim[1])[0, 1] > 0.1


def test_copula_handles_zero_genes():
    ref = _reference()
    ref = sp.vstack([ref, sp.csc_matrix((3, ref.shape[1]))]).tocsc()
    sim, _ = simulate_from_reference(ref, n_cells=100, rank=4, seed=2)
    x = np.asarray(sim.todense())
    assert x.shape == (33, 100)
    assert np.all(x[-3:] == 0)  # silent genes stay silent


def test_sim_topic_extended_knobs_and_default_determinism():
    """New simulate_topic knobs (handlers.rs pve_noise /
    hierarchical_depth / n_housekeeping / batch_rank): defaults keep
    the RNG stream byte-identical to earlier fixtures; each knob
    changes the draw in its documented direction."""
    from legume_tpu.data.sim import simulate_topic

    a = simulate_topic(rows=50, cols=80, factors=4, batches=2, seed=9)
    b = simulate_topic(rows=50, cols=80, factors=4, batches=2, seed=9)
    assert (a.counts != b.counts).nnz == 0  # determinism intact

    h = simulate_topic(rows=50, cols=80, factors=4, seed=9,
                       hierarchical_depth=3)
    assert h.beta.shape[1] == 8  # 2^3 leaves override factors
    # sibling leaves share tree ancestry -> correlated log-dictionaries
    lg = np.log(h.beta)
    sib = np.corrcoef(lg[:, 0], lg[:, 1])[0, 1]
    far = np.corrcoef(lg[:, 0], lg[:, 7])[0, 1]
    assert sib > far

    hk = simulate_topic(rows=50, cols=80, factors=4, seed=9,
                        n_housekeeping=8, housekeeping_fold=10.0)
    assert hk.beta[:8].std(1).max() < 1e-12  # topic-uniform rows
    assert hk.beta[:8].mean() > 3 * hk.beta[8:].mean()

    lr = simulate_topic(rows=200, cols=50, factors=4, batches=4, seed=9,
                        pve_batch=1.0, batch_rank=2)
    # rank-2 batch program: ln_delta spans <= 2 directions
    s = np.linalg.svd(lr.ln_delta - lr.ln_delta.mean(1, keepdims=True),
                      compute_uv=False)
    assert s[2] < 1e-8 * s[0]
