"""fagioli eQTL mapping recovery (sim-qtl -> map-qtl roundtrip,
reference pattern 3)."""

import numpy as np
import pytest

from legume_tpu.fagioli.qtl import map_qtl, pseudobulk_log_rates, simulate_qtl


def test_pseudobulk_log_rates():
    rng = np.random.default_rng(0)
    counts = rng.poisson(5.0, size=(10, 100)).astype(np.float32)
    indv = np.repeat(np.arange(10), 10)
    log_mu, w = pseudobulk_log_rates(counts, indv, 10)
    assert log_mu.shape == (10, 10)
    # posterior log-mean tracks the empirical log group mean
    emp = np.log((1 + np.add.reduceat(counts, np.arange(0, 100, 10), axis=1)) / 11)
    np.testing.assert_allclose(log_mu, emp, atol=0.25)
    assert np.all(w > 0)


def test_map_qtl_recovers_egenes():
    sim = simulate_qtl(
        n_genes=12, n_indv=80, cells_per_indv=20, n_variants=30,
        frac_egenes=0.5, effect_sd=0.8, seed=4,
    )
    out = map_qtl(sim.counts, sim.cell_indv, sim.genotypes, L=2, num_steps=600)
    assert out["pip"].shape == (12, 30)
    hits, fps = 0, 0
    for gi in range(12):
        top = out["pip"][gi].argmax()
        if sim.causal_variant[gi] >= 0:
            if top == sim.causal_variant[gi] and out["pip"][gi, top] > 0.3:
                hits += 1
        else:
            fps += out["pip"][gi].max() > 0.8
    n_egenes = (sim.causal_variant >= 0).sum()
    assert hits >= max(n_egenes - 2, 1), (hits, n_egenes)
    assert fps <= 2
