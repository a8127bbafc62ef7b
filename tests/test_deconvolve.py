"""Bulk deconvolution recovery: Dirichlet-mixed reference profiles must
be un-mixed (reference pattern 3 + the bench_tool scoring harness
pattern, `senna/examples/bench_tool.rs`)."""

import numpy as np
import pytest

from legume_tpu.senna.deconvolve import DeconvConfig, DeconvResult, deconvolve


def test_deconvolve_recovers_fractions():
    rng = np.random.default_rng(0)
    d, r, s = 300, 4, 6
    # well-separated reference profiles
    mu = rng.gamma(0.3, 1.0, size=(d, r)) * 5.0
    for m in range(r):
        mu[m * 60 : (m + 1) * 60, m] *= 10.0  # marker blocks
    frac_true = rng.dirichlet(np.ones(r), size=s)
    depth = 50_000
    lam = frac_true @ mu.T
    lam = lam / lam.sum(1, keepdims=True) * depth
    y = rng.poisson(lam).astype(np.float32)

    res = deconvolve(
        y, mu / mu.sum(0, keepdims=True),
        config=DeconvConfig(n_sweeps=400, burn_in=150, seed=1),
    )
    assert res.fractions.shape == (s, r)
    np.testing.assert_allclose(res.fractions.sum(1), 1.0, rtol=1e-4)
    # correlation with truth per sample
    for si in range(s):
        corr = np.corrcoef(res.fractions[si], frac_true[si])[0, 1]
        assert corr > 0.9, (si, corr, res.fractions[si], frac_true[si])


def test_deconvolve_readout_maps_components():
    rng = np.random.default_rng(1)
    d, r, s = 100, 4, 2
    mu = rng.gamma(1.0, 1.0, size=(d, r))
    y = rng.poisson(mu.sum(1) * 10, size=(s, d)).astype(np.float32)
    # two components map to one cell type each
    readout = np.asarray([[1, 0], [1, 0], [0, 1], [0, 1]], np.float32)
    res = deconvolve(y, mu, readout, DeconvConfig(n_sweeps=100, burn_in=50))
    assert res.fractions.shape == (s, 2)
    np.testing.assert_allclose(res.fractions.sum(1), 1.0, rtol=1e-4)


def test_tempering_widens_posterior():
    """Power-posterior contract (the reference's own regression,
    deconvolve/tests.rs:180): tau scales the evidence, so tempered
    chains carry wider, better-mixed posteriors. Fractions are RATIOS
    (u / sum u), so their sd widens sub-1/sqrt(tau); assert direction +
    mixing, at a depth where the tau=1 chain itself mixes."""
    rng = np.random.default_rng(0)
    d, r = 60, 3
    mu = rng.gamma(2.0, 1.0, (d, r)).astype(np.float32)
    mu[:20, 0] *= 8
    mu[20:40, 1] *= 8
    mu[40:, 2] *= 8
    u_true = np.asarray([[3.0, 1.0, 2.0]])
    y = rng.poisson((u_true @ mu.T) * 1.0).astype(np.float32)

    full = deconvolve(y, mu, config=DeconvConfig(n_sweeps=800, burn_in=300, seed=3))
    temp = deconvolve(
        y, mu,
        config=DeconvConfig(n_sweeps=800, burn_in=300, seed=3, count_scale=0.05),
    )
    ratio = temp.fractions_sd.mean() / max(full.fractions_sd.mean(), 1e-12)
    assert 1.3 < ratio < 8.0, f"tempering widened by {ratio:.2f}x"
    # tempering also improves mixing (the knob's purpose at high depth)
    assert temp.ess.min() >= full.ess.min()
    # point estimates stay consistent under tempering
    assert np.abs(temp.fractions - full.fractions).max() < 0.1


def test_deconvolve_archetype_mode_e2e(tmp_path):
    """senna deconvolve --from (deconvolve/source.rs + archetypes.rs):
    Leiden communities on the prior run's latent become MEASURED
    profiles; the annotation's soft readout pools two granularities
    into one posterior that recovers planted bulk fractions."""
    import pandas as pd

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sim import simulate_topic, write_topic_sim

    sim = simulate_topic(rows=90, cols=700, factors=3, batches=1,
                         pve_topic=0.9, depth=3000, seed=17)
    path = write_topic_sim(sim, str(tmp_path / "sc"))
    fit = str(tmp_path / "fit")
    cli.main([
        "senna", "topic", "--data-files", path, "--out", fit,
        "-k", "3", "--encoder-layers", "16", "--epochs", "20",
        "--minibatch-size", "64", "--num-levels", "2", "--sort-dim", "5",
        "--proj-dim", "12", "--iter-opt", "5", "--block-size", "256",
        "--decoder", "multinomial",
    ])

    # annotation = true dominant topic; bulk = planted mixtures of cells
    true_k = sim.theta.argmax(1)
    import legume_tpu.data.sparse_io as sio

    cells = sio.open_sparse_matrix(path).column_names()
    ann = tmp_path / "ann.tsv"
    ann.write_text("".join(f"{c}\ttype{k}\n" for c, k in zip(cells, true_k)))

    rng = np.random.default_rng(5)
    full = sim.counts.tocsc()
    planted = np.asarray([[0.6, 0.3, 0.1], [0.1, 0.2, 0.7], [0.34, 0.33, 0.33]])
    bulk_rows = []
    for s in range(3):
        n_draw = 220
        picks = []
        for k in range(3):
            pool = np.nonzero(true_k == k)[0]
            picks.append(rng.choice(pool, int(planted[s, k] * n_draw), replace=True))
        cols = np.concatenate(picks)
        bulk_rows.append(np.asarray(full[:, cols].sum(1)).ravel())
    bulk = pd.DataFrame(
        np.stack(bulk_rows), index=[f"s{j}" for j in range(3)],
        columns=[f"g{i}" for i in range(90)],
    )
    bulk_path = str(tmp_path / "bulk.tsv")
    bulk.to_csv(bulk_path, sep="\t")

    out = str(tmp_path / "dec")
    cli.main([
        "senna", "deconvolve", "--bulk", bulk_path, "--from", fit,
        "--annotation", str(ann), "--archetypes", "6", "12",
        "--archetype-min-cells", "5", "--out", out,
        "--sweeps", "400", "--burn-in", "150", "--seed", "2",
    ])
    frac = pd.read_parquet(out + ".fractions.parquet")
    cols = [c for c in frac.columns if c.startswith("type")]
    est = frac[cols].to_numpy()
    # fractions are simplex rows; planted composition recovered
    np.testing.assert_allclose(est.sum(1), 1.0, atol=1e-3)
    err = np.abs(est - planted).mean()
    assert err < 0.15, f"mean abs fraction error {err:.3f}"
    # membership artifact covers every cell at both granularities
    memb = pd.read_parquet(out + ".membership.parquet")
    assert {"archetype_k6", "archetype_k12"} <= set(memb.columns)
    assert len(memb) == 700
