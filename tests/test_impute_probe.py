"""senna impute + probe tests."""

import numpy as np
from pathlib import Path
import scipy.sparse as sp

from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.senna.impute import impute_counts, probe_latent


def test_impute_smooths_dropouts():
    rng = np.random.default_rng(0)
    d, n = 40, 200
    # two latent groups with distinct profiles
    group = np.arange(n) % 2
    rates = np.where(group[:, None] == 0, 5.0, 0.5) * np.ones((n, d))
    rates[:, : d // 2] = np.where(group[:, None] == 1, 5.0, 0.5)
    y = rng.poisson(rates).astype(np.float32)
    latent = np.stack([group + rng.normal(0, 0.05, n), rng.normal(0, 0.05, n)], 1)
    be = MemoryBackend(sp.csc_matrix(y.T))
    imp = impute_counts(be, latent.astype(np.float32), knn=10, cell_block=64)
    assert imp.shape == (n, d)
    # imputed values are smoother: per-group variance shrinks
    raw_var = y[group == 0].var(0).mean()
    imp_var = imp[group == 0].var(0).mean()
    assert imp_var < 0.5 * raw_var
    # group means preserved
    np.testing.assert_allclose(
        imp[group == 0].mean(0), y[group == 0].mean(0), rtol=0.25, atol=0.5
    )


def test_probe_flags_drift():
    rng = np.random.default_rng(1)
    train = rng.normal(0, 1, size=(500, 4)).astype(np.float32)
    same = rng.normal(0, 1, size=(200, 4)).astype(np.float32)
    shifted = same + 3.0
    v_ok = probe_latent(train, same)
    v_drift = probe_latent(train, shifted)
    assert v_ok.verdict == "ok"
    assert v_drift.verdict in ("drift", "novel")
    assert v_drift.drift_score > v_ok.drift_score


def test_predict_dispatch_vae_and_masked(tmp_path):
    """`senna predict` dispatches on model_type (predict.rs:287): vae
    and masked models round-trip through their saved weights and agree
    with the training-time latents on the SAME data."""
    import pandas as pd

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sim import simulate_topic, write_topic_sim

    sim = simulate_topic(rows=80, cols=250, factors=3, depth=1500, seed=8)
    path = write_topic_sim(sim, str(tmp_path / "sim"))

    # vae
    vf = str(tmp_path / "vae")
    cli.run_senna([
        "vae", "--data-files", path, "--out", vf, "-k", "4",
        "--encoder-layers", "24", "--epochs", "10", "--sort-dim", "4",
        "--num-levels", "1", "--iter-opt", "3",
    ])
    pv = str(tmp_path / "pv")
    cli.run_senna(["predict", "--data-files", path, "--model", vf, "--out", pv])
    z_train = pd.read_parquet(f"{vf}.latent.parquet").iloc[:, 1:].to_numpy()
    z_pred = pd.read_parquet(f"{pv}.latent.parquet").iloc[:, 1:].to_numpy()
    assert z_pred.shape == z_train.shape
    # same data, same encoder: correlated latents (train used batch-null
    # inputs per pb; predict uses none, so exact equality is not expected)
    r = np.corrcoef(z_train.ravel(), z_pred.ravel())[0, 1]
    assert r > 0.9, r

    # masked-topic
    mf = str(tmp_path / "mt")
    cli.run_senna([
        "masked-topic", "--data-files", path, "--out", mf, "-k", "3",
        "--window", "24", "--embed-dim", "8", "--epochs", "8",
        "--minibatch-size", "64",
    ])
    pm = str(tmp_path / "pm")
    cli.run_senna(["predict", "--data-files", path, "--model", mf, "--out", pm])
    zt = pd.read_parquet(f"{mf}.latent.parquet").iloc[:, 1:].to_numpy()
    zp = pd.read_parquet(f"{pm}.latent.parquet").iloc[:, 1:].to_numpy()
    assert zp.shape == zt.shape
    np.testing.assert_allclose(np.exp(zp).sum(1), 1.0, rtol=1e-3)
    r = np.corrcoef(zt.ravel(), zp.ravel())[0, 1]
    assert r > 0.95, r


def test_eval_topic_refinement_improves_llik(tmp_path):
    """eval-topic inference-time refinement (topic_refinement.rs):
    refined log-proportions must raise the multinomial likelihood
    against the frozen dictionary vs the raw encoder output, and stay
    on the simplex; batch files feed the encoder-null stream."""
    import pandas as pd

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sim import simulate_topic, write_topic_sim

    sim = simulate_topic(rows=80, cols=200, factors=3, depth=2000, seed=9)
    path = write_topic_sim(sim, str(tmp_path / "sim"))
    fit = str(tmp_path / "fit")
    cli.run_senna([
        "topic", "--data-files", path, "--out", fit, "-k", "3",
        "--encoder-layers", "24", "--epochs", "15", "--minibatch-size", "64",
        "--num-levels", "1", "--sort-dim", "4", "--iter-opt", "5",
    ])
    p0 = str(tmp_path / "p0")
    cli.run_senna(["predict", "--data-files", path, "--model", fit, "--out", p0])
    p1 = str(tmp_path / "p1")
    batches = tmp_path / "batch.txt"
    batches.write_text("\n".join("ab"[j % 2] for j in range(200)) + "\n")
    cli.run_senna([
        "eval-topic", "--data-files", path, "--model", fit, "--out", p1,
        "--refine-steps", "20", "--refine-lr", "0.05",
        "--batch-files", str(batches),
    ])
    z0 = pd.read_parquet(f"{p0}.latent.parquet").iloc[:, 1:].to_numpy()
    z1 = pd.read_parquet(f"{p1}.latent.parquet").iloc[:, 1:].to_numpy()
    assert np.allclose(np.exp(z1).sum(1), 1, atol=1e-3)

    from legume_tpu.data import open_sparse_matrix

    be = open_sparse_matrix(path)
    x = np.asarray(be.read_columns_csc(np.arange(200)).todense()).T  # [N, D]
    ld = pd.read_parquet(f"{fit}.dictionary.parquet").set_index("gene").to_numpy()
    if not np.all(ld <= 0):
        ld = np.log(np.maximum(ld, 1e-12))

    def llik(z):
        lr = np.zeros_like(x)
        m = (z[:, :, None] + ld.T[None]).max(axis=1)
        lr = m + np.log(
            np.exp(z[:, :, None] + ld.T[None] - m[:, None, :]).sum(axis=1)
        )
        return float((x * lr).sum(1).mean())

    l0, l1 = llik(z0), llik(z1)
    assert l1 >= l0 - 1e-3, f"refinement degraded llik: {l0:.2f} -> {l1:.2f}"


def test_predict_decoder_only_delta_and_residual(tmp_path):
    """predict --decoder-only / --delta-iters / --residual-out
    (predict.rs LatentMode::DecoderOnly, predict_tmle.rs:143,
    predict.rs:1355 write_residual_backend): decoder-only latent is a
    finite simplex that tracks the planted topics; the TMLE delta
    recovers the per-batch effect direction; the residual backend has
    the input's shape and gene/cell names and nonneg entries."""
    import pandas as pd

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sim import simulate_topic, write_topic_sim
    from legume_tpu.data.sparse_io import open_sparse_matrix

    sim = simulate_topic(
        rows=80, cols=500, factors=3, batches=2,
        pve_topic=0.7, pve_batch=0.8, depth=2000, seed=13,
    )
    path = write_topic_sim(sim, str(tmp_path / "pd"))
    batch_file = tmp_path / "batches.txt"
    batch_file.write_text("\n".join(f"b{int(b)}" for b in sim.batch) + "\n")
    fit = str(tmp_path / "fit")
    cli.main([
        "senna", "topic", "--data-files", path, "--out", fit,
        "-k", "3", "--encoder-layers", "16", "--epochs", "15",
        "--minibatch-size", "64", "--num-levels", "2", "--sort-dim", "5",
        "--proj-dim", "12", "--iter-opt", "5", "--block-size", "256",
        "--decoder", "nb",
    ])

    out = str(tmp_path / "po")
    res_path = str(tmp_path / "resid.zarr")
    cli.main([
        "senna", "predict", "--data-files", path, "--model", fit,
        "--out", out, "--block-size", "256",
        "--batch-files", str(batch_file),
        "--decoder-only", "--delta-iters", "2",
        "--residual-out", res_path, "--residual-include-delta",
    ])

    z = pd.read_parquet(out + ".latent.parquet").iloc[:, 1:].to_numpy()
    assert np.isfinite(z).all()
    np.testing.assert_allclose(np.exp(z).sum(1), 1.0, atol=1e-3)
    # decoder-only latent separates the planted topics
    theta = np.exp(z)
    true_k = sim.theta.argmax(1)
    cent = np.stack([theta[true_k == k].mean(0) for k in range(3)])
    spread = np.linalg.norm(cent[:, None] - cent[None, :], axis=-1)
    assert spread[np.triu_indices(3, 1)].mean() > 0.05

    # TMLE delta tracks the simulated batch contrast in direction
    delta = pd.read_parquet(out + ".delta.parquet")
    est = np.log(delta[["batch0", "batch1"]].to_numpy())
    true_c = sim.ln_delta[:, 1] - sim.ln_delta[:, 0]
    r = np.corrcoef(true_c, est[:, 1] - est[:, 0])[0, 1]
    assert r > 0.3, f"delta contrast correlation too low: {r:.3f}"

    # residual backend round-trips with names and nonneg entries
    resid = open_sparse_matrix(res_path)
    assert resid.num_rows == 80 and resid.num_columns == 500
    assert resid.row_names()[:3] == open_sparse_matrix(path).row_names()[:3]
    block = resid.read_columns_csc(np.arange(50))
    assert (block.data >= 0).all()
    # division by the model's own rates recenters the residual near 1
    assert 0.2 < float(np.median(block.data)) < 5.0


def test_impute_reference_mode_recovers_full_profiles(tmp_path):
    """senna impute reference mode (impute.rs pipeline): a gene-PANEL
    query projects through the trained encoder, finds reference
    neighbors in latent space, and the weighted-average imputation
    recovers the full-feature profile direction of each query cell."""
    import pandas as pd
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sim import simulate_topic, write_topic_sim
    from legume_tpu.data.sparse_io import create_sparse_from_csc

    sim = simulate_topic(rows=100, cols=600, factors=3, batches=1, depth=3000, seed=21)
    ref_path = write_topic_sim(sim, str(tmp_path / "ref"))
    fit = str(tmp_path / "fit")
    cli.main([
        "senna", "topic", "--data-files", ref_path, "--out", fit,
        "-k", "3", "--encoder-layers", "16", "--epochs", "15",
        "--minibatch-size", "64", "--num-levels", "2", "--sort-dim", "5",
        "--proj-dim", "12", "--iter-opt", "5", "--block-size", "256",
        "--decoder", "multinomial",
    ])

    # panel query: first 150 reference cells restricted to 40 genes
    full = sim.counts.tocsc()
    panel_genes = np.arange(40)
    query = full[panel_genes[:, None], np.arange(150)[None, :]]
    qpath = str(tmp_path / "query.zarr")
    create_sparse_from_csc(
        sp.csc_matrix(query), qpath,
        [f"g{i}" for i in panel_genes], [f"q{j}" for j in range(150)],
    )

    out = str(tmp_path / "imp")
    cli.main([
        "senna", "impute", "--data-files", qpath, "--out", out,
        "--model", fit, "--reference-latent", fit + ".latent.parquet",
        "--reference-data", ref_path, "--knn", "10",
        "--knn-temperature", "0.5", "--block-size", "256",
    ])
    imp = pd.read_parquet(out + ".imputed.parquet")
    assert imp.shape == (150, 101)  # cell col + 100 reference genes
    vals = imp.iloc[:, 1:].to_numpy()
    assert np.isfinite(vals).all() and (vals >= 0).all()

    # imputed full profiles track each query cell's TRUE full profile
    truth = np.asarray(full[:, :150].todense()).T  # [150, 100]
    r = [
        np.corrcoef(vals[j], truth[j])[0, 1]
        for j in range(150)
        if truth[j].std() > 0 and vals[j].std() > 0
    ]
    assert np.mean(r) > 0.5, f"mean per-cell correlation {np.mean(r):.3f}"


def test_probe_model_conformal_and_counterfactual(tmp_path):
    """senna probe model mode (probe.rs): in-distribution query reads
    covered; an out-of-distribution query (shuffled gene programs)
    reads novel with a high flag rate; --counterfactual reports a
    LARGER benefit for the novel batch than the covered one (updating
    helps more when the model does not explain the cells)."""
    import json

    import pandas as pd
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sim import simulate_topic, write_topic_sim
    from legume_tpu.data.sparse_io import create_sparse_from_csc

    # ONE generative model; columns split into train / calibration /
    # covered-query so the null and query share the dictionary
    sim = simulate_topic(rows=60, cols=1400, factors=3, batches=1,
                         pve_topic=0.8, depth=2000, seed=23)
    full = sim.counts.tocsc()
    gnames = [f"g{i}" for i in range(60)]

    def _write(cols, prefix, names):
        p = str(tmp_path / f"{prefix}.zarr")
        create_sparse_from_csc(full[:, cols], p, gnames, names)
        return p

    path = _write(np.arange(800), "tr", [f"t{j}" for j in range(800)])
    fit = str(tmp_path / "fit")
    cli.main([
        "senna", "topic", "--data-files", path, "--out", fit,
        "-k", "3", "--encoder-layers", "16", "--epochs", "15",
        "--minibatch-size", "64", "--num-levels", "2", "--sort-dim", "5",
        "--proj-dim", "12", "--iter-opt", "5", "--block-size", "256",
        "--decoder", "multinomial",
    ])
    cal = _write(np.arange(800, 1100), "cal", [f"c{j}" for j in range(300)])
    cov = _write(np.arange(1100, 1400), "cov", [f"v{j}" for j in range(300)])
    # novel query: rows permuted -> programs the dictionary never saw
    rng = np.random.default_rng(0)
    perm = rng.permutation(60)
    nov_counts = full[:, 1100:1400].tocsr()[perm].tocsc()
    nov = str(tmp_path / "nov.zarr")
    create_sparse_from_csc(
        nov_counts, nov, gnames, [f"q{j}" for j in range(300)],
    )

    out_c = str(tmp_path / "pc")
    cli.main([
        "senna", "probe", "--data-files", cov, "--model", fit,
        "--calibration", cal, "--out", out_c, "--counterfactual",
    ])
    doc_c = json.loads(Path(out_c + ".probe.json").read_text())
    out_n = str(tmp_path / "pn")
    cli.main([
        "senna", "probe", "--data-files", nov, "--model", fit,
        "--calibration", cal, "--out", out_n, "--counterfactual",
    ])
    doc_n = json.loads(Path(out_n + ".probe.json").read_text())

    assert doc_c["verdict"] == "covered", doc_c
    assert doc_n["verdict"] == "novel", doc_n
    assert doc_n["flag_rate"] > doc_c["flag_rate"] + 0.2
    # the novel batch pulls the dictionary harder than the covered one
    # (the reference reports magnitudes, no decision rule on this axis)
    assert (doc_n["counterfactual"]["pull_norm"]
            > doc_c["counterfactual"]["pull_norm"])
    for doc in (doc_c, doc_n):
        cfd = doc["counterfactual"]
        assert np.isfinite(cfd["benefit"]) and np.isfinite(cfd["forgetting"])
        assert len(cfd["pull_norm_per_topic"]) == 3
    fitdf = pd.read_parquet(out_n + ".probe.fit.parquet")
    assert len(fitdf) == 300
