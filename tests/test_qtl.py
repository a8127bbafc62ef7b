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


def test_fit_qtl_sgvb_celltype_specific_effect(tmp_path):
    """fit-qtl-sgvb resolves a cell-type-specific eQTL: the causal
    variant's pip is high in the carrier cell type and low in the
    other (fit_qtl_sgvb.rs soft-membership pseudobulk)."""
    rng = np.random.default_rng(4)
    g, i, p, cpi = 4, 60, 20, 24
    maf = rng.uniform(0.2, 0.5, p)
    geno = rng.binomial(2, maf[None, :], size=(i, p)).astype(np.float64)
    gs = (geno - geno.mean(0)) / np.maximum(geno.std(0), 1e-8)
    cell_indv = np.repeat(np.arange(i), cpi)
    n = len(cell_indv)
    ct = np.tile(np.repeat([0, 1], cpi // 2), i)  # half cells each type
    causal = 7
    base = rng.gamma(2.0, 1.0, g)
    log_mu = np.tile(np.log(base)[:, None], (1, n))
    # gene 0 eQTL only in ct0
    log_mu[0, ct == 0] += 0.9 * gs[cell_indv[ct == 0], causal]
    lam = 40.0 * np.exp(np.clip(log_mu, -6, 6))
    counts = rng.poisson(lam).astype(np.float32)
    membership = np.eye(2, dtype=np.float32)[ct]

    from legume_tpu.fagioli.qtl import fit_qtl_sgvb

    rows = fit_qtl_sgvb(
        counts, cell_indv, geno,
        membership_nc=membership, celltype_names=["a", "b"],
        num_steps=500, prior_vars=[0.1, 1.0],
    )
    import pandas as pd

    df = pd.DataFrame(rows)
    pip_a = df[(df.celltype == "a") & (df.gene == 0) & (df.variant == causal)]["pip"]
    pip_b = df[(df.celltype == "b") & (df.gene == 0) & (df.variant == causal)]["pip"]
    assert float(pip_a.iloc[0]) > 0.5, f"carrier-ct pip {float(pip_a.iloc[0]):.2f}"
    assert float(pip_a.iloc[0]) > float(pip_b.iloc[0]) + 0.3
    # rank check too: causal tops the carrier cell type
    sub = df[(df.celltype == "a") & (df.gene == 0)]
    assert int(sub.loc[sub["pip"].idxmax(), "variant"]) == causal


def test_fit_qtl_sgvb_full_cli_surface(tmp_path):
    """fit-qtl-sgvb CLI: --annot (cell,individual,celltype), PLINK
    bounds + --max-individuals, --empirical-bayes, covariates, the
    bed.gz + parameters.json output contract (FitQtlSgvbArgs)."""
    import json

    import pandas as pd
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sparse_io import create_sparse_from_csc
    from legume_tpu.fagioli.plink import write_plink

    rng = np.random.default_rng(5)
    g, i, p, cpi = 3, 50, 12, 16
    maf = rng.uniform(0.2, 0.5, p)
    geno = rng.binomial(2, maf[None, :], size=(i, p)).astype(np.float64)
    gs = (geno - geno.mean(0)) / np.maximum(geno.std(0), 1e-8)
    cell_indv = np.repeat(np.arange(i), cpi)
    n = len(cell_indv)
    causal = 4
    log_mu = np.zeros((g, n))
    log_mu[0] += 1.0 * gs[cell_indv, causal]
    counts = rng.poisson(30.0 * np.exp(np.clip(log_mu, -6, 6))).astype(
        np.float32)
    genes = [f"G{k}" for k in range(g)]
    cells = [f"c{j}" for j in range(n)]
    be = str(tmp_path / "counts.zarr")
    create_sparse_from_csc(sp.csc_matrix(counts), be, genes, cells)
    write_plink(str(tmp_path / "panel"), geno,
                variant_ids=[f"rs{j}" for j in range(p)],
                sample_ids=[f"I{k}" for k in range(i)])
    annot = tmp_path / "annot.tsv"
    annot.write_text("".join(
        f"c{j}\tI{cell_indv[j]}\t{'A' if j % 2 else 'B'}\n"
        for j in range(n)
    ))
    cov = tmp_path / "cov.tsv"
    cov.write_text("indv\tage\n" + "".join(
        f"I{k}\t{30 + k % 7}\n" for k in range(i)))
    out = str(tmp_path / "fit")
    cli.run_fagioli([
        "fit-qtl-sgvb", "--backend", be, "--annot", str(annot),
        "--plink", str(tmp_path / "panel"), "--out", out,
        "--steps", "300", "--empirical-bayes",
        "--prior-var", "0.01", "0.3",
        "--covariates", str(cov), "--composition-covariates",
        "--min-weight", "1", "--seed", "0",
    ])
    df = pd.read_parquet(f"{out}.qtl.parquet")
    # annot's celltype column becomes the (hard) membership
    assert set(df["celltype"]) == {"A", "B"}
    # EB picks ONE prior variance for every fit
    assert df["prior_var"].nunique() == 1
    # the causal variant tops gene 0's pip in both types
    for ct in ("A", "B"):
        sub = df[(df["gene"] == "G0") & (df["celltype"] == ct)]
        assert sub.set_index("variant")["pip"].idxmax() == f"rs{causal}"
    params = json.load(open(f"{out}.parameters.json"))
    assert params["empirical_bayes"] and params["model"] == "susie"
    import gzip

    with gzip.open(f"{out}.results.bed.gz", "rt") as f:
        lines = f.read().splitlines()
    assert lines[0].startswith("#chr") and len(lines) == len(df) + 1

    # --max-individuals subsamples the panel (smoke: runs + shrinks)
    cli.run_fagioli([
        "fit-qtl-sgvb", "--backend", be, "--annot", str(annot),
        "--plink", str(tmp_path / "panel"), "--out",
        str(tmp_path / "sub"), "--steps", "120",
        "--max-individuals", "30", "--min-weight", "1",
    ])
    assert (tmp_path / "sub.qtl.parquet").exists()


def test_sim_qtl_full_roundtrip(tmp_path):
    """sim-qtl (full generator) -> fit-qtl-sgvb recovers a shared
    causal variant (SimQtlArgs surface + the --annot handoff)."""
    import pandas as pd

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sparse_io import open_sparse_matrix

    out = str(tmp_path / "sim")
    cli.run_fagioli([
        "sim-qtl", "--out", out, "--genes", "6", "--indv", "50",
        "--variants", "15", "--num-cell-types", "2",
        "--frac-egenes", "1.0", "--shared-eqtl-proportion", "1.0",
        "--independent-eqtl-proportion", "0.0",
        "--genetic-variance", "0.6", "--cells-per-indv", "20",
        "--depth-per-cell", "3000", "--seed", "3",
    ])
    be = open_sparse_matrix(f"{out}.zarr")
    truth = pd.read_parquet(f"{out}.truth.parquet")
    assert be.num_rows == 6 and len(truth) == 6
    assert set(truth["kind"]) == {"shared"}
    annot = pd.read_csv(f"{out}.annotations.tsv.gz", sep="\t",
                        header=None)
    assert annot.shape[1] == 3 and len(annot) == be.num_columns

    fit_out = str(tmp_path / "fit")
    cli.run_fagioli([
        "fit-qtl-sgvb", "--backend", f"{out}.zarr",
        "--annot", f"{out}.annotations.tsv.gz",
        "--geno", f"{out}.geno.npy", "--out", fit_out,
        "--steps", "300", "--min-weight", "1",
    ])
    res = pd.read_parquet(f"{fit_out}.qtl.parquet")
    # per (gene, celltype): the truth variant should top the pip for
    # most genes (shared effect, strong h2)
    hits = 0
    want = dict(zip(truth["gene"], truth["variant"]))
    for (gene, ct), sub in res.groupby(["gene", "celltype"]):
        top = int(sub.loc[sub["pip"].idxmax(), "variant"].lstrip("v"))
        hits += top == want[gene]
    n_tests = res.groupby(["gene", "celltype"]).ngroups
    assert hits >= int(0.6 * n_tests), (hits, n_tests)


def test_sim_mediation_full_surface(tmp_path):
    """sim-mediation (full generator): collider-bias selection and the
    discovery/replication instrument split (SimMediationArgs)."""
    import pandas as pd

    from legume_tpu.cli import main as cli

    out = str(tmp_path / "med")
    cli.run_fagioli([
        "sim-mediation", "--out", out, "--n", "400", "--p", "60",
        "--num-genes", "10", "--mediators", "4",
        "--num-collider-genes", "2", "--induce-collider-bias",
        "--collider-selection-quantile", "0.5",
        "--n-eqtl-discovery", "150", "--seed", "1",
    ])
    pheno = pd.read_parquet(f"{out}.phenotypes.parquet")
    assert len(pheno) == 400 and pheno["kept"].sum() == 200
    truth = pd.read_parquet(f"{out}.truth.parquet")
    assert truth["is_mediator"].sum() == 4
    assert truth["is_collider"].sum() == 2
    # colliders are never mediators
    assert not (truth["is_mediator"] & truth["is_collider"]).any()
    ss = pd.read_csv(f"{out}.sumstat.tsv", sep="\t")
    assert len(ss) == 60 and "z" in ss.columns
    inst = np.load(f"{out}.instruments.npy")
    alpha = np.load(f"{out}.alpha.npy")
    # instrument selection is enriched at true eQTL sites
    true_rate = inst[alpha != 0].mean()
    bg_rate = inst[alpha == 0].mean()
    assert true_rate > 3 * max(bg_rate, 1e-6)
