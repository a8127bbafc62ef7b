"""cocoa diff end-to-end through the file-based driver (run_diff path),
including permutation p-values (SURVEY.md section 3.3 call stack)."""

import numpy as np
import pytest

from legume_tpu.cocoa.diff import CocoaDiffArgs, run_cocoa_diff
from legume_tpu.cocoa.sim import simulate_one
from legume_tpu.data.sparse_io import create_sparse_from_csc


def test_cocoa_diff_e2e(tmp_path):
    sim = simulate_one(
        n_genes=60, n_indv=10, cells_per_indv=30, n_causal=8,
        pve_exposure_gene=0.6, depth=3000, seed=5,
    )
    be_path = str(tmp_path / "counts.zarr")
    create_sparse_from_csc(
        sim.counts, be_path,
        [f"g{i}" for i in range(60)],
        [f"c{j}" for j in range(sim.counts.shape[1])],
    )
    indv_file = tmp_path / "indv.txt"
    indv_file.write_text("\n".join(f"i{v}" for v in sim.cell_indv) + "\n")
    exp_file = tmp_path / "exposure.tsv"
    exp_file.write_text("".join(f"i{i}\t{x}\n" for i, x in enumerate(sim.exposure)))

    out = str(tmp_path / "de")
    res = run_cocoa_diff(
        CocoaDiffArgs(
            data_files=[be_path],
            out=out,
            indv_file=str(indv_file),
            exposure_file=str(exp_file),
            n_pb_samples=4,
            knn=5,
            n_opt_iter=40,
            n_permutations=8,
            proj_dim=12,
        )
    )
    import pandas as pd
    from pathlib import Path

    for sfx in [".effect.parquet", ".shared.parquet", ".residual.parquet",
                ".pvalue.parquet", ".cocoa.json"]:
        assert Path(out + sfx).exists(), sfx

    eff = pd.read_parquet(out + ".effect.parquet")
    assert len(eff) == 60
    assert np.all(np.isfinite(eff.effect))
    # causal genes have systematically larger |effect|
    causal = sim.causal_genes
    assert np.abs(res["effect"][causal]).mean() > np.abs(res["effect"][~causal]).mean()
    # permutation p-values: enriched for small values on causal genes
    pv = pd.read_parquet(out + ".pvalue.parquet").pvalue.to_numpy()
    assert pv[causal].mean() < pv[~causal].mean()


def test_cocoa_cnv_side_channel_recovers_amplified_block(tmp_path):
    # 8 individuals; carriers 0-1 have a 2.2x amplified gene block
    # [20, 36) — a minority, so the auto-detected "normal" reference is
    # identifiable (a ~50% carrier fraction makes the sign ambiguous, in
    # the reference implementation too). Exposure orthogonal to carriers.
    import gzip

    import pandas as pd

    rng = np.random.default_rng(11)
    g, n_indv, cpi = 60, 8, 40
    n = n_indv * cpi
    base = rng.gamma(2.0, 1.0, size=g)
    cell_indv = np.repeat(np.arange(n_indv), cpi)
    rate = np.tile(base[:, None], (1, n))
    carriers = np.arange(2)
    amp = slice(20, 36)
    for i in carriers:
        rate[amp, cell_indv == i] *= 2.2
    counts = rng.poisson(rate * 5.0).astype(np.float32)
    import scipy.sparse as sp

    be_path = str(tmp_path / "cnv_counts.zarr")
    create_sparse_from_csc(
        sp.csc_matrix(counts), be_path,
        [f"g{i}" for i in range(g)], [f"c{j}" for j in range(n)],
    )
    (tmp_path / "indv.txt").write_text(
        "\n".join(f"i{v}" for v in cell_indv) + "\n"
    )
    exposure = np.tile([0, 1], n_indv // 2)  # alternating: orthogonal
    (tmp_path / "exp.tsv").write_text(
        "".join(f"i{i}\t{x}\n" for i, x in enumerate(exposure))
    )
    truth = tmp_path / "truth.tsv"
    pd.DataFrame({
        "gene_idx": np.arange(g), "chr": "chr1",
        "pos": np.arange(g) * 1000 + 500,
    }).to_csv(truth, sep="\t", index=False)

    out = str(tmp_path / "cnv")
    run_cocoa_diff(
        CocoaDiffArgs(
            data_files=[be_path], out=out,
            indv_file=str(tmp_path / "indv.txt"),
            exposure_file=str(tmp_path / "exp.tsv"),
            n_pb_samples=4, knn=5, n_opt_iter=40,
            cnv_ground_truth=str(truth), cnv_ref_iters=2,
        )
    )
    cn = pd.read_parquet(out + ".cnv.states.parquet")
    score = pd.read_parquet(out + ".cnv.cn_score.parquet").set_index("gene")
    assert len(cn) == g  # all genes mapped
    # carriers' mean cn_score inside the block exceeds non-carriers'
    carrier_cols = [c for c in score.columns if int(c.split("@")[0][1:]) < 2]
    other_cols = [c for c in score.columns if c not in carrier_cols]
    blk = [f"g{i}" for i in range(20, 36)]
    rest = [f"g{i}" for i in range(g) if not (20 <= i < 36)]
    gap_block = (
        score.loc[blk, carrier_cols].to_numpy().mean()
        - score.loc[blk, other_cols].to_numpy().mean()
    )
    gap_rest = (
        score.loc[rest, carrier_cols].to_numpy().mean()
        - score.loc[rest, other_cols].to_numpy().mean()
    )
    assert gap_block > 0.25, f"carrier-vs-normal block gap {gap_block:.3f}"
    assert gap_block > gap_rest + 0.2
    # segments BED names the carriers in the amplified region
    with gzip.open(out + ".cnv.segments.bed.gz", "rt") as f:
        seg = [line.split("\t") for line in f]
    carrier_seg = [
        r for r in seg
        if int(r[3].split("@")[0][1:]) < 2 and int(r[1]) < 36000 and int(r[2]) > 20000
    ]
    assert carrier_seg, "no non-neutral segments overlap the amplified block"
    # concordance columns attached to effect output
    eff = pd.read_parquet(out + ".effect.parquet")
    assert {"cnv_concordance_r", "cnv_concordance_p", "cnv_state"} <= set(eff.columns)
    assert np.isfinite(eff["cnv_concordance_r"]).all()
    # normal-sample TSV exists and lists only non-carrier-heavy refs in fit 2
    assert (tmp_path / "cnv.cnv.normal_samples.tsv.gz").exists()


def test_cocoa_cnv_gff_genome_order(tmp_path):
    """--gff mode: gene names match by GFF Name=, TSS ordering by
    (chrom, position), unmatched genes dropped from CNV outputs."""
    import pandas as pd

    from legume_tpu.cocoa.cnv_call import genome_order_from_gff

    gff = tmp_path / "g.gff"
    rows = []
    # genes deliberately OUT of genome order in the name list; g3 absent
    rows.append("chr2\tsrc\tgene\t500\t900\t.\t+\t.\tID=gene:G0;Name=g0")
    rows.append("chr1\tsrc\tgene\t2000\t2400\t.\t-\t.\tID=gene:G1;Name=g1")
    rows.append("chr1\tsrc\tgene\t100\t300\t.\t+\t.\tID=gene:G2;Name=g2")
    gff.write_text("\n".join(rows) + "\n")
    order = genome_order_from_gff(["g0", "g1", "g2", "g3"], str(gff))
    # genome order: chr1 g2 (0-based start 99), chr1 g1 (minus strand
    # TSS = end 2400), chr2 g0; g3 dropped
    assert order.ordered.tolist() == [2, 1, 0]
    assert order.pos.tolist() == [99, 2400, 499]
    assert len(order.chrom_names) == 2


def test_cocoa_cnv_gff_cli_path(tmp_path):
    """--gff mode end-to-end: gene names matched via GFF, CNV artifacts
    written genome-ordered."""
    import pandas as pd

    rng = np.random.default_rng(7)
    g, n_indv, cpi = 30, 6, 30
    n = n_indv * cpi
    base = rng.gamma(2.0, 1.0, size=g)
    cell_indv = np.repeat(np.arange(n_indv), cpi)
    rate = np.tile(base[:, None], (1, n))
    rate[10:20, cell_indv == 0] *= 2.5  # one carrier
    counts = rng.poisson(rate * 5.0).astype(np.float32)
    import scipy.sparse as sp

    be_path = str(tmp_path / "c.zarr")
    create_sparse_from_csc(
        sp.csc_matrix(counts), be_path,
        [f"g{i}" for i in range(g)], [f"c{j}" for j in range(n)],
    )
    (tmp_path / "indv.txt").write_text(
        "\n".join(f"i{v}" for v in cell_indv) + "\n"
    )
    (tmp_path / "exp.tsv").write_text(
        "".join(f"i{i}\t{i % 2}\n" for i in range(n_indv))
    )
    gff = tmp_path / "genes.gff"
    # g29 deliberately absent from the GFF -> dropped from CNV outputs
    gff.write_text("\n".join(
        f"chr1\tsrc\tgene\t{1000 * i + 1}\t{1000 * i + 500}\t.\t+\t.\tID=gene:G{i};Name=g{i}"
        for i in range(g - 1)
    ) + "\n")
    out = str(tmp_path / "gffcnv")
    run_cocoa_diff(
        CocoaDiffArgs(
            data_files=[be_path], out=out,
            indv_file=str(tmp_path / "indv.txt"),
            exposure_file=str(tmp_path / "exp.tsv"),
            n_pb_samples=3, knn=5, n_opt_iter=30,
            gff=str(gff), cnv_ref_iters=1,
        )
    )
    st = pd.read_parquet(out + ".cnv.states.parquet")
    assert len(st) == g - 1  # unmatched gene dropped
    assert st["gene"].tolist() == [f"g{i}" for i in range(g - 1)]  # genome order
    eff = pd.read_parquet(out + ".effect.parquet")
    assert np.isnan(eff.loc[eff["gene"] == "g29", "cnv_concordance_r"]).all()


def test_cocoa_diff_extended_flags(tmp_path):
    """diff --topic-assignment (hard one-hot), --covariate-file OLS
    collider gate, --no-adjust-housekeeping (run_diff.rs surface):
    artifacts land, causal genes still outrank nulls, and turning the
    housekeeping weights off changes the statistic."""
    import pandas as pd

    from legume_tpu.cli import main as cli

    sim = simulate_one(
        n_genes=60, n_indv=10, cells_per_indv=30, n_causal=10,
        pve_exposure_gene=0.5, depth=1500, seed=3,
    )
    be_path = str(tmp_path / "counts.zarr")
    create_sparse_from_csc(
        sim.counts, be_path,
        [f"g{i}" for i in range(60)],
        [f"c{j}" for j in range(sim.counts.shape[1])],
    )
    indv_file = tmp_path / "indv.txt"
    indv_file.write_text("\n".join(f"i{v}" for v in sim.cell_indv) + "\n")
    exp_file = tmp_path / "exposure.tsv"
    exp_file.write_text("".join(f"i{i}\t{x}\n" for i, x in enumerate(sim.exposure)))
    n_cells = sim.counts.shape[1]
    ta = tmp_path / "ta.txt"
    ta.write_text("\n".join(f"t{j % 2}" for j in range(n_cells)) + "\n")
    rng = np.random.default_rng(0)
    cov = tmp_path / "cov.tsv"
    cov.write_text("\n".join(f"{x:.4f}" for x in rng.standard_normal(10)) + "\n")

    out = str(tmp_path / "d")
    cli.main([
        "cocoa", "diff", "--data-files", be_path,
        "--indv", str(indv_file), "--exposure", str(exp_file),
        "--topic-assignment", str(ta), "--covariate-file", str(cov),
        "--out", out, "--n-pb-samples", "6", "--knn", "5",
        "--iter-opt", "30", "--proj-dim", "12",
    ])
    eff = pd.read_parquet(out + ".effect.parquet")
    assert len(eff) == 60 and np.isfinite(eff.effect).all()
    causal = sim.causal_genes
    assert np.abs(eff.effect[causal]).mean() > np.abs(eff.effect[~causal]).mean()

    out2 = str(tmp_path / "d2")
    cli.main([
        "cocoa", "diff", "--data-files", be_path,
        "--indv", str(indv_file), "--exposure", str(exp_file),
        "--topic-assignment", str(ta), "--out", out2,
        "--n-pb-samples", "6", "--knn", "5", "--iter-opt", "30",
        "--proj-dim", "12", "--no-adjust-housekeeping",
    ])
    eff2 = pd.read_parquet(out2 + ".effect.parquet")
    assert not np.allclose(eff.effect, eff2.effect)
