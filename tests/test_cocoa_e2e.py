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
