"""One manifest-chained multi-command pipeline (VERDICT r4 #10):
sim -> data-beans from-mtx -> senna topic -> clustering (--from) ->
annotate-by-enrichment -> plot-topic (--from), the way the reference's
run-manifest contract is actually used (run_manifest.rs:269-952),
plus the artifact-kind guard firing on a mis-fed signed latent."""

import gzip

import numpy as np
import pandas as pd
import pytest

from legume_tpu.cli import main as cli
from legume_tpu.data.sim import simulate_topic


@pytest.fixture(scope="module")
def chain(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("chain")
    sim = simulate_topic(rows=80, cols=300, factors=3, depth=2000, seed=11)
    # start from the interchange format, not our own writer: mtx in,
    # backend out through the real data-beans ingest
    from scipy.io import mmwrite

    mmwrite(str(tmp / "counts.mtx"), sim.counts)
    (tmp / "rows.txt").write_text("\n".join(sim.row_names) + "\n")
    (tmp / "cols.txt").write_text("\n".join(sim.col_names) + "\n")
    return tmp, sim


def test_manifest_chained_pipeline(chain):
    tmp, sim = chain
    backend = str(tmp / "b.zarr")
    cli.main([
        "data-beans", "from-mtx", "--mtx", str(tmp / "counts.mtx"),
        "--rows", str(tmp / "rows.txt"), "--cols", str(tmp / "cols.txt"),
        "--output", backend,
    ])

    fit = str(tmp / "fit")
    cli.run_senna([
        "topic", "--data-files", backend, "--out", fit, "-k", "3",
        "--encoder-layers", "32", "--epochs", "15", "--minibatch-size", "64",
        "--num-levels", "1", "--sort-dim", "5", "--proj-dim", "16",
        "--iter-opt", "5", "--block-size", "256",
    ])
    manifest = pd.read_json(fit + ".senna.json", typ="series")
    assert manifest["command"] == "topic"

    # clustering chains its latent from the fit's manifest (--from)
    cl = str(tmp / "cl")
    cli.run_senna([
        "clustering", "--from", fit, "--out", cl, "--method", "kmeans",
        "--n-clusters", "3",
    ])
    labels = pd.read_parquet(cl + ".clusters.parquet")
    assert len(labels) == 300 and labels.cluster.nunique() >= 2

    # marker panel from the sim's true dictionary -> GMT
    gmt = tmp / "markers.gmt"
    with open(gmt, "w") as f:
        for t in range(3):
            top = np.argsort(-sim.beta[:, t])[:10]
            genes = "\t".join(sim.row_names[i] for i in top)
            f.write(f"type{t}\tna\t{genes}\n")
    ann = str(tmp / "ann")
    cli.run_senna([
        "annotate-by-enrichment", "--data-files", backend,
        "--clusters", cl + ".clusters.parquet", "--markers", str(gmt),
        "--out", ann, "--min-markers", "3", "--min-score", "0.0",
    ])
    import glob
    import os

    ann_files = glob.glob(ann + "*")
    assert ann_files, "annotate wrote nothing"

    # plot-topic chains latent + dictionary from the fit's manifest
    fig = str(tmp / "fig.png")
    cli.run_senna([
        "plot-topic", "--from", fit, "--out", fig,
        "--clusters", cl + ".clusters.parquet",
    ])
    assert os.path.exists(fig) and os.path.getsize(fig) > 0

    # artifact-kind guard (run_manifest.rs ArtifactScale): a SIGNED
    # latent fed where a (log-)simplex is required must raise, not
    # silently produce NaNs
    signed = str(tmp / "signed.latent.parquet")
    rng = np.random.default_rng(0)
    pd.DataFrame(
        rng.standard_normal((300, 3)), columns=["k0", "k1", "k2"],
        index=sim.col_names,
    ).reset_index(names="cell").to_parquet(signed)
    with pytest.raises((ValueError, SystemExit)):
        cli.run_senna([
            "plot-topic", "--latent", signed, "--out", str(tmp / "bad.png"),
        ])
