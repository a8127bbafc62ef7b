"""CLI-level end-to-end smoke: sim -> backend -> masked-topic / bge /
clustering / layout drive the real subcommand handlers (argv in, files
out)."""

import numpy as np
import pytest

from legume_tpu.cli import main as cli
from legume_tpu.data.sim import simulate_topic, write_topic_sim


@pytest.fixture(scope="module")
def sim_path(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    sim = simulate_topic(rows=80, cols=300, factors=3, depth=1500, seed=6)
    path = write_topic_sim(sim, str(tmp / "sim"))
    return path, tmp


def test_cli_masked_topic(sim_path):
    path, tmp = sim_path
    out = str(tmp / "mt")
    cli.run_senna(
        [
            "masked-topic", "--data-files", path, "--out", out,
            "-k", "3", "--window", "32", "--embed-dim", "16",
            "--epochs", "10", "--minibatch-size", "64",
        ]
    )
    import pandas as pd

    z = pd.read_parquet(out + ".latent.parquet")
    assert z.shape == (300, 4)
    theta = np.exp(z.iloc[:, 1:].to_numpy())
    np.testing.assert_allclose(theta.sum(1), 1.0, rtol=1e-3)


def test_cli_bge(sim_path):
    path, tmp = sim_path
    out = str(tmp / "bge")
    cli.run_senna(
        [
            "bge", "--data-files", path, "--out", out,
            "-d", "8", "--epochs", "120", "--sort-dim", "5", "--proj-dim", "16",
            "--posterior", "8",
        ]
    )
    import pandas as pd

    e = pd.read_parquet(out + ".latent.parquet")
    assert e.shape == (300, 9)
    f = pd.read_parquet(out + ".feature_embedding.parquet")
    assert f.shape == (80, 9)
    assert np.isfinite(e.iloc[:, 1:].to_numpy()).all()
    fp = pd.read_parquet(out + ".feature_posterior.parquet")
    assert len(fp) == 80 and fp["pip"].between(0, 1).all()
    assert np.isfinite(fp["posterior_norm"]).all()


def test_cli_beans_qc(sim_path):
    path, tmp = sim_path
    out = str(tmp / "qc")
    cli.run_beans(["qc", path, "--output", out])
    import pandas as pd

    qc = pd.read_parquet(out + ".qc.parquet")
    assert len(qc) == 300
    assert qc.keep.mean() > 0.5
