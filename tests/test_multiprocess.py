"""True multi-process execution: N python processes, each with its own
virtual CPU devices, joined by `jax.distributed.initialize` over a
localhost coordinator (the harness SURVEY.md section 4 calls for:
"fake-mesh / multi-process-on-one-host").

Each worker reads ONLY its local devices' column shards of a shared
zarr backend, assembles the global array with
`jax.make_array_from_single_device_arrays`, and the psum'd pseudobulk
plane must equal the serial groupby — plus each worker asserts its
reads stayed inside its own bounds.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest
import scipy.sparse as sp

_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import jax
    jax.config.update("jax_platforms", "cpu")

    work, coord, pid_s = sys.argv[1], sys.argv[2], sys.argv[3]
    pid = int(pid_s)
    from legume_tpu.parallel.multihost import (
        collapse_observed_multihost, column_nnz, plan_column_shards,
        maybe_initialize_distributed,
    )
    assert maybe_initialize_distributed(coord, 2, pid)
    assert jax.process_count() == 2 and jax.process_index() == pid
    n_dev = len(jax.devices())
    assert n_dev == 4 and len(jax.local_devices()) == 2

    import numpy as np
    from legume_tpu.data.sparse_io import open_sparse_matrix
    from legume_tpu.parallel.mesh import make_mesh

    vec = open_sparse_matrix(f"{work}/be")
    groups = np.load(f"{work}/groups.npy")
    mesh = make_mesh(n_dev)
    read_log = []
    out = collapse_observed_multihost(
        vec, groups, mesh, num_groups=int(groups.max()) + 1,
        block_size=32, read_log=read_log,
    )
    # read isolation: all this worker's reads inside its device bounds
    bounds = plan_column_shards(column_nnz(vec), n_dev)
    lo, hi = int(bounds[pid * 2]), int(bounds[(pid + 1) * 2])
    for lb, ub in read_log:
        assert lo <= lb and ub <= hi, (pid, lb, ub, lo, hi)
    np.save(f"{work}/out{pid}.npy", np.asarray(out))
    with open(f"{work}/ok{pid}.json", "w") as f:
        json.dump({"reads": read_log, "lo": lo, "hi": hi}, f)
    """
)


# Whole-pipeline worker: runs the REAL `senna topic` CLI (projection,
# QC, binary sort, matched stats, dp training over the GLOBAL mesh,
# streaming per-cell latent eval) under jax.distributed. Invoked both
# as the single-process reference (no coordinator args) and as each of
# the two distributed workers.
_TOPIC_WORKER = textwrap.dedent(
    """
    import os, sys
    nd = sys.argv[1]
    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={nd}"
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    work, out = sys.argv[2], sys.argv[3]
    if len(sys.argv) > 4:
        os.environ["LEGUME_COORDINATOR"] = sys.argv[4]
        os.environ["LEGUME_NUM_PROCESSES"] = sys.argv[5]
        os.environ["LEGUME_PROCESS_ID"] = sys.argv[6]
    from legume_tpu.cli.main import main
    rc = main([
        "senna", "topic",
        "--data-files", f"{work}/b0", f"{work}/b1",
        "--out", out,
        "-k", "4", "--epochs", "20", "--minibatch-size", "32",
        "--encoder-layers", "16", "16",
        "--proj-dim", "8", "--sort-dim", "3", "--num-levels", "2",
        "--block-size", "64", "--hvg-genes", "30", "--knn-cells", "4",
        "--qc", "--qc-min-total", "1",
        "--data-parallel", "--seed", "11",
    ])
    assert rc == 0, rc
    if len(sys.argv) > 4:
        assert jax.process_count() == 2
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_collapse(tmp_path):
    from legume_tpu.data.sparse_io import create_sparse_from_csc

    rng = np.random.default_rng(3)
    d, n, s = 25, 240, 4
    dense = rng.poisson(1.2, (d, n)).astype(np.float32)
    groups = rng.integers(0, s, n)
    create_sparse_from_csc(
        sp.csc_matrix(dense), str(tmp_path / "be"),
        [f"g{i}" for i in range(d)], [f"c{j}" for j in range(n)],
    )
    np.save(tmp_path / "groups.npy", groups)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(tmp_path), coord, str(p)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for p in range(2)
    ]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, txt in zip(procs, outs):
        assert p.returncode == 0, txt[-3000:]

    want = np.zeros((d, s), np.float32)
    for j in range(n):
        want[:, groups[j]] += dense[:, j]
    for p in range(2):
        got = np.load(tmp_path / f"out{p}.npy")
        np.testing.assert_allclose(got, want, rtol=1e-5)
    # the two workers' reads tile [0, n) without overlap
    ranges = []
    for p in range(2):
        ranges.extend(
            tuple(r) for r in json.loads((tmp_path / f"ok{p}.json").read_text())["reads"]
        )
    ranges.sort()
    cur = 0
    for lb, ub in ranges:
        assert lb == cur
        cur = ub
    assert cur == n


def test_two_process_distributed_topic_cli(tmp_path):
    """VERDICT r2 item 5: the FULL `senna topic` CLI — projection, QC,
    matched stats, dp-sharded training over the global mesh, streaming
    per-cell eval — under 2-process `jax.distributed`, asserting output
    parity with a single-process run on the same 4-device mesh."""
    import pandas as pd

    from legume_tpu.data.sparse_io import create_sparse_from_csc

    rng = np.random.default_rng(7)
    d = 40
    # two backends = two batches (the matched-stat counterfactual path)
    for b, (n_b, shift) in enumerate([(150, 0.0), (130, 0.6)]):
        base = rng.gamma(2.0, 1.0, (d, 1)) * np.exp(
            shift * rng.normal(0, 1, (d, 1))
        )
        dense = rng.poisson(base * rng.gamma(3.0, 0.5, (1, n_b))).astype(np.float32)
        create_sparse_from_csc(
            sp.csc_matrix(dense), str(tmp_path / f"b{b}"),
            [f"g{i}" for i in range(d)], [f"b{b}c{j}" for j in range(n_b)],
        )
    script = tmp_path / "topic_worker.py"
    script.write_text(_TOPIC_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])

    # single-process reference on a 4-device dp mesh (same global mesh
    # size as the 2x2 distributed run -> same padding + shard layout)
    ref = subprocess.run(
        [sys.executable, str(script), "4", str(tmp_path), str(tmp_path / "sp")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, timeout=600,
    )
    assert ref.returncode == 0, ref.stdout.decode()[-3000:]

    coord = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [
                sys.executable, str(script), "2", str(tmp_path),
                str(tmp_path / "mp"), coord, "2", str(p),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for p in range(2)
    ]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, txt in zip(procs, outs):
        assert p.returncode == 0, txt[-4000:]

    # only process 0 writes
    assert (tmp_path / "mp.latent.parquet").exists()

    # the QC mask and the cell->pb partition must agree EXACTLY (the
    # per-column projection math is identical on both paths)
    qc_sp = pd.read_parquet(tmp_path / "sp.qc.parquet")
    qc_mp = pd.read_parquet(tmp_path / "mp.qc.parquet")
    assert (qc_sp["keep"] == qc_mp["keep"]).all()
    with np.load(tmp_path / "sp.partition.npz") as z_sp, np.load(
        tmp_path / "mp.partition.npz"
    ) as z_mp:
        np.testing.assert_array_equal(z_sp["fine_groups"], z_mp["fine_groups"])

    # trained outputs: tolerance-band parity (sufficient-stat planes
    # reduce in a different float association across hosts)
    z_sp = pd.read_parquet(tmp_path / "sp.latent.parquet")
    z_mp = pd.read_parquet(tmp_path / "mp.latent.parquet")
    assert list(z_sp["cell"]) == list(z_mp["cell"])
    th_sp = np.exp(z_sp.iloc[:, 1:].to_numpy())
    th_mp = np.exp(z_mp.iloc[:, 1:].to_numpy())
    np.testing.assert_allclose(th_sp, th_mp, atol=0.05)
    # dominant-topic assignment agreement
    agree = (th_sp.argmax(1) == th_mp.argmax(1)).mean()
    assert agree > 0.95, agree

    ll_sp = pd.read_parquet(tmp_path / "sp.log_likelihood.parquet")
    ll_mp = pd.read_parquet(tmp_path / "mp.log_likelihood.parquet")
    np.testing.assert_allclose(
        ll_sp["llik"].to_numpy(), ll_mp["llik"].to_numpy(), rtol=2e-2, atol=1e-2
    )


# dp-sharded pb_gibbs worker: two processes, 2 virtual devices each,
# join a 4-device global mesh; the anchor axis shards across BOTH
# processes and every host must read back identical gathered results.
_GIBBS_WORKER = textwrap.dedent(
    """
    import json, os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import jax
    jax.config.update("jax_platforms", "cpu")

    work, coord, pid_s = sys.argv[1], sys.argv[2], sys.argv[3]
    pid = int(pid_s)
    from legume_tpu.parallel.multihost import maybe_initialize_distributed
    assert maybe_initialize_distributed(coord, 2, pid)
    import numpy as np
    from legume_tpu.embedding.posterior import pb_gibbs
    from legume_tpu.parallel.mesh import make_mesh

    dat = np.load(f"{work}/gibbs_in.npz")
    mesh = make_mesh(len(jax.devices()))
    res = pb_gibbs(
        dat["y"], dat["z"], np.zeros(dat["y"].shape[1]),
        dat["ep"], np.zeros(dat["y"].shape[0]),
        n_sweeps=6, burnin=2, transitions_per_dim=1, seed=5, mesh=mesh,
    )
    np.savez(
        f"{work}/gibbs_out{pid}.npz",
        e_feat_mean=res.e_feat_mean, pip=res.pip,
        e_pb_mean=res.e_pb_mean, b_pb_mean=res.b_pb_mean,
    )
    """
)


def test_two_process_distributed_pb_gibbs(tmp_path):
    """pb_gibbs over a REAL 2-process jax.distributed mesh (VERDICT r3
    item 4): the anchor axis (P=10, pads to 12 on the 4-device mesh)
    shards across processes; both workers finish and read back the
    SAME gathered posterior summaries."""
    rng = np.random.default_rng(0)
    d, p, h = 20, 10, 2
    z = rng.normal(0, 0.9, (d, h))
    ep = rng.normal(0, 0.9, (p, h))
    y = rng.poisson(np.exp(np.clip(ep @ z.T, -6, 4))).astype(np.float32)
    np.savez(tmp_path / "gibbs_in.npz", y=y, z=z, ep=ep)
    script = tmp_path / "gibbs_worker.py"
    script.write_text(_GIBBS_WORKER)

    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(Path(__file__).resolve().parents[1])
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(tmp_path), coord, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [pr.communicate(timeout=300)[0].decode() for pr in procs]
    for pr, txt in zip(procs, outs):
        assert pr.returncode == 0, txt[-3000:]
    a = np.load(tmp_path / "gibbs_out0.npz")
    b = np.load(tmp_path / "gibbs_out1.npz")
    for k in ("e_feat_mean", "pip", "e_pb_mean", "b_pb_mean"):
        np.testing.assert_allclose(a[k], b[k], atol=1e-6, err_msg=k)
    assert a["e_pb_mean"].shape == (p, h)
    assert np.all(np.isfinite(a["e_feat_mean"]))
