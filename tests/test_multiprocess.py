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
