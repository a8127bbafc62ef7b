"""data-beans handler parity: align/reorder/squeeze/subsample/stat."""

import numpy as np
import scipy.sparse as sp

from legume_tpu.data.builders import (
    align_backends,
    backend_stat,
    merge_backends,
    reorder_backend,
    squeeze_backend,
    subsample_backend,
)
from legume_tpu.data.sparse_io import create_sparse_from_csc, open_sparse_matrix


def _mk(tmp_path, name, dense, rows, cols):
    p = str(tmp_path / name)
    create_sparse_from_csc(sp.csc_matrix(np.asarray(dense, np.float32)), p, rows, cols)
    return p


def test_align_then_merge_on_row_union(tmp_path):
    a = _mk(tmp_path, "a", [[0, 1, 2], [3, 4, 5]], ["gX", "gY"], ["a0", "a1", "a2"])
    b = _mk(tmp_path, "b", [[0, 1], [4, 5]], ["gY", "gZ"], ["b0", "b1"])
    align_backends([a, b], [a + ".al", b + ".al"])
    m = merge_backends([a + ".al", b + ".al"], str(tmp_path / "m"))
    assert m.row_names() == ["gX", "gY", "gZ"]
    d = np.asarray(m.read_columns_csc(np.arange(5)).todense())
    np.testing.assert_array_equal(
        d, [[0, 1, 2, 0, 0], [3, 4, 5, 0, 1], [0, 0, 0, 4, 5]]
    )


def test_reorder_and_missing_name(tmp_path):
    p = _mk(tmp_path, "r", [[1, 2, 3]], ["g"], ["c0", "c1", "c2"])
    out = reorder_backend(p, str(tmp_path / "ro"), ["c2", "c0"])
    assert out.column_names() == ["c2", "c0"]
    d = np.asarray(out.read_columns_csc(np.arange(2)).todense())
    np.testing.assert_array_equal(d, [[3, 1]])
    import pytest

    with pytest.raises(ValueError, match="absent"):
        reorder_backend(p, str(tmp_path / "bad"), ["nope"])


def test_squeeze_subsample_stat(tmp_path):
    dense = np.zeros((4, 6), np.float32)
    dense[0] = 1.0
    dense[2, 3] = 7.0
    p = _mk(tmp_path, "s", dense, ["r0", "r1", "r2", "r3"], [f"c{i}" for i in range(6)])
    sq = squeeze_backend(p, str(tmp_path / "sq"))
    assert sq.row_names() == ["r0", "r2"]
    sub = subsample_backend(p, str(tmp_path / "sub"), 3, seed=0)
    assert sub.num_columns == 3
    st = backend_stat(p)
    assert st["nrow"] == 4 and st["ncol"] == 6
    assert st["zero_rows"] == 2
    assert st["total"] == 13.0


def test_builder_squeeze_qc_extensions_and_gene_subsample(tmp_path):
    """data-beans surface extensions (QcArgs / SubsampleArgs /
    do_squeeze trio): builder squeeze drops sub-cutoff rows/cols; qc
    exposes ribo pattern + feature keep list + report; subsample takes
    fractions on both axes."""
    import json

    import pandas as pd
    import scipy.sparse as sp
    from pathlib import Path

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sparse_io import create_sparse_from_csc, open_sparse_matrix

    rng = np.random.default_rng(0)
    d, n = 30, 80
    m = rng.poisson(2.0, (d, n)).astype(np.float32)
    m[5] = 0  # dead gene
    m[:, 7] = 0  # dead cell
    names = [f"g{i}" for i in range(d)]
    names[0] = "MT-CO1"
    names[1] = "RPL3"
    # write an mtx triple
    mtx = tmp_path / "m.mtx"
    coo = sp.coo_matrix(m)
    with open(mtx, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{d} {n} {coo.nnz}\n")
        for r, c, v in zip(coo.row, coo.col, coo.data):
            f.write(f"{r + 1} {c + 1} {v}\n")
    rows = tmp_path / "rows.txt"
    rows.write_text("\n".join(names) + "\n")
    out = str(tmp_path / "b.zarr")
    cli.run_beans([
        "from-mtx", "--mtx", str(mtx), "--rows", str(rows), "--output", out,
        "--do-squeeze", "--row-nnz-cutoff", "1", "--column-nnz-cutoff", "1",
    ])
    be = open_sparse_matrix(out)
    assert be.num_rows == d - 1 and be.num_columns == n - 1

    qc_out = str(tmp_path / "q")
    cli.run_beans([
        "qc", out, "--output", qc_out, "--ribo-pattern", "^RPL",
        "--feature-min-cells", "5", "--report", "--mads", "4",
    ])
    qdf = pd.read_parquet(qc_out + ".qc.parquet")
    assert "ribo_frac" in qdf.columns and qdf.ribo_frac.max() > 0
    fdf = pd.read_parquet(qc_out + ".qc.features.parquet")
    assert fdf.keep.sum() > 0
    rep = json.loads(Path(qc_out + ".qc.report.json").read_text())
    assert "median_ribo_frac" in rep

    sub = str(tmp_path / "s.zarr")
    cli.run_beans([
        "subsample", out, "--output", sub,
        "--cell-frac", "0.5", "--gene-frac", "0.5",
    ])
    sb = open_sparse_matrix(sub)
    assert sb.num_columns == round(0.5 * (n - 1))
    assert sb.num_rows == round(0.5 * (d - 1))


def test_from_zarr_raw_store(tmp_path):
    """`data-beans from-zarr` ingests a raw CSR zarr-v2 store (the
    Xenium cell_feature_matrix layout): numeric chunks via
    tensorstore, names from group attrs, row-type select/remove
    filter, and the .zarr.zip archive path (from_zarr.rs:129-260)."""
    import json
    import os
    import zipfile

    import tensorstore as ts

    from legume_tpu.cli import main as cli

    rng = np.random.default_rng(0)
    dense = rng.poisson(1.0, (6, 9)).astype(np.float32)
    dense[4] = 0  # an "aggregate" row the filter should drop anyway
    csr = sp.csr_matrix(dense)
    store = str(tmp_path / "cfm.zarr")

    def put(field, arr, dtype):
        spec = {
            "driver": "zarr",
            "kvstore": {"driver": "file", "path": f"{store}/{field}"},
            "metadata": {
                "shape": list(arr.shape),
                "chunks": list(arr.shape),
                "dtype": dtype,
                "compressor": {"id": "zlib", "level": 5},
            },
            "create": True,
        }
        ts.open(spec).result()[...] = arr

    put("cell_features/data", csr.data.astype(np.float32), "<f4")
    put("cell_features/indices", csr.indices.astype(np.uint32), "<u4")
    put("cell_features/indptr", csr.indptr.astype(np.uint32), "<u4")
    genes = [f"g{i}" for i in range(6)]
    types = ["Gene Expression"] * 4 + ["Aggregate counts", "Gene Expression"]
    with open(f"{store}/cell_features/.zattrs", "w") as f:
        json.dump(
            {"feature_keys": genes, "feature_ids": genes,
             "feature_types": types}, f,
        )
    # Xenium packed cell ids: [N, 2] uint32 -> "aaaaaaah-1" style
    ids = np.stack([np.arange(9, dtype=np.uint32),
                    np.ones(9, np.uint32)], 1)
    put("cell_features/cell_id", ids, "<u4")

    out = str(tmp_path / "built.zarr")
    cli.run_beans(["from-zarr", store, "--output", out])
    be = open_sparse_matrix(out)
    # row 4 (Aggregate) dropped by the default remove pattern
    assert be.num_rows == 5 and be.num_columns == 9
    assert be.row_names() == ["g0", "g1", "g2", "g3", "g5"]
    assert be.column_names()[0] == "aaaaaaaa-1"
    keep = [0, 1, 2, 3, 5]
    np.testing.assert_allclose(
        np.asarray(be.read_columns_csc(np.arange(9)).todense()),
        dense[keep],
    )

    # the same store as a .zarr.zip archive
    zpath = str(tmp_path / "cfm.zarr.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(store):
            for fn in files:
                p = os.path.join(root, fn)
                zf.write(p, os.path.relpath(p, store))
    out2 = str(tmp_path / "built2.zarr")
    cli.run_beans(["from-zarr", zpath, "--output", out2])
    be2 = open_sparse_matrix(out2)
    assert be2.num_rows == 5 and be2.row_names() == be.row_names()
