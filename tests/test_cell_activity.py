"""faba --cell-scan null-cell calling (editing/cell_activity.rs):
beta-binomial MoM, depth strata, the tolerance sweep, and the CLI."""

import json

import numpy as np

from legume_tpu.faba.cell_activity import (
    call_competent_cells,
    fit_betabinom_mom,
    quantile_strata,
)


def test_fit_betabinom_mom():
    rng = np.random.default_rng(0)
    n = rng.integers(50, 500, 400)
    # true beta-binomial with rho ~ 0.02
    rho, m = 0.02, 0.1
    a = m * (1 - rho) / rho
    b = (1 - m) * (1 - rho) / rho
    p = rng.beta(a, b, 400)
    y = rng.binomial(n, p)
    mean, rho_hat = fit_betabinom_mom(y, n)
    assert abs(mean - m) < 0.02
    assert 0.005 < rho_hat < 0.06, rho_hat
    # binomial data -> rho ~ 0
    y2 = rng.binomial(n, m)
    _, rho0 = fit_betabinom_mom(y2, n)
    assert rho0 < 0.01


def test_quantile_strata():
    v = np.arange(100.0)
    s = quantile_strata(v, n_strata=4, min_per=10)
    assert s.max() == 3 and len(np.unique(s)) == 4
    # monotone in value
    assert (np.diff(s[np.argsort(v)]) >= 0).all()
    # too few cells per stratum collapses
    assert quantile_strata(np.arange(30.0), 12, 50).max() == 0


def _arms(rng, n_comp=300, n_null=300, n_ctrl=600):
    """Competent cells edit at 2%, null + control at 0.2%."""
    cov_c = rng.integers(80, 800, n_comp)
    cov_n = rng.integers(80, 800, n_null)
    cov_k = rng.integers(80, 800, n_ctrl)
    wt_e = np.concatenate([
        rng.binomial(cov_c, 0.02), rng.binomial(cov_n, 0.002)
    ]).astype(float)
    wt_n = np.concatenate([cov_c, cov_n]).astype(float)
    ct_e = rng.binomial(cov_k, 0.002).astype(float)
    return wt_e, wt_n, ct_e, cov_k.astype(float)


def test_call_competent_cells_separates_arms():
    rng = np.random.default_rng(3)
    wt_e, wt_n, ct_e, ct_n = _arms(rng)
    call = call_competent_cells(wt_e, wt_n, ct_e, ct_n, min_per_stratum=30)
    # competent cells overwhelmingly kept, null cells overwhelmingly cut
    assert call.keep[:300].mean() > 0.9, call.keep[:300].mean()
    assert call.keep[300:].mean() < 0.25, call.keep[300:].mean()
    # the QC invariant: the discarded pool looks like the control
    assert call.rejected_over_control < 1.5
    assert call.selected_rate > 5 * call.control_rate


def test_call_control_tail_agrees():
    rng = np.random.default_rng(4)
    wt_e, wt_n, ct_e, ct_n = _arms(rng)
    sweep = call_competent_cells(wt_e, wt_n, ct_e, ct_n, min_per_stratum=30)
    tail = call_competent_cells(
        wt_e, wt_n, ct_e, ct_n, min_per_stratum=30, control_tail=0.05
    )
    # the two cut rules agree closely (cell_activity.rs NullCallOpts doc)
    agree = (sweep.keep == tail.keep).mean()
    assert agree > 0.85, agree


def test_no_control_refuses_to_cut():
    wt_e = np.array([5.0, 0.0])
    wt_n = np.array([100.0, 100.0])
    call = call_competent_cells(wt_e, wt_n, np.zeros(0), np.zeros(0))
    assert call.keep.all() and call.n_scored == 0


def test_cell_scan_cli(tmp_path):
    """argv e2e: WT cells with no conversions (null enzyme) drop from
    site calling; competent cells stay; report JSON written."""
    import pandas as pd

    from legume_tpu.cli import main as cli
    from legume_tpu.faba.bam import write_bam

    comp = [f"comp{i}" for i in range(3)]
    null = [f"null{i}" for i in range(3)]

    def reads(prefix, pos, n_conv, n_ref, cells, read_len=40, off=10):
        out = []
        for i in range(n_conv + n_ref):
            conv = i < n_conv
            md = f"{off}C{read_len - off - 1}" if conv else f"{read_len}"
            seq = list("A" * read_len)
            seq[off] = "T" if conv else "C"
            out.append(dict(name=f"{prefix}{i}", ref_id=0, pos=pos,
                            seq="".join(seq), cigar=f"{read_len}M",
                            cb=cells[i % len(cells)], ub=f"u{prefix}{i}",
                            md=md))
        return out

    wt = []
    # competent cells: heavy conversion at two sites
    for si, pos in enumerate([100, 400]):
        wt += reads(f"c{si}_", pos, 30, 10, comp)
    # null cells: same coverage, no conversions
    for si, pos in enumerate([100, 400]):
        wt += reads(f"n{si}_", pos, 0, 40, null)
    ct = reads("k0_", 100, 1, 60, ["ctrlA", "ctrlB", "ctrlC"]) + reads(
        "k1_", 400, 1, 60, ["ctrlA", "ctrlB", "ctrlC"]
    )
    wt_p, ct_p = str(tmp_path / "wt.bam"), str(tmp_path / "ct.bam")
    write_bam(wt_p, [("chr1", 10000)], wt)
    write_bam(ct_p, [("chr1", 10000)], ct)
    out = str(tmp_path / "cs")
    cli.run_faba([
        "dartseq", "--bam", wt_p, "--control-bam", ct_p, "--output", out,
        "--no-mixture", "--cell-scan", "--cell-scan-min-coverage", "5",
    ])
    rep = json.loads((tmp_path / "cs.cell_scan.json").read_text())
    assert rep["n_kept"] >= 3 and rep["selected_rate"] > rep["control_rate"]
    from legume_tpu.data.sparse_io import open_sparse_matrix

    be = open_sparse_matrix(out + ".zarr")
    cols = be.column_names()
    dense = np.asarray(be.read_columns_csc(np.arange(be.num_columns)).todense())
    by_cell = dict(zip(cols, dense.sum(0)))
    # competent cells carry the conversions; gated null cells keep their
    # column (the barcode axis is stable) but contribute ZERO counts
    assert all(by_cell[c] > 0 for c in comp)
    assert all(by_cell.get(n, 0) == 0 for n in null)
