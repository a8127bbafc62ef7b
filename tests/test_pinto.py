"""Pinto link-community tests: synthetic spatial domains must be
segmented (reference pattern 3; `pinto lc` on Xenium-style data)."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.pinto.lc import (
    edge_profiles,
    fit_link_community,
    spatial_knn_edges,
)


@pytest.fixture(scope="module")
def spatial_sim():
    """Two spatial domains with distinct expression programs."""
    rng = np.random.default_rng(0)
    n_per, d = 400, 60
    # domain 0 at left, domain 1 at right
    coords = np.concatenate(
        [
            rng.uniform([0, 0], [1, 1], size=(n_per, 2)),
            rng.uniform([1.2, 0], [2.2, 1], size=(n_per, 2)),
        ]
    )
    domain = np.repeat([0, 1], n_per)
    beta = np.full((2, d), 0.3)
    beta[0, : d // 2] = 3.0  # domain-0 genes
    beta[1, d // 2 :] = 3.0  # domain-1 genes
    lam = beta[domain] * 4.0
    y = rng.poisson(lam).astype(np.float32).T  # [D, N]
    return MemoryBackend(sp.csc_matrix(y)), coords, domain


def test_spatial_knn_edges(spatial_sim):
    be, coords, domain = spatial_sim
    edges = spatial_knn_edges(coords, k=8)
    assert edges.shape[1] == 2
    assert (edges[:, 0] < edges[:, 1]).all()
    # the vast majority of edges connect same-domain cells (domains are
    # spatially separated)
    same = (domain[edges[:, 0]] == domain[edges[:, 1]]).mean()
    assert same > 0.95


def test_edge_profiles_sum_endpoints(spatial_sim):
    be, coords, _ = spatial_sim
    edges = spatial_knn_edges(coords, k=4)[:50]
    prof = edge_profiles(be, edges)
    dense = be.read_columns_dense(np.arange(be.num_columns)).T  # [N, D]
    want = dense[edges[:, 0]] + dense[edges[:, 1]]
    np.testing.assert_allclose(np.asarray(prof.todense()), want, rtol=1e-5)


def test_link_community_recovers_domains(spatial_sim):
    be, coords, domain = spatial_sim
    res = fit_link_community(
        be, coords, n_communities=4, knn=8, n_sweeps=20, n_greedy=5, seed=7
    )
    assert res.propensity.shape == (800, 4)
    np.testing.assert_allclose(res.propensity.sum(1), 1.0, rtol=1e-4)
    assert np.all(np.isfinite(res.entropy))
    # dominant community per cell should align with the spatial domain:
    # compute best-case accuracy over community -> domain maps
    top = res.propensity.argmax(1)
    acc = 0.0
    for c in range(4):
        cells = top == c
        if cells.sum() == 0:
            continue
        maj = np.bincount(domain[cells]).argmax()
        acc += (domain[cells] == maj).sum()
    acc /= len(domain)
    assert acc > 0.9, acc
    # objective improves across sweeps (trace entries are (phase, score))
    assert res.scores_trace[-1][1] > res.scores_trace[0][1]


def test_lc_etm_segments_domains(spatial_sim):
    from legume_tpu.pinto.lc_etm import fit_lc_etm

    be, coords, domain = spatial_sim
    res = fit_lc_etm(
        be, coords, n_communities=4, knn=6, window=32, embed_dim=16,
        epochs=30, minibatch=128,
    )
    assert res.propensity.shape == (800, 4)
    np.testing.assert_allclose(res.propensity.sum(1), 1.0, rtol=1e-3)
    assert res.loss_trace[-1] < res.loss_trace[0]
    top = res.propensity.argmax(1)
    acc = 0
    for c in np.unique(top):
        cells = top == c
        acc += np.bincount(domain[cells]).max()
    assert acc / len(domain) > 0.85, acc / len(domain)


def _planted_domains(seed=7, side=14, d=50):
    """Two spatial domains, distinct programs, plus a gene network whose
    modules align with the programs."""
    rng = np.random.default_rng(seed)
    xs, ys = np.meshgrid(np.arange(side), np.arange(side))
    coords = np.stack([xs.ravel(), ys.ravel()], 1).astype(float)
    domain = (coords[:, 0] < side / 2).astype(int)
    prog = np.stack([np.linspace(4, 0.2, d), np.linspace(0.2, 4, d)])
    counts = rng.poisson(prog[domain] * 2.0).astype(np.float32).T  # [D, N]
    return coords, domain, counts


def test_lc_component_em_recovers_planted_domains(tmp_path):
    """Full `pinto lc` with the frozen-incidence EM stage: per-cell
    propensity must separate the planted spatial domains (VERDICT
    round-1 item 7 quality bar)."""
    import scipy.sparse as sp

    from legume_tpu.data.sparse_io import MemoryBackend
    from legume_tpu.pinto.lc import fit_link_community

    coords, domain, counts = _planted_domains()
    vec = MemoryBackend(
        sp.csc_matrix(counts),
        [f"g{i}" for i in range(counts.shape[0])],
        [f"c{j}" for j in range(counts.shape[1])],
    )
    res = fit_link_community(
        vec, coords, n_communities=2, knn=6,
        n_sweeps=15, n_greedy=5, em_sweeps=8, seed=3,
    )
    lab = res.propensity.argmax(1)
    agree = max((lab == domain).mean(), (lab != domain).mean())
    assert agree > 0.85, agree
    # EM phase appears in the score trace and does not degrade the score
    phases = [p for p, _ in res.scores_trace]
    assert "em" in phases
    gibbs_last = [s for p, s in res.scores_trace if p == "gibbs"][-1]
    em_last = [s for p, s in res.scores_trace if p == "em"][-1]
    assert em_last >= gibbs_last - abs(gibbs_last) * 0.05


def test_lc_module_pair_basis(tmp_path):
    """Gene-network module-pair basis: modules recover the two programs
    and the lc fit on pair features still separates the domains."""
    import scipy.sparse as sp

    from legume_tpu.data.sparse_io import MemoryBackend
    from legume_tpu.pinto.gene_network import (
        GenePairGraph, ModulePairBasis, kcore_trim, leiden_gene_modules,
    )
    from legume_tpu.pinto.lc import fit_link_community

    coords, domain, counts = _planted_domains()
    d = counts.shape[0]
    genes = [f"g{i}" for i in range(d)]
    vec = MemoryBackend(sp.csc_matrix(counts), genes, None)
    # network: cliquish chains inside each half of the gene axis
    lines = []
    for base in (0, d // 2):
        for i in range(base, base + d // 2 - 2):
            lines.append(f"g{i}\tg{i + 1}")
            lines.append(f"g{i}\tg{i + 2}")
    net = tmp_path / "net.tsv"
    net.write_text("\n".join(lines) + "\n")

    graph = GenePairGraph.from_edge_list(str(net), genes)
    graph.augment_with_snn(2)
    keep = kcore_trim(graph, 2)
    mog = leiden_gene_modules(graph, keep, resolution=0.5, seed=0)
    # the two halves of the gene axis should never share a module
    left = set(mog[: d // 2]) - {-1}
    right = set(mog[d // 2 :]) - {-1}
    assert left and right and not (left & right)
    basis = ModulePairBasis.build(graph, mog)
    assert basis.n_pairs >= 2

    res = fit_link_community(
        vec, coords, n_communities=2, knn=6,
        n_sweeps=15, n_greedy=5, em_sweeps=5,
        gene_network=str(net), seed=4,
    )
    lab = res.propensity.argmax(1)
    agree = max((lab == domain).mean(), (lab != domain).mean())
    assert agree > 0.8, agree


def test_lc_cli_outputs_traces_and_consensus(tmp_path):
    """`pinto lc` writes score traces, gene-community rates, and the
    BHC consensus table (score_trace.rs / outputs.rs roles)."""
    import pandas as pd
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sparse_io import create_sparse_from_csc

    coords, domain, counts = _planted_domains(seed=9, side=10, d=30)
    path = str(tmp_path / "sp.zarr")
    create_sparse_from_csc(
        sp.csc_matrix(counts), path,
        [f"g{i}" for i in range(30)], [f"c{j}" for j in range(100)],
    )
    cf = tmp_path / "coords.tsv"
    np.savetxt(
        cf, np.column_stack([np.arange(100), coords[:, 0], coords[:, 1]]),
        fmt=["%d", "%.1f", "%.1f"], delimiter="\t",
    )
    out = str(tmp_path / "lc")
    cli.run_pinto([
        "lc", "--data-files", path, "--coords", str(cf), "--out", out,
        "-k", "3", "--knn", "5", "--sweeps", "10", "--em-sweeps", "4",
    ])
    tr = pd.read_parquet(f"{out}.score_trace.parquet")
    assert set(tr["phase"]) >= {"gibbs", "em"}
    gc = pd.read_parquet(f"{out}.gene_community.parquet")
    assert gc.shape == (30, 4)
    cons = pd.read_parquet(f"{out}.consensus.parquet")
    assert len(cons) == 3


def test_interface_report_flags_boundary_cells(tmp_path):
    import pandas as pd

    # two spatial halves with opposite communities; boundary strip mixed
    from legume_tpu.cli import main as cli
    from legume_tpu.pinto.interfaces import (
        interface_report, pick_uncommitted_cells,
    )

    rng = np.random.default_rng(0)
    n = 300
    xy = rng.uniform(0, 10, size=(n, 2))
    # propensity: smooth in x — pure c0 at x=0, pure c1 at x=10
    w = 1 / (1 + np.exp(-(xy[:, 0] - 5) * 2.0))
    prop = np.stack([1 - w, w], axis=1)
    rep = interface_report(prop, xy, entropy_quantile=0.9, max_cells=50)
    # focal cells concentrate near the x=5 boundary
    assert len(rep.focal) > 0
    assert np.abs(xy[rep.focal, 0] - 5).mean() < np.abs(xy[:, 0] - 5).mean()
    unc = pick_uncommitted_cells(prop, commit_threshold=0.7)
    assert np.abs(xy[unc, 0] - 5).max() < 2.0  # strictly boundary strip
    # rows carry dominant + neighborhood composition
    assert all(r["n_one_hop"] > 0 for r in rep.rows)

    # CLI e2e: coords TSV + propensity parquet -> pdf + tsv
    coords = tmp_path / "xy.tsv"
    np.savetxt(coords, np.column_stack(
        [np.arange(n), xy[:, 0], xy[:, 1]]
    ), fmt=["%d", "%.4f", "%.4f"], delimiter="\t")
    pq = tmp_path / "prop.parquet"
    pd.DataFrame(prop, columns=["c0", "c1"]).assign(
        entropy=0.0
    ).reset_index(names="cell").to_parquet(pq)
    out = str(tmp_path / "ifc")
    cli.run_pinto([
        "interfaces", "--coords", str(coords), "--propensity", str(pq),
        "--out", out, "--entropy-quantile", "0.85",
    ])
    tsv = pd.read_csv(f"{out}.interfaces.tsv", sep="\t")
    assert {"cell", "entropy", "dominant", "neighbor_communities"} <= set(tsv.columns)
    assert (tmp_path / "ifc.interfaces.pdf").exists()


def test_lc_gibbs_dp_sharded_matches_quality():
    """The link-community Gibbs over the 8-device dp mesh (edge + nnz
    axes sharded, E deliberately NOT divisible so masked edge padding
    runs): labels still recover the planted communities."""
    import jax
    from jax.sharding import Mesh

    import scipy.sparse as sp

    from legume_tpu.pinto.lc import _fit_edge_labels

    rng = np.random.default_rng(0)
    e, g, k = 301, 40, 3  # 301 pads to 304 on 8 devices
    true = rng.integers(0, k, e)
    rates = rng.gamma(2.0, 1.0, (k, g)) * (rng.random((k, g)) < 0.25)
    prof = rng.poisson(rates[true] * 4.0).astype(np.float32)
    profiles = sp.csr_matrix(prof)

    mesh = Mesh(np.array(jax.devices()[:8]), ("dp",))
    labels, trace = _fit_edge_labels(
        profiles, k, n_genes=g, n_sweeps=15, n_greedy=10, seed=3, mesh=mesh
    )
    assert labels.shape == (e,)
    # label-permutation-free agreement: majority map
    acc = 0
    for kk in range(k):
        m = labels == kk
        if m.any():
            acc += np.bincount(true[m], minlength=k).max()
    assert acc / e > 0.85, acc / e
