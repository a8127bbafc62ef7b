"""chickpea peak-to-gene recovery on paired multiome sim
(reference pattern 3; `data-beans-sim multiome` ground truth)."""

import numpy as np
import pytest

from legume_tpu.chickpea.p2g import peak_to_gene


@pytest.fixture(scope="module")
def multiome_sim():
    """Paired RNA+ATAC pseudobulks where each gene is driven by one
    true peak (multiome sim spirit: shared latent activity)."""
    rng = np.random.default_rng(0)
    n, g, k = 200, 8, 60
    activity = rng.standard_normal((n, k))  # latent per-peak accessibility
    atac = rng.poisson(np.exp(0.5 * activity + 2.0)).astype(np.float64)
    true_peak = rng.choice(k, g, replace=False)
    rna = rng.poisson(
        np.exp(0.8 * activity[:, true_peak] + 2.0)
    ).astype(np.float64)
    # cis windows: the true peak + 9 decoys
    cis = {}
    for gi in range(g):
        decoys = rng.choice(np.setdiff1d(np.arange(k), [true_peak[gi]]), 9, replace=False)
        cis[gi] = np.sort(np.concatenate([[true_peak[gi]], decoys]))
    return rna, atac, cis, true_peak


def test_peak_to_gene_recovers_true_peaks(multiome_sim):
    rna, atac, cis, true_peak = multiome_sim
    links = peak_to_gene(rna, atac, cis, rank=30, L=2, num_steps=800, seed=1)
    assert len(links.gene) == sum(len(v) for v in cis.values())
    hits = 0
    for gi in range(rna.shape[1]):
        rows = [i for i, g in enumerate(links.gene) if g == gi]
        pk = np.asarray([links.peak[i] for i in rows])
        pip = links.pip[rows]
        if pk[np.argmax(pip)] == true_peak[gi]:
            hits += 1
    assert hits >= rna.shape[1] - 2, hits  # at least 6/8 genes resolved


def test_peak_to_gene_knockoff_filter(multiome_sim):
    rna, atac, cis, true_peak = multiome_sim
    links = peak_to_gene(
        rna, atac, cis, rank=30, L=2, num_steps=300, knockoff_fdr=0.2, seed=2
    )
    assert links.knockoff_selected is not None
    assert links.knockoff_selected.shape == links.pip.shape
    # the filter keeps a sparse subset enriched for true peaks
    sel = links.knockoff_selected
    if sel.any():
        true_frac_sel = np.mean(
            [links.peak[i] == true_peak[links.gene[i]] for i in np.nonzero(sel)[0]]
        )
        true_frac_all = np.mean(
            [links.peak[i] == true_peak[links.gene[i]] for i in range(len(sel))]
        )
        assert true_frac_sel >= true_frac_all


def test_from_multiome_and_pseudobulk_p2g(tmp_path):
    """chickpea from-multiome splits a 10x multiome h5 on feature_type
    and filters fragments to matched barcodes
    (from_multiome/mod.rs); chickpea p2g --pseudobulk collapses the
    CELL-level pair into shared pseudobulks before mapping
    (run.rs pipeline) and still ranks the driver peak first."""
    import gzip

    import h5py
    import numpy as np
    import pandas as pd
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli

    rng = np.random.default_rng(9)
    n_cells, n_genes, n_peaks = 400, 30, 40
    # planted signal: peak 7 activity drives gene 3 across two programs
    act = rng.gamma(2.0, 1.0, n_cells)
    atac = rng.poisson(1.0, (n_peaks, n_cells)).astype(np.float32)
    atac[7] = rng.poisson(3.0 * act)
    rna = rng.poisson(2.0, (n_genes, n_cells)).astype(np.float32)
    rna[3] = rng.poisson(4.0 * act)

    # pack as a multiome h5 (features stacked: genes then peaks)
    x = sp.csc_matrix(np.vstack([rna, atac]))
    h5 = str(tmp_path / "multi.h5")
    names = [f"g{i}".encode() for i in range(n_genes)] + [
        f"chr1:{1000 * i}-{1000 * i + 500}".encode() for i in range(n_peaks)
    ]
    ftype = [b"Gene Expression"] * n_genes + [b"Peaks"] * n_peaks
    bcs = [f"BC{j}".encode() for j in range(n_cells)]
    with h5py.File(h5, "w") as f:
        g = f.create_group("matrix")
        g["data"] = x.data
        g["indices"] = x.indices
        g["indptr"] = x.indptr
        g["shape"] = np.asarray(x.shape)
        g["barcodes"] = np.asarray(bcs)
        ff = g.create_group("features")
        ff["name"] = np.asarray(names)
        ff["feature_type"] = np.asarray(ftype)
    frag = tmp_path / "frags.tsv.gz"
    with gzip.open(frag, "wt") as f:
        f.write("# comment\n")
        f.write("chr1\t100\t600\tBC0\t2\n")
        f.write("chr1\t100\t600\tUNMATCHED\t1\n")

    out = str(tmp_path / "mo")
    cli.main(["chickpea", "from-multiome", h5, "--out", out,
              "--fragments", str(frag)])
    from legume_tpu.data.sparse_io import open_sparse_matrix

    r = open_sparse_matrix(out + ".rna.zarr")
    a = open_sparse_matrix(out + ".atac.zarr")
    assert r.num_rows == n_genes and a.num_rows == n_peaks
    assert r.column_names()[:2] == ["BC0", "BC1"]
    kept = gzip.open(out + ".fragments.tsv.gz", "rt").read()
    assert "BC0" in kept and "UNMATCHED" not in kept

    # TSS annotation for the planted gene near peak 7's window
    gff = tmp_path / "genes.gff"
    rows = [
        f"chr1\tx\tgene\t{7 * 1000}\t{7 * 1000 + 100}\t.\t+\t.\tgene_name=g3",
    ]
    gff.write_text("\n".join(rows) + "\n")

    p2g_out = str(tmp_path / "pp")
    cli.main([
        "chickpea", "p2g", "--rna", out + ".rna.zarr",
        "--atac", out + ".atac.zarr", "--gff", str(gff),
        "--out", p2g_out, "--pseudobulk", "--sort-dim", "5",
        "--proj-dim", "10", "--cis-window", "8000",
        "--rank", "8", "--steps", "300", "--prior-var", "5.0",
    ])
    links = pd.read_parquet(p2g_out + ".p2g.parquet")
    g3 = links[links.gene == "g3"].sort_values("pip", ascending=False)
    assert len(g3) > 1
    assert g3.iloc[0]["peak"] == "chr1:7000-7500", g3.head()
