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
