"""Sims, PLINK IO, knowledge bases, plotting smoke tests."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data.knowledge import Ontology, parse_obo, read_gaf, read_gmt
from legume_tpu.data.sim import (
    simulate_bulk,
    simulate_multimodal,
    simulate_multiome,
    simulate_topic,
)
from legume_tpu.fagioli.plink import read_plink, write_plink
from legume_tpu.utils.plot import scatter_by_label, spatial_hex, structure_bars


def test_multimodal_sim_shapes():
    mm = simulate_multimodal(rows_per_modality=(100, 40), cols=60, factors=4)
    assert len(mm.counts) == 2
    assert mm.counts[0].shape == (100, 60)
    assert mm.counts[1].shape == (40, 60)
    np.testing.assert_allclose(mm.theta.sum(1), 1.0, rtol=1e-6)


def test_multiome_sim_peak_gene_truth():
    mo = simulate_multiome(genes=50, peaks=120, cols=80, factors=3)
    assert mo.rna.shape == (50, 80)
    assert mo.atac.shape == (120, 80)
    assert mo.peak_to_gene.shape == (50, 1)
    assert mo.peak_to_gene.max() < 120
    # causal-structure knobs (MultiomeArgs): multiple drivers, partial
    # linkage, and a cis-PVE below 1 still yield valid ground truth
    mo2 = simulate_multiome(
        genes=50, peaks=120, cols=80, factors=3,
        n_causal_per_gene=3, linked_gene_fraction=0.6, pve_cis=0.7,
    )
    assert mo2.peak_to_gene.shape == (50, 3)
    assert 0 < mo2.linked.sum() < 50
    assert (mo2.peak_to_gene[~mo2.linked] == -1).all()


def test_bulk_sim_mixes_profiles():
    sim = simulate_topic(rows=60, cols=200, factors=3, seed=1)
    labels = sim.theta.argmax(1)
    bulk, fracs = simulate_bulk(sim.counts, labels, n_samples=5)
    assert bulk.shape == (5, 60)
    np.testing.assert_allclose(fracs.sum(1), 1.0, rtol=1e-6)


def test_plink_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    geno = rng.integers(0, 3, size=(10, 7)).astype(np.float32)
    geno[2, 3] = np.nan
    prefix = str(tmp_path / "test")
    write_plink(prefix, geno)
    back = read_plink(prefix)
    assert back.genotypes.shape == (10, 7)
    np.testing.assert_array_equal(np.isnan(back.genotypes), np.isnan(geno))
    m = ~np.isnan(geno)
    np.testing.assert_allclose(back.genotypes[m], geno[m])
    assert back.variant_ids[0] == "rs0"


def test_obo_and_gene_sets(tmp_path):
    obo = tmp_path / "mini.obo"
    obo.write_text(
        "[Term]\nid: GO:1\nname: root\n\n"
        "[Term]\nid: GO:2\nname: mid\nis_a: GO:1 ! root\n\n"
        "[Term]\nid: GO:3\nname: leaf\nis_a: GO:2 ! mid\n"
        "relationship: part_of GO:1\n"
    )
    ont = parse_obo(str(obo))
    assert ont.terms["GO:3"] == "leaf"
    assert ont.ancestors("GO:3") == {"GO:1", "GO:2"}
    assert ont.roots() == {"GO:1"}

    gmt = tmp_path / "sets.gmt"
    gmt.write_text("SetA\tdesc\tG1\tG2\nSetB\tdesc\tG3\n")
    sets = read_gmt(str(gmt))
    assert sets["SetA"] == ["G1", "G2"]

    gaf = tmp_path / "anno.gaf"
    gaf.write_text("!header\nDB\tID1\tGENE1\t\tGO:3\tref\tIEA\n")
    annos = read_gaf(str(gaf), ont)
    # true-path propagation: GENE1 reaches every ancestor
    assert annos["GO:3"] == {"GENE1"}
    assert annos["GO:1"] == {"GENE1"}


def test_plots_write_files(tmp_path):
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(200, 2))
    labels = rng.integers(0, 4, 200)
    scatter_by_label(coords, labels, str(tmp_path / "sc.png"))
    structure_bars(rng.dirichlet(np.ones(5), 100), str(tmp_path / "bars.svg"))
    spatial_hex(coords, rng.random(200), str(tmp_path / "hex.pdf"))
    for f in ["sc.png", "bars.svg", "hex.pdf"]:
        assert (tmp_path / f).stat().st_size > 1000


def test_soft_clamp_keeps_gradient_alive():
    """nn/soft_clamp.rs: c*tanh(x/c) bounds to (-c, c) but keeps a
    nonzero gradient where a hard clip would be exactly flat, so a
    logit driven past the bound can still recover."""
    import jax
    import jax.numpy as jnp

    from legume_tpu.models.encoders import CLAMP, soft_clamp

    xs = jnp.asarray([-12.0, -8.5, 0.0, 8.5, 12.0])
    ys = soft_clamp(xs)
    assert (jnp.abs(ys) < CLAMP).all()
    g_soft = jax.vmap(jax.grad(soft_clamp))(xs)
    g_hard = jax.vmap(jax.grad(lambda x: jnp.clip(x, -CLAMP, CLAMP)))(xs)
    assert (g_soft > 0).all()          # alive everywhere in range
    assert g_hard[0] == 0 and g_hard[-1] == 0  # hard clip is dead there
    # near zero the bound is ~identity
    assert abs(float(soft_clamp(jnp.asarray(0.5))) - 0.5) < 0.01
