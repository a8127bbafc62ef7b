"""Q-matrix lens + ontology-consensus annotation (enrichment)."""

import numpy as np

from legume_tpu.data.knowledge import Ontology
from legume_tpu.ops.enrichment import (
    UNASSIGNED_LABEL,
    annotate_ontology,
    geneset_topic_qmatrix,
)


def test_qmatrix_flags_topic_set_pairs():
    rng = np.random.default_rng(0)
    d, k = 200, 3
    genes = [f"g{i}" for i in range(d)]
    log_beta = rng.normal(scale=0.2, size=(k, d))
    # topic 0 loads set A genes; topic 2 loads set B genes
    set_a = [f"g{i}" for i in range(0, 20)]
    set_b = [f"g{i}" for i in range(50, 70)]
    log_beta[0, 0:20] += 2.0
    log_beta[2, 50:70] += 2.0
    out = geneset_topic_qmatrix(
        log_beta, genes, {"A": set_a, "B": set_b}, n_perm=200, seed=1
    )
    z = out["z"]
    ia, ib = out["labels"].index("A"), out["labels"].index("B")
    # weighted-KS nulls are wide, so z ~ 2 even for a perfect set; the
    # permutation q-value is the crisp signal
    assert z[ia, 0] > 1.5 and z[ib, 2] > 1.5, z
    # A is ANTI-enriched in topic 2 (B's genes displace it) — sign flips
    assert z[ia, 2] < 0 and z[ib, 0] < 0
    assert out["q"][ia, 0] < 0.05 and out["q"][ib, 2] < 0.05
    # off-target pairs not significant
    assert out["q"][ia, 1] > 0.05 and out["q"][ib, 1] > 0.05


def _toy_ontology():
    # root CL:0 -> CL:1 (lymphocyte) -> CL:2 (T cell); sibling CL:3 (myeloid)
    return Ontology(
        terms={"CL:0": "cell", "CL:1": "lymphocyte", "CL:2": "T cell", "CL:3": "myeloid"},
        parents={"CL:0": set(), "CL:1": {"CL:0"}, "CL:2": {"CL:1"}, "CL:3": {"CL:0"}},
    )


def test_ontology_consensus_picks_deepest_significant():
    rng = np.random.default_rng(1)
    d = 120
    genes = [f"g{i}" for i in range(d)]
    # T-cell genes 0..14 (subset of lymphocyte genes 0..29); myeloid 60..74
    term_genes = {
        "CL:0": {f"g{i}" for i in range(d)},
        "CL:1": {f"g{i}" for i in range(0, 30)},
        "CL:2": {f"g{i}" for i in range(0, 15)},
        "CL:3": {f"g{i}" for i in range(60, 75)},
    }
    prof = rng.normal(scale=0.2, size=(2, d))
    prof[0, 0:15] += 3.0  # cluster 0 is a T cell
    prof[1, 60:75] += 3.0  # cluster 1 myeloid
    out = annotate_ontology(
        prof, genes, term_genes, _toy_ontology(),
        term_names=_toy_ontology().terms,
    )
    assert out["labels"][0] == "T cell"
    assert out["labels"][1] == "myeloid"
    assert np.all(out["q"] < 0.05)


def test_ontology_consensus_unassigned_on_noise():
    rng = np.random.default_rng(2)
    d = 120
    genes = [f"g{i}" for i in range(d)]
    term_genes = {"CL:1": {f"g{i}" for i in range(0, 30)}}
    prof = rng.normal(scale=0.2, size=(1, d))
    ont = Ontology(terms={"CL:1": "lymphocyte"}, parents={"CL:1": set()})
    out = annotate_ontology(prof, genes, term_genes, ont)
    assert out["labels"][0] == UNASSIGNED_LABEL


def test_qmatrix_cli_cell_labels(tmp_path):
    """`senna qmatrix --latent` projects per-cell labels via theta . Q
    (cellproj.rs)."""
    import pandas as pd

    from legume_tpu.cli import main as cli

    rng = np.random.default_rng(2)
    d, k, n = 150, 2, 60
    genes = [f"g{i}" for i in range(d)]
    log_beta = rng.normal(scale=0.2, size=(k, d))
    log_beta[0, :15] += 2.5
    log_beta[1, 40:55] += 2.5
    dic = tmp_path / "dict.parquet"
    pd.DataFrame(
        log_beta.T, index=genes, columns=["t0", "t1"]
    ).reset_index(names="gene").to_parquet(dic)
    gmt = tmp_path / "m.gmt"
    gmt.write_text(
        "TypeA\tna\t" + "\t".join(genes[:15]) + "\n"
        "TypeB\tna\t" + "\t".join(genes[40:55]) + "\n"
    )
    theta = np.zeros((n, k))
    theta[:30, 0] = 0.95
    theta[:30, 1] = 0.05
    theta[30:, 0] = 0.05
    theta[30:, 1] = 0.95
    lat = tmp_path / "lat.parquet"
    pd.DataFrame(
        np.log(theta), index=[f"c{i}" for i in range(n)], columns=["t0", "t1"]
    ).reset_index(names="cell").to_parquet(lat)
    out = str(tmp_path / "qm")
    cli.run_senna([
        "qmatrix", "--dictionary", str(dic), "--markers", str(gmt),
        "--out", out, "--permutations", "200", "--latent", str(lat),
    ])
    ca = pd.read_parquet(f"{out}.cell_annotation.parquet")
    assert (ca["annotation"][:30] == "TypeA").mean() > 0.9
    assert (ca["annotation"][30:] == "TypeB").mean() > 0.9
    assert ca["confidence"].between(0, 1).all()


def test_ontology_module_score_cancels_common_signature():
    """ontology_module_score (ontology_enrich.rs:88-153 + its
    integration test): unique blocks discriminate their own cluster;
    a block high in EVERY cluster contrasts to ~0."""
    from legume_tpu.ops.enrichment import ontology_module_score

    g, k = 200, 3
    prof = np.ones((g, k))
    prof[0:20, 0] = 50.0    # A -> k0
    prof[20:40, 1] = 50.0   # B -> k1
    prof[40:60, :] = 50.0   # C -> all (common)
    prof[60:80, 2] = 50.0   # D -> k2
    terms = {
        "A": list(range(0, 20)),
        "B": list(range(20, 40)),
        "C": list(range(40, 60)),
        "D": list(range(60, 80)),
    }
    out = ontology_module_score(prof, terms)
    d = out["effect_kt"]  # [3, 4]
    assert d[0, 0] > 0.5 and d[0, 0] > d[1, 0] + 1.0
    assert d[1, 1] > 0.5 and d[1, 1] > d[0, 1] + 1.0
    assert np.abs(d[:, 2]).max() < 1e-3  # common signature cancels
    assert d[2, 3] > 0.5
