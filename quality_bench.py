"""kNN label-purity quality benchmark for the posterior feature gate
(BASELINE.md table row: k=30 purity — pip(.)beta 0.6739 vs plain SGD
0.6664 vs z~Bern(pip) 0.6632 vs softmax gate 0.638 on the reference's
BM1; `plans/posterior-feature-gate.md:64-70`).

Simulates a labeled mixture at a BM1-like aspect (few informative
genes in a wide noise panel), fits phase-1 NCE pseudobulk embeddings,
runs the pb_gibbs spike-and-slab posterior, and scores the SAME four
arms the reference table reports, paired across seeds:

    plain      phase-1 SGD feature embedding, ungated
    pip*beta   posterior-mean embedding gated by inclusion probability
    bern(pip)  a single z ~ Bernoulli(pip) mask draw
    softmax    softmax over per-gene posterior norms as soft weights

Cell embeddings are the row-normalized log1p counts projected through
each arm's feature matrix; purity is the mean fraction of a cell's
k=30 nearest neighbors sharing its label.

Usage:
    python quality_bench.py            # small shape, CPU-friendly
    python quality_bench.py --bm1     # 2627 x 34008, H=16 (chip scale)
Prints one JSON line per arm plus a summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

if "--cpu" in sys.argv or os.environ.get("LEGUME_CPU") == "1":
    # pin BEFORE any jax import: the session sitecustomize appends the
    # axon TPU backend regardless of JAX_PLATFORMS (verify-skill gotcha)
    import jax

    jax.config.update("jax_platforms", "cpu")


def simulate_labeled(
    rng, *, n_cells: int, n_genes: int, n_types: int, n_informative: int,
    depth: int = 400,
):
    """Cell-type mixture where only `n_informative` genes separate the
    types (the BM1 story: a sparse dictionary inside a wide panel).
    Shallow depth + per-(cell, gene) Gamma overdispersion put the
    baseline purity in the reference table's ~0.6-0.8 regime — at a
    purity ceiling every arm saturates and the gate question vanishes."""
    labels = rng.integers(0, n_types, n_cells)
    base = rng.gamma(0.5, 1.0, n_genes)
    base /= base.sum()
    profiles = np.tile(base, (n_types, 1))
    info = rng.choice(n_genes, n_informative, replace=False)
    for t in range(n_types):
        bump = rng.gamma(2.0, 1.0, n_informative) * (
            rng.random(n_informative) < 0.3
        )
        profiles[t, info] = base[info] * (1.0 + 2.5 * bump)
    profiles /= profiles.sum(1, keepdims=True)
    depths = rng.integers(depth // 2, depth * 2, n_cells)
    x = np.empty((n_cells, n_genes), np.float32)
    for i in range(n_cells):
        rate = profiles[labels[i]] * rng.gamma(0.7, 1.0 / 0.7, n_genes)
        rate /= rate.sum()
        x[i] = rng.multinomial(depths[i], rate)
    return x, labels, info


def participation_ratio(m: np.ndarray) -> float:
    """Effective genes per dim: (sum w)^2 / sum w^2 of each column's
    squared loadings, averaged over dims (the reference table's
    'eff #genes/dim' sparsity diagnostic)."""
    w = np.asarray(m, np.float64) ** 2
    num = w.sum(0) ** 2
    den = (w**2).sum(0)
    ok = den > 0
    return float((num[ok] / den[ok]).mean()) if ok.any() else 0.0


def knn_purity(emb: np.ndarray, labels: np.ndarray, k: int = 30) -> float:
    import jax.numpy as jnp

    e = jnp.asarray(emb, jnp.float32)
    d2 = (
        jnp.sum(e * e, 1)[:, None]
        - 2.0 * (e @ e.T)
        + jnp.sum(e * e, 1)[None, :]
    )
    d2 = d2.at[jnp.arange(len(e)), jnp.arange(len(e))].set(jnp.inf)
    idx = np.asarray(jnp.argsort(d2, axis=1)[:, :k])
    return float((labels[idx] == labels[:, None]).mean())


def run_once(seed: int, *, n_cells, n_genes, n_types, h, sweeps, epochs,
             depth=400, plain_only=False):
    from legume_tpu.embedding.nce import NceConfig, fit_bge
    from legume_tpu.embedding.posterior import pb_gibbs

    rng = np.random.default_rng(seed)
    x, labels, _ = simulate_labeled(
        rng, n_cells=n_cells, n_genes=n_genes, n_types=n_types,
        n_informative=max(n_genes // 20, 40), depth=depth,
    )
    if plain_only:
        # calibration probe: only the ungated phase-1 arm, whose purity
        # anchors the regime (reference BM1: plain SGD = 0.6664)
        res = fit_bge(
            [x], config=NceConfig(embedding_dim=h, epochs=epochs, seed=seed)
        )
        xl = np.log1p(x)
        xl /= np.maximum(np.linalg.norm(xl, axis=1, keepdims=True), 1e-8)
        return {"plain_sgd": {
            "purity": knn_purity(xl @ res.e_feat, labels, k=30),
            "eff_genes_per_dim": round(participation_ratio(res.e_feat), 1),
        }}
    # anchors = cells (the BM1 measurement ran the posterior over the
    # 2,627 cells directly, not coarser pseudobulks)
    pb = x

    res = fit_bge(
        [pb], config=NceConfig(embedding_dim=h, epochs=epochs, seed=seed)
    )
    post = pb_gibbs(
        pb, res.e_feat, res.b_feat, res.pb_embeddings[0],
        np.zeros(pb.shape[0]), n_sweeps=sweeps,
        burnin=max(sweeps // 4, 2), seed=seed,
    )

    # arm matrices (plans/posterior-feature-gate.md:64-70):
    # e_feat_mean IS the held mean E[z*beta] = pip (.) slab-mean, so
    # the pip arm uses it directly; Bern(pip) draws one mask over the
    # CONDITIONAL slab mean E[beta | z=1] = E[z*beta]/pip
    rng_z = np.random.default_rng(seed + 1)
    slab = post.e_feat_mean / np.maximum(post.pip, 0.05)
    norms = np.linalg.norm(post.e_feat_mean, axis=1)
    soft = np.exp(norms - norms.max())
    soft = soft / soft.sum() * len(norms)  # mean-1 soft weights
    arms = {
        "plain_sgd": res.e_feat,
        "pip_beta": post.e_feat_mean,
        "bern_pip": (rng_z.random(post.pip.shape) < post.pip) * slab,
        "softmax_gate": soft[:, None] * slab,
    }
    xl = np.log1p(x)
    xl /= np.maximum(np.linalg.norm(xl, axis=1, keepdims=True), 1e-8)
    return {
        name: {
            "purity": knn_purity(xl @ m, labels, k=30),
            "eff_genes_per_dim": round(participation_ratio(m), 1),
        }
        for name, m in arms.items()
    }


def _argval(flag, default, cast=str):
    if flag in sys.argv:
        return cast(sys.argv[sys.argv.index(flag) + 1])
    return default


def main():
    bm1 = "--bm1" in sys.argv
    seeds = list(range(_argval("--seeds", 3, int)))
    depth = _argval("--depth", 400, int)
    shape = dict(
        n_cells=2627 if bm1 else 900,
        n_genes=34008 if bm1 else 3000,
        n_types=8,
        h=16,
        sweeps=45 if bm1 else 20,
        epochs=1000 if bm1 else 300,
        depth=depth,
    )
    if "--calibrate" in sys.argv:
        # regime calibration (VERDICT r3 missing #8): sweep sequencing
        # depth until the PLAIN-SGD arm's purity lands in the reference
        # BM1 band (0.6664) — then the 4-arm table at that depth is the
        # like-regime comparison
        depths = [int(x) for x in _argval("--calibrate", "400,800,1600").split(",")]
        for dep in depths:
            t0 = time.time()
            r = run_once(seeds[0], **{**shape, "depth": dep}, plain_only=True)
            print(json.dumps({
                "metric": "calibrate_plain_sgd_purity",
                "depth": dep,
                "value": round(r["plain_sgd"]["purity"], 4),
                "eff_genes_per_dim": r["plain_sgd"]["eff_genes_per_dim"],
                "target_reference": 0.6664,
                "wall_s": round(time.time() - t0, 1),
            }))
        return
    t0 = time.time()
    per_seed = [run_once(s, **shape) for s in seeds]
    out = {}
    for arm in per_seed[0]:
        vals = np.asarray([r[arm]["purity"] for r in per_seed])
        effs = np.asarray([r[arm]["eff_genes_per_dim"] for r in per_seed])
        out[arm] = {"mean": round(float(vals.mean()), 4),
                    "sd": round(float(vals.std()), 4)}
        print(json.dumps({"metric": f"knn_purity_{arm}",
                          "value": out[arm]["mean"],
                          "unit": "purity@k30", "sd": out[arm]["sd"],
                          "eff_genes_per_dim": round(float(effs.mean()), 1)}))
    # paired contrast, the table's headline
    diff = np.asarray(
        [r["pip_beta"]["purity"] - r["plain_sgd"]["purity"] for r in per_seed]
    )
    print(json.dumps({
        "metric": "knn_purity_pip_minus_plain",
        "value": round(float(diff.mean()), 4),
        "unit": "paired delta",
        "per_seed": [round(float(v), 4) for v in diff],
        "shape": shape,
        "wall_s": round(time.time() - t0, 1),
        "reference_bm1": {"pip_beta": 0.6739, "plain_sgd": 0.6664,
                          "bern_pip": 0.6632, "softmax_gate": 0.638},
    }))


if __name__ == "__main__":
    main()
