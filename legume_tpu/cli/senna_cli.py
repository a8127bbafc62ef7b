"""`senna` binary: embedding suite CLI (extracted from cli/main.py; one module per installed binary)."""

from __future__ import annotations

import argparse
import numpy as np




def _manifest_prefix(path: str) -> str:
    """Run prefix from a --from value: strips .senna.json (or .json)
    instead of slicing a fixed width off arbitrary names."""
    if path.endswith(".senna.json"):
        return path[: -len(".senna.json")]
    if path.endswith(".json"):
        return path[: -len(".json")]
    return path


def _add_topic_parser(sub):
    p = sub.add_parser("topic", help="multilevel pseudobulk VAE topic model")
    p.add_argument("--data-files", nargs="*", default=[],
                   help="input backends (optional when --from is given)")
    p.add_argument("--out", required=True)
    p.add_argument("--from", dest="from_run", default=None,
                   help="chain data, batch files and cell->pb partition "
                        "from a prior run's {prefix}.senna.json")
    p.add_argument("--init-from", dest="init_from", default=None,
                   help="warm-start encoder+decoder weights from a prior "
                        "run's prefix (strict architecture check)")
    p.add_argument("--batch-files", nargs="+", default=None)
    p.add_argument("--n-latent-topics", "-k", type=int, default=10)
    p.add_argument("--encoder-layers", type=int, nargs="+", default=[128, 1024, 128])
    p.add_argument("--epochs", "-i", type=int, default=1000)
    p.add_argument("--minibatch-size", type=int, default=100)
    p.add_argument("--learning-rate", "--lr", type=float, default=0.01)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument(
        "--decoder", default="nb",
        help="decoder family (multinomial|nb|poisson|nb-mixture), or a "
             "comma-separated list for joint multi-decoder training "
             "(per-family dictionaries written as "
             "{out}.{name}.dictionary.parquet)",
    )
    p.add_argument("--decoder-weights", type=float, nargs="+", default=None,
                   help="per-decoder loss weights (default: equal)")
    p.add_argument("--adj-method", choices=["batch", "residual"], default="residual",
                   help="null plane at eval: per-batch delta or "
                        "per-group residual")
    p.add_argument("--rho-prior-weight", type=float, default=0.0,
                   help="Beta(a,b) prior weight on the nb-mixture ambient "
                        "fraction rho (0 = off)")
    p.add_argument("--rho-prior-alpha", type=float, default=2.0)
    p.add_argument("--rho-prior-beta", type=float, default=18.0)
    p.add_argument("--amort-refine-steps", type=int, default=0,
                   help="per-cell refinement steps of the final latent "
                        "against the frozen dictionary (0 = off)")
    p.add_argument("--amort-refine-lr", type=float, default=0.01)
    p.add_argument("--amort-refine-reg", type=float, default=1.0)
    p.add_argument("--preload-data", action="store_true",
                   help="load all columns into memory before training")
    p.add_argument("--topic-smoothing", type=float, default=1e-4)
    p.add_argument("--proj-dim", type=int, default=50)
    p.add_argument("--sort-dim", type=int, default=10)
    p.add_argument("--knn-cells", type=int, default=10)
    p.add_argument("--num-levels", type=int, default=3)
    p.add_argument("--iter-opt", type=int, default=30)
    p.add_argument("--ignore-batch", action="store_true")
    p.add_argument("--block-size", type=int, default=8192)
    p.add_argument("--max-coarse-features", type=int, default=0)
    p.add_argument("--cnv", action="store_true", help="CNV side-channel on pb residuals")
    p.add_argument("--qc", action="store_true", help="cell QC keep mask before projection")
    p.add_argument("--qc-min-total", type=float, default=0.0)
    p.add_argument("--qc-min-genes", type=int, default=0)
    p.add_argument("--qc-max-mito-frac", type=float, default=1.0)
    p.add_argument("--hvg-genes", type=int, default=5000, help="HVG gate on the projection sketch")
    p.add_argument("--no-refine", action="store_true", help="skip DC-Poisson partition refinement")
    p.add_argument("--gene-weighting", choices=["nb-fisher", "none"], default="nb-fisher")
    p.add_argument("--anchor-penalty", type=float, default=0.0,
                   help="CE penalty lambda on beta toward the anchor prior (0 = off)")
    p.add_argument("--data-parallel", action="store_true",
                   help="dp-shard pseudobulk rows over all visible devices "
                        "during training (params replicate)")
    p.add_argument("--seed", type=int, default=None)
    return p


def run_senna(argv):
    ap = argparse.ArgumentParser(prog="senna", description="embedding suite")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _add_topic_parser(sub)

    p = sub.add_parser(
        "predict", aliases=["eval-topic"],
        help="held-out latent inference (eval-topic: +batch null, refinement)",
    )
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--model", required=True, help="output prefix of a senna topic run")
    p.add_argument("--out", required=True)
    p.add_argument("--block-size", type=int, default=4096)
    p.add_argument("--batch-files", nargs="+", default=None,
                   help="batch label files (one label per cell, per data file)")
    p.add_argument("--refine-steps", type=int, default=0,
                   help="per-cell refinement steps against the frozen dictionary")
    p.add_argument("--refine-lr", type=float, default=0.01)
    p.add_argument("--refine-reg", type=float, default=1.0)
    p.add_argument("--decoder-only", action="store_true",
                   help="skip the encoder: optimize theta against the frozen "
                        "dictionary from a uniform start")
    p.add_argument("--delta-iters", type=int, default=0,
                   help="TMLE refinement sweeps over the plug-in per-batch "
                        "delta (needs --batch-files)")
    p.add_argument("--residual-out", default=None,
                   help="also write residual expression x/(mu*lambda) to a "
                        "NEW sparse backend (.zarr/.h5)")
    p.add_argument("--residual-include-delta", action="store_true",
                   help="fold the estimated per-batch delta into the "
                        "residual denominator")
    p.add_argument("--residual-threshold", type=float, default=0.0,
                   help="drop residual entries <= this value")

    p = sub.add_parser("clustering", help="kmeans/leiden on a latent parquet")
    p.add_argument("--latent", default=None)
    p.add_argument("--from", dest="from_run", default=None,
                   help="prefix of a prior run: inputs resolve from its manifest")
    p.add_argument("--out", required=True)
    p.add_argument("--method", choices=["kmeans", "leiden", "hsblock"],
                   default="leiden")
    p.add_argument("--hsblock-depth", "--tree-depth", dest="hsblock_depth",
                   type=int, default=4)
    p.add_argument("--n-clusters", type=int, default=10)
    p.add_argument("--knn", type=int, default=15)
    p.add_argument("--resolution", type=float, default=1.0)
    p.add_argument("--max-iter", type=int, default=10)
    p.add_argument("--no-degree-corrected", action="store_true",
                   help="hsblock: plain (non-degree-corrected) SBM")
    p.add_argument("--edge-scale", type=float, default=1.0)
    p.add_argument("--min-cluster-size", type=int, default=1,
                   help="clusters smaller than this unassign to -1")
    p.add_argument("--data-files", nargs="+", default=None,
                   help="BHC postprocess: aggregate these counts per "
                        "cluster and write the DM Bayes-factor merge "
                        "tree + consensus cut")
    p.add_argument("--bhc-gamma-per-gene", type=float, default=1.0)
    p.add_argument("--bhc-cut", type=float, default=0.0)
    p.add_argument("--bhc-block-size", type=int, default=4096)
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("svd", help="streaming Nystrom rSVD embedding")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-files", nargs="+", default=None)
    p.add_argument("--n-factors", type=int, default=20)
    p.add_argument("--block-size", type=int, default=8192)
    p.add_argument("--column-sum-norm", type=float, default=0.0,
                   help="normalize each cell to this total before log1p "
                        "(0 = off)")
    p.add_argument("--save-adjusted", action="store_true",
                   help="write batch-adjusted counts to {out}.adjusted.zarr")
    p.add_argument("--qc", action="store_true")
    p.add_argument("--qc-min-total", type=float, default=0.0)
    p.add_argument("--qc-min-genes", type=int, default=0)
    p.add_argument("--qc-max-mito-frac", type=float, default=1.0)
    p.add_argument("--hvg-genes", type=int, default=0,
                   help="restrict the spectral basis to the top-N HVGs")
    p.add_argument("--cnv", action="store_true",
                   help="CNV side-channel on the pseudobulk planes")
    p.add_argument("--seed", type=int, default=None)

    p = sub.add_parser("layout", help="2D layout of a latent parquet")
    p.add_argument("--latent", default=None)
    p.add_argument("--from", dest="from_run", default=None,
                   help="prefix of a prior run: inputs resolve from its manifest")
    p.add_argument("--out", required=True)
    p.add_argument("--method", choices=["umap", "tumap", "tsne", "phate", "tree"],
                   default="umap")
    p.add_argument("--n-neighbors", type=int, default=15)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--perplexity", type=float, default=30.0, help="tsne only")
    p.add_argument("--pcs", type=int, default=0,
                   help="umap/tumap: run the kNN graph + SGD init on this "
                        "many PC scores (leading mean axis dropped); 0 = raw")
    p.add_argument("--tree-jitter", type=float, default=0.08,
                   help="tree method: per-cell perpendicular jitter as a "
                        "fraction of edge length (0 = cells stack on the "
                        "line; fit_layout_tree.rs tree_jitter)")
    p.add_argument("--tree-jitter-seed", type=int, default=42)

    p = sub.add_parser("pseudotime", help="principal-graph pseudotime")
    p.add_argument("--latent", default=None)
    p.add_argument("--from", dest="from_run", default=None,
                   help="prefix of a prior run: inputs resolve from its manifest")
    p.add_argument("--out", required=True)
    p.add_argument("--n-nodes", "--n-centroids", dest="n_nodes",
                   type=int, default=50)
    p.add_argument("--root-cell", type=int, default=None)
    p.add_argument("--root-node", type=int, default=None,
                   help="explicit tree node id as the root")
    p.add_argument("--gamma", "--lam", dest="lam", type=float, default=1.0,
                   help="tree smoothness weight")
    p.add_argument("--sigma", type=float, default=0.1,
                   help="soft-assignment bandwidth")
    p.add_argument("--max-iter", type=int, default=30)
    p.add_argument(
        "--velocity",
        default=None,
        help="parquet of per-cell velocity in latent space (e.g. senna bge"
        " --velocity output); orients the tree and overrides --root-cell",
    )

    p = sub.add_parser("plot", help="scatter a layout colored by clusters")
    p.add_argument("--layout", default=None, help="layout/latent parquet")
    p.add_argument("--from", dest="from_run", default=None,
                   help="prior run prefix: layout/latent + clusters resolve "
                        "from its manifest")
    p.add_argument("--clusters", default=None, help="clusters parquet")
    p.add_argument("--colour-by", "--color-by", dest="colour_by",
                   choices=["cluster", "topic", "pseudotime", "annotation"],
                   default="cluster")
    p.add_argument("--topics", type=int, nargs="+", default=None,
                   help="colour-by topic: which topic columns (default: argmax)")
    p.add_argument("--annotation", default=None,
                   help="TSV/parquet cell,label for colour-by annotation")
    p.add_argument("--pseudotime", default=None,
                   help="pseudotime parquet for colour-by pseudotime")
    p.add_argument("--width", type=float, default=6.0)
    p.add_argument("--height", type=float, default=5.0)
    p.add_argument("--dpi", type=int, default=150)
    p.add_argument("--point-size", type=float, default=3.0)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--hull", action="store_true",
                   help="convex hulls around each cluster")
    p.add_argument("--hull-coverage", type=float, default=0.9)
    p.add_argument("--hull-fill-alpha", type=float, default=0.15)
    p.add_argument("--no-labels", action="store_true",
                   help="legend instead of centroid label text")
    p.add_argument("--label-font-size", type=float, default=8.0)
    p.add_argument("--svg", action="store_true", help="also write .svg")
    p.add_argument("--png", action="store_true", help="also write .png")
    p.add_argument("--no-pdf", action="store_true")
    p.add_argument("--out", required=True,
                   help="output path or prefix (formats via --svg/--png/--no-pdf)")

    p = sub.add_parser("plot-topic", help="structure bars + top genes per topic")
    p.add_argument("--latent", default=None, help="log topic proportions parquet")
    p.add_argument("--from", dest="from_run", default=None,
                   help="prefix of a prior run: latent+dictionary resolve from its manifest")
    p.add_argument("--out", required=True, help="output image (.png/.svg/.pdf)")
    p.add_argument("--clusters", default=None, help="order cells by these labels")
    p.add_argument("--dictionary", default=None, help="{out}.dictionary.parquet")
    p.add_argument("--top-genes", type=int, default=10)
    p.add_argument("--group-by", default=None,
                   help="per-cell group labels (file, one per line, or "
                        "parquet/TSV cell,label): one structure panel per "
                        "group (plot-topic long_about: one bar panel per "
                        "batch)")
    p.add_argument("--no-struct", action="store_true",
                   help="skip the structure-bar panels")
    p.add_argument("--no-dict", action="store_true",
                   help="skip the dictionary hinton/top-genes outputs")

    p = sub.add_parser("deconvolve", help="bulk deconvolution against a reference")
    p.add_argument("--bulk", required=True, help="TSV/parquet: samples x genes counts")
    p.add_argument("--reference", default=None,
                   help="direct mode: parquet of genes x components rates")
    p.add_argument("--from", dest="from_run", default=None,
                   help="archetype mode: prior embedding run prefix; its "
                        "latent clusters into measured archetype profiles "
                        "(deconvolve/source.rs)")
    p.add_argument("--sc-data", nargs="+", default=None,
                   help="archetype mode: single-cell count backends "
                        "(default: the --from run's data files)")
    p.add_argument("--annotation", default=None,
                   help="archetype mode: TSV cell<TAB>label (soft readout)")
    p.add_argument("--archetypes", type=int, nargs="+", default=[200],
                   help="target archetype counts; several granularities "
                        "pool into ONE posterior (gibbs.rs:241)")
    p.add_argument("--archetype-min-cells", type=int, default=10)
    p.add_argument("--out", required=True)
    p.add_argument("--sweeps", "--draws", dest="sweeps", type=int, default=300)
    p.add_argument("--burn-in", "--warmup", dest="burn_in", type=int, default=100)
    p.add_argument("--thin", type=int, default=1)
    p.add_argument("--frac-prior-shape", type=float, default=1.0)
    p.add_argument("--frac-prior-rate", type=float, default=1.0)
    p.add_argument("--nb-dispersion", type=float, default=10.0)
    p.add_argument("--count-scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser(
        "probe",
        help="drift probe: model-based conformal fit null (--model + "
             "--calibration, probe.rs) or latent drift (--train-latent)",
    )
    p.add_argument("--data-files", nargs="+", default=None,
                   help="model mode: query backends to probe")
    p.add_argument("--model", default=None,
                   help="model mode: trained topic-model prefix")
    p.add_argument("--calibration", default=None,
                   help="model mode: in-distribution backend defining the null")
    p.add_argument("--alpha", type=float, default=0.05,
                   help="null tail probability = per-cell FP rate")
    p.add_argument("--minibatch-size", type=int, default=2048)
    p.add_argument("--counterfactual", action="store_true",
                   help="first-order benefit/forgetting along the pull "
                        "direction (no training; magnitudes only)")
    p.add_argument("--cf-seed", type=int, default=42)
    p.add_argument("--train-latent", default=None)
    p.add_argument("--heldout-latent", default=None)
    p.add_argument("--out", required=True)

    for _name, _help in [
        ("masked-topic", "indexed top-K masked ETM (simplex latent)"),
        ("masked-vae", "masked indexed model, Gaussian latent"),
        ("masked-sbp", "masked indexed model, stick-breaking simplex"),
    ]:
        p = sub.add_parser(_name, help=_help)
        p.add_argument("--data-files", nargs="+", required=True)
        p.add_argument("--out", required=True)
        p.add_argument("-k", "--n-latent-topics", type=int, default=10)
        p.add_argument("--window", type=int, default=128, help="top-K genes per cell")
        p.add_argument("--embed-dim", type=int, default=64)
        p.add_argument("--gene-modules", type=int, default=0,
                       help="learned gene-module pooling branch: M "
                            "centroids over the embedding space append "
                            "per-module level+coverage to the encoder "
                            "input (0 = off; encoder/indexed.rs "
                            "n_gene_modules)")
        p.add_argument("--epochs", type=int, default=100)
        p.add_argument("--minibatch-size", type=int, default=256)
        p.add_argument("--mask-frac", type=float, default=0.15)
        p.add_argument("--mask-schedule", choices=["fixed", "uniform"],
                       default="fixed",
                       help="uniform samples the mask rate per minibatch in "
                            "[--mask-rate-lo, --mask-rate-hi]")
        p.add_argument("--mask-rate-lo", type=float, default=0.05)
        p.add_argument("--mask-rate-hi", type=float, default=0.5)
        p.add_argument("--masked-likelihood", choices=["nb", "multinomial"],
                       default="nb")
        p.add_argument("--learning-rate", "--lr", type=float, default=1e-3)
        p.add_argument("--weight-decay", type=float, default=0.01)
        p.add_argument("--grad-clip", type=float, default=0.0)
        p.add_argument("--feature-embedding-l2", type=float, default=0.0,
                       help="L2 penalty on the shared gene embedding rho")
        p.add_argument("--kl-weight", type=float, default=1e-3,
                       help="Gaussian-latent KL weight (masked-vae)")
        p.add_argument("--eval-mask-fraction", type=float, default=0.0,
                       help="held-out masked-llik eval after training "
                            "(0 = skip); writes {out}.eval.json")
        p.add_argument("--eval-seed", type=int, default=0)
        p.add_argument(
            "--frozen-features", default=None,
            help="feature-embedding parquet from a prior run: matching"
            " genes' rho rows load frozen (topic/freeze.rs)",
        )
        p.add_argument(
            "--init-feature-embedding", default=None,
            help="feature-embedding parquet: rho initializes from it but "
                 "stays TRAINABLE (masked_topic.rs init_feature_embedding)",
        )
        p.add_argument("--batch-files", nargs="+", default=None,
                       help="per-cell batch labels: a collapse-derived "
                            "null plane feeds the encoder's second pool "
                            "(MaskedTopicArgs batch_files)")
        p.add_argument("--adj-method", choices=["batch", "residual"],
                       default="residual",
                       help="null plane: per-batch delta or per-group "
                            "residual (topic/common.rs:55-85)")
        p.add_argument("--sort-dim", type=int, default=6,
                       help="null-plane collapse partition depth")
        p.add_argument("--iter-opt", type=int, default=10)
        p.add_argument(
            "--feature-network", default=None,
            help="TSV gene-gene edge list: restrict top-K windows to "
                 "network genes (masked_topic.rs feature_network)",
        )
        p.add_argument("--feature-network-min-degree", type=int, default=0)
        p.add_argument("--feature-network-max-degree", type=int, default=0,
                       help="0 = no cap")
        p.add_argument("--no-feature-network-restrict", action="store_true",
                       help="load the network without restricting the gene "
                            "axis")
        p.add_argument("--seed", type=int, default=0)
        if _name == "masked-topic":
            p.add_argument("--latent", choices=["simplex", "sbp"], default="simplex")

    p = sub.add_parser("bge", help="count-NCE joint embedding")
    p.add_argument("--posterior", type=int, default=0,
                   help="pb-level Gibbs sweeps over the fitted model "
                        "(0 = off); writes feature_posterior.parquet")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--embed-dim", "-d", type=int, default=16)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--sort-dim", type=int, default=8)
    p.add_argument("--proj-dim", type=int, default=50)
    p.add_argument("--batch-files", nargs="+", default=None,
                   help="per-cell batch labels; switches NCE negatives to "
                        "the batch-stratified marginal (loss/ contract)")
    p.add_argument("--feature-qc", action="store_true",
                   help="HVG feature QC before the fit (feature_qc.rs)")
    p.add_argument("--hvg-min-excess", type=float, default=0.0)
    p.add_argument("--min-nnz-rows", type=float, default=0.0)
    p.add_argument("--multiome", action="store_true",
                   help="two data files = paired RNA + ATAC on shared "
                        "cells; features stack with peaks scaled by "
                        "--bridge-weight (BgeArgs multiome)")
    p.add_argument("--bridge-weight", type=float, default=1.0,
                   help="relative count mass of the second modality")
    p.add_argument("--num-topics", type=int, default=0,
                   help="target ETM topic count (0 = Leiden-resolved)")
    p.add_argument("--phase1-cells-per-pb", type=int, default=0,
                   help="choose the pseudobulk depth so groups average "
                        "about this many cells (overrides --sort-dim)")
    p.add_argument("--skip-etm", action="store_true",
                   help="skip the post-training SIMBA co-embed + "
                        "cluster-seeded ETM layout; keep the raw rho "
                        "feature embedding")
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                   default="float32",
                   help="phase-1 [P,D]-plane compute dtype; bfloat16 "
                        "halves HBM traffic on TPU (params/reductions "
                        "stay float32)")
    p.add_argument("--data-parallel", action="store_true",
                   help="shard phase-1 pb rows over all visible devices "
                        "(dp mesh; feature side replicated)")

    p = sub.add_parser("qmatrix", help="gene-set x topic enrichment Q-matrix")
    p.add_argument("--dictionary", required=True, help="{out}.dictionary.parquet")
    p.add_argument("--markers", required=True, help="GMT gene sets")
    p.add_argument("--out", required=True)
    p.add_argument("--permutations", type=int, default=500)
    p.add_argument("--specificity", choices=["raw", "simplex", "abs"],
                   default="raw")
    p.add_argument("--no-stratify", action="store_true",
                   help="disable abundance-stratified null sets (GOseq fix)")
    p.add_argument("--latent", default=None,
                   help="cell topic proportions parquet: also writes per-cell "
                        "labels via theta . Q (cellproj)")
    p.add_argument("--q-temperature", type=float, default=1.0,
                   help="softmax temperature of the normalized Q lens "
                        "(q_matrix.rs build_q_matrix)")
    p.add_argument("--fdr-alpha", type=float, default=0.05,
                   help="survival gate for the Q lens")
    p.add_argument("--min-confidence", type=float, default=0.0)

    p = sub.add_parser(
        "annotate-ontology", help="ontology-consensus cluster annotation (TreeBH)"
    )
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--clusters", required=True, help="clusters parquet")
    p.add_argument("--obo", required=True, help="ontology .obo")
    p.add_argument("--gaf", required=True, help="term-gene annotations GAF")
    p.add_argument("--out", required=True)
    p.add_argument("--top-frac", type=float, default=0.1)
    p.add_argument("--alpha", type=float, default=0.05)
    p.add_argument("--by", choices=["ora", "module-score"], default="ora",
                   help="module-score adds the descriptive cross-cluster "
                        "contrast table (ontology_enrich.rs "
                        "ontology_module_score)")

    p = sub.add_parser(
        "annotate-by-enrichment", help="marker-panel cluster annotation"
    )
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--clusters", required=True, help="clusters parquet")
    p.add_argument("--markers", required=True, help="GMT marker sets")
    p.add_argument("--out", required=True)
    p.add_argument("--bootstrap", "--n-boot", dest="bootstrap",
                   type=int, default=0,
                   help="panel stability bootstrap draws (0 = off)")
    p.add_argument("--support-threshold", "--min-support",
                   dest="support_threshold", type=float, default=0.6)
    p.add_argument("--min-score", type=float, default=0.0,
                   help="below this marker z the cluster stays UNASSIGNED")
    p.add_argument("--min-markers", type=int, default=0,
                   help="panels matching fewer genes drop out")
    p.add_argument("--min-gene-set", type=int, default=0)
    p.add_argument("--max-gene-set", type=int, default=0, help="0 = no cap")
    p.add_argument("--num-perm", type=int, default=0,
                   help="gene-label permutation null: adds perm_z/perm_p "
                        "columns (AnnotateArgs num_perm)")
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("vae", help="scVI-style Gaussian-latent VAE")
    p.add_argument("--data-files", nargs="*", default=[],
                   help="input backends (optional when --from is given)")
    p.add_argument("--out", required=True)
    p.add_argument("--from", dest="from_run", default=None,
                   help="chain data/batch files from a prior run's manifest")
    p.add_argument("--init-from", dest="init_from", default=None,
                   help="warm-start weights from a prior vae run prefix")
    p.add_argument("--batch-files", nargs="+", default=None)
    p.add_argument("-k", "--n-latent", type=int, default=16)
    p.add_argument("--encoder-layers", type=int, nargs="+", default=[128, 64])
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--minibatch-size", type=int, default=100)
    p.add_argument("--learning-rate", "--lr", type=float, default=0.01)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument("--adj-method", choices=["batch", "residual"], default="residual")
    p.add_argument("--proj-dim", type=int, default=50)
    p.add_argument("--sort-dim", type=int, default=10)
    p.add_argument("--num-levels", type=int, default=2)
    p.add_argument("--iter-opt", type=int, default=30)
    p.add_argument("--block-size", type=int, default=8192)
    p.add_argument("--qc", action="store_true")
    p.add_argument("--qc-min-total", type=float, default=0.0)
    p.add_argument("--qc-min-genes", type=int, default=0)
    p.add_argument("--qc-max-mito-frac", type=float, default=1.0)
    p.add_argument("--hvg-genes", type=int, default=5000)
    p.add_argument("--seed", type=int, default=None)

    p = sub.add_parser(
        "impute",
        help="kNN count imputation: against a REFERENCE dataset "
             "(--model + --reference-latent + --reference-data, "
             "impute.rs pipeline) or self-latent smoothing (--latent)",
    )
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--latent", default=None,
                   help="self mode: this dataset's own latent parquet")
    p.add_argument("--model", default=None,
                   help="reference mode: trained model prefix (query cells "
                        "project through its encoder)")
    p.add_argument("--reference-latent", default=None,
                   help="reference mode: the reference run's latent parquet")
    p.add_argument("--reference-data", nargs="+", default=None,
                   help="reference mode: data files behind --reference-latent")
    p.add_argument("--reference-batch-files", nargs="+", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--knn", type=int, default=15)
    p.add_argument("--knn-temperature", type=float, default=1.0,
                   help="softmax temperature on kNN distances "
                        "(w ~ exp(-d^2/2 tau^2))")
    p.add_argument("--block-size", type=int, default=4096)

    p = sub.add_parser("fne", help="feature-network embedding from an edge list")
    p.add_argument("--edges", required=True, help="TSV: src dst [weight]")
    p.add_argument("--out", required=True)
    p.add_argument("-d", "--embedding-dim", type=int, default=32)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--learning-rate", "--lr", type=float, default=0.05)
    p.add_argument("--num-negatives", type=float, default=5.0,
                   help="expected negatives per positive edge unit "
                        "(EXACT expectation, not samples)")
    p.add_argument("--neg-alpha", type=float, default=0.75,
                   help="marginal^alpha negative distribution")
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser(
        "resolve-embedding-space", aliases=["rest"],
        help="recast a topic run into a shared cell+gene metric space "
             "(--from, resolve_embedding_space.rs) or Procrustes-align "
             "runs (--runs)",
    )
    p.add_argument("--from", dest="from_run", default=None,
                   help="finished topic run prefix: freeze its theta and "
                        "learn the shared cell+gene H-space against the "
                        "raw counts")
    p.add_argument("--data-files", nargs="+", default=None,
                   help="counts behind --from (default: its manifest)")
    p.add_argument("--embedding-dim", "-d", type=int, default=None,
                   help="H (default: the run's topic count)")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--learning-rate", "--lr", type=float, default=0.05)
    p.add_argument("--num-negatives", type=float, default=5.0)
    p.add_argument(
        "--runs", nargs="+", default=None,
        help="Procrustes mode: run prefixes; each needs "
        "{prefix}.feature_embedding.parquet",
    )
    p.add_argument("--out", required=True)
    p.add_argument("--reference", type=int, default=0, help="index of the anchor run")
    p.add_argument("--no-scale", action="store_true")
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("joint-topic", help="multi-modality topic model (shared cells)")
    p.add_argument(
        "--data-files", nargs="+", required=True, action="append",
        help="repeat once per modality",
    )
    p.add_argument("--out", required=True)
    p.add_argument("-k", "--n-latent-topics", type=int, default=10)
    p.add_argument("--encoder-layers", type=int, nargs="+", default=[128, 128])
    p.add_argument("--epochs", type=int, default=300)
    p.add_argument("--minibatch-size", type=int, default=100)
    p.add_argument(
        "--decoder", choices=["multinomial", "nb", "poisson", "delta"], default="nb",
        help="delta = shared base + chain deltas (same feature axis across modalities)",
    )
    p.add_argument("--decoder-weights", type=float, nargs="+", default=None)
    p.add_argument("--proj-dim", type=int, default=50)
    p.add_argument("--sort-dim", type=int, default=8)
    p.add_argument("--iter-opt", type=int, default=30)
    p.add_argument("--seed", type=int, default=None)

    p = sub.add_parser("joint-svd", help="multi-modality rSVD (shared cells)")
    p.add_argument(
        "--data-files", nargs="+", required=True, action="append",
        help="repeat once per modality",
    )
    p.add_argument("--out", required=True)
    p.add_argument("--n-factors", type=int, default=20)
    p.add_argument("--proj-dim", type=int, default=50)
    p.add_argument("--sort-dim", type=int, default=10)
    p.add_argument("--block-size", type=int, default=8192)
    p.add_argument("--seed", type=int, default=None)

    p = sub.add_parser(
        "annotate-by-projection",
        help="marker projection into a co-embedding (--from rest run + "
             "--markers, annotate args.rs) or kNN label transfer "
             "(--train-latent)",
    )
    p.add_argument("--from", dest="from_run", default=None,
                   help="rest/bge run prefix with feature_embedding + "
                        "latent: markers project into the shared space")
    p.add_argument("--markers", default=None, help="GMT marker sets")
    p.add_argument("--no-idf", action="store_true",
                   help="skip the inverse-panel-frequency marker weighting")
    p.add_argument("--assign-mad", type=float, default=3.0,
                   help="cells further than this many MADs from every "
                        "label centroid stay UNASSIGNED (assign_qc)")
    p.add_argument("--no-assign-qc", action="store_true")
    p.add_argument("--train-latent", default=None)
    p.add_argument("--train-clusters", default=None, help="clusters parquet")
    p.add_argument("--latent", default=None, help="held-out latent parquet")
    p.add_argument("--out", required=True)
    p.add_argument("--knn", type=int, default=15)

    p = sub.add_parser(
        "plot-strand", help="Watson/Crick mirrored genomic-activity ideograms"
    )
    p.add_argument("--activity", required=True, help="parquet: gene x group activity")
    p.add_argument("--gff", required=True, help="gene coordinates + strand")
    p.add_argument("--out", required=True, help="output prefix (one image per group)")
    p.add_argument("--bins", type=int, default=200)
    args = ap.parse_args(argv)

    # --from manifest chaining (run_manifest.rs:848 inherit_from):
    # downstream commands resolve their inputs from a prior run's
    # {prefix}.senna.json instead of explicit paths
    if getattr(args, "from_run", None):
        from ..utils.manifest import RunManifest

        mpath = (
            args.from_run
            if args.from_run.endswith(".json")
            else args.from_run + ".senna.json"
        )
        prev = RunManifest.load(mpath)
        if getattr(args, "latent", None) is None and "latent" in prev.outputs:
            args.latent = prev.outputs["latent"]
        if (
            getattr(args, "dictionary", None) is None
            and "dictionary" in prev.outputs
        ):
            args.dictionary = prev.outputs["dictionary"]
    if (
        args.cmd in ("clustering", "layout", "pseudotime", "plot-topic")
        and not getattr(args, "latent", None)
        # layout tree resolves its latent from the PSEUDOTIME manifest's
        # inputs (the pt run records no outputs.latent of its own)
        and not (args.cmd == "layout" and args.method == "tree" and args.from_run)
    ):
        raise SystemExit(f"{args.cmd}: provide --latent or --from <run prefix>")

    if args.cmd == "vae":
        from ..senna.vae import VaeArgs, fit_vae
        from ..utils.prng import DEFAULT_PROJECTION_SEED

        if not args.data_files and not args.from_run:
            raise SystemExit("vae: provide --data-files or --from <run prefix>")
        fit_vae(
            VaeArgs(
                data_files=args.data_files,
                out=args.out,
                from_run=args.from_run,
                init_from=args.init_from,
                batch_files=args.batch_files,
                n_latent=args.n_latent,
                encoder_layers=tuple(args.encoder_layers),
                epochs=args.epochs,
                minibatch_size=args.minibatch_size,
                learning_rate=args.learning_rate,
                grad_clip=args.grad_clip,
                adj_method=args.adj_method,
                qc=args.qc,
                qc_min_total=args.qc_min_total,
                qc_min_genes=args.qc_min_genes,
                qc_max_mito_frac=args.qc_max_mito_frac,
                hvg_genes=args.hvg_genes,
                proj_dim=args.proj_dim,
                sort_dim=args.sort_dim,
                num_levels=args.num_levels,
                iter_opt=args.iter_opt,
                block_size=args.block_size,
                seed=args.seed if args.seed is not None else DEFAULT_PROJECTION_SEED,
            )
        )
        print(f"wrote {args.out}.latent.parquet")
        return
    if args.cmd == "impute":
        import pandas as pd
        import scipy.sparse as sp

        from ..data.sparse_io import create_sparse_from_csc
        from ..senna.impute import impute_counts, impute_from_reference
        from ..senna.topic import load_data_vec

        vec = load_data_vec(args.data_files)
        ref_mode = bool(args.model or args.reference_latent or args.reference_data)
        if ref_mode:
            if not (args.model and args.reference_latent and args.reference_data):
                raise SystemExit(
                    "impute reference mode needs --model, --reference-latent "
                    "AND --reference-data"
                )
            # 1. project the query through the trained encoder
            # (impute.rs:113 delegates to predict)
            from ..senna.predict import PredictArgs, predict_model

            z_new = predict_model(
                PredictArgs(
                    data_files=list(args.data_files), model=args.model,
                    out=f"{args.out}.query", block_size=args.block_size,
                )
            )
            ref_df = pd.read_parquet(args.reference_latent)
            z_ref = ref_df.iloc[:, 1:].to_numpy("float32")
            # latents store log proportions; compare in linear space
            theta_new = np.exp(z_new) if np.all(z_new <= 0) else z_new
            theta_ref = np.exp(z_ref) if np.all(z_ref <= 0) else z_ref
            ref_vec = load_data_vec(args.reference_data, args.reference_batch_files)
            imp = impute_from_reference(
                theta_new, theta_ref, ref_vec,
                knn=args.knn, knn_temperature=args.knn_temperature,
                cell_block=args.block_size,
            )
            pd.DataFrame(
                imp, index=vec.column_names(), columns=ref_vec.row_names()
            ).reset_index(names="cell").to_parquet(f"{args.out}.imputed.parquet")
            print(f"wrote {args.out}.imputed.parquet "
                  f"({imp.shape[0]} x {imp.shape[1]})")
            return
        if not args.latent:
            raise SystemExit("impute self mode needs --latent")
        z = pd.read_parquet(args.latent).iloc[:, 1:].to_numpy("float32")
        if len(z) != vec.num_columns:
            raise SystemExit(
                f"latent has {len(z)} cells but data has {vec.num_columns}"
            )
        imp = impute_counts(vec, z, knn=args.knn)
        create_sparse_from_csc(
            sp.csc_matrix(imp.T), f"{args.out}.zarr",
            vec.row_names(), vec.column_names(),
        )
        print(f"wrote backend: {args.out}.zarr (imputed)")
        return
    if args.cmd == "fne":
        import pandas as pd

        from ..senna.fne import fit_fne

        df = pd.read_csv(args.edges, sep="\t", header=None)
        edges = [tuple(r) for r in df.itertuples(index=False)]
        res = fit_fne(
            edges, embedding_dim=args.embedding_dim,
            epochs=args.epochs, seed=args.seed,
            learning_rate=args.learning_rate,
            n_negatives=args.num_negatives, neg_alpha=args.neg_alpha,
        )
        pd.DataFrame(
            res.embedding, index=[str(n) for n in res.names],
            columns=[f"h{j}" for j in range(res.embedding.shape[1])],
        ).reset_index(names="node").to_parquet(f"{args.out}.embedding.parquet")
        print(f"wrote {args.out}.embedding.parquet ({len(res.names)} nodes)")
        return
    if args.cmd in ("resolve-embedding-space", "rest"):
        import pandas as pd

        if args.from_run:
            # reference semantics: frozen-theta NCE co-embedding
            # (resolve_embedding_space.rs)
            import numpy as _np

            from ..embedding.resolve import rest_fit
            from ..senna.topic import load_data_vec
            from ..utils.manifest import RunManifest

            prev = RunManifest.load(
                args.from_run if args.from_run.endswith(".json")
                else args.from_run + ".senna.json"
            )
            lat = prev.outputs.get("latent")
            if lat is None:
                raise SystemExit("rest --from: source run has no latent")
            zdf = pd.read_parquet(lat)
            theta = zdf.iloc[:, 1:].to_numpy("float32")
            if _np.all(theta <= 0):
                theta = _np.exp(theta)
            theta = theta / _np.maximum(theta.sum(1, keepdims=True), 1e-30)
            files = args.data_files or prev.inputs.get("data_files")
            if not files:
                raise SystemExit("rest --from: no data files found")
            vec = load_data_vec(files)
            res = rest_fit(
                theta, vec, embedding_dim=args.embedding_dim,
                epochs=args.epochs, learning_rate=args.learning_rate,
                n_negatives=args.num_negatives, seed=args.seed,
            )
            h = res["cell_embedding"].shape[1]
            pd.DataFrame(
                res["cell_embedding"], index=zdf.iloc[:, 0],
                columns=[f"h{i}" for i in range(h)],
            ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")
            pd.DataFrame(
                res["feature_embedding"], index=vec.row_names(),
                columns=[f"h{i}" for i in range(h)],
            ).reset_index(names="gene").to_parquet(
                f"{args.out}.feature_embedding.parquet"
            )
            pd.DataFrame(
                res["topic_embedding"],
                columns=[f"h{i}" for i in range(h)],
            ).to_parquet(f"{args.out}.topic_embedding.parquet")
            RunManifest(
                command="resolve-embedding-space",
                inputs={"from": args.from_run, "data_files": list(files)},
                outputs={
                    "latent": f"{args.out}.latent.parquet",
                    "feature_embedding": f"{args.out}.feature_embedding.parquet",
                },
            ).save(args.out)
            print(f"wrote {args.out}.latent/.feature_embedding/.topic_embedding")
            return
        if not args.runs:
            raise SystemExit("rest: provide --from <run> or --runs <prefixes>")
        from ..embedding.resolve import resolve_embedding_spaces

        runs = []
        for prefix in args.runs:
            fe = pd.read_parquet(f"{prefix}.feature_embedding.parquet")
            run = {
                "feat_names": fe.iloc[:, 0].astype(str).tolist(),
                "e_feat": fe.iloc[:, 1:].to_numpy("float64"),
                "e_cell": None,
                "cell_names": None,
            }
            try:
                ce = pd.read_parquet(f"{prefix}.latent.parquet")
                run["e_cell"] = ce.iloc[:, 1:].to_numpy("float64")
                run["cell_names"] = ce.iloc[:, 0].astype(str).tolist()
            except FileNotFoundError:
                pass
            runs.append(run)
        aligned = resolve_embedding_spaces(
            runs, reference=args.reference, allow_scale=not args.no_scale
        )
        for i, run in enumerate(aligned):
            pd.DataFrame(
                run["e_feat"], index=run["feat_names"],
                columns=[f"h{j}" for j in range(run["e_feat"].shape[1])],
            ).reset_index(names="feature").to_parquet(
                f"{args.out}.run{i}.feature_embedding.parquet"
            )
            if run.get("e_cell") is not None:
                pd.DataFrame(
                    run["e_cell"], index=run["cell_names"],
                    columns=[f"h{j}" for j in range(run["e_cell"].shape[1])],
                ).reset_index(names="cell").to_parquet(
                    f"{args.out}.run{i}.latent.parquet"
                )
        print(f"wrote {len(aligned)} aligned runs under {args.out}.run*")
        return
    if args.cmd == "joint-topic":
        import pandas as pd

        from ..senna.joint import JointTopicArgs, fit_joint_topic
        from ..senna.topic import load_data_vec
        from ..utils.manifest import RunManifest
        from ..utils.prng import DEFAULT_PROJECTION_SEED

        modality_files = args.data_files  # list of lists (action=append)
        mods = [load_data_vec(files) for files in modality_files]
        res = fit_joint_topic(
            mods,
            JointTopicArgs(
                n_topics=args.n_latent_topics,
                encoder_layers=tuple(args.encoder_layers),
                epochs=args.epochs,
                minibatch_size=args.minibatch_size,
                decoder=args.decoder,
                decoder_weights=args.decoder_weights,
                proj_dim=args.proj_dim,
                sort_dim=args.sort_dim,
                iter_opt=args.iter_opt,
                seed=args.seed if args.seed is not None else DEFAULT_PROJECTION_SEED,
            ),
        )
        k = args.n_latent_topics
        pd.DataFrame(
            res["pb_latent"], columns=[f"topic{j}" for j in range(k)]
        ).reset_index(names="pseudobulk").to_parquet(f"{args.out}.pb_latent.parquet")
        # per-cell latent via the cell -> pb map
        cell_theta = res["pb_latent"][res["groups"]]
        pd.DataFrame(
            cell_theta, index=mods[0].column_names(),
            columns=[f"topic{j}" for j in range(k)],
        ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")
        RunManifest(
            command="joint-topic",
            inputs={"modalities": [list(f) for f in modality_files]},
            outputs={"latent": f"{args.out}.latent.parquet",
                     "pb_latent": f"{args.out}.pb_latent.parquet"},
        ).save(args.out)
        print(f"wrote {args.out}.latent.parquet + .pb_latent.parquet")
        return
    if args.cmd == "joint-svd":
        from ..senna.svd import fit_joint_svd
        from ..utils.prng import DEFAULT_PROJECTION_SEED

        fit_joint_svd(
            args.data_files, args.out,
            n_factors=args.n_factors, proj_dim=args.proj_dim,
            sort_dim=args.sort_dim, block_size=args.block_size,
            seed=args.seed if args.seed is not None else DEFAULT_PROJECTION_SEED,
        )
        print(f"wrote {args.out}.latent.parquet + .dictionary.parquet")
        return
    if args.cmd == "annotate-by-projection":
        import pandas as pd

        from ..ops.knn import knn_search

        if args.from_run:
            # marker projection into the shared cell+gene space
            # (annotate/args.rs marker-projection path): each label's
            # score is the IDF-weighted mean similarity of the cell to
            # the label's marker-gene embeddings
            import numpy as _np

            from ..data.knowledge import read_gmt
            from ..utils.manifest import RunManifest

            if not args.markers:
                raise SystemExit("annotate-by-projection --from needs --markers")
            prev = RunManifest.load(
                args.from_run if args.from_run.endswith(".json")
                else args.from_run + ".senna.json"
            )
            fe = pd.read_parquet(prev.outputs["feature_embedding"])
            ce = pd.read_parquet(prev.outputs["latent"])
            genes = {str(g).lower(): i for i, g in enumerate(fe.iloc[:, 0])}
            g_emb = fe.iloc[:, 1:].to_numpy("float32")
            z = ce.iloc[:, 1:].to_numpy("float32")
            zn = z / _np.maximum(_np.linalg.norm(z, axis=1, keepdims=True), 1e-9)
            gn = g_emb / _np.maximum(
                _np.linalg.norm(g_emb, axis=1, keepdims=True), 1e-9
            )
            sets = read_gmt(args.markers)
            # IDF: markers shared by many panels discriminate less
            counts = {}
            for label, gl in sets.items():
                for g in gl:
                    counts[str(g).lower()] = counts.get(str(g).lower(), 0) + 1
            n_panels = max(len(sets), 1)
            scores = _np.full((len(z), len(sets)), -_np.inf, _np.float32)
            labels = list(sets)
            for li, label in enumerate(labels):
                idxs, wts = [], []
                for g in sets[label]:
                    j = genes.get(str(g).lower())
                    if j is not None:
                        idxs.append(j)
                        w = 1.0 if args.no_idf else _np.log1p(
                            n_panels / counts[str(g).lower()]
                        )
                        wts.append(w)
                if not idxs:
                    continue
                w = _np.asarray(wts, _np.float32)
                sim = zn @ gn[_np.asarray(idxs)].T  # [N, M]
                scores[:, li] = (sim * w[None, :]).sum(1) / w.sum()
            best = scores.argmax(1)
            ann = _np.asarray(labels)[best]
            conf = scores[_np.arange(len(z)), best]
            if not args.no_assign_qc:
                # MAD fence on the winning score (assign_mad)
                med = _np.median(conf)
                mad = _np.median(_np.abs(conf - med)) * 1.4826
                low = conf < med - args.assign_mad * max(mad, 1e-9)
                ann = _np.where(low, "UNASSIGNED", ann)
            pd.DataFrame(
                {"cell": ce.iloc[:, 0], "annotation": ann, "score": conf}
            ).to_parquet(f"{args.out}.annotation.parquet")
            print(f"wrote {args.out}.annotation.parquet "
                  f"({(_np.asarray(ann) != 'UNASSIGNED').sum()}/{len(ann)} assigned)")
            return
        if not (args.train_latent and args.train_clusters and args.latent):
            raise SystemExit(
                "annotate-by-projection: provide --from/--markers or "
                "--train-latent/--train-clusters/--latent"
            )
        tr = pd.read_parquet(args.train_latent)
        ho = pd.read_parquet(args.latent)
        cl = pd.read_parquet(args.train_clusters)
        lab = cl.set_index(cl.columns[0]).reindex(tr.iloc[:, 0]).iloc[:, 0].to_numpy()
        zt = tr.iloc[:, 1:].to_numpy("float32")
        zh = ho.iloc[:, 1:].to_numpy("float32")
        dist, idx = knn_search(zh, zt, min(args.knn, len(zt)))
        w = np.exp(-(dist - dist.min(1, keepdims=True)))
        w = w / np.maximum(w.sum(1, keepdims=True), 1e-30)
        uniq, lab_codes = np.unique(lab.astype(str), return_inverse=True)
        votes = np.zeros((len(zh), len(uniq)))
        for j in range(idx.shape[1]):
            np.add.at(votes, (np.arange(len(zh)), lab_codes[idx[:, j]]), w[:, j])
        best = votes.argmax(1)
        conf = votes[np.arange(len(zh)), best] / np.maximum(votes.sum(1), 1e-30)
        pd.DataFrame(
            {"cell": ho.iloc[:, 0], "annotation": uniq[best], "confidence": conf}
        ).to_parquet(f"{args.out}.annotation.parquet")
        print(f"wrote {args.out}.annotation.parquet")
        return
    if args.cmd == "plot-strand":
        import pandas as pd

        from ..faba.genes import parse_gff_genes
        from ..utils.plot import strand_ideogram

        act = pd.read_parquet(args.activity)
        gene_col = act.columns[0]
        act = act.set_index(gene_col)
        model = parse_gff_genes(args.gff)
        pos_of = {}
        for i, nm in enumerate(model.names):
            tss = model.start[i] if model.strand[i] > 0 else model.end[i]
            pos_of[nm] = (model.chrom[i], int(tss), int(model.strand[i]))
        hit = [g for g in act.index.astype(str) if g in pos_of]
        if not hit:
            raise SystemExit("no activity rows match GFF gene names")
        chrom = np.asarray([pos_of[g][0] for g in hit])
        pos = np.asarray([pos_of[g][1] for g in hit])
        strand = np.asarray([pos_of[g][2] for g in hit])
        outs = []
        for col in act.columns:
            a = act.loc[hit, col].to_numpy("float64")
            f = f"{args.out}.{col}.png"
            strand_ideogram(
                a, chrom, pos, strand, model.chrom_names, f,
                bins=args.bins, title=str(col),
            )
            outs.append(f)
        print(f"wrote {len(outs)} ideograms: {outs[0]} ...")
        return

    if args.cmd == "deconvolve":
        import numpy as _np
        import pandas as pd

        from ..senna.deconvolve import DeconvConfig, deconvolve

        bulk_df = (
            pd.read_parquet(args.bulk)
            if args.bulk.endswith(".parquet")
            else pd.read_csv(args.bulk, sep="\t", index_col=0)
        )
        cfg = DeconvConfig(
            n_sweeps=args.sweeps, burn_in=args.burn_in, thin=args.thin,
            a0=args.frac_prior_shape, b0=args.frac_prior_rate,
            nb_dispersion=args.nb_dispersion, count_scale=args.count_scale,
            seed=args.seed,
        )
        if args.from_run:
            # archetype mode (deconvolve/source.rs + archetypes.rs):
            # cluster the prior run's cell embedding into measured
            # sub-type profiles; pool granularities into one posterior
            from ..senna.deconvolve import build_archetype_reference
            from ..senna.topic import load_data_vec
            from ..utils.manifest import RunManifest

            prev = RunManifest.load(
                args.from_run if args.from_run.endswith(".json")
                else args.from_run + ".senna.json"
            )
            latent_path = prev.outputs.get("latent")
            if latent_path is None:
                raise SystemExit("deconvolve --from: source run has no latent")
            zdf = pd.read_parquet(latent_path)
            emb = zdf.iloc[:, 1:].to_numpy("float32")
            if _np.all(emb <= 0):
                emb = _np.exp(emb)
            sc_files = args.sc_data or prev.inputs.get("data_files")
            if not sc_files:
                raise SystemExit("deconvolve --from: no --sc-data and no "
                                 "data files in the source manifest")
            sc_vec = load_data_vec(sc_files)
            ann = _np.array([""] * sc_vec.num_columns, dtype=object)
            if args.annotation:
                adf = pd.read_csv(args.annotation, sep="\t", header=None,
                                  names=["cell", "label"], dtype=str)
                lut = dict(zip(adf.cell, adf.label))
                ann = _np.array(
                    [lut.get(str(c), "") for c in sc_vec.column_names()],
                    dtype=object,
                )
            frac_means, frac_sds, memb_cols = [], [], {}
            celltypes = None
            for gi, n_arch in enumerate(args.archetypes):
                ref = build_archetype_reference(
                    sc_vec, emb, ann, n_archetypes=n_arch,
                    min_cells=args.archetype_min_cells, seed=args.seed + gi,
                )
                celltypes = ref.celltype_names
                shared = [g for g in ref.gene_names if g in bulk_df.columns]
                gpos = {g: i for i, g in enumerate(ref.gene_names)}
                rows = [gpos[g] for g in shared]
                y = bulk_df[shared].to_numpy(_np.float32)
                res = deconvolve(
                    y, ref.mu_gm[rows], readout_mc=ref.readout, config=cfg
                )
                frac_means.append(res.fractions)
                frac_sds.append(res.fractions_sd)
                memb_cols[f"archetype_k{n_arch}"] = ref.membership
            frac = _np.mean(frac_means, axis=0)
            pd.DataFrame(
                frac, index=bulk_df.index, columns=celltypes
            ).reset_index(names="sample").to_parquet(f"{args.out}.fractions.parquet")
            pd.DataFrame(
                {"cell": sc_vec.column_names(), **memb_cols}
            ).to_parquet(f"{args.out}.membership.parquet")
            print(f"wrote {args.out}.fractions.parquet "
                  f"({len(args.archetypes)} granularities pooled) + membership")
            return
        if not args.reference:
            raise SystemExit("deconvolve: provide --reference or --from")
        ref_df = pd.read_parquet(args.reference)
        # a non-numeric first column is the gene-name index (pandas 3
        # strings are 'str' dtype, not object — test numerically)
        import pandas.api.types as ptypes

        ref = (
            ref_df.set_index(ref_df.columns[0])
            if not ptypes.is_numeric_dtype(ref_df.iloc[:, 0])
            else ref_df
        )
        shared = [g for g in ref.index if g in bulk_df.columns]
        y = bulk_df[shared].to_numpy(_np.float32)
        mu = ref.loc[shared].to_numpy(_np.float32)
        res = deconvolve(y, mu, config=cfg)
        pd.DataFrame(
            res.fractions, index=bulk_df.index, columns=list(ref.columns)
        ).reset_index(names="sample").to_parquet(f"{args.out}.fractions.parquet")
        print(f"wrote {args.out}.fractions.parquet (worst Rhat {res.rhat.max():.2f})")
        return
    if args.cmd == "probe":
        import pandas as pd

        if args.model:
            # model-based conformal probe (probe.rs)
            import json as _json

            from ..senna.probe import probe_model

            if not (args.data_files and args.calibration):
                raise SystemExit(
                    "probe model mode needs --data-files AND --calibration"
                )
            res = probe_model(
                args.model, args.data_files, args.calibration,
                alpha=args.alpha, block_size=args.minibatch_size,
                counterfactual=args.counterfactual, cf_seed=args.cf_seed,
            )
            pd.DataFrame(
                {"fit": res.q_fit, "flagged": res.q_fit < res.threshold}
            ).to_parquet(f"{args.out}.probe.fit.parquet")
            doc = {
                "verdict": res.verdict,
                "flag_rate": res.flag_rate,
                "binom_p": res.binom_p,
                "threshold": res.threshold,
                "alpha": args.alpha,
            }
            if res.counterfactual is not None:
                doc["counterfactual"] = res.counterfactual
            with open(f"{args.out}.probe.json", "w") as f:
                _json.dump(doc, f, indent=2)
            print(_json.dumps({k: v for k, v in doc.items()
                               if k != "counterfactual"}))
            if res.counterfactual:
                cfd = res.counterfactual
                print(
                    f"counterfactual: benefit={cfd['benefit']:+.4e} "
                    f"forgetting={cfd['forgetting']:+.4e} "
                    f"||g||={cfd['pull_norm']:.4e}"
                )
            return
        if not (args.train_latent and args.heldout_latent):
            raise SystemExit(
                "probe: provide --model/--calibration/--data-files or "
                "--train-latent/--heldout-latent"
            )
        from ..senna.impute import probe_latent

        tr = pd.read_parquet(args.train_latent).iloc[:, 1:].to_numpy("float32")
        ho = pd.read_parquet(args.heldout_latent).iloc[:, 1:].to_numpy("float32")
        v = probe_latent(tr, ho)
        import json as _json

        doc = {
            "verdict": v.verdict,
            "drift_score": v.drift_score,
            "novelty_frac": v.novelty_frac,
        }
        with open(f"{args.out}.probe.json", "w") as f:
            _json.dump(doc, f, indent=2)
        print(_json.dumps(doc))
        return
    if args.cmd in ("masked-topic", "masked-vae", "masked-sbp"):
        import pandas as pd

        from ..models.indexed import (
            MaskedTopicModel,
            MaskedTrainConfig,
            build_topk_windows,
            encode_all,
            train_masked,
        )
        from ..senna.topic import load_data_vec
        from ..utils.manifest import RunManifest

        latent = {
            "masked-topic": getattr(args, "latent", "simplex"),
            "masked-vae": "gaussian",
            "masked-sbp": "sbp",
        }[args.cmd]
        vec = load_data_vec(args.data_files, args.batch_files)
        null_plane = null_membership = None
        if args.batch_files:
            # batch-null stream: single-level collapse supplies the
            # adj_method plane restricted later to each window
            import numpy as _np

            from ..senna.topic import TopicArgs as _TArgs
            from ..senna.topic import load_and_collapse as _collapse

            lv = _collapse(
                vec,
                _TArgs(num_levels=1, sort_dim=args.sort_dim,
                       iter_opt=args.iter_opt),
            )
            fin = lv.collapsed[0]
            if args.adj_method == "batch" and fin.delta is not None:
                plane = _np.asarray(fin.delta.mean())  # [D, B]
                null_membership = vec.batch_membership()
            elif fin.mu_residual is not None:
                plane = _np.asarray(fin.mu_residual.mean())  # [D, S]
                null_membership = lv.groups_per_level[0]
            else:
                plane = None
            if plane is not None:
                null_plane = _np.zeros(
                    (vec.num_rows + 1, plane.shape[1]), _np.float32
                )
                null_plane[:-1] = plane  # pad gene row stays zero
                print(f"masked null stream: {args.adj_method} plane "
                      f"[{plane.shape[0]} x {plane.shape[1]}]")
        gene_weights = None
        if getattr(args, "feature_network", None):
            # feature-network gene restriction (masked_topic.rs:473):
            # genes outside the network (or outside the degree bounds)
            # are excluded from the top-K windows
            import numpy as _np

            names = {str(g): i for i, g in enumerate(vec.row_names())}
            deg = _np.zeros(vec.num_rows, _np.int64)
            with open(args.feature_network) as f:
                for line in f:
                    parts = line.rstrip("\n").split("\t")
                    if len(parts) < 2:
                        continue
                    a, b = names.get(parts[0]), names.get(parts[1])
                    if a is not None and b is not None and a != b:
                        deg[a] += 1
                        deg[b] += 1
            in_net = deg > 0
            if args.feature_network_min_degree > 0:
                in_net &= deg >= args.feature_network_min_degree
            if args.feature_network_max_degree > 0:
                in_net &= deg <= args.feature_network_max_degree
            print(f"feature network: {int(in_net.sum())}/{vec.num_rows} genes kept")
            if not args.no_feature_network_restrict:
                gene_weights = in_net.astype(_np.float32)
        data = build_topk_windows(vec, args.window, gene_weights=gene_weights)
        embed_dim = args.embed_dim
        frozen_init = frozen_mask = None
        if getattr(args, "frozen_features", None):
            import numpy as _np

            from ..data.knowledge import load_frozen_features

            ff = load_frozen_features(args.frozen_features, vec.row_names())
            embed_dim = ff.h
            rng = _np.random.default_rng(0)
            frozen_init = 0.1 * rng.standard_normal(
                (vec.num_rows + 1, ff.h)
            ).astype(_np.float32)
            frozen_init[ff.keep_target_indices] = ff.e_feat
            frozen_mask = _np.zeros(vec.num_rows + 1, _np.float32)
            frozen_mask[ff.keep_target_indices] = 1.0
            print(
                f"frozen features: {len(ff.keep_target_indices)}/{vec.num_rows}"
                f" genes pinned (H={ff.h})"
            )
        init_rho = None
        if getattr(args, "init_feature_embedding", None):
            import numpy as _np

            from ..data.knowledge import load_frozen_features

            ff = load_frozen_features(args.init_feature_embedding, vec.row_names())
            embed_dim = ff.h
            rng = _np.random.default_rng(0)
            init_rho = 0.1 * rng.standard_normal(
                (vec.num_rows + 1, ff.h)
            ).astype(_np.float32)
            init_rho[ff.keep_target_indices] = ff.e_feat
        model = MaskedTopicModel(
            n_genes=vec.num_rows,
            n_topics=args.n_latent_topics,
            embed_dim=embed_dim,
            latent=latent,
            kl_weight=args.kl_weight,
            masked_likelihood=args.masked_likelihood,
            n_gene_modules=args.gene_modules,
        )
        variables, trace, eval_loss = train_masked(
            model, data,
            MaskedTrainConfig(
                epochs=args.epochs,
                minibatch=args.minibatch_size,
                learning_rate=args.learning_rate,
                mask_frac=args.mask_frac,
                mask_schedule=args.mask_schedule,
                mask_rate_lo=args.mask_rate_lo,
                mask_rate_hi=args.mask_rate_hi,
                weight_decay=args.weight_decay,
                grad_clip=args.grad_clip,
                feature_embedding_l2=args.feature_embedding_l2,
                eval_mask_frac=args.eval_mask_fraction,
                eval_seed=args.eval_seed,
                seed=args.seed,
                frozen_rho_init=frozen_init,
                frozen_rho_mask=frozen_mask,
                init_rho=init_rho,
                null_plane=null_plane,
                null_membership=null_membership,
            ),
        )
        if eval_loss is not None:
            import json as _json

            with open(f"{args.out}.eval.json", "w") as f:
                _json.dump(
                    {"eval_mask_fraction": args.eval_mask_fraction,
                     "eval_seed": args.eval_seed,
                     "masked_eval_loss": eval_loss}, f, indent=2,
                )
            print(f"held-out masked eval loss: {eval_loss:.4f}")
        raw = latent == "gaussian"
        log_theta = encode_all(
            model, variables, data, raw_latent=raw,
            null_plane=null_plane, null_membership=null_membership,
        )
        import numpy as _np

        col = "z" if raw else "topic"
        pd.DataFrame(
            log_theta, index=vec.column_names(),
            columns=[f"{col}{k}" for k in range(args.n_latent_topics)],
        ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")
        pd.DataFrame({"epoch": _np.arange(len(trace)), "loss": trace}).to_parquet(
            f"{args.out}.loss.parquet"
        )
        from ..senna.topic import save_model

        save_model(
            args.out, variables, args, vec.num_rows, vec.row_names(),
            model_type=args.cmd,
            extra_meta={
                "window": args.window,
                "embed_dim": embed_dim,
                "latent": latent,
                "gene_modules": args.gene_modules,
            },
        )
        RunManifest(
            command=args.cmd,
            inputs={"data_files": list(args.data_files)},
            outputs={"latent": f"{args.out}.latent.parquet",
                     "model": f"{args.out}.model.npz"},
        ).save(args.out)
        print(f"wrote {args.out}.latent.parquet")
        return
    if args.cmd == "bge":
        import numpy as _np
        import pandas as pd

        from ..embedding.nce import NceConfig, fit_bge
        from ..ops import collapse as _clp
        from ..ops import random_projection as _rp
        from ..senna.topic import load_data_vec
        from ..utils.manifest import RunManifest

        if args.multiome:
            # paired RNA+ATAC: stack feature axes on the SHARED cells,
            # the second modality's counts scaled by the bridge weight
            # (cross-modality co-occurrence flows through the shared
            # cell side of the NCE)
            import scipy.sparse as _sp

            from ..data import SparseIoVec as _Vec
            from ..data.sparse_io import MemoryBackend as _Mem
            from ..data.sparse_io import open_sparse_matrix as _open

            if len(args.data_files) != 2:
                raise SystemExit("--multiome needs exactly 2 data files (rna atac)")
            rna_be = _open(args.data_files[0])
            atac_be = _open(args.data_files[1])
            if rna_be.num_columns != atac_be.num_columns:
                raise SystemExit("multiome modalities must share cells")
            n_all = rna_be.num_columns
            rna_m = rna_be.read_columns_csc(np.arange(n_all))
            atac_m = atac_be.read_columns_csc(np.arange(n_all)) * args.bridge_weight
            names = [f"rna:{g}" for g in rna_be.row_names()] + [
                f"atac:{p_}" for p_ in atac_be.row_names()
            ]
            stacked = _Mem(
                _sp.vstack([rna_m, atac_m]).tocsc(), names, rna_be.column_names()
            )
            vec = _Vec()
            vec.push(stacked)
            if args.batch_files:
                labels = []
                for bf in args.batch_files:
                    with open(bf) as f:
                        labels.extend(x.strip() for x in f if x.strip())
                vec.register_batches(labels)
            print(f"multiome: {rna_be.num_rows} genes + {atac_be.num_rows} "
                  f"peaks (bridge {args.bridge_weight})")
        else:
            vec = load_data_vec(args.data_files, batch_files=args.batch_files)
        sort_dim = args.sort_dim
        if args.phase1_cells_per_pb > 0:
            # 2^d groups averaging ~target cells (BgeArgs
            # phase1_cells_per_pb role)
            import math as _math

            sort_dim = max(
                1,
                int(_math.ceil(_math.log2(
                    max(vec.num_columns / args.phase1_cells_per_pb, 2)
                ))),
            )
            print(f"phase1: sort-dim {sort_dim} "
                  f"(~{vec.num_columns // (1 << sort_dim)} cells/pb)")
        _, proj = _rp.project_columns(vec, args.proj_dim)
        codes = _rp.binary_sort_columns(proj, sort_dim)
        groups, s = _rp.compact_group_codes(codes)
        pb_batches = cell_batches = None
        if vec.num_batches > 1:
            # stratified negatives need pure-batch pb rows: split every
            # group by batch so each row carries its batch's marginal
            memb = vec.batch_membership()
            gb = groups.astype(np.int64) * vec.num_batches + memb
            gb_u, gb_c = _np.unique(gb, return_inverse=True)
            stat = _clp.collect_basic_stats(vec, gb_c, gb_u.size)
            pb = stat.observed_sum_ds.T  # [P(g,b), D]
            pb_batches = [(gb_u % vec.num_batches).astype(np.int32)]
            cell_batches = memb
        else:
            stat = _clp.collect_basic_stats(vec, groups, s)
            pb = stat.observed_sum_ds.T  # [P, D]
        mesh = None
        if args.data_parallel:
            import jax as _jax

            from ..parallel.mesh import make_mesh

            if _jax.device_count() > 1:
                mesh = make_mesh()
        res = fit_bge(
            [pb], data=vec,
            config=NceConfig(
                embedding_dim=args.embed_dim, epochs=args.epochs,
                feature_qc=args.feature_qc,
                hvg_min_excess=args.hvg_min_excess,
                min_nnz_rows=args.min_nnz_rows,
                compute_dtype=args.compute_dtype,
            ),
            pb_batches=pb_batches, cell_batches=cell_batches,
            mesh=mesh,
        )
        e_feat_out = res.e_feat
        if not args.skip_etm:
            # post-training (bge/mod.rs:717-760): ONE Leiden clustering
            # of the cell embedding seeds BOTH the SIMBA co-embed (gene
            # -> softmax-over-cells average of cell embeddings,
            # OVERRIDING feature_embedding like the reference — raw rho
            # survives only under --skip-etm) and the ETM topic layout
            # ({out}.dictionary/.topic_latent in topic conventions)
            from ..ops.leiden import knn_adjacency, leiden_clustering

            if args.num_topics > 0:
                from ..senna.deconvolve import leiden_at_count

                lab = leiden_at_count(res.e_cell, args.num_topics, knn=15)
            else:
                adj = knn_adjacency(res.e_cell, k=15)
                lab = leiden_clustering(adj, resolution=1.0, seed=0).membership
            k_top = int(lab.max()) + 1
            # SIMBA co-embed
            s_gc = res.e_feat @ res.e_cell.T  # [D, N]
            w = _np.exp(s_gc - s_gc.max(1, keepdims=True))
            w = w / _np.maximum(w.sum(1, keepdims=True), 1e-30)
            e_feat_out = (w @ res.e_cell).astype(_np.float32)
            # cluster-seeded ETM layout
            cent = _np.stack(
                [res.e_cell[lab == t].mean(0) for t in range(k_top)]
            )  # [K, H]
            log_theta = _np.log(
                _np.maximum(
                    _np.exp(
                        res.e_cell @ cent.T
                        - (res.e_cell @ cent.T).max(1, keepdims=True)
                    ), 1e-30
                )
            )
            log_theta = log_theta - _np.log(
                _np.exp(log_theta).sum(1, keepdims=True)
            )
            s_kd = cent @ res.e_feat.T  # [K, D]
            log_beta = s_kd - s_kd.max(1, keepdims=True)
            log_beta = log_beta - _np.log(
                _np.exp(log_beta).sum(1, keepdims=True)
            )
            pd.DataFrame(
                log_beta.T, index=vec.row_names(),
                columns=[f"topic{t}" for t in range(k_top)],
            ).reset_index(names="gene").to_parquet(f"{args.out}.dictionary.parquet")
            pd.DataFrame(
                log_theta, index=vec.column_names(),
                columns=[f"topic{t}" for t in range(k_top)],
            ).reset_index(names="cell").to_parquet(
                f"{args.out}.topic_latent.parquet"
            )
            print(f"ETM layout: {k_top} cluster-seeded topics")
        pd.DataFrame(
            e_feat_out, index=vec.row_names(),
            columns=[f"h{i}" for i in range(args.embed_dim)],
        ).reset_index(names="gene").to_parquet(f"{args.out}.feature_embedding.parquet")
        pd.DataFrame(
            res.e_cell, index=vec.column_names(),
            columns=[f"h{i}" for i in range(args.embed_dim)],
        ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")
        outputs = {
            "latent": f"{args.out}.latent.parquet",
            "feature_embedding": f"{args.out}.feature_embedding.parquet",
        }
        if not args.skip_etm:
            outputs["dictionary"] = f"{args.out}.dictionary.parquet"
            outputs["topic_latent"] = f"{args.out}.topic_latent.parquet"
        if args.posterior > 0:
            from ..embedding.posterior import pb_gibbs

            post = pb_gibbs(
                pb, res.e_feat, res.b_feat,
                res.pb_embeddings[0], _np.zeros(pb.shape[0]),
                n_sweeps=args.posterior,
                burnin=max(args.posterior // 4, 2),
            )
            pd.DataFrame({
                "gene": vec.row_names(),
                "pip": post.pip.max(axis=1),
                "posterior_norm": _np.linalg.norm(post.e_feat_mean, axis=1),
            }).to_parquet(f"{args.out}.feature_posterior.parquet")
            outputs["feature_posterior"] = f"{args.out}.feature_posterior.parquet"
            print(
                f"posterior: {args.posterior} sweeps, rhat max "
                f"{post.rhat.max():.2f}"
            )
        RunManifest(
            command="bge",
            inputs={"data_files": list(args.data_files)},
            outputs=outputs,
        ).save(args.out, "gem.json")
        print(f"wrote {args.out}.latent.parquet")
        return
    if args.cmd == "qmatrix":
        import numpy as _np
        import pandas as pd

        from ..data.knowledge import read_gmt
        from ..ops.enrichment import geneset_topic_qmatrix

        dic = pd.read_parquet(args.dictionary)
        genes = dic.iloc[:, 0].astype(str).tolist()
        log_beta = dic.iloc[:, 1:].to_numpy("float64").T  # [K, D]
        out = geneset_topic_qmatrix(
            log_beta, genes, read_gmt(args.markers), n_perm=args.permutations,
            specificity=args.specificity, stratify=not args.no_stratify,
        )
        topics = dic.columns[1:].tolist()
        pd.DataFrame(out["z"], index=out["labels"], columns=topics).reset_index(
            names="gene_set"
        ).to_parquet(f"{args.out}.qmatrix.parquet")
        if args.latent:
            from ..ops.enrichment import label_cells

            zdf = pd.read_parquet(args.latent)
            th = zdf.iloc[:, 1:].to_numpy("float64")
            if _np.all(th <= 0):
                th = _np.exp(th)
            # FDR-sparse lens: zero out non-significant entries
            zq = _np.where(out["q"] < 0.05, _np.maximum(out["z"], 0.0), 0.0)
            _, cell_labels, conf = label_cells(
                th, zq.T, out["labels"], min_confidence=args.min_confidence
            )
            pd.DataFrame({
                "cell": zdf.iloc[:, 0], "annotation": cell_labels,
                "confidence": conf,
            }).to_parquet(f"{args.out}.cell_annotation.parquet")
        pd.DataFrame(out["q"], index=out["labels"], columns=topics).reset_index(
            names="gene_set"
        ).to_parquet(f"{args.out}.qvalues.parquet")
        # normalized Q lens (q_matrix.rs build_q_matrix): per TOPIC, the
        # surviving (q < alpha, es > 0) labels softmax at 1/temperature;
        # topics with nothing surviving stay a zero column
        beta = 1.0 / max(args.q_temperature, 1e-6)
        z = out["z"]  # [n_sets, K]
        surv = (out["q"] < args.fdr_alpha) & (z > 0)
        qsm = _np.zeros_like(z)
        for kk in range(z.shape[1]):
            m = surv[:, kk]
            if m.any():
                v = z[m, kk] * beta
                e = _np.exp(v - v.max())
                qsm[m, kk] = e / e.sum()
        pd.DataFrame(qsm, index=out["labels"], columns=topics).reset_index(
            names="gene_set"
        ).to_parquet(f"{args.out}.qsoftmax.parquet")
        print(f"wrote {args.out}.qmatrix/.qvalues/.qsoftmax parquet")
        return
    if args.cmd == "annotate-ontology":
        import numpy as _np
        import pandas as pd

        from ..data.knowledge import parse_obo, read_gaf
        from ..ops.enrichment import annotate_ontology
        from ..senna.topic import load_data_vec

        vec = load_data_vec(args.data_files)
        cl = pd.read_parquet(args.clusters)
        labels = cl.iloc[:, 1].to_numpy()
        uniq = _np.unique(labels)
        profiles = _np.zeros((len(uniq), vec.num_rows))
        for i, c in enumerate(uniq):
            cells = _np.nonzero(labels == c)[0]
            profiles[i] = _np.log1p(
                _np.asarray(vec.read_columns_csc(cells).mean(axis=1)).ravel()
            )
        ont = parse_obo(args.obo)
        term_genes = read_gaf(args.gaf, ont)
        if args.by == "module-score":
            from ..ops.enrichment import ontology_module_score

            ms = ontology_module_score(
                profiles.T, term_genes, gene_names=vec.row_names()
            )
            pd.DataFrame(
                ms["effect_kt"],
                index=[str(u) for u in uniq],
                columns=[str(t) for t in ms["terms"]],
            ).reset_index(names="cluster").to_parquet(
                f"{args.out}.module_score.parquet"
            )
            print(f"wrote {args.out}.module_score.parquet "
                  f"({len(ms['terms'])} terms x {len(uniq)} clusters)")
        res = annotate_ontology(
            profiles, vec.row_names(), term_genes, ont,
            top_frac=args.top_frac, alpha=args.alpha, term_names=ont.terms,
        )
        pd.DataFrame(
            {"cluster": uniq, "annotation": res["labels"], "q": res["q"]}
        ).to_parquet(f"{args.out}.annotation.parquet")
        print(f"wrote {args.out}.annotation.parquet")
        return
    if args.cmd == "annotate-by-enrichment":
        import numpy as _np
        import pandas as pd

        from ..data.knowledge import read_gmt
        from ..ops.enrichment import annotate_by_markers
        from ..senna.topic import load_data_vec

        vec = load_data_vec(args.data_files)
        cl = pd.read_parquet(args.clusters)
        labels = cl.iloc[:, 1].to_numpy()
        uniq = _np.unique(labels)
        # mean log1p profile per cluster
        profiles = _np.zeros((len(uniq), vec.num_rows))
        for i, c in enumerate(uniq):
            cells = _np.nonzero(labels == c)[0]
            profiles[i] = _np.log1p(
                _np.asarray(vec.read_columns_csc(cells).mean(axis=1)).ravel()
            )
        sets = read_gmt(args.markers)
        # panel filters (AnnotateArgs min_markers / min/max_gene_set)
        gene_pool = {str(g).lower() for g in vec.row_names()}
        kept_sets = {}
        for label, gl in sets.items():
            if args.min_gene_set and len(gl) < args.min_gene_set:
                continue
            if args.max_gene_set and len(gl) > args.max_gene_set:
                continue
            matched = sum(str(g).lower() in gene_pool for g in gl)
            if args.min_markers and matched < args.min_markers:
                continue
            kept_sets[label] = gl
        if not kept_sets:
            raise SystemExit("annotate: no marker panel survives the filters")
        sets = kept_sets
        names, scores = annotate_by_markers(
            profiles, vec.row_names(), sets, min_score=args.min_score
        )
        table = {"cluster": uniq, "annotation": names, "score": scores.max(1)}
        if args.num_perm > 0:
            # gene-label permutation null on the winning score
            rng = _np.random.default_rng(args.seed)
            gene_list = list(vec.row_names())
            null = _np.zeros((args.num_perm, len(uniq)))
            for t in range(args.num_perm):
                perm_genes = [gene_list[i] for i in rng.permutation(len(gene_list))]
                _, s_t = annotate_by_markers(profiles, perm_genes, sets)
                null[t] = s_t.max(1)
            mu0 = null.mean(0)
            sd0 = _np.maximum(null.std(0), 1e-9)
            perm_z = (scores.max(1) - mu0) / sd0
            from scipy.stats import norm as _norm

            table["perm_z"] = perm_z
            table["perm_p"] = _norm.sf(perm_z)
        if args.bootstrap > 0:
            from ..ops.enrichment import marker_bootstrap

            bs = marker_bootstrap(
                profiles, vec.row_names(), sets, n_boot=args.bootstrap,
                support_threshold=args.support_threshold,
            )
            table["annotation"] = bs["annotation"]
            table["cluster_label_support"] = bs["cluster_label_support"]
        pd.DataFrame(table).to_parquet(f"{args.out}.annotation.parquet")
        print(f"wrote {args.out}.annotation.parquet")
        return

    if args.cmd == "layout" and args.method == "tree":
        # Reingold-Tilford tree layout from a pseudotime run's principal
        # graph (`senna layout tree`, fit_layout_tree.rs:55): y is
        # geodesic pseudotime, x is sibling order; cells lerp along
        # their projected edge with perpendicular jitter.
        import pandas as pd

        from ..ops.principal_graph import (
            place_cells_on_tree,
            project_cells_to_edges,
            reingold_tilford_layout,
        )
        from ..utils.manifest import ArtifactScale, RunManifest

        if not args.from_run:
            raise SystemExit(
                "layout tree: provide --from <pseudotime run prefix> "
                "(run `senna pseudotime` first)"
            )
        src_path = (
            args.from_run if args.from_run.endswith(".json")
            else args.from_run + ".senna.json"
        )
        manifest = RunManifest.load(src_path)
        nodes_p = manifest.outputs.get("pt_nodes_latent")
        edges_p = manifest.outputs.get("pt_edges")
        root = manifest.params.get("root_node")
        if nodes_p is None or edges_p is None or root is None:
            raise SystemExit(
                f"layout tree: {src_path} has no principal-graph entries — "
                "re-run `senna pseudotime` (a --velocity lineage run has "
                "no tree to lay out)"
            )
        latent_p = args.latent or manifest.inputs.get("latent")
        df = pd.read_parquet(latent_p)
        z = df.iloc[:, 1:].to_numpy("float32")
        if ArtifactScale.detect(z, axis=1) == ArtifactScale.LOG_SIMPLEX_COLUMNS:
            z = np.exp(z)
        nodes = pd.read_parquet(nodes_p).iloc[:, 1:].to_numpy("float32")
        edf = pd.read_parquet(edges_p)
        edges = edf[["from", "to"]].to_numpy(np.int64)
        weights = edf["weight"].to_numpy(np.float32)

        node_xy = reingold_tilford_layout(nodes, edges, weights, int(root))
        n_finite = int(np.isfinite(node_xy).all(1).sum())
        if n_finite == 0:
            raise SystemExit(
                "layout tree: no finite nodes — the principal graph is "
                "disconnected from the root"
            )
        print(f"tree layout: {n_finite} reachable nodes, root = node {root}")
        e_star, t_star = project_cells_to_edges(z, nodes, edges)
        cell_xy = place_cells_on_tree(
            edges, node_xy, e_star, t_star,
            jitter_frac=args.tree_jitter, seed=args.tree_jitter_seed,
        )

        cc_path = f"{args.out}.tree_layout.cell_coords.parquet"
        pd.DataFrame(
            {"cell": df.iloc[:, 0], "x": cell_xy[:, 0], "y": cell_xy[:, 1]}
        ).to_parquet(cc_path)
        n2_path = f"{args.out}.tree_layout.nodes_2d.parquet"
        pd.DataFrame(
            {
                "node": [f"node_{i}" for i in range(len(node_xy))],
                "x": node_xy[:, 0],
                "y": node_xy[:, 1],
            }
        ).to_parquet(n2_path)
        manifest.outputs["tree_cell_coords"] = cc_path
        manifest.outputs["tree_nodes_2d"] = n2_path
        manifest.save(_manifest_prefix(src_path))
        print(f"wrote {cc_path}")
        return

    if args.cmd == "layout":
        import pandas as pd

        from ..ops.umap import umap

        df = pd.read_parquet(args.latent)
        z = df.iloc[:, 1:].to_numpy(np.float32) if False else df.iloc[:, 1:].to_numpy()
        import numpy as _np

        z = z.astype("float32")
        from ..utils.manifest import ArtifactScale

        # content-detected scale guard (run_manifest.rs:308-345): only a
        # log-simplex exponentiates; signed latents (vae/svd) pass raw
        if ArtifactScale.detect(z, axis=1) == ArtifactScale.LOG_SIMPLEX_COLUMNS:
            z = _np.exp(z)
        if args.method == "tsne":
            from ..ops.layouts import tsne

            emb = tsne(z, perplexity=args.perplexity, n_iter=max(args.epochs, 300))
        elif args.method == "phate":
            from ..ops.layouts import phate

            emb = phate(z, knn=args.n_neighbors, n_iter=args.epochs)
        else:
            emb = umap(
                z, n_neighbors=args.n_neighbors, n_epochs=args.epochs,
                kernel="tumap" if args.method == "tumap" else "umap",
                pcs=min(args.pcs, max(z.shape[1] - 1, 0)),
            )
        pd.DataFrame(
            {"cell": df.iloc[:, 0], "x": emb[:, 0], "y": emb[:, 1]}
        ).to_parquet(f"{args.out}.layout.parquet")
        from ..utils.manifest import RunManifest

        RunManifest(
            command="layout",
            inputs={"latent": args.latent},
            outputs={"layout": f"{args.out}.layout.parquet"},
            params={"method": args.method},
        ).save(args.out)
        if args.from_run:
            # record the layout back into the source manifest so
            # `senna plot --from` picks it up (main.rs:607 manifest
            # layout.cell_coords update)
            src_path = (
                args.from_run if args.from_run.endswith(".json")
                else args.from_run + ".senna.json"
            )
            prev = RunManifest.load(src_path)
            prev.outputs["layout"] = f"{args.out}.layout.parquet"
            prev.save(_manifest_prefix(src_path))
        print(f"wrote {args.out}.layout.parquet")
        return
    if args.cmd == "pseudotime":
        import pandas as pd

        from ..ops.principal_graph import pseudotime as fit_pt

        df = pd.read_parquet(args.latent)
        z = df.iloc[:, 1:].to_numpy("float32")
        import numpy as _np

        from ..utils.manifest import ArtifactScale

        # content-detected scale guard (run_manifest.rs:308-345): only a
        # log-simplex exponentiates; signed latents (vae/svd) pass raw
        if ArtifactScale.detect(z, axis=1) == ArtifactScale.LOG_SIMPLEX_COLUMNS:
            z = _np.exp(z)
        if args.velocity is not None:
            from ..embedding.lineage import velocity_oriented_lineage

            vel = pd.read_parquet(args.velocity).iloc[:, 1:].to_numpy("float32")
            lin = velocity_oriented_lineage(z, vel, n_nodes=args.n_nodes)
            out_df = pd.DataFrame(
                {
                    "cell": df.iloc[:, 0],
                    "pseudotime": lin.pseudotime,
                    "consistency": lin.consistency,
                }
            )
        else:
            pg = fit_pt(
                z, n_nodes=args.n_nodes, root_cell=args.root_cell,
                root_node=args.root_node, lam=args.lam, sigma=args.sigma,
                n_iter=args.max_iter,
            )
            out_df = pd.DataFrame(
                {
                    "cell": df.iloc[:, 0],
                    "pseudotime": pg.pseudotime,
                    "branch": pg.branch,
                    "node": pg.cell_to_node,
                }
            )
            # persist the principal graph for `senna layout tree`
            # (run_manifest.rs pseudotime.{nodes_latent, edges,
            # root_node}; fit_layout_tree.rs reads them back)
            from ..ops.principal_graph import edge_list_from_adjacency

            e_ft, e_w = edge_list_from_adjacency(pg.nodes, pg.edges)
            pd.DataFrame(
                pg.nodes,
                columns=[f"dim{i}" for i in range(pg.nodes.shape[1])],
            ).reset_index(names="node").to_parquet(
                f"{args.out}.nodes_latent.parquet"
            )
            pd.DataFrame(
                {"from": e_ft[:, 0], "to": e_ft[:, 1], "weight": e_w}
            ).to_parquet(f"{args.out}.edges.parquet")
        from ..utils.manifest import RunManifest as _RM

        out_df.to_parquet(f"{args.out}.pseudotime.parquet")
        manifest = _RM(
            command="pseudotime",
            inputs={"latent": args.latent},
            outputs={"pseudotime": f"{args.out}.pseudotime.parquet"},
            params={"n_nodes": args.n_nodes},
        )
        if args.velocity is None:
            manifest.outputs["pt_nodes_latent"] = f"{args.out}.nodes_latent.parquet"
            manifest.outputs["pt_edges"] = f"{args.out}.edges.parquet"
            manifest.params["root_node"] = int(pg.root)
        manifest.save(args.out)
        print(f"wrote {args.out}.pseudotime.parquet")
        return
    if args.cmd == "plot-topic":
        import numpy as _np
        import pandas as pd

        from ..utils.plot import structure_bars

        df = pd.read_parquet(args.latent)
        theta = df.iloc[:, 1:].to_numpy("float64")
        from ..utils.manifest import ArtifactScale

        # plot-topic REQUIRES a simplex: a signed matrix here means the
        # wrong artifact was passed (scale guard, run_manifest.rs:346)
        theta = ArtifactScale.to_linear_simplex(theta, axis=1)
        theta = theta / _np.maximum(theta.sum(1, keepdims=True), 1e-12)
        order_by = None
        if args.clusters:
            cl = pd.read_parquet(args.clusters).set_index(
                pd.read_parquet(args.clusters).columns[0]
            )
            order_by = cl.reindex(df.iloc[:, 0]).iloc[:, 0].to_numpy()
        msg = "wrote"
        if not args.no_struct:
            if args.group_by:
                # one structure panel per group (per-batch panels)
                gp = args.group_by
                if gp.endswith(".parquet"):
                    gdf = pd.read_parquet(gp)
                    lut = dict(zip(gdf.iloc[:, 0].astype(str), gdf.iloc[:, 1]))
                    groups = _np.asarray(
                        [str(lut.get(str(c), "NA")) for c in df.iloc[:, 0]]
                    )
                else:
                    with open(gp) as f:
                        lines = [x.strip() for x in f if x.strip()]
                    if lines and "\t" in lines[0]:
                        lut = dict(x.split("\t")[:2] for x in lines)
                        groups = _np.asarray(
                            [str(lut.get(str(c), "NA")) for c in df.iloc[:, 0]]
                        )
                    else:
                        groups = _np.asarray(lines)
                base = args.out
                for ext in (".png", ".svg", ".pdf"):
                    if base.endswith(ext):
                        base, sfx = base[: -len(ext)], ext
                        break
                else:
                    sfx = ".png"
                for g in _np.unique(groups):
                    m = groups == g
                    ob = order_by[m] if order_by is not None else None
                    structure_bars(
                        theta[m], f"{base}.{g}{sfx}", order_by=ob,
                        title=f"topic proportions — {g} ({int(m.sum())} cells)",
                    )
                msg += f" {base}.<group>{sfx}"
            else:
                structure_bars(
                    theta, args.out, order_by=order_by, title="topic proportions"
                )
                msg += f" {args.out}"
        if args.dictionary and args.no_dict:
            args.dictionary = None
        if args.dictionary:
            dic = pd.read_parquet(args.dictionary)
            genes = dic.iloc[:, 0].astype(str).to_numpy()
            lb = dic.iloc[:, 1:].to_numpy("float64")
            lines = []
            for t, col in enumerate(dic.columns[1:]):
                top = genes[_np.argsort(-lb[:, t])[: args.top_genes]]
                lines.append(f"{col}\t" + "\t".join(top))
            topf = f"{args.out}.top_genes.tsv"
            with open(topf, "w") as f:
                f.write("\n".join(lines) + "\n")
            msg += f" and {topf}"
            # gene x topic dictionary as a Hinton diagram over the
            # union of top genes (plot-topic long_help: "a Hinton plot
            # at <= 100 genes")
            from ..utils.plot import hinton

            top_union = []
            for t in range(lb.shape[1]):
                for g in _np.argsort(-lb[:, t])[: args.top_genes]:
                    if g not in top_union:
                        top_union.append(g)
            top_union = _np.asarray(top_union[:100])
            hf = f"{args.out}.dict_hinton.png"
            hinton(
                _np.exp(lb[top_union]), hf,
                row_labels=genes[top_union], col_labels=list(dic.columns[1:]),
                title="topic dictionary (top genes)",
            )
            msg += f" and {hf}"
        print(msg)
        return
    if args.cmd == "plot":
        import numpy as _np
        import pandas as pd

        from ..utils.plot import scatter_figure

        layout_path = args.layout
        clusters_path = args.clusters
        if args.from_run:
            from ..utils.manifest import RunManifest

            prev = RunManifest.load(
                args.from_run if args.from_run.endswith(".json")
                else args.from_run + ".senna.json"
            )
            layout_path = layout_path or prev.outputs.get(
                "layout", prev.outputs.get("latent")
            )
            clusters_path = clusters_path or prev.outputs.get("clusters")
        if not layout_path:
            raise SystemExit("plot: provide --layout or --from <run prefix>")
        lay = pd.read_parquet(layout_path)
        coords = lay.iloc[:, 1:3].to_numpy("float32")

        labels = values = None
        if args.colour_by == "pseudotime":
            if not args.pseudotime:
                raise SystemExit("colour-by pseudotime needs --pseudotime")
            pt = pd.read_parquet(args.pseudotime)
            col = "pseudotime" if "pseudotime" in pt.columns else pt.columns[1]
            values = pt[col].to_numpy("float32")
        elif args.colour_by == "topic":
            z = lay.iloc[:, 1:].to_numpy("float32")
            if _np.all(z <= 0):
                z = _np.exp(z)
            if args.topics and len(args.topics) == 1:
                values = z[:, args.topics[0]]
            else:
                cols = args.topics if args.topics else range(z.shape[1])
                labels = _np.asarray([f"t{int(k)}" for k in _np.asarray(
                    [list(cols)[i] for i in z[:, list(cols)].argmax(1)]
                )])
        elif args.colour_by == "annotation":
            if not args.annotation:
                raise SystemExit("colour-by annotation needs --annotation")
            ann = (
                pd.read_parquet(args.annotation)
                if args.annotation.endswith(".parquet")
                else pd.read_csv(args.annotation, sep="\t", header=None,
                                 names=["cell", "label"])
            )
            lut = dict(zip(ann.iloc[:, 0].astype(str), ann.iloc[:, 1]))
            labels = _np.asarray(
                [str(lut.get(str(c), "NA")) for c in lay.iloc[:, 0]]
            )
        elif clusters_path:
            cl = pd.read_parquet(clusters_path)
            labels = cl.iloc[:, 1].to_numpy()

        # output formats (scatter.rs svg/png/no_pdf convention)
        base = args.out
        for ext in (".png", ".svg", ".pdf"):
            if base.endswith(ext):
                base = base[: -len(ext)]
        formats = []
        if args.png or args.out.endswith(".png"):
            formats.append(base + ".png")
        if args.svg or args.out.endswith(".svg"):
            formats.append(base + ".svg")
        if not args.no_pdf and (args.out.endswith(".pdf") or not formats):
            formats.append(base + ".pdf" if not args.out.endswith((".png", ".svg")) else args.out)
        if not formats:
            formats = [base + ".png"]
        scatter_figure(
            coords, formats, labels=labels, values=values,
            width=args.width, height=args.height, dpi=args.dpi,
            point_size=args.point_size, alpha=args.alpha,
            hull=args.hull, hull_coverage=args.hull_coverage,
            hull_fill_alpha=args.hull_fill_alpha,
            show_labels=not args.no_labels,
            label_font_size=args.label_font_size,
        )
        print(f"wrote {' '.join(formats)}")
        return

    if args.cmd in ("predict", "eval-topic"):
        from ..senna.predict import PredictArgs, predict_model

        predict_model(
            PredictArgs(
                data_files=args.data_files,
                model=args.model,
                out=args.out,
                block_size=args.block_size,
                batch_files=args.batch_files,
                refine_steps=args.refine_steps,
                refine_lr=args.refine_lr,
                refine_reg=args.refine_reg,
                decoder_only=args.decoder_only,
                delta_iters=args.delta_iters,
                residual_out=args.residual_out,
                residual_include_delta=args.residual_include_delta,
                residual_threshold=args.residual_threshold,
            )
        )
        return
    if args.cmd == "clustering":
        from ..senna.clustering import ClusteringArgs, run_clustering

        run_clustering(
            ClusteringArgs(
                latent=args.latent,
                out=args.out,
                method=args.method,
                n_clusters=args.n_clusters,
                knn=args.knn,
                resolution=args.resolution,
                max_iter=args.max_iter,
                hsblock_depth=args.hsblock_depth,
                degree_corrected=not args.no_degree_corrected,
                edge_scale=args.edge_scale,
                min_cluster_size=args.min_cluster_size,
                data_files=args.data_files,
                bhc_gamma_per_gene=args.bhc_gamma_per_gene,
                bhc_cut=args.bhc_cut,
                bhc_block_size=args.bhc_block_size,
                seed=args.seed,
            )
        )
        if args.from_run:
            # record the cluster path back into the source manifest
            # (clustering.rs:296 update_manifest_cluster_path)
            from ..utils.manifest import RunManifest

            src = (
                args.from_run if args.from_run.endswith(".json")
                else args.from_run + ".senna.json"
            )
            prev = RunManifest.load(src)
            prev.outputs["clusters"] = f"{args.out}.clusters.parquet"
            prev.save(_manifest_prefix(src))
        return
    if args.cmd == "svd":
        from ..senna.svd import SvdArgs, fit_svd
        from ..utils.prng import DEFAULT_PROJECTION_SEED

        fit_svd(
            SvdArgs(
                data_files=args.data_files,
                out=args.out,
                batch_files=args.batch_files,
                n_factors=args.n_factors,
                block_size=args.block_size,
                column_sum_norm=args.column_sum_norm,
                save_adjusted=args.save_adjusted,
                qc=args.qc,
                qc_min_total=args.qc_min_total,
                qc_min_genes=args.qc_min_genes,
                qc_max_mito_frac=args.qc_max_mito_frac,
                hvg_genes=args.hvg_genes,
                cnv=args.cnv,
                seed=args.seed if args.seed is not None else DEFAULT_PROJECTION_SEED,
            )
        )
        return

    if args.cmd == "topic":
        from ..models.decoders import DECODERS
        from ..senna.topic import TopicArgs, fit_topic_model
        from ..utils.prng import DEFAULT_PROJECTION_SEED

        if not args.data_files and not args.from_run:
            raise SystemExit("topic: provide --data-files or --from <run prefix>")
        topic_families = ("multinomial", "nb", "poisson", "nb-mixture")
        dec_names = [s for s in args.decoder.replace(",", " ").split() if s]
        bad = [nm for nm in dec_names if nm not in topic_families]
        if bad or not dec_names:
            raise SystemExit(
                f"topic: unknown decoder {bad or args.decoder!r} "
                f"(choose from {', '.join(topic_families)})"
            )
        assert set(topic_families) <= set(DECODERS)
        fit_topic_model(
            TopicArgs(
                data_files=args.data_files,
                out=args.out,
                from_run=args.from_run,
                init_from=args.init_from,
                batch_files=args.batch_files,
                n_latent_topics=args.n_latent_topics,
                encoder_layers=tuple(args.encoder_layers),
                epochs=args.epochs,
                minibatch_size=args.minibatch_size,
                learning_rate=args.learning_rate,
                grad_clip=args.grad_clip,
                decoder=args.decoder,
                decoder_weights=args.decoder_weights,
                adj_method=args.adj_method,
                rho_prior_weight=args.rho_prior_weight,
                rho_prior_alpha=args.rho_prior_alpha,
                rho_prior_beta=args.rho_prior_beta,
                amort_refine_steps=args.amort_refine_steps,
                amort_refine_lr=args.amort_refine_lr,
                amort_refine_reg=args.amort_refine_reg,
                preload_data=args.preload_data,
                topic_smoothing=args.topic_smoothing,
                proj_dim=args.proj_dim,
                sort_dim=args.sort_dim,
                knn_cells=args.knn_cells,
                num_levels=args.num_levels,
                iter_opt=args.iter_opt,
                ignore_batch=args.ignore_batch,
                block_size=args.block_size,
                max_coarse_features=args.max_coarse_features,
                cnv=args.cnv,
                qc=args.qc,
                qc_min_total=args.qc_min_total,
                qc_min_genes=args.qc_min_genes,
                qc_max_mito_frac=args.qc_max_mito_frac,
                hvg_genes=args.hvg_genes,
                refine=not args.no_refine,
                gene_weighting=args.gene_weighting,
                anchor_penalty=args.anchor_penalty,
                data_parallel=args.data_parallel,
                seed=args.seed if args.seed is not None else DEFAULT_PROJECTION_SEED,
            )
        )
