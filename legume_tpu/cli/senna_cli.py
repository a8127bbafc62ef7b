"""`senna` binary: embedding suite CLI (extracted from cli/main.py; one module per installed binary)."""

from __future__ import annotations

import argparse
import numpy as np




from ._util import _manifest_prefix  # noqa: F401


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
    p.add_argument("--data-parallel", action="store_true",
                   help="dp-shard the streaming per-cell projection over "
                        "all visible devices (basis replicates)")
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
        p.add_argument("--data-parallel", action="store_true",
                       help="dp-shard cell rows over all visible devices "
                            "during masked training (params replicate)")
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
    p.add_argument("--data-parallel", action="store_true",
                   help="dp-shard pseudobulk rows over all visible devices "
                        "during training (params replicate)")
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

    # handler dispatch: one module per command family
    from . import senna_cmds

    if args.cmd == "layout" and args.method == "tree":
        return senna_cmds.LAYOUT_TREE(args)
    handler = senna_cmds.HANDLERS.get(args.cmd)
    if handler is None:
        raise SystemExit(f"senna: unhandled command {args.cmd!r}")
    return handler(args)
