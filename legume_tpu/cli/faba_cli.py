"""`faba` binary: BAM feature extraction CLI (extracted from cli/main.py; one module per installed binary)."""

from __future__ import annotations

import argparse
import os

import numpy as np


def _add_gene_qc_args(p):
    """Gene-expression + mitochondrial QC knobs, flattened into every
    subcommand that quantifies genes (m6a/run.rs:450-489 +
    quant/mod.rs MitoQcArgs). The reference runs gene QC BY DEFAULT;
    here it is opt-in via --gene-qc (tiny fixtures would otherwise be
    emptied by the 10-cell floors) — a declared divergence."""
    p.add_argument("--gene-qc", action="store_true",
                   help="run gene/cell expression QC before downstream "
                        "steps (the reference's default; see "
                        "--skip-gene-qc)")
    p.add_argument("--skip-gene-qc", action="store_true",
                   help="explicitly skip gene expression QC "
                        "(reference-compatible no-op when --gene-qc "
                        "is absent)")
    p.add_argument("--gene-min-cells", type=int, default=10,
                   help="min cells with nonzero expression per gene")
    p.add_argument("--gene-min-counts", type=int, default=0,
                   help="min total UMI per gene (0 disables)")
    p.add_argument("--cell-min-genes", type=int, default=10,
                   help="min genes detected per cell")
    p.add_argument("--mito-chr", default="chrM,chrMT,MT,M",
                   help="mitochondrial chromosome names (comma-separated, "
                        "case-insensitive GFF seqname match)")
    p.add_argument("--keep-mito", action="store_true",
                   help="keep mitochondrial genes in the quantified set")
    p.add_argument("--max-mito-frac", type=float, default=0.0,
                   help="max MT fraction per cell (>0 fixed; 0 = elbow)")
    p.add_argument("--no-mito-cell-qc", action="store_true",
                   help="report MT%% only, drop no cells")


def run_faba(argv):
    ap = argparse.ArgumentParser(prog="faba", description="BAM feature extraction")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser(
        "genes",
        help="per-cell gene counts from BAM (gene_count/run.rs "
             "GeneCountArgs)",
    )
    p.add_argument("--bam", required=True,
                   help="BAM(s), comma-separated (multi-sample runs "
                        "write {out}.{batch}.* per batch)")
    p.add_argument("--gff", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--min-mapq", type=int, default=20)
    p.add_argument("--no-dedup", "--no-umi-dedup", dest="no_dedup",
                   action="store_true")
    p.add_argument("--cell-barcode-tag", default="CB")
    p.add_argument("--umi-tag", default="UB")
    p.add_argument("--gene-type", default=None,
                   help="GFF biotype filter (empty = all biotypes)")
    p.add_argument("--row-nnz-cutoff", type=int, default=0,
                   help="drop genes with fewer non-zero cells")
    p.add_argument("--column-nnz-cutoff", type=int, default=0,
                   help="drop cells with fewer non-zero genes")
    p.add_argument("--backend", choices=["zarr", "hdf5"], default="zarr")
    p.add_argument("--zip", action="store_true",
                   help="archive outputs as .zarr.zip (the reference "
                        "default; opt-in here)")
    _add_gene_qc_args(p)
    p.add_argument(
        "--splice", action="store_true",
        help="emit spliced + unspliced backends (velocity input; the "
             "reference separates by default — declared divergence)",
    )
    for _name, _help in [
        ("dartseq", "m6A C->T WT-vs-control site calling"),
        ("atoi", "A-to-I (A->G) editing site calling"),
    ]:  # gene-QC args join below (after the shared editing flags)
        p = sub.add_parser(_name, help=_help)
        p.add_argument("--bam", required=True, help="WT/DART BAM")
        p.add_argument("--control-bam", required=True)
        p.add_argument("--output", required=True)
        p.add_argument("--max-p", "--pvalue-cutoff", dest="max_p",
                       type=float, default=0.05)
        p.add_argument("--min-alt", "--min-conversion", dest="min_alt",
                       type=int, default=3)
        p.add_argument("--min-coverage", type=int, default=0)
        p.add_argument("--min-mapq", "--min-mapping-quality", dest="min_mapq",
                       type=int, default=20)
        p.add_argument("--min-base-quality", type=int, default=20,
                       help="phred floor at the conversion base "
                            "(dna_stat_map.rs default 20)")
        p.add_argument("--error-rate", type=float, default=0.01,
                       help="base conversion error rate eps")
        p.add_argument("--overdispersion", type=float, default=0.05,
                       help="beta-binomial rho")
        p.add_argument("--snp-mask-file", default=None,
                       help="TSV chrom<TAB>pos of known SNPs to exclude")
        p.add_argument("--valid-cells", default=None,
                       help="file of called cell barcodes (one per line): "
                            "reads from other cells are ambient and excluded")
        # per-gene 1D Gaussian mixture of sites (editing/mixture.rs;
        # default ON in the reference when a gene model is available)
        p.add_argument("--gff", default=None,
                       help="gene model for the per-gene site mixture "
                            "(components on transcript-relative positions)")
        p.add_argument("--no-mixture", action="store_true",
                       help="disable mixture component calling even with --gff")
        p.add_argument("--mixture-min-sites", type=int, default=3)
        p.add_argument("--mixture-max-k", type=int, default=5)
        p.add_argument("--mixture-bandwidth", "--mixture-initial-sigma",
                       dest="mixture_bandwidth", type=float, default=0.0,
                       help="component-calling bandwidth in nt; 0 = estimate "
                            "from within-gene site spacing (cluster-aware for "
                            "atoi)")
        p.add_argument("--mixture-weight", choices=["posterior", "converted"],
                       default="posterior",
                       help="observation weight: Beta-posterior effective "
                            "count n*(c+a)/(n+a+b) (default) or raw converted "
                            "count")
        p.add_argument("--mixture-prior-alpha", type=float, default=1.0)
        p.add_argument("--mixture-prior-beta", type=float, default=1.0)
        p.add_argument("--cell-barcode-tag", default="CB",
                       help="BAM Z tag carrying the cell barcode "
                            "(DartSeqCountArgs cell_barcode_tag)")
        p.add_argument("--umi-tag", default="UB",
                       help="BAM Z tag carrying the UMI")
        p.add_argument("--site-min-cells", type=int, default=0,
                       help="called sites detected in fewer cells drop "
                            "from the site matrix; the gene-level outputs "
                            "are unaffected (run.rs site_min_cells)")
        p.add_argument("--output-bed-file", action="store_true",
                       help="also write per-(site, cell) conversion rows "
                            "as {output}.bed.gz (editing/bed_output.rs)")
        p.add_argument("--cell-membership", default=None,
                       help="TSV mapping barcodes to cell types")
        p.add_argument("--membership-barcode-col", type=int, default=0,
                       help="0-based barcode column in --cell-membership")
        p.add_argument("--membership-celltype-col", type=int, default=1,
                       help="0-based cell-type column in --cell-membership")
        p.add_argument("--exact-barcode-match", action="store_true",
                       help="disable suffix-tolerant ('-1') barcode matching")
        p.add_argument("--output-cell-types", action="store_true",
                       help="append the matched cell type to BED rows "
                            "(needs --cell-membership)")
        # barcode QC / cell calling (cell_qc/mod.rs CellQcArgs); needs
        # --gff for the gene-count matrix the caller runs on
        p.add_argument("--cell-filter",
                       choices=["empty-drops", "ord-mag", "min-counts", "nnz"],
                       default="nnz",
                       help="cell-calling method on the gene counts "
                            "(reference default: empty-drops; nnz here "
                            "keeps the raw superset unless asked)")
        p.add_argument("--expected-cells", type=int, default=3000,
                       help="OrdMag recovered-cell estimate")
        p.add_argument("--cell-min-umis", type=int, default=500,
                       help="min-counts threshold / EmptyDrops candidate floor")
        p.add_argument("--cell-fdr", type=float, default=0.01,
                       help="EmptyDrops BH FDR cutoff")
        p.add_argument("--cell-sims", type=int, default=10_000,
                       help="EmptyDrops Monte-Carlo iterations")
        p.add_argument("--ambient-lo", type=int, default=45_000,
                       help="EmptyDrops ambient window lower rank bound")
        p.add_argument("--ambient-hi", type=int, default=90_000,
                       help="EmptyDrops ambient window upper rank bound")
        _add_gene_qc_args(p)
        # null-cell scan (editing/cell_activity.rs CellScanArgs):
        # expression QC can't see the fusion enzyme, so this scores
        # each WT cell's editing activity against depth-matched control
        # cells and keeps the competent ones
        p.add_argument("--cell-scan", action="store_true",
                       help="call editing-competent cells against the "
                            "control arm before site discovery; the kept "
                            "set gates the matrices too (the reference "
                            "quantifies null cells unless "
                            "--quantify-competent-only — declared "
                            "divergence)")
        p.add_argument("--cell-scan-tolerance", type=float, default=None,
                       help="how much the DISCARDED pool may still edit, "
                            "as a multiple of the control (default 1.0 = "
                            "the parameter-free cut)")
        p.add_argument("--cell-scan-control-tail", type=float, default=0.0,
                       help="cut on the control's own scale instead: keep "
                            "cells above this upper-tail fraction of "
                            "depth-matched control cells")
        p.add_argument("--cell-scan-min-coverage", type=int, default=50,
                       help="min candidate-site coverage to score a cell")
        p.add_argument("--reader-genes", default=None,
                       help="diagnostic: comma-separated m6A reader genes "
                            "summarized per kept/dropped cell (needs --gff)")
        p.add_argument("--writer-genes", default=None,
                       help="diagnostic: m6A writer/eraser genes, same")
        p.add_argument("--drop-single-component", action="store_true",
                       help="drop genes whose fit keeps one component (no "
                            "relative signal)")
        if _name == "dartseq":
            p.add_argument("--detect-atoi", action="store_true",
                           help="run the A-to-I contrast first and mask m6A "
                                "candidates whose RAC/GTY triplet overlaps an "
                                "edited site (writes {out}.atoi_mask.sites."
                                "parquet)")
            p.add_argument("--atoi-pvalue", type=float, default=0.05,
                           help="p-value cutoff for the A-to-I mask pass "
                                "(separate from the m6A --max-p)")
            p.add_argument("--atoi-min-conversion", type=int, default=5)
            p.add_argument("--atoi-min-coverage", type=int, default=10)
            p.add_argument("--atoi-mask", default=None,
                           help="pre-computed A-to-I sites parquet (from "
                                "`faba atoi` or --detect-atoi) used as the "
                                "confounder mask")
            p.add_argument("--genome", default=None,
                           help="genome FASTA: restrict called sites to the "
                                "DART RAC motif ([AG]AC forward / GTY "
                                "reverse; editing/sifter.rs)")
            p.add_argument("--no-check-r-site", action="store_true",
                           help="relax the motif to .AC / GT. (drop the "
                                "[AG] R-site requirement)")
    p = sub.add_parser(
        "all",
        help="unified pipeline: snp -> genes -> depth -> atoi -> m6a "
             "-> apa (pipeline/args.rs PipelineArgs)",
    )
    p.add_argument("--bam", required=True,
                   help="signal/WT BAM(s), comma-separated; every "
                        "sample (incl. controls) is quantified in "
                        "every modality")
    p.add_argument("--gff", required=True)
    p.add_argument("--output", required=True, help="output prefix")
    p.add_argument("--control-bam", default=None,
                   help="control/MUT BAM(s), comma-separated; used "
                        "for the editing contrast AND quantified")
    p.add_argument("-f", "--genome", default=None,
                   help="reference FASTA (optional; validates SNP ref "
                        "alleles)")
    p.add_argument("--gene-type", default=None,
                   help="GFF biotype filter")
    p.add_argument("--cell-barcode-tag", default="CB")
    p.add_argument("--umi-tag", default="UB")
    p.add_argument("--no-umi-dedup", action="store_true")
    p.add_argument("--backend", choices=["zarr", "hdf5"], default="zarr")
    p.add_argument("--zip", action="store_true",
                   help="write .zarr.zip archives")
    p.add_argument("--min-mapq", "--min-mapping-quality",
                   dest="min_mapq", type=int, default=20)
    p.add_argument("--min-base-quality", type=int, default=20)
    p.add_argument("--skip-snp", action="store_true")
    p.add_argument("--skip-genes", action="store_true")
    p.add_argument("--skip-atoi", action="store_true")
    p.add_argument("--skip-apa", action="store_true")
    p.add_argument("--depth-resolution-kb", type=float, default=None,
                   help="opt-in step 2: per-cell depth over uniform "
                        "genome tiles at this resolution")
    # SNP stage (snp_* fields)
    p.add_argument("--known-snps", default=None)
    p.add_argument("--snp-min-depth", type=int, default=5)
    p.add_argument("--snp-min-gq", type=float, default=20.0)
    p.add_argument("--snp-min-coverage", type=int, default=8)
    p.add_argument("--snp-min-alt-count", type=int, default=2)
    p.add_argument("--snp-min-alt-freq", type=float, default=0.1)
    p.add_argument("--snp-mask-min-vaf", type=float, default=0.2,
                   help="germline-VAF gate on the editing mask so "
                        "true RNA-editing sites stay out of it")
    # editing stages
    p.add_argument("--atoi-min-coverage", type=int, default=0)
    p.add_argument("--atoi-min-conversion", type=int, default=3)
    p.add_argument("--atoi-pvalue-cutoff", type=float, default=0.05)
    p.add_argument("--edit-error-rate", type=float, default=0.01)
    p.add_argument("--edit-overdispersion", type=float, default=0.05)
    p.add_argument("--mixture-weight",
                   choices=["converted", "posterior"],
                   default="converted")
    p.add_argument("--no-mixture", action="store_true")
    p.add_argument("--drop-single-component", action="store_true")
    # APA stage
    p.add_argument("--apa-min-coverage", type=int, default=5)
    p.add_argument("--polya-min-tail-length", type=int, default=0)
    p.add_argument("--no-apa-pdui", action="store_true")
    # expression QC (opt-in, as in the standalone commands)
    p.add_argument("--gene-qc", action="store_true")
    p.add_argument("--gene-min-cells", type=int, default=10)
    p.add_argument("--gene-min-counts", type=int, default=10)
    p.add_argument("--cell-min-genes", type=int, default=10)
    p = sub.add_parser(
        "pwm",
        help="sequence-context PWM around called sites "
             "(site_analysis/scan_pwm.rs ScanPwmArgs)",
    )
    p.add_argument("-s", "--sites", required=True,
                   help="parquet with chrom,pos[,strand]")
    p.add_argument("-f", "--fasta", "--genome", dest="fasta",
                   required=True)
    p.add_argument("-o", "--output", required=True,
                   help="output prefix; also accepts a .tsv/.tsv.gz "
                        "path for the reference TSV layout")
    p.add_argument("--flank", "--window", dest="flank", type=int,
                   default=5, help="+/- bp collected around each site")
    p.add_argument("--source", choices=["reference", "reads"],
                   default="reference",
                   help="base frequencies from the FASTA context or "
                        "from the reads covering each position")
    p.add_argument("--bam", default=None,
                   help="BAM(s), comma-separated (required for "
                        "--source reads)")
    p = sub.add_parser(
        "metagene",
        help="MetaPlotR tripartite 5'UTR/CDS/3'UTR metagene "
             "(site_analysis/metagene.rs MetageneArgs)",
    )
    p.add_argument("-s", "--sites", required=True,
                   help="site parquet (from dartseq/atoi/apa output)")
    p.add_argument("-g", "--gff", required=True)
    p.add_argument("-o", "--output", required=True,
                   help="TSV path (a .parquet twin is written too)")
    p.add_argument("--bins", type=int, default=200,
                   help="total bins across 5'UTR+CDS+3'UTR, split in "
                        "proportion to the site-weighted medians")
    p.add_argument("--isoform", choices=["longest", "all"],
                   default="longest",
                   help="longest spliced coding isoform per gene "
                        "(MetaPlotR) or every coding transcript")
    p.add_argument("--ncrna", action="store_true",
                   help="also profile non-coding genes (own [0,1] track)")
    p.add_argument("--distances", default=None,
                   help="also write MetaPlotR's per-site distance "
                        "table (TSV) here")
    p.add_argument("--print", dest="print_hist", action="store_true",
                   help="print the ASCII histogram to stderr")
    p.add_argument("--max-width", type=int, default=60)
    p.add_argument("--gene-type", default=None,
                   help="GFF biotype filter")
    p.add_argument("--body", action="store_true",
                   help="legacy round-2 mode: uniform gene-body bins "
                        "(writes {out}.metagene.parquet only)")
    p = sub.add_parser(
        "pileup", aliases=["inspect"],
        help="gene/region pileup of faba matrices (PileupArgs); "
             "--bam+--sites = base composition; --miami = figure mode",
    )
    p.add_argument("--bam", default=None,
                   help="BAM(s): base-composition mode, or the "
                        "read-depth track of --miami")
    p.add_argument("--sites", default=None,
                   help="site-level parquet (composition mode, or the "
                        "second track of the matrix mode)")
    p.add_argument("--output", default=None,
                   help="TSV path (matrix mode) / parquet prefix "
                        "(composition mode)")
    p.add_argument("--flank", type=int, default=2)
    p.add_argument("--fasta", default=None)
    # matrix-track mode (the reference's original ASCII/TSV pileup)
    p.add_argument("--data", default=None,
                   help="sparse matrix backend(s) from faba output, "
                        "comma-separated (matrix-track mode)")
    p.add_argument("--genes", default=None,
                   help="comma-separated gene symbols (needs --gff to "
                        "resolve spans — row names key by locus here)")
    p.add_argument("--regions", default=None,
                   help="comma-separated chr:lb-ub regions")
    p.add_argument("--signal", choices=["sum", "nnz", "log10-sum"],
                   default="sum",
                   help="per-position aggregation over cells")
    p.add_argument("--site-signal",
                   choices=["count", "wt-coverage", "mut-coverage",
                            "neglog10pv"],
                   default="count",
                   help="signal for the --sites second track")
    p.add_argument("--bins", type=int, default=80,
                   help="bins along the selected span")
    p.add_argument("--plot-height", type=int, default=12,
                   help="ASCII plot height in rows (per track)")
    p.add_argument("--quiet", "--no-plot", dest="quiet",
                   action="store_true", help="suppress the ASCII plot")
    p.add_argument("--modalities", default=None,
                   help="restrict matrix rows to these modalities "
                        "(e.g. m6a,atoi)")
    # figure (miami) mode
    p.add_argument("--miami", default=None,
                   help="figure out-path (.pdf/.svg/.png): sites up, gene "
                        "model middle, mirrored depth down")
    p.add_argument("--region", default=None, help="chr:lb-ub (miami mode)")
    p.add_argument("--gff", default=None,
                   help="gene model (miami track; resolves --genes)")
    p.add_argument("--cell-membership", default=None,
                   help="TSV cell TAB type: one depth panel per cell type")
    p.add_argument("--membership-barcode-col", type=int, default=0)
    p.add_argument("--membership-celltype-col", type=int, default=1)
    for _name, _help in [
        ("gem", "geodesic embedding + motion (NCE, velocity delta)"),
        ("gem-encoder", "masked generative sibling (u+delta->s)"),
    ]:
        p = sub.add_parser(_name, help=_help)
        p.add_argument("--posterior", type=int, default=0,
                       help="gem only: two-gate Gibbs sweeps over the fit "
                            "(0 = off); writes delta_posterior.parquet")
        p.add_argument("--spliced", required=True,
                       help="spliced backend (pb-level, or cell-level "
                            "with --raw)")
        p.add_argument("--unspliced", required=True,
                       help="unspliced backend (same granularity)")
        p.add_argument("--output", required=True)
        p.add_argument("-d", "--embedding-dim", type=int, default=16)
        p.add_argument("--epochs", "-i", type=int, default=600)
        p.add_argument("--learning-rate", "--lr", type=float, default=None,
                       help="default: 0.02 (gem) / 0.01 (gem-encoder)")
        p.add_argument("--delta-l2", type=float, default=0.01,
                       help="L2 on the velocity offset delta "
                            "(gem/args.rs ModelArgs)")
        p.add_argument("--weight-decay", type=float, default=0.0,
                       help="AdamW decoupled weight decay (0 = Adam)")
        p.add_argument("--grad-clip", type=float, default=0.0,
                       help="global-norm gradient clip (0 = off)")
        p.add_argument("--seed", type=int, default=0)
        # CollapseArgs: run the pseudobulk collapse in-command on
        # CELL-level inputs (the reference gem always collapses;
        # pb-level inputs stay the no-flag behavior here)
        p.add_argument("--raw", action="store_true",
                       help="inputs are cell-level: hash cells into "
                            "pseudobulks first (CollapseArgs)")
        p.add_argument("--sort-dim", type=int, default=8,
                       help="[--raw] binary sketch bits (<= 2^bits pbs)")
        p.add_argument("--proj-dim", type=int, default=16,
                       help="[--raw] random-projection dimension")
        p.add_argument("--n-hvg", type=int, default=0,
                       help="[--raw] gate the projection sketch to the "
                            "top-N variable genes (every gene still "
                            "trains; hvg.rs)")
        p.add_argument("--block-size", type=int, default=2048)
        if _name == "gem-encoder":
            p.add_argument("--mask-fraction", type=float, default=0.2,
                           help="BERT-style masked-gene fraction")
        if _name == "gem":
            p.add_argument("--nce-objective",
                           choices=["logistic", "softmax"],
                           default="logistic",
                           help="phase-1 objective: binary NCE vs the "
                                "unigram noise, or the exact softmax "
                                "over the pb gene axis")
            p.add_argument("--ibp-alpha", type=float, default=2.0,
                           help="[--posterior] truncated-IBP "
                                "concentration of the gate ladder")
            p.add_argument("--half-cauchy-scale", type=float, default=1.0,
                           help="[--posterior] slab scale")
            p.add_argument("--sequential-velocity", action="store_true",
                           help="fit theta on the spliced track first, then "
                                "delta with theta frozen (default: joint)")
            p.add_argument("--lineage-dag", action="store_true",
                           help="second training pass with a velocity-drift "
                                "SEM residual over the oriented lineage; "
                                "writes dag_pseudotime/dag_fate parquets")
            p.add_argument("--lineage-smooth", action="store_true",
                           help="smooth the velocity readout over KNN "
                                "neighbours before orienting")
            p.add_argument("--dense-dag", action="store_true",
                           help="use the dense velocity-KNN graph instead "
                                "of the MST lineage tree")
    p = sub.add_parser(
        "lineage",
        help="velocity-informed forest lineage over a gem fit "
             "(lineage/args.rs LineageArgs)",
    )
    p.add_argument("-f", "--from", dest="frm", default=None,
                   help="gem / gem-encoder / topic output prefix")
    p.add_argument("-o", "--out", default=None,
                   help="output prefix (default: the gem prefix)")
    # legacy explicit-file pair (round-2 surface), still honored
    p.add_argument("--latent", default=None, help="explicit θ parquet "
                   "(legacy alternative to --from)")
    p.add_argument("--velocity", default=None, help="explicit δ parquet")
    p.add_argument("--n-centroids", "--n-nodes", dest="n_centroids",
                   type=int, default=None,
                   help="MST centroids K (default min(cells/10, 200))")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--kmeans-iter", type=int, default=100)
    p.add_argument("--theta-from",
                   choices=["auto", "cell-embedding", "latent"],
                   default="auto",
                   help="which table supplies θ (auto: a log-θ simplex "
                        "latent when detected, else the cell embedding)")
    p.add_argument("--latent-geometry",
                   choices=["auto", "cosine", "euclidean", "hellinger"],
                   default="auto",
                   help="fit/layout metric (auto: hellinger on a "
                        "simplex, cosine on an embedding)")
    p.add_argument("--cluster-space",
                   choices=["identity", "nascent", "concat"],
                   default="identity",
                   help="grouping features: θ, θ+δ, or [θ̂|δ̂]")
    p.add_argument("--no-edge-direction", action="store_true",
                   help="skip the per-edge velocity test; forest = "
                        "the geometric MST")
    p.add_argument("--no-orient-velocity", action="store_true",
                   help="ignore velocity entirely")
    p.add_argument("--edge-cand-knn", type=int, default=4)
    p.add_argument("--edge-direction-n-boot", type=int, default=200)
    p.add_argument("--edge-direction-n-perm", type=int, default=500)
    p.add_argument("--edge-alpha", type=float, default=0.05)
    p.add_argument("--edge-min-cells", type=int, default=2)
    p.add_argument("--root-affinity", type=float, default=None,
                   help="forest granularity tau_root (default: median "
                        "arc weight)")
    p.add_argument("--root-type", default=None,
                   help="root at this cell type's best node (needs "
                        "--markers)")
    p.add_argument("--root-from-gem", action="store_true",
                   help="root at gem's velocity-DAG source "
                        "({from}.dag_pseudotime.parquet)")
    p.add_argument("--root-node", type=int, default=None)
    p.add_argument("--root-cell", default=None)
    p.add_argument("--curve-bandwidth", type=float, default=0.0)
    p.add_argument("--curve-resolution", type=int, default=100)
    p.add_argument("--max-iter", type=int, default=15)
    p.add_argument("--tol", type=float, default=1e-3)
    p.add_argument("--markers", default=None,
                   help="gene<TAB>celltype TSV (or GMT) naming nodes "
                        "by cell type")
    p.add_argument("--marker-num-perm", type=int, default=500)
    p.add_argument("--marker-obo", default=None)
    p.add_argument("--marker-label-cl", default=None)
    p.add_argument("--no-bootstrap-markers", action="store_true")
    p.add_argument("--marker-n-boot", type=int, default=200)
    p.add_argument("--marker-min-support", type=float, default=0.5)
    p.add_argument("--layout", choices=["none", "phate", "umap"],
                   default="phate")
    p.add_argument("--layout-space",
                   choices=["identity", "nascent", "concat"],
                   default="identity")
    p.add_argument("--layout-pcs", type=int, default=20)
    p.add_argument("--velocity-aware-layout",
                   choices=["auto", "on", "off"], default="auto")
    p.add_argument("--phate-knn", type=int, default=15)
    p.add_argument("--phate-t", type=int, default=0)
    p.add_argument("--phate-landmarks", type=int, default=2000)

    p = sub.add_parser(
        "dyn-assoc",
        help="between-branch Bayesian modality contrast "
             "(assoc/run.rs AssocArgs)",
    )
    p.add_argument("--backend", "--sites-backend", dest="backend",
                   required=True,
                   help="site x cell counts backend(s), comma-separated "
                        "(rows concatenate)")
    p.add_argument("-f", "--from", dest="frm", default=None,
                   help="lineage prefix: reads {from}.pseudotime.parquet "
                        "as --branches")
    p.add_argument("--branches", default=None,
                   help="parquet: cell, branch|pseudotime (alternative "
                        "to --from)")
    p.add_argument("--output", default=None,
                   help="output prefix (default: the lineage prefix)")
    p.add_argument("--modality", default=None,
                   help="restrict rows to this modality channel "
                        "(e.g. m6a, atoi)")
    p.add_argument("--seed", type=int, default=42,
                   help="accepted for parity; the contrast here is "
                        "closed-form conjugate, not a sampler")
    p.add_argument("--posterior-prior-sd", "--prior-sd",
                   dest="prior_sd", type=float, default=1.0,
                   help="effect-scale prior: maps onto the Gamma "
                        "pseudo-counts a0=b0=1/sd^2 (the reference's "
                        "ESS sampler prior sd; declared mapping)")
    p.add_argument("--cell-membership", default=None,
                   help="cell<TAB>cell_type TSV: adds the per-type "
                        "contrast report {out}.assoc.celltype.parquet")
    p.add_argument("--no-celltype", action="store_true")
    p.add_argument("--exposure", default=None, help="optional coverage backend")
    p.add_argument("--n-bins", type=int, default=8,
                   help="pseudotime windows (AssocArgs n_bins)")
    p.add_argument("--min-total-coverage", type=float, default=0.0,
                   help="sites with fewer total counts drop out")
    p.add_argument("--min-cells", type=int, default=0,
                   help="sites expressed in fewer cells drop out")
    p.add_argument("--fdr-alpha", type=float, default=0.0,
                   help=">0: add a BH significant column at this level")
    p.add_argument("--trend-method", choices=["bayes", "quasi", "binomial"],
                   default="bayes",
                   help="within-branch trend estimator (AssocArgs "
                        "trend_method): bayes = Gamma-Poisson windows, "
                        "quasi/binomial = IRLS spline GAM with F / "
                        "deviance-LRT test (assoc/gam.rs:194)")
    p.add_argument("--n-knots", type=int, default=5,
                   help="GAM spline knots (quasi/binomial only)")
    p = sub.add_parser(
        "apa",
        help="alternative polyadenylation site usage "
             "(SCAPE mixture by default; run.rs CountApaArgs)",
    )
    p.add_argument("--bam", required=True,
                   help="BAM file(s), comma-separated (one batch each)")
    p.add_argument("--gff", default=None,
                   help="gene annotation; mixture mode uses its 3'UTRs "
                        "(three_prime_UTR rows, CDS-derived fallback)")
    p.add_argument("--output", required=True)
    p.add_argument("--method", choices=["simple", "mixture"], default="mixture",
                   help="pileup counting vs SCAPE EM mixture (run.rs default "
                        "mixture; falls back to simple when no 3'UTR is "
                        "derivable from --gff and no --utr-bed is given)")
    p.add_argument("--min-mapq", "--min-mapping-quality", dest="min_mapq",
                   type=int, default=20)
    p.add_argument("--peak-window", type=int, default=30,
                   help="simple-mode PAS peak clustering window")
    p.add_argument("--resolution-bp", type=int, default=10,
                   help="simple-mode site bin resolution (unused by mixture)")
    p.add_argument("--min-reads", "--min-coverage", dest="min_reads",
                   type=int, default=5,
                   help="min supporting reads per candidate site")
    p.add_argument("--polya-min-tail-length", type=int, default=0,
                   help="keep only reads with an untemplated A/T soft-clip "
                        "tail of at least this length (0 = all reads; "
                        "mixture default 10 when unset)")
    p.add_argument("--polya-max-non-a-or-t", type=int, default=3)
    p.add_argument("--polya-internal-prime-window", type=int, default=10,
                   help="genomic window checked for A/T-rich internal "
                        "priming around the cleavage site (needs --genome)")
    p.add_argument("--polya-internal-prime-count", type=int, default=7)
    p.add_argument("--genome", default=None,
                   help="FASTA for the internal-priming check")
    p.add_argument("--utr-bed", "-u", default=None,
                   help="3'UTR BED (3/4/6-col); alternative to --gff")
    p.add_argument("--min-utr-length", type=int, default=200,
                   help="skip UTRs with spliced length below this")
    p.add_argument("--pre-sites", default=None,
                   help="BED of known pA sites (name col = gene/UTR name, "
                        "start = UTR-relative position); skips discovery")
    p.add_argument("--min-fragments", type=int, default=50,
                   help="skip UTRs with fewer extracted fragments")
    p.add_argument("--mu-f", type=float, default=300.0,
                   help="expected fragment length mean (SCAPE mu_f)")
    p.add_argument("--sigma-f", type=float, default=50.0)
    p.add_argument("--theta-step", type=int, default=10,
                   help="pA candidate position enumeration step (bp)")
    p.add_argument("--min-beta", type=float, default=10.0)
    p.add_argument("--max-beta", type=float, default=70.0)
    p.add_argument("--min-ws", type=float, default=0.01,
                   help="prune components below this mixing weight")
    p.add_argument("--merge-distance", type=float, default=50.0,
                   help="merge candidate sites within this distance")
    p.add_argument("--skirt-eta", type=float, default=0.05,
                   help="per-site uniform skirt weight (robust emission)")
    p.add_argument("--skirt-mult", type=float, default=3.0,
                   help="skirt half-width in beta units")
    p.add_argument("--merge-beta-mult", type=float, default=2.0,
                   help="post-EM close-site merge tolerance in beta units")
    p.add_argument("--apa-max-sites", type=int, default=20,
                   help="cap candidate sites per UTR for BIC (0 = unlimited)")
    p.add_argument("--apa-em-pdui", action="store_true",
                   help="full SCAPE EM for PDUI instead of the fast top-2 "
                        "nearest-site assignment")
    p.add_argument("--mixture", dest="write_mixture", action="store_true",
                   help="also write the per-cell component matrix "
                        "({output}.apa_mixture.zarr); forces the EM")
    p.add_argument("--no-pdui", dest="compute_pdui", action="store_false",
                   default=True,
                   help="skip the proximal/distal PDUI channel matrix "
                        "(written by default)")
    p.add_argument("--drop-single-component", action="store_true",
                   help="drop genes with a single active pA site")
    p.add_argument("--no-umi-dedup", action="store_true",
                   help="count each fragment once (bulk / non-UMI data)")
    p.add_argument("--atoi-mask", default=None,
                   help="A-to-I sites parquet; overlapping pA sites drop")
    p.add_argument("--snp-mask", default=None,
                   help="snp_sites.parquet; pA sites at variants drop")
    p.add_argument("--valid-cells", default=None,
                   help="cell allow-list file (plain/.gz/first TSV column)")
    p.add_argument("--valid-genes", default=None,
                   help="gene allow-list file")
    p.add_argument("--skip-gene-qc", action="store_true",
                   help="skip the gene/cell expression QC gates")
    p.add_argument("--gene-min-cells", type=int, default=10)
    p.add_argument("--gene-min-counts", type=int, default=0)
    p.add_argument("--cell-min-genes", type=int, default=10)
    p.add_argument("--row-nnz-cutoff", type=int, default=10,
                   help="drop output sites with fewer non-zero cells")
    p.add_argument("--column-nnz-cutoff", type=int, default=1)
    p.add_argument("--compute-pdui-triplets", dest="compute_pdui_triplets",
                   action="store_true",
                   help="simple-mode per-(gene, cell) PDUI parquet "
                        "(round-2 behavior; mixture writes channel matrices)")

    p = sub.add_parser(
        "snp",
        help="cellSNP-lite-style pileup genotyper (snp/run.rs SnpArgs)",
    )
    p.add_argument("--bam", required=True,
                   help="comma-separated coordinate-sorted BAMs (merged pileup)")
    p.add_argument("--output", required=True,
                   help="output DIRECTORY: snp_sites.parquet + "
                        "snp_sites.vcf.gz + snp_mask.parquet "
                        "[+ {batch}_baf.zarr]")
    p.add_argument("-f", "--genome", default=None,
                   help="reference FASTA (optional here: the MD-tag "
                        "mismatch stream carries ref bases; validates "
                        "ref alleles + VCF contigs when given)")
    p.add_argument("--known-snps", default=None,
                   help="VCF(.gz) or snp_sites.parquet; force-called "
                        "regardless of alt evidence")
    p.add_argument("-g", "--gff", default=None,
                   help="gene model; gates sites to gene bodies and "
                        "enables the per-cell BAF matrices")
    p.add_argument("--cell-barcode-tag", default="CB")
    p.add_argument("--umi-tag", default="UB")
    p.add_argument("--no-umi-dedup", action="store_true")
    p.add_argument("--bulk", action="store_true",
                   help="genotype calls only, no per-cell output")
    p.add_argument("--skip-discovery", action="store_true",
                   help="known sites only")
    p.add_argument("--min-coverage", type=int, default=10,
                   help="de novo discovery depth gate")
    p.add_argument("--min-alt-count", type=int, default=3)
    p.add_argument("--min-alt-freq", type=float, default=0.1)
    p.add_argument("--min-depth", type=int, default=5,
                   help="genotype-calling depth gate")
    p.add_argument("--min-gq", type=float, default=20.0)
    p.add_argument("--base-error-rate", "--error-rate",
                   dest="base_error_rate", type=float, default=0.01)
    p.add_argument("--min-base-quality", type=int, default=20)
    p.add_argument("--min-mapping-quality", type=int, default=20)
    p.add_argument("--use-base-quality", dest="use_base_quality",
                   action="store_true", default=True,
                   help="Li 2011 per-base quality GLs on alt "
                        "observations (default; see MIGRATION.md)")
    p.add_argument("--no-use-base-quality", dest="use_base_quality",
                   action="store_false")
    p.add_argument("--min-vaf", type=float, default=None,
                   help="germline-like VAF gate on the SNP mask "
                        "(het in [v,1-v], hom-alt >= 1-v)")
    p.add_argument("--gene-type", default=None,
                   help="GFF biotype filter (e.g. protein_coding)")
    p.add_argument("--backend", choices=["zarr", "hdf5"], default="zarr",
                   help="per-cell BAF matrix backend")
    p.add_argument("--zip", action="store_true",
                   help="archive BAF matrices as .zarr.zip (reference "
                        "default; opt-in here — declared divergence)")

    p = sub.add_parser(
        "depth",
        help="per-cell coverage over BED regions or uniform tiles "
             "(read_depth/run.rs ReadDepthArgs)",
    )
    p.add_argument("--bam", required=True,
                   help="BAM(s), comma-separated")
    p.add_argument("--bed", default=None,
                   help="BED regions (alternative to --resolution-kb)")
    p.add_argument("--resolution-kb", type=float, default=None,
                   help="uniform genome tiles at this resolution "
                        "(the reference's bin mode)")
    p.add_argument("--output", required=True)
    p.add_argument("--min-mapq", type=int, default=20)
    p.add_argument("--cell-barcode-tag", default="CB")
    p.add_argument("--row-nnz-cutoff", type=int, default=0)
    p.add_argument("--column-nnz-cutoff", type=int, default=0)
    p.add_argument("--backend", choices=["zarr", "hdf5"], default="zarr")
    p.add_argument("--zip", action="store_true")

    p = sub.add_parser(
        "annotate",
        help="marker cell-type annotation of a gem run "
             "(annotate/run.rs AnnotateArgs)",
    )
    p.add_argument("-f", "--from", dest="frm", default=None,
                   help="gem / gem-encoder / topic output prefix")
    p.add_argument("--markers", required=True,
                   help="gene<TAB>celltype TSV (or GMT) marker panels")
    p.add_argument("-o", "--out", default=None,
                   help="output prefix (default: the gem prefix)")
    p.add_argument("--mode", choices=["projection", "enrichment"],
                   default=None,
                   help="how markers become a call (default: from "
                        "{from}.gem.json — topic -> enrichment, "
                        "embedding -> projection)")
    p.add_argument("--track",
                   choices=["spliced", "velocity", "nascent", "both"],
                   default="both",
                   help="spliced/velocity are projection tracks; "
                        "spliced/nascent are enrichment tracks")
    p.add_argument("--knn", type=int, default=15,
                   help="k for the cosine cell kNN graph fed to Leiden")
    p.add_argument("--resolution", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num-perm", type=int, default=200,
                   help="permutation draws calibrating the "
                        "over-representation statistic")
    p.add_argument("--min-markers", type=int, default=3)
    p.add_argument("--no-assign-qc", action="store_true")
    p.add_argument("--assign-mad", type=float, default=3.0)
    p.add_argument("--fdr-alpha", type=float, default=0.05)
    p.add_argument("--q-temperature", type=float, default=1.0)
    p.add_argument("--no-idf", action="store_true")
    p.add_argument("--obo", default=None,
                   help="Cell Ontology OBO: TreeBH layer (needs "
                        "--label-cl)")
    p.add_argument("--label-cl", default=None)
    p.add_argument("--ontology-fdr-q", type=float, default=0.05)
    p.add_argument("--ontology-by", action="store_true")
    p.add_argument("--panel-perm", type=int, default=0,
                   help="marker-panel permutation null (bias guard); "
                        "0 = off, try 200")
    p.add_argument("--support-perm", type=int, default=0,
                   help="support permutation null calibrating "
                        "label_support; 0 = off")
    p.add_argument("--no-bootstrap-markers", action="store_true")
    p.add_argument("--n-boot", type=int, default=100)
    p.add_argument("--no-recluster", action="store_true",
                   help="hold the clustering fixed across resamples "
                        "(weakens the bootstrap)")
    p.add_argument("--min-support", type=float, default=0.5)
    p.add_argument("--abstain-separable", action="store_true",
                   help="abstain by a top-vs-runner-up sign test "
                        "instead of the --min-support threshold")
    p.add_argument("--abstain-alpha", type=float, default=0.05)
    p.add_argument("--set-coverage", type=float, default=0.8,
                   help="coverage of the reported label_set")
    p.add_argument("--max-set-size", type=int, default=3)
    p.add_argument("--min-panel-coverage", type=float, default=0.0)
    # legacy round-2 surface (site-track cluster labelling) stays:
    p.add_argument("--backend", default=None,
                   help="LEGACY: site x cell counts backend (with "
                        "--clusters; pre-r3 surface)")
    p.add_argument("--clusters", default=None, help="LEGACY clusters parquet")
    p.add_argument("--min-score", type=float, default=0.0)
    p.add_argument("--output", default=None, help="LEGACY output prefix")

    p = sub.add_parser("docs", help="print embedded method write-ups")
    p.add_argument("topic", nargs="?", default=None,
                   help="omit to list available topics")

    p = sub.add_parser(
        "plot", help="render a lineage fit: annotated trajectory over a 2D layout"
    )
    p.add_argument("-f", "--from", dest="frm", required=True,
                   help="lineage output prefix ({from}.pseudotime/... parquet)")
    p.add_argument("--latent", required=True,
                   help="cell latent parquet (the gem fit the lineage used)")
    p.add_argument("-o", "--out", default=None,
                   help="figure path (default {from}.plot.pdf)")
    p.add_argument("--color-by",
                   choices=["pseudotime", "label", "celltype"],
                   default="pseudotime",
                   help="celltype reads the lineage's own node calls "
                        "({from}.trajectory_annotation.parquet)")
    p.add_argument("--annot", default=None,
                   help="cell,label parquet (required for --color-by label)")
    p.add_argument("--pt-ramp", choices=["sqrt", "linear", "rank"],
                   default="sqrt",
                   help="non-linear remap of the pseudotime ramp")
    p.add_argument("--width", type=float, default=9.0)
    p.add_argument("--height", type=float, default=8.0)
    p.add_argument("--dpi", type=int, default=150)
    p.add_argument("--point-size", type=float, default=3.0)
    p.add_argument("--alpha", type=float, default=0.7)
    p.add_argument("--label-font-size", type=float, default=8.0)
    p.add_argument("--velocity-scale", type=float, default=0.5,
                   help="scale on the velocity-field arrow length")
    p.add_argument("--no-velocity-field", action="store_true")
    p.add_argument("--backbone", choices=["auto", "curves", "tree"],
                   default="auto",
                   help="auto draws the Slingshot curves when "
                        "{from}.curves_2d.parquet exists, else the tree")
    p.add_argument("--no-type-labels", action="store_true",
                   help="skip the node cell-type annotations")
    p.add_argument("--show-unassigned", action="store_true")
    p.add_argument("--svg", action="store_true",
                   help="also emit the SVG next to the main output")
    p.add_argument("--layout",
                   choices=["auto", "phate", "umap", "tumap", "tsne"],
                   default="auto",
                   help="auto reuses {from}.cells_2d.parquet when the "
                        "lineage run already laid out (else tumap)")
    p.add_argument("--layout-pcs", type=int, default=50,
                   help="PCs carrying the umap/tumap kNN graph + SGD init, "
                        "leading (mean) axis dropped; 0 = raw latent + "
                        "random init (lineage/args.rs layout_pcs)")
    p.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.cmd == "docs":
        from ..faba import docs as faba_docs

        if args.topic is None:
            for line in faba_docs.index_lines():
                print(line)
        else:
            print(faba_docs.text(args.topic))
        return
    if args.cmd == "plot":
        _run_faba_plot(args)
        return
    if args.cmd == "apa":
        _run_apa_cmd(args)
        return
    if args.cmd == "snp":
        from ..faba.snp import GenotypeParams, run_snp

        sites = run_snp(
            args.bam.split(","),
            args.output,
            genome=args.genome,
            known_snps=args.known_snps,
            gff=args.gff,
            params=GenotypeParams(
                min_depth=args.min_depth,
                min_gq=args.min_gq,
                base_error_rate=args.base_error_rate,
                min_coverage=args.min_coverage,
                min_alt_count=args.min_alt_count,
                min_alt_freq=args.min_alt_freq,
            ),
            cell_barcode_tag=args.cell_barcode_tag,
            umi_tag=args.umi_tag,
            no_umi_dedup=args.no_umi_dedup,
            use_base_quality=args.use_base_quality,
            min_base_quality=args.min_base_quality,
            min_mapping_quality=args.min_mapping_quality,
            bulk=args.bulk,
            skip_discovery=args.skip_discovery,
            min_vaf=args.min_vaf,
            gene_type=args.gene_type,
            backend=args.backend,
            zip_output=args.zip,
        )
        n_called = int((sites.genotype != 3).sum())
        print(
            f"wrote {args.output}/snp_sites.parquet "
            f"({len(sites)} sites, {n_called} called)"
        )
        return
    if args.cmd == "depth":
        from ..data.sparse_io import create_sparse_from_csc
        from ..faba.depth import (
            depth_matrix_uniform,
            depth_per_region,
            read_bed,
        )

        if (args.bed is None) == (args.resolution_kb is None):
            raise SystemExit(
                "faba depth: give exactly one of --bed or --resolution-kb"
            )
        sfx = ".h5" if args.backend == "hdf5" else (
            ".zarr.zip" if args.zip else ".zarr")
        bam_list = args.bam.split(",")
        for bam_path in bam_list:
            tag = (
                "" if len(bam_list) == 1
                else "." + os.path.splitext(os.path.basename(bam_path))[0]
            )
            if args.bed is not None:
                cov, names, barcodes = depth_per_region(
                    bam_path, read_bed(args.bed), min_mapq=args.min_mapq
                )
            else:
                cov, names, barcodes = depth_matrix_uniform(
                    bam_path,
                    resolution_bp=int(args.resolution_kb * 1000),
                    min_mapq=args.min_mapq,
                    cb_tag=args.cell_barcode_tag,
                )
            if args.row_nnz_cutoff > 0 or args.column_nnz_cutoff > 0:
                csc = cov.tocsc()
                rk = np.asarray((csc > 0).sum(axis=1)).ravel() \
                    >= args.row_nnz_cutoff
                ck = np.asarray((csc > 0).sum(axis=0)).ravel() \
                    >= args.column_nnz_cutoff
                cov = csc[rk][:, ck]
                names = [n for n, k in zip(names, rk) if k]
                barcodes = [b for b, k in zip(barcodes, ck) if k]
            out_path = f"{args.output}{tag}{sfx}"
            create_sparse_from_csc(cov, out_path, names, barcodes)
            print(f"wrote backend: {out_path} ({cov.shape[0]} rows)")
        return
    if args.cmd == "annotate":
        import pandas as pd

        if args.backend is None:
            _run_faba_annotate(args)
            return

        from ..data.knowledge import read_gmt
        from ..data.sparse_io import open_sparse_matrix
        from ..ops.enrichment import annotate_by_markers

        be = open_sparse_matrix(args.backend)
        cl = pd.read_parquet(args.clusters)
        labels = cl.iloc[:, 1].to_numpy()
        uniq = np.unique(labels)
        profiles = np.zeros((len(uniq), be.num_rows))
        for i, c in enumerate(uniq):
            cells = np.nonzero(labels == c)[0]
            profiles[i] = np.log1p(
                np.asarray(be.read_columns_csc(cells).mean(axis=1)).ravel()
            )
        # faba features follow gene/modality/channel; match markers on
        # the gene part of the row name (feature_name.rs convention)
        genes = [str(n).split(":")[0].split("/")[0] for n in be.row_names()]
        sets = read_gmt(args.markers)
        names, scores = annotate_by_markers(
            profiles, genes, sets, min_score=args.min_score
        )
        table = {"cluster": uniq, "annotation": names, "score": scores.max(1)}
        if args.n_boot > 0:
            from ..ops.enrichment import marker_bootstrap

            bs = marker_bootstrap(
                profiles, genes, sets, n_boot=args.n_boot,
                support_threshold=args.min_support,
            )
            table["annotation"] = bs["annotation"]
            table["cluster_label_support"] = bs["cluster_label_support"]
        pd.DataFrame(table).to_parquet(f"{args.output}.annotation.parquet")
        print(f"wrote {args.output}.annotation.parquet")
        return

    if args.cmd == "genes":
        bam_list = args.bam.split(",")
        gsfx = ".h5" if args.backend == "hdf5" else (
            ".zarr.zip" if args.zip else "")
        for bam_path in bam_list:
            tag = (
                "" if len(bam_list) == 1
                else "." + os.path.splitext(os.path.basename(bam_path))[0]
            )
            _run_genes_one(args, bam_path, f"{args.output}{tag}", gsfx)
        return
    elif args.cmd in ("dartseq", "atoi"):
        import pandas as pd

        from ..data.sparse_io import create_sparse_from_csc
        from ..faba.bam import read_bam
        from ..faba.dartseq import run_atoi, run_dartseq

        runner = run_dartseq if args.cmd == "dartseq" else run_atoi
        snp_mask = None
        if args.snp_mask_file:
            snp_mask = set()
            with open(args.snp_mask_file) as f:
                for line in f:
                    parts = line.split()
                    if len(parts) >= 2:
                        snp_mask.add((parts[0], int(parts[1])))
        valid_cells = None
        if args.valid_cells:
            with open(args.valid_cells) as f:
                valid_cells = {line.strip() for line in f if line.strip()}
        run_gene_qc = args.gene_qc and not args.skip_gene_qc
        if args.cell_filter != "nnz" or run_gene_qc:
            # barcode QC on the gene-count matrix (cell_qc/mod.rs via
            # the quant stage) + gene-expression/mito cell QC; the
            # surviving set gates the site pipeline like an implicit
            # --valid-cells. One gene-count pass serves both.
            if not args.gff:
                raise SystemExit(
                    f"{args.cmd} --cell-filter/--gene-qc needs --gff "
                    "(both run on gene counts)"
                )
            from ..faba.cell_calling import (
                CellCallParams,
                call_cells,
                gene_qc_masks,
                mito_qc,
            )
            from ..faba.genes import count_genes, parse_gff_genes

            gcounts, _genes, gbarcodes = count_genes(
                args.bam, args.gff, min_mapq=args.min_mapq,
                cb_tag=args.cell_barcode_tag, umi_tag=args.umi_tag,
            )
            keep_cells = np.ones(len(gbarcodes), bool)
            if args.cell_filter != "nnz":
                keep_cells &= call_cells(
                    gcounts,
                    CellCallParams(
                        filter=args.cell_filter,
                        min_counts=args.cell_min_umis,
                        expected_cells=args.expected_cells,
                        ed_fdr=args.cell_fdr,
                        ed_n_sims=args.cell_sims,
                        ed_ambient_lo=args.ambient_lo,
                        ed_ambient_hi=args.ambient_hi,
                        ed_min_umis=args.cell_min_umis,
                    ),
                )
            if run_gene_qc:
                model = parse_gff_genes(args.gff)
                gene_chroms = [model.chrom_names[i] for i in model.chrom]
                _gk, ck = gene_qc_masks(
                    gcounts, gene_min_cells=args.gene_min_cells,
                    gene_min_counts=args.gene_min_counts,
                    cell_min_genes=args.cell_min_genes,
                )
                _mg, _frac, mito_cell = mito_qc(
                    gcounts, gene_chroms, mito_chr=args.mito_chr,
                    keep_mito=args.keep_mito,
                    max_mito_frac=args.max_mito_frac,
                    no_mito_cell_qc=args.no_mito_cell_qc,
                )
                keep_cells &= ck & mito_cell
            called = {b for b, k in zip(gbarcodes, keep_cells) if k}
            with open(f"{args.output}.called_cells.txt", "w") as f:
                f.write("\n".join(sorted(called)) + "\n")
            print(
                f"cell qc ({args.cell_filter}"
                f"{', gene-qc' if run_gene_qc else ''}): "
                f"{len(called)}/{len(gbarcodes)} barcodes kept"
            )
            valid_cells = called if valid_cells is None else (valid_cells & called)
        if args.cell_scan:
            # null-cell scan: score WT cells' genome-wide conversion
            # activity against depth-matched control cells and keep the
            # editing-competent set (cell_activity.rs call_and_report)
            import json as _json

            from ..faba.cell_activity import call_competent_cells
            from ..faba.dartseq import A, C, G, T, editing_activity_tallies

            wt_recs = read_bam(
                args.bam, cb_tag=args.cell_barcode_tag, umi_tag=args.umi_tag
            )
            ct_recs = read_bam(
                args.control_bam, cb_tag=args.cell_barcode_tag,
                umi_tag=args.umi_tag,
            )
            rb, ab = (C, T) if args.cmd == "dartseq" else (A, G)
            wt_e, wt_n, ct_e, ct_n = editing_activity_tallies(
                wt_recs, ct_recs, ref_base=rb, alt_base=ab,
                min_mapq=args.min_mapq, min_baseq=args.min_base_quality,
            )
            call = call_competent_cells(
                wt_e, wt_n, ct_e, ct_n,
                min_coverage=args.cell_scan_min_coverage,
                reject_tolerance=(
                    args.cell_scan_tolerance
                    if args.cell_scan_tolerance is not None
                    else 1.0
                ),
                control_tail=args.cell_scan_control_tail,
            )
            competent = {
                wt_recs.barcodes[i] for i in np.nonzero(call.keep)[0]
            }
            report = {
                "n_scored": call.n_scored,
                "n_kept": len(competent),
                "kept_frac": round(call.kept_frac, 4),
                "selected_rate": call.selected_rate,
                "rejected_rate": call.rejected_rate,
                "control_rate": call.control_rate,
                "rejected_over_control": call.rejected_over_control,
                "control_percentile": call.control_percentile,
            }
            if (args.reader_genes or args.writer_genes) and args.gff:
                # diagnostic only (cell_activity.rs log_family_expression):
                # median per-cell expression of the listed genes in the
                # kept vs dropped pools
                from ..faba.genes import count_genes

                gcounts2, genes2, gb2 = count_genes(
                    args.bam, args.gff, min_mapq=args.min_mapq,
                    cb_tag=args.cell_barcode_tag, umi_tag=args.umi_tag,
                )
                kept_ix = [i for i, b in enumerate(gb2) if b in competent]
                drop_ix = [i for i, b in enumerate(gb2) if b not in competent]
                gl = {g.lower(): i for i, g in enumerate(genes2)}
                for fam, arg in (("reader", args.reader_genes),
                                 ("writer", args.writer_genes)):
                    if not arg:
                        continue
                    ids = [gl[g.strip().lower()] for g in arg.split(",")
                           if g.strip().lower() in gl]
                    if not ids:
                        continue
                    dense = np.asarray(gcounts2[ids].todense())
                    report[f"{fam}_median_kept"] = float(
                        np.median(dense[:, kept_ix].sum(0)) if kept_ix else 0.0
                    )
                    report[f"{fam}_median_dropped"] = float(
                        np.median(dense[:, drop_ix].sum(0)) if drop_ix else 0.0
                    )
            with open(f"{args.output}.cell_scan.json", "w") as f:
                _json.dump(report, f, indent=1)
            print(
                f"cell scan: kept {len(competent)}/{call.n_scored} scored "
                f"cells (rejected/control = {call.rejected_over_control:.2f})"
            )
            scan_cells = competent
        else:
            scan_cells = None
        res = runner(
            args.bam, args.control_bam, max_p=args.max_p, min_alt=args.min_alt,
            min_coverage=args.min_coverage, min_mapq=args.min_mapq,
            min_baseq=args.min_base_quality, valid_cells=valid_cells,
            wt_cells=scan_cells,
            eps=args.error_rate, rho=args.overdispersion, snp_mask=snp_mask,
            cb_tag=args.cell_barcode_tag, umi_tag=args.umi_tag,
        )
        from ..faba.bam import read_bam_ref_names

        ref_names = read_bam_ref_names(args.bam)
        if args.cmd == "dartseq" and (
            getattr(args, "detect_atoi", False) or getattr(args, "atoi_mask", None)
        ):
            from ..faba.dartseq import atoi_confounder_mask, filter_sites, run_atoi

            if args.atoi_mask:
                adf = pd.read_parquet(args.atoi_mask)
                atoi_sites = set(zip(adf["chrom"].astype(str), adf["pos"].astype(int)))
            else:
                ares = run_atoi(
                    args.bam, args.control_bam, max_p=args.atoi_pvalue,
                    min_alt=args.atoi_min_conversion,
                    min_coverage=args.atoi_min_coverage, min_mapq=args.min_mapq,
                    min_baseq=args.min_base_quality, valid_cells=valid_cells,
                    snp_mask=snp_mask,
                )
                adf = pd.DataFrame({
                    "chrom": [ref_names[r] for r in ares.sites[:, 0]],
                    "pos": ares.sites[:, 1],
                    "strand": ares.strand,
                })
                adf.to_parquet(f"{args.output}.atoi_mask.sites.parquet")
                atoi_sites = set(zip(adf["chrom"].astype(str), adf["pos"].astype(int)))
            clear = atoi_confounder_mask(
                res.sites[:, 0], res.sites[:, 1], res.strand, ref_names, atoi_sites
            )
            print(f"A-to-I confounder mask: {len(clear)} m6A candidates -> "
                  f"{int(clear.sum())} ({len(atoi_sites)} edited sites)")
            res = filter_sites(res, clear)
        if args.cmd == "dartseq" and getattr(args, "genome", None):
            from ..faba.context import read_fasta
            from ..faba.dartseq import filter_sites, m6a_motif_mask

            keep = m6a_motif_mask(
                read_fasta(args.genome), ref_names,
                res.sites[:, 0], res.sites[:, 1], res.strand,
                check_r_site=not args.no_check_r_site,
            )
            n0 = len(keep)
            res = filter_sites(res, keep)
            print(f"RAC motif gate: {n0} called sites -> {int(keep.sum())}")
        if args.site_min_cells > 0 and res.cell_counts.shape[0]:
            # site-axis sparsity gate (run.rs site_min_cells): the site
            # matrix drops sparse sites; the sites table keeps them
            from ..faba.dartseq import filter_sites as _fs

            ncells_per_site = np.asarray(
                (res.cell_counts > 0).sum(axis=1)
            ).ravel()
            keep_s = ncells_per_site >= args.site_min_cells
            print(
                f"site-min-cells {args.site_min_cells}: "
                f"{len(keep_s)} sites -> {int(keep_s.sum())}"
            )
            res = _fs(res, keep_s)
        df = pd.DataFrame(
            {
                "chrom": [ref_names[r] for r in res.sites[:, 0]],
                "pos": res.sites[:, 1],
                "strand": res.strand,
                "name": res.site_names,
                **{k: v for k, v in res.stats.items()},
            }
        )
        df.to_parquet(f"{args.output}.sites.parquet")
        if res.cell_counts.shape[0]:
            create_sparse_from_csc(
                res.cell_counts, f"{args.output}.zarr", res.site_names, res.barcodes
            )
        if args.output_bed_file and res.cell_counts.shape[0]:
            # per-(site, cell) conversion rows, bgzip-compatible gzip
            # (editing/bed_output.rs write_bed: chrom start stop strand
            # gene converted unconverted barcode site_pos [cell_type]);
            # row order is total — (site, barcode) — by construction
            import gzip as _gzip

            from ..faba.cell_calling import load_cell_membership, match_barcode
            from ..faba.dartseq import per_cell_coverage_at_sites

            membership = None
            if args.cell_membership:
                membership = load_cell_membership(
                    args.cell_membership,
                    barcode_col=args.membership_barcode_col,
                    celltype_col=args.membership_celltype_col,
                )
            gene_of_site = ["."] * len(res.site_names)
            if args.gff:
                from ..faba.genes import assign_reads_to_genes, parse_gff_genes

                _model = parse_gff_genes(args.gff)
                gids = assign_reads_to_genes(
                    res.sites[:, 0], res.sites[:, 1], res.sites[:, 1] + 1,
                    ref_names, _model,
                )
                gene_of_site = [
                    _model.names[g] if g >= 0 else "." for g in gids
                ]
            cov_sc = per_cell_coverage_at_sites(
                read_bam(args.bam, cb_tag=args.cell_barcode_tag,
                         umi_tag=args.umi_tag),
                res.sites[:, 0], res.sites[:, 1], len(res.barcodes),
                min_mapq=args.min_mapq,
            ).tocsr()
            conv = res.cell_counts.tocsr()
            bed_path = f"{args.output}.bed.gz"
            with _gzip.open(bed_path, "wt") as f:
                for si in range(conv.shape[0]):
                    row = conv.getrow(si).tocoo()
                    order = np.argsort(
                        [res.barcodes[c] for c in row.col], kind="stable"
                    )
                    chrom = ref_names[res.sites[si, 0]]
                    pos = int(res.sites[si, 1])
                    strand = res.strand[si] if res.strand is not None else "."
                    for oi in order:
                        cb_i = int(row.col[oi])
                        cb = res.barcodes[cb_i]
                        converted = int(row.data[oi])
                        cov = int(cov_sc[si, cb_i])
                        cols = [
                            chrom, pos, pos + 1, strand, gene_of_site[si],
                            converted, max(cov - converted, 0), cb, pos,
                        ]
                        if args.output_cell_types and membership is not None:
                            cols.append(
                                match_barcode(
                                    membership, cb,
                                    exact=args.exact_barcode_match,
                                ) or "unknown"
                            )
                        f.write("\t".join(str(c) for c in cols) + "\n")
            print(f"wrote {bed_path}")
        if args.gff and not args.no_mixture and res.cell_counts.shape[0]:
            from ..faba.genes import parse_gff_exons, parse_gff_genes
            from ..faba.mixture import MixtureParams, run_mixture

            model = parse_gff_genes(args.gff)
            exons = parse_gff_exons(args.gff, model)
            cov = None
            if args.mixture_weight == "posterior":
                from ..faba.dartseq import per_cell_coverage_at_sites

                cov = per_cell_coverage_at_sites(
                    read_bam(args.bam), res.sites[:, 0], res.sites[:, 1],
                    len(res.barcodes), min_mapq=args.min_mapq,
                )
            modality = "m6a" if args.cmd == "dartseq" else "atoi"
            mat, names, components, bw = run_mixture(
                res.cell_counts, res.sites[:, 0], res.sites[:, 1], res.strand,
                ref_names, model, exons,
                modality=modality,
                params=MixtureParams(
                    min_sites=args.mixture_min_sites,
                    max_k=args.mixture_max_k,
                    bandwidth=args.mixture_bandwidth,
                    drop_single_component=args.drop_single_component,
                ),
                weight_mode=args.mixture_weight,
                prior_alpha=args.mixture_prior_alpha,
                prior_beta=args.mixture_prior_beta,
                cell_coverage=cov,
            )
            comp_path = f"{args.output}.{modality}_components.parquet"
            components.to_parquet(comp_path)
            if mat is not None:
                create_sparse_from_csc(
                    mat, f"{args.output}.mixture.zarr", names, res.barcodes
                )
                print(
                    f"wrote {args.output}.mixture.zarr "
                    f"({len(names)} components, bandwidth {bw:.1f} nt) + "
                    f"{comp_path}"
                )
            else:
                print(f"mixture: no gene met min-sites; wrote empty {comp_path}")
        print(f"wrote {args.output}.sites.parquet ({len(df)} sites)")
    elif args.cmd == "all":
        from ..faba.pipeline import run_all

        res = run_all(
            args.bam.split(","), args.gff, args.output,
            control_bam=(args.control_bam.split(",")
                         if args.control_bam else None),
            genome=args.genome, gene_type=args.gene_type,
            cell_barcode_tag=args.cell_barcode_tag,
            umi_tag=args.umi_tag, no_umi_dedup=args.no_umi_dedup,
            backend=args.backend, zip_output=args.zip,
            min_mapq=args.min_mapq,
            min_base_quality=args.min_base_quality,
            skip_snp=args.skip_snp, skip_genes=args.skip_genes,
            skip_atoi=args.skip_atoi, skip_apa=args.skip_apa,
            depth_resolution_kb=args.depth_resolution_kb,
            known_snps=args.known_snps,
            snp_min_depth=args.snp_min_depth,
            snp_min_gq=args.snp_min_gq,
            snp_min_coverage=args.snp_min_coverage,
            snp_min_alt_count=args.snp_min_alt_count,
            snp_min_alt_freq=args.snp_min_alt_freq,
            snp_mask_min_vaf=args.snp_mask_min_vaf,
            atoi_min_coverage=args.atoi_min_coverage,
            atoi_min_conversion=args.atoi_min_conversion,
            atoi_pvalue_cutoff=args.atoi_pvalue_cutoff,
            edit_error_rate=args.edit_error_rate,
            edit_overdispersion=args.edit_overdispersion,
            apa_min_coverage=args.apa_min_coverage,
            polya_min_tail_length=args.polya_min_tail_length,
            no_apa_pdui=args.no_apa_pdui,
            mixture=not args.no_mixture,
            mixture_weight=args.mixture_weight,
            drop_single_component=args.drop_single_component,
            gene_qc=args.gene_qc,
            gene_min_cells=args.gene_min_cells,
            gene_min_counts=args.gene_min_counts,
            cell_min_genes=args.cell_min_genes,
        )
        print(f"wrote: {' '.join(sorted(res.outputs))}")
    elif args.cmd == "pwm":
        import json as _json

        import pandas as pd

        from ..faba.context import pwm_at_sites, pwm_from_reads, read_fasta

        df = pd.read_parquet(args.sites)
        strand = df["strand"].to_numpy() if "strand" in df else None
        strand = (
            np.where(np.asarray(strand).astype(str) == "-", -1, 1)
            if strand is not None and strand.dtype == object else strand
        )
        fasta = read_fasta(args.fasta)
        if args.source == "reads":
            if not args.bam:
                raise SystemExit("--source reads needs --bam")
            pwm = pwm_from_reads(
                args.bam.split(","), fasta,
                df["chrom"].astype(str).to_numpy(object),
                df["pos"].to_numpy(np.int64),
                flank=args.flank, strand=strand,
            )
        else:
            pwm = pwm_at_sites(
                fasta, df["chrom"].tolist(),
                df["pos"].to_numpy(), flank=args.flank, strand=strand,
            )
        out = pd.DataFrame(pwm.freqs, columns=list("ACGT"))
        out["offset"] = np.arange(-args.flank, args.flank + 1)
        out["info_bits"] = pwm.info_bits
        if args.output.endswith((".tsv", ".tsv.gz")):
            out.to_csv(args.output, sep="\t", index=False)
            out_path = args.output
        else:
            out_path = f"{args.output}.pwm.parquet"
            out.to_parquet(out_path)
        print(
            _json.dumps(
                {"consensus": pwm.consensus, "n_sites": pwm.n_sites,
                 "source": args.source, "out": out_path}
            )
        )
    elif args.cmd == "metagene":
        import pandas as pd

        df = pd.read_parquet(args.sites)
        if args.body:
            from ..faba.context import metagene_profile
            from ..faba.genes import parse_gff_genes

            model = parse_gff_genes(args.gff, gene_type=args.gene_type)
            chroms = sorted(set(df["chrom"].astype(str)))
            cidx = {c: i for i, c in enumerate(chroms)}
            prof = metagene_profile(
                model, chroms,
                df["chrom"].map(cidx).to_numpy(), df["pos"].to_numpy(),
                bins=args.bins,
            )
            pd.DataFrame(
                {"bin": prof["bin_centers"], "density": prof["density"],
                 "count": prof["counts"]}
            ).to_parquet(f"{args.output}.metagene.parquet")
            print(
                f"wrote {args.output}.metagene.parquet "
                f"({prof['n_assigned']}/{len(df)} sites in genes)"
            )
            return
        import sys

        from ..faba.metagene import (
            ascii_histogram,
            metagene_metaplotr,
            parse_gff_transcripts,
        )

        models, ncrna = parse_gff_transcripts(
            args.gff, gene_type=args.gene_type
        )
        res = metagene_metaplotr(
            models, ncrna,
            df["chrom"].astype(str).to_numpy(object),
            df["pos"].to_numpy(np.int64),
            bins=args.bins, isoform=args.isoform,
            include_ncrna=args.ncrna,
        )
        out_df = pd.DataFrame(res["rows"]).rename(
            columns={"feature": "#feature"})
        out_df.to_csv(args.output, sep="\t", index=False)
        base = args.output.removesuffix(".tsv").removesuffix(".gz")
        out_df.to_parquet(f"{base}.metagene.parquet")
        if args.distances:
            pd.DataFrame(res["distances"]).to_csv(
                args.distances, sep="\t", index=False)
        if args.print_hist:
            print(ascii_histogram(res["rows"],
                                  max_width=args.max_width),
                  file=sys.stderr)
        m5, mc, m3 = res["median_sizes"]
        print(
            f"wrote {args.output} ({res['n_sites_placed']}/{len(df)} "
            f"sites placed; median 5'UTR/CDS/3'UTR = "
            f"{m5:.0f}/{mc:.0f}/{m3:.0f} nt; bins {res['region_bins']})"
        )
    elif args.cmd in ("gem", "gem-encoder"):
        import pandas as pd

        from ..data.sparse_io import open_sparse_matrix
        from ..embedding.gem import fit_gem, fit_gem_encoder

        sb = open_sparse_matrix(args.spliced)
        ub = open_sparse_matrix(args.unspliced)
        s = np.asarray(
            sb.read_columns_csc(np.arange(sb.num_columns)).todense()
        ).T  # [P, D]
        u = np.asarray(ub.read_columns_csc(np.arange(ub.num_columns)).todense()).T
        if s.shape != u.shape:
            raise SystemExit(
                f"spliced {s.shape} and unspliced {u.shape} backends must "
                "share genes and columns"
            )
        genes = sb.row_names()
        pb_names = sb.column_names()
        if args.raw:
            # CollapseArgs path: hash cells into pseudobulks on the
            # SPLICED sketch, aggregate BOTH tracks by the same
            # partition (gem/run.rs collapse stage; one grouping so
            # theta and delta read the same populations)
            from ..ops import random_projection as rp

            row_weights = None
            if args.n_hvg and args.n_hvg < len(genes):
                from ..ops.gene_stats import hvg_row_weights

                row_weights = hvg_row_weights(
                    sb, args.n_hvg, block_size=args.block_size
                )
            _, proj = rp.project_columns(
                sb, args.proj_dim, block_size=args.block_size,
                row_weights=row_weights, seed=args.seed,
            )
            codes = rp.binary_sort_columns(
                proj, args.sort_dim, seed=args.seed
            )
            _, groups = np.unique(codes, return_inverse=True)
            n_pb = int(groups.max()) + 1
            onehot = np.zeros((len(groups), n_pb), np.float32)
            onehot[np.arange(len(groups)), groups] = 1.0
            s = onehot.T @ s
            u = onehot.T @ u
            pb_names = [f"pb{j}" for j in range(n_pb)]
            np.savez(
                f"{args.output}.partition.npz",
                fine_groups=groups.astype(np.int32),
            )
            print(f"collapse: {len(groups)} cells -> {n_pb} pseudobulks "
                  f"(sort_dim={args.sort_dim}); wrote "
                  f"{args.output}.partition.npz")
        if args.cmd == "gem":
            if args.lineage_dag and args.posterior > 0:
                raise SystemExit(
                    "--lineage-dag cannot combine with --posterior: the "
                    "posterior REPLACES phase-1 training, so there is no "
                    "fit for the second pass to refine (gem/args.rs)"
                )
            res = fit_gem(
                s, u, embedding_dim=args.embedding_dim, epochs=args.epochs,
                learning_rate=args.learning_rate or 0.02,
                delta_l2=args.delta_l2,
                objective=args.nce_objective,
                weight_decay=args.weight_decay,
                grad_clip=args.grad_clip,
                sequential_velocity=args.sequential_velocity,
                lineage_dag=args.lineage_dag,
                lineage_smooth=args.lineage_smooth,
                lineage_mst=not args.dense_dag,
                seed=args.seed,
            )
            if res.dag_pseudotime is not None:
                pd.DataFrame({
                    "cell": pb_names,
                    "pseudotime": res.dag_pseudotime,
                }).to_parquet(f"{args.output}.dag_pseudotime.parquet")
                pd.DataFrame(
                    res.dag_fate,
                    index=pb_names,
                    columns=[f"leaf{int(l)}" for l in res.dag_leaves],
                ).reset_index(names="cell").to_parquet(
                    f"{args.output}.dag_fate.parquet"
                )
                print(f"lineage DAG: {len(res.dag_edges)} edges, "
                      f"{len(res.dag_leaves)} leaves")
            delta, emb = res.delta, res.e_feat
            vel = res.cell_velocity(u)
            w = s / np.maximum(s.sum(1, keepdims=True), 1e-9)
            cell_emb = w @ emb  # spliced-weighted gene embedding
            if args.posterior > 0:
                from ..embedding.posterior import gem_gibbs

                post = gem_gibbs(
                    s, u, res.e_feat, res.delta,
                    res.b_feat_s, res.b_feat_u, res.pb_e, res.pb_b,
                    n_sweeps=args.posterior,
                    burnin=max(args.posterior // 4, 2),
                    stick_alpha=args.ibp_alpha,
                    half_cauchy_scale=args.half_cauchy_scale,
                    seed=args.seed,
                )
                pd.DataFrame({
                    "gene": genes,
                    "delta_pip": post.delta_pip.max(axis=1),
                    "delta_norm": np.linalg.norm(post.delta_mean, axis=1),
                    "beta_pip": post.beta_pip.max(axis=1),
                    "identified": post.delta_identified,
                }).to_parquet(f"{args.output}.delta_posterior.parquet")
                print(
                    f"posterior: {args.posterior} sweeps, rhat max "
                    f"{post.rhat.max():.2f}"
                )
        else:
            res = fit_gem_encoder(
                s, u, latent_dim=args.embedding_dim, epochs=args.epochs,
                learning_rate=args.learning_rate or 0.01,
                mask_frac=args.mask_fraction, delta_l2=args.delta_l2,
                weight_decay=args.weight_decay,
                grad_clip=args.grad_clip, seed=args.seed,
            )
            delta, emb = res.delta, res.rho
            vel = res.cell_velocity(u)
            cell_emb = res.encode(u)
        pd.DataFrame(
            emb, index=genes, columns=[f"h{j}" for j in range(emb.shape[1])]
        ).reset_index(names="gene").to_parquet(f"{args.output}.gene_embedding.parquet")
        out_v = pd.DataFrame(
            vel, index=pb_names,
            columns=[f"v{j}" for j in range(vel.shape[1])],
        ).reset_index(names="cell")
        out_v.to_parquet(f"{args.output}.velocity.parquet")
        pd.DataFrame(
            {"gene": genes, "velocity_norm": np.linalg.norm(delta, axis=1)}
        ).to_parquet(f"{args.output}.gene_velocity.parquet")
        cell_df = pd.DataFrame(
            cell_emb, index=pb_names,
            columns=[f"h{j}" for j in range(cell_emb.shape[1])],
        ).reset_index(names="cell")
        cell_df.to_parquet(f"{args.output}.latent.parquet")
        # reference table names (gem/run.rs outputs): the co-embedded
        # feature rows keyed {gene}/count/{spliced,unspliced} (unspliced
        # = spliced + the nascent increment δ_g) and the cell θ table —
        # what `faba annotate`/`faba lineage` read by prefix
        cell_df.to_parquet(f"{args.output}.cell_embedding.parquet")
        feat_rows = np.vstack([emb, emb + delta])
        feat_names = (
            [f"{g}/count/spliced" for g in genes]
            + [f"{g}/count/unspliced" for g in genes]
        )
        pd.DataFrame(
            feat_rows, index=feat_names,
            columns=[f"h{j}" for j in range(emb.shape[1])],
        ).reset_index(names="feature").to_parquet(
            f"{args.output}.feature_embedding.parquet"
        )
        import json as _json

        # run manifest ({prefix}.gem.json, faba/manifest.rs): names the
        # producer so `faba annotate` can resolve --mode. DIVERGENCE:
        # our gem-encoder is an embedding model (masked generative,
        # H-space latent), not the reference's topic sibling, so both
        # report "embedding"; enrichment mode reads topic prefixes
        # (senna topic writes dictionary/latent log tables).
        with open(f"{args.output}.gem.json", "w") as f:
            _json.dump(
                {"model_type": "embedding", "program": args.cmd,
                 "latent": "h-space"}, f,
            )
        print(
            f"wrote {args.output}."
            "{gene_embedding,velocity,gene_velocity,latent,"
            "cell_embedding,feature_embedding,gem.json}"
        )
    elif args.cmd == "lineage":
        import pandas as pd

        from ..faba.lineage_run import run_lineage

        if args.frm is None and args.latent is None:
            raise SystemExit("faba lineage: need --from PREFIX (or the "
                             "legacy --latent/--velocity pair)")
        theta = vel = cells = None
        prefix = args.frm
        if args.latent is not None:
            zdf = pd.read_parquet(args.latent)
            cells = zdf.iloc[:, 0].astype(str).tolist()
            theta = zdf.iloc[:, 1:].to_numpy(np.float32)
            if args.velocity is not None:
                vel = pd.read_parquet(args.velocity).iloc[:, 1:].to_numpy(
                    np.float32)
            prefix = prefix or os.path.splitext(args.latent)[0]
        res = run_lineage(
            prefix, args.out,
            theta=theta, velocity=vel, cell_names=cells,
            theta_from=args.theta_from,
            latent_geometry=args.latent_geometry,
            n_centroids=args.n_centroids, seed=args.seed,
            kmeans_iter=args.kmeans_iter,
            cluster_space=args.cluster_space,
            no_edge_direction=args.no_edge_direction,
            no_orient_velocity=args.no_orient_velocity,
            edge_cand_knn=args.edge_cand_knn,
            edge_direction_n_boot=args.edge_direction_n_boot,
            edge_direction_n_perm=args.edge_direction_n_perm,
            edge_alpha=args.edge_alpha,
            edge_min_cells=args.edge_min_cells,
            root_affinity=args.root_affinity,
            root_type=args.root_type,
            root_from_gem=args.root_from_gem,
            root_node=args.root_node, root_cell=args.root_cell,
            curve_bandwidth=args.curve_bandwidth,
            curve_resolution=args.curve_resolution,
            max_iter=args.max_iter, tol=args.tol,
            markers=args.markers,
            marker_num_perm=args.marker_num_perm,
            marker_obo=args.marker_obo,
            marker_label_cl=args.marker_label_cl,
            no_bootstrap_markers=args.no_bootstrap_markers,
            marker_n_boot=args.marker_n_boot,
            marker_min_support=args.marker_min_support,
            layout=args.layout, layout_space=args.layout_space,
            layout_pcs=args.layout_pcs,
            velocity_aware_layout=args.velocity_aware_layout,
            phate_knn=args.phate_knn, phate_t=args.phate_t,
            phate_landmarks=args.phate_landmarks,
        )
        print(
            f"lineage: {res['n_trees']} tree(s), {res['n_lineages']} "
            f"lineage(s), {res['edges_called']}/{res['edges_total']} edges "
            f"oriented, roots {res['roots']}"
        )
    elif args.cmd == "dyn-assoc":
        import pandas as pd

        from ..data.sparse_io import open_sparse_matrix
        from ..faba.assoc import dyn_assoc, dyn_assoc_pseudotime

        if args.branches is None and args.frm is None:
            raise SystemExit("dyn-assoc: need --from PREFIX or --branches")
        branches_path = args.branches or f"{args.frm}.pseudotime.parquet"
        out_prefix = args.output or args.frm
        if out_prefix is None:
            raise SystemExit("dyn-assoc: need --output (or --from)")
        args.output = out_prefix
        # multi-backend: rows concatenate over one shared cell axis
        counts_parts, site_names, cells = [], [], None
        for path in args.backend.split(","):
            be = open_sparse_matrix(path)
            mat = np.asarray(
                be.read_columns_csc(np.arange(be.num_columns)).todense()
            )
            names = list(be.row_names())
            if args.modality:
                keep = [
                    i for i, nme in enumerate(names)
                    if f"/{args.modality.lower()}/" in f"/{str(nme).lower()}/"
                ]
                mat = mat[keep]
                names = [names[i] for i in keep]
            if cells is None:
                cells = be.column_names()
            elif list(be.column_names()) != list(cells):
                raise SystemExit(
                    f"dyn-assoc: {path} has a different cell axis"
                )
            counts_parts.append(mat)
            site_names += names
        counts = np.concatenate(counts_parts, axis=0)  # [S, N]
        keep_sites = (counts.sum(1) >= args.min_total_coverage) & (
            (counts > 0).sum(1) >= args.min_cells
        )
        if not keep_sites.all():
            counts = counts[keep_sites]
            site_names = [s for s, k in zip(site_names, keep_sites) if k]
        lab = pd.read_parquet(branches_path)
        lab = lab.set_index(lab.columns[0]).reindex(cells)
        exposure_sm = None  # per-(site, cell) trials when row-aligned
        if args.exposure:
            ex_be = open_sparse_matrix(args.exposure)
            ex_mat = np.asarray(
                ex_be.read_columns_csc(np.arange(ex_be.num_columns)).todense()
            )
            if ex_mat.shape[0] == len(keep_sites):
                # site-aligned coverage backend: keep the per-site rows
                # for the GAM's binomial denominators (trend.rs bd.n)
                exposure_sm = ex_mat[keep_sites]
            exposure = ex_mat.sum(0)
        else:
            exposure = counts.sum(0) + 1.0
        branch_col = next((c for c in ("branch", "state") if c in lab.columns), None)

        if args.trend_method != "bayes":
            # frequentist within-branch spline GAM (assoc/gam.rs via
            # trend.rs): per-branch when a branch column exists, one
            # whole-trajectory fit otherwise
            from ..faba.gam import gam_association_batch

            if "pseudotime" not in lab.columns:
                raise SystemExit(
                    "dyn-assoc --trend-method quasi|binomial needs a "
                    "pseudotime column in --branches"
                )
            x_all = lab["pseudotime"].to_numpy(np.float64)
            n_all = (
                exposure_sm
                if exposure_sm is not None
                else np.broadcast_to(exposure[None, :], counts.shape)
            )
            branch_labels = (
                lab[branch_col].to_numpy()
                if branch_col is not None
                else np.zeros(len(x_all), np.int64)
            )
            rows = []
            for b in np.unique(branch_labels):
                sel = (branch_labels == b) & np.isfinite(x_all)
                fit = gam_association_batch(
                    counts[:, sel], n_all[:, sel], x_all[sel],
                    n_knots=args.n_knots,
                    overdispersion=args.trend_method == "quasi",
                )
                if fit is None:
                    continue
                rows.append(
                    pd.DataFrame(
                        {
                            "site": site_names,
                            "branch": b,
                            "n_cells": fit["n_obs"],
                            "stat": fit["stat"],
                            "effect": fit["effect"],
                            "dispersion": fit["dispersion"],
                            "pvalue": fit["pvalue"],
                        }
                    )[fit["ok"]]
                )
            if not rows:
                raise SystemExit("dyn-assoc: no branch supports a spline fit")
            df = pd.concat(rows, ignore_index=True)
            if args.fdr_alpha > 0:
                from ..ops.enrichment import bh_fdr

                df["qvalue"] = bh_fdr(df["pvalue"].to_numpy())
                df["significant"] = df["qvalue"] <= args.fdr_alpha
            df.to_parquet(f"{args.output}.assoc.parquet")
            print(f"wrote {args.output}.assoc.parquet ({len(df)} trends)")
            return

        a0 = b0 = 1.0 / max(args.prior_sd, 1e-3) ** 2
        if branch_col is not None:
            out = dyn_assoc(
                counts, exposure, lab[branch_col].to_numpy(), a0=a0, b0=b0
            )
            df = pd.DataFrame(
                {
                    "site": site_names,
                    "branch": out["branch"],
                    "log_fold_change": out["log_fold_change"],
                    "z": out["z"],
                    "log_bf": out["log_bf"],
                    "pvalue": out["pvalue"],
                }
            )
            if args.cell_membership and not args.no_celltype:
                # cell-type-level report (AssocArgs cell_membership):
                # the same branch contrast restricted to each type's
                # cells, one table row per (site, cell_type)
                memb = {}
                with open(args.cell_membership) as f:
                    for ln in f:
                        parts = ln.split()
                        if len(parts) >= 2:
                            memb[parts[0]] = parts[1]
                ct = np.asarray(
                    [memb.get(str(c), "") for c in cells], object
                )
                blab = lab[branch_col].to_numpy()
                ct_rows = []
                for t in sorted(set(ct) - {""}):
                    sel = ct == t
                    if len(np.unique(blab[sel])) < 2 or sel.sum() < 4:
                        continue
                    o = dyn_assoc(
                        counts[:, sel], exposure[sel], blab[sel],
                        a0=a0, b0=b0,
                    )
                    ct_rows.append(pd.DataFrame({
                        "site": site_names, "cell_type": t,
                        "branch": o["branch"],
                        "log_fold_change": o["log_fold_change"],
                        "z": o["z"], "pvalue": o["pvalue"],
                    }))
                if ct_rows:
                    pd.concat(ct_rows, ignore_index=True).to_parquet(
                        f"{args.output}.assoc.celltype.parquet"
                    )
                    print(f"wrote {args.output}.assoc.celltype.parquet")
        else:
            pt_col = "pseudotime" if "pseudotime" in lab.columns else lab.columns[0]
            out = dyn_assoc_pseudotime(
                counts, exposure, lab[pt_col].to_numpy(),
                n_windows=args.n_bins,
            )
            df = pd.DataFrame(
                {
                    "site": site_names,
                    "slope": out["slope"],
                    "z": out["z"],
                    "pvalue": out["pvalue"],
                }
            )
        if args.fdr_alpha > 0:
            from ..ops.enrichment import bh_fdr

            df["qvalue"] = bh_fdr(df["pvalue"].to_numpy())
            df["significant"] = df["qvalue"] <= args.fdr_alpha
        df.to_parquet(f"{args.output}.assoc.parquet")
        print(f"wrote {args.output}.assoc.parquet ({len(df)} sites)")
    elif args.cmd in ("pileup", "inspect"):
        import pandas as pd

        if args.data:
            _run_faba_pileup_tracks(args)
            return
        if not args.miami and not (args.bam and args.sites and args.output):
            raise SystemExit(
                "pileup: give --data (matrix-track mode), --miami "
                "(figure mode), or --bam/--sites/--output "
                "(base-composition mode)"
            )
        if args.miami:
            from ..faba.bam import read_bam
            from ..utils.plot import miami_pileup

            if not args.region:
                raise SystemExit("pileup --miami needs --region chr:lb-ub")
            chrom, span = args.region.rsplit(":", 1)
            lb, ub = (int(x) for x in span.replace(",", "").split("-"))
            df = pd.read_parquet(args.sites)
            insel = (
                (df["chrom"].astype(str) == chrom)
                & (df["pos"] >= lb) & (df["pos"] <= ub)
            )
            sel = df[insel]
            stat_cols = [
                c for c in sel.columns
                if c not in ("chrom", "pos", "strand")
                and pd.api.types.is_numeric_dtype(sel[c])
            ]
            vals = (
                sel[stat_cols[0]].to_numpy(float)
                if stat_cols else np.ones(len(sel))
            )
            reads = read_bam(args.bam)
            rmap = {n: i for i, n in enumerate(reads.ref_names)}
            rid = rmap.get(chrom, -1)
            m = (
                (reads.ref_id == rid)
                & (reads.end_pos >= lb) & (reads.pos <= ub)
            )
            bins = np.linspace(lb, ub, 800)
            facet_names = None
            if args.cell_membership:
                memb = {}
                bc_col = args.membership_barcode_col
                ty_col = args.membership_celltype_col
                with open(args.cell_membership) as f:
                    for ln in f:
                        parts = ln.split()
                        if len(parts) > max(bc_col, ty_col):
                            memb[parts[bc_col]] = parts[ty_col]
                facet_names = sorted(set(memb.values()))
                fidx = {t: i for i, t in enumerate(facet_names)}
                cb_facet = np.full(len(reads.barcodes), -1, np.int64)
                for bi, bc in enumerate(reads.barcodes):
                    t = memb.get(bc)
                    if t is not None:
                        cb_facet[bi] = fidx[t]
                depth = np.zeros((len(facet_names), len(bins)))
                read_facet = np.where(
                    reads.cb_id[m] >= 0, cb_facet[reads.cb_id[m]], -1
                )
                for rf, rs, re_ in zip(
                    read_facet, reads.pos[m], reads.end_pos[m]
                ):
                    if rf < 0:
                        continue
                    i0 = np.searchsorted(bins, max(rs, lb))
                    i1 = np.searchsorted(bins, min(re_, ub))
                    depth[rf, i0:i1] += 1
            else:
                depth = np.zeros(len(bins))
                for rs, re_ in zip(reads.pos[m], reads.end_pos[m]):
                    i0 = np.searchsorted(bins, max(rs, lb))
                    i1 = np.searchsorted(bins, min(re_, ub))
                    depth[i0:i1] += 1
            gene_rows = []
            if args.gff:
                from ..faba.genes import parse_gff_genes

                model = parse_gff_genes(args.gff)
                cidx = (
                    model.chrom_names.index(chrom)
                    if chrom in model.chrom_names else -1
                )
                for gi in range(len(model.names)):
                    if (
                        model.chrom[gi] == cidx
                        and model.end[gi] >= lb and model.start[gi] <= ub
                    ):
                        gene_rows.append((
                            model.names[gi], int(model.start[gi]),
                            int(model.end[gi]), int(model.strand[gi]),
                        ))
            miami_pileup(
                sel["pos"].to_numpy(), vals, bins, depth, gene_rows,
                args.miami, title=args.region, facet_names=facet_names,
            )
            print(
                f"wrote {args.miami} ({len(sel)} sites, "
                f"{int(m.sum())} reads, {len(gene_rows)} genes)"
            )
            return

        from ..faba.bam import read_bam
        from ..faba.context import pileup_at_sites, read_fasta

        reads = read_bam(args.bam)
        df = pd.read_parquet(args.sites)
        rmap = {n: i for i, n in enumerate(reads.ref_names)}
        rid = df["chrom"].astype(str).map(rmap).to_numpy()
        fasta = read_fasta(args.fasta) if args.fasta else None
        pu = pileup_at_sites(
            reads, rid, df["pos"].to_numpy(), flank=args.flank, fasta=fasta
        )
        out = pd.DataFrame(pu["counts"], columns=pu["channels"])
        out["offset"] = pu["offsets"]
        out.to_parquet(f"{args.output}.pileup.parquet")
        print(f"wrote {args.output}.pileup.parquet (mismatch records: {pu['n_mismatch']})")


def _run_apa_cmd(args):
    """`faba apa` dispatch: SCAPE mixture (default) with a logged
    fallback to the simple pileup path when no 3'UTR regions are
    derivable (run.rs:665-700 method dispatch)."""
    import logging

    import pandas as pd

    from ..data.sparse_io import create_sparse_from_csc

    log = logging.getLogger(__name__)
    bam_paths = [b for b in args.bam.split(",") if b]

    method = args.method
    utrs_available = bool(args.utr_bed)
    if method == "mixture" and not utrs_available and args.gff:
        from ..faba.apa_mixture import build_utr_regions_from_gff

        utrs_available = len(build_utr_regions_from_gff(args.gff)) > 0
    if method == "mixture" and not utrs_available:
        log.warning(
            "apa: no 3'UTR regions derivable from the GFF (no "
            "three_prime_UTR or CDS rows) and no --utr-bed; falling "
            "back to --method simple"
        )
        method = "simple"

    if method == "mixture":
        from ..faba.apa_mixture import ScapeParams, load_valid_set, run_apa_mixture

        params = ScapeParams(
            mu_f=args.mu_f, sigma_f=args.sigma_f, theta_step=args.theta_step,
            min_ws=args.min_ws, skirt_eta=args.skirt_eta,
            skirt_mult=args.skirt_mult, merge_beta_mult=args.merge_beta_mult,
            apa_max_sites=args.apa_max_sites,
            min_coverage=max(args.min_reads, 1),
            merge_distance=args.merge_distance,
            min_beta=args.min_beta, max_beta=args.max_beta,
            min_fragments=args.min_fragments,
            min_utr_length=args.min_utr_length,
            # 0 = unset on the shared flag; the mixture default is 10
            polya_min_tail_length=args.polya_min_tail_length or 10,
            polya_max_non_at=args.polya_max_non_a_or_t,
            internal_prime_window=args.polya_internal_prime_window,
            internal_prime_count=args.polya_internal_prime_count,
            min_mapq=args.min_mapq,
        )
        genome_seqs = None
        if args.genome:
            from ..faba.context import read_fasta

            genome_seqs = read_fasta(args.genome)
        pre = None
        if args.pre_sites:
            import numpy as np

            pre = {}
            with open(args.pre_sites) as f:
                for line in f:
                    t = line.split()
                    if len(t) >= 4:
                        pre.setdefault(t[3], []).append(float(t[1]))
            pre = {k: np.asarray(v) for k, v in pre.items()}
        res = run_apa_mixture(
            bam_paths, args.gff,
            utr_bed=args.utr_bed, params=params, pre_sites=pre,
            atoi_mask=args.atoi_mask, snp_mask=args.snp_mask,
            valid_cells=load_valid_set(args.valid_cells) if args.valid_cells else None,
            valid_genes=load_valid_set(args.valid_genes) if args.valid_genes else None,
            skip_gene_qc=args.skip_gene_qc,
            gene_min_cells=args.gene_min_cells,
            gene_min_counts=args.gene_min_counts,
            cell_min_genes=args.cell_min_genes,
            no_umi_dedup=args.no_umi_dedup,
            write_mixture=args.write_mixture,
            apa_em_pdui=args.apa_em_pdui,
            compute_pdui=args.compute_pdui,
            drop_single_component=args.drop_single_component,
            genome_seqs=genome_seqs,
        )

        import numpy as np

        def _squeeze(mat, rows, cols):
            # row/column nnz cutoffs (run.rs qc_cutoffs via SqueezeCutoffs)
            csr = mat.tocsr()
            keep_r = np.diff(csr.indptr) >= args.row_nnz_cutoff
            csc = csr[keep_r].tocsc()
            keep_c = np.diff(csc.indptr) >= args.column_nnz_cutoff
            out = csc[:, keep_c]
            return (
                out,
                [r for r, k in zip(rows, keep_r) if k],
                [c for c, k in zip(cols, keep_c) if k],
            )

        multi = len(bam_paths) > 1
        wrote = []
        if args.compute_pdui and res.pdui_names:
            for b, mat in enumerate(res.pdui):
                tag = f".{b}" if multi else ""
                path = f"{args.output}{tag}.apa.zarr"
                m, rn, cn = _squeeze(mat, res.pdui_names, res.barcodes[b])
                if not m.shape[0]:
                    continue
                create_sparse_from_csc(m, path, rn, cn)
                wrote.append(path)
        if args.write_mixture and res.mixture is not None and res.mixture_names:
            for b, mat in enumerate(res.mixture):
                tag = f".{b}" if multi else ""
                path = f"{args.output}{tag}.apa_mixture.zarr"
                m, rn, cn = _squeeze(mat, res.mixture_names, res.barcodes[b])
                if not m.shape[0]:
                    continue
                create_sparse_from_csc(m, path, rn, cn)
                wrote.append(path)
        res.annotations.to_parquet(f"{args.output}.apa_sites.parquet")
        wrote.append(f"{args.output}.apa_sites.parquet")
        print(
            f"apa mixture: {len(res.annotations)} sites, wrote "
            + ", ".join(wrote)
        )
        return

    from ..faba.apa import run_apa

    apa = run_apa(
        bam_paths[0], args.gff,
        min_mapq=args.min_mapq, peak_window=args.peak_window,
        min_reads=args.min_reads,
        polya_min_tail_length=args.polya_min_tail_length,
        polya_max_non_at=args.polya_max_non_a_or_t,
        utr_bed=args.utr_bed,
    )
    if apa.counts.shape[0]:
        create_sparse_from_csc(
            apa.counts, f"{args.output}.zarr", apa.site_names, apa.barcodes
        )
    if args.compute_pdui_triplets:
        from ..faba.apa import compute_pdui

        gg, cc2, vv = compute_pdui(apa)
        pd.DataFrame(
            {"gene": gg, "cell": cc2, "pdui": vv}
        ).to_parquet(f"{args.output}.pdui.parquet")
        print(f"wrote {args.output}.pdui.parquet ({len(vv)} gene-cell pairs)")
    pd.DataFrame(
        {"gene": list(apa.distal_index),
         "distal_usage": list(apa.distal_index.values())}
    ).to_parquet(f"{args.output}.distal.parquet")
    print(
        f"wrote {args.output}.zarr ({apa.counts.shape[0]} PAS sites) "
        f"+ .distal.parquet"
    )


def _run_genes_one(args, bam_path, out_prefix, gsfx):
    """One batch of `faba genes` (gene_count/run.rs per-BAM loop):
    count, optional gene/mito QC, nnz cutoffs, backend write."""
    from ..data.sparse_io import create_sparse_from_csc
    from ..faba.genes import count_genes, count_genes_spliced

    if args.splice:
        s, u, genes, barcodes = count_genes_spliced(
            bam_path, args.gff,
            min_mapq=args.min_mapq, dedup_umi=not args.no_dedup,
        )
        create_sparse_from_csc(
            s, f"{out_prefix}.spliced{gsfx}", genes, barcodes)
        create_sparse_from_csc(
            u, f"{out_prefix}.unspliced{gsfx}", genes, barcodes)
        print(
            f"wrote backends: {out_prefix}.spliced / .unspliced "
            f"({s.nnz} spliced, {u.nnz} unspliced entries)"
        )
        return
    counts, genes, barcodes = count_genes(
        bam_path, args.gff, min_mapq=args.min_mapq,
        dedup_umi=not args.no_dedup, gene_type=args.gene_type,
        cb_tag=args.cell_barcode_tag, umi_tag=args.umi_tag,
    )
    if args.gene_qc and not args.skip_gene_qc:
        import pandas as pd

        from ..faba.cell_calling import gene_qc_masks, mito_qc
        from ..faba.genes import parse_gff_genes

        model = parse_gff_genes(args.gff, gene_type=args.gene_type)
        gene_chroms = [model.chrom_names[i] for i in model.chrom]
        mito_gene, mt_frac, mito_cell = mito_qc(
            counts, gene_chroms, mito_chr=args.mito_chr,
            keep_mito=args.keep_mito, max_mito_frac=args.max_mito_frac,
            no_mito_cell_qc=args.no_mito_cell_qc,
        )
        gk, ck = gene_qc_masks(
            counts, gene_min_cells=args.gene_min_cells,
            gene_min_counts=args.gene_min_counts,
            cell_min_genes=args.cell_min_genes,
        )
        gk &= mito_gene
        ck &= mito_cell
        pd.DataFrame(
            {
                "cell": barcodes,
                "total": np.asarray(counts.sum(axis=0)).ravel(),
                "n_genes": np.asarray((counts > 0).sum(axis=0)).ravel(),
                "mito_frac": mt_frac,
                "keep": ck,
            }
        ).to_parquet(f"{out_prefix}.cell_qc.parquet")
        print(
            f"gene qc: {int(gk.sum())}/{len(genes)} genes, "
            f"{int(ck.sum())}/{len(barcodes)} cells kept"
        )
        counts = counts[gk][:, ck]
        genes = [g for g, k in zip(genes, gk) if k]
        barcodes = [b for b, k in zip(barcodes, ck) if k]
    if args.row_nnz_cutoff > 0 or args.column_nnz_cutoff > 0:
        # output squeeze (GeneCountArgs row/column nnz cutoffs)
        csc = counts.tocsc()
        gk = np.asarray((csc > 0).sum(axis=1)).ravel() >= args.row_nnz_cutoff
        ck = np.asarray((csc > 0).sum(axis=0)).ravel() >= args.column_nnz_cutoff
        counts = csc[gk][:, ck]
        genes = [g for g, k in zip(genes, gk) if k]
        barcodes = [b for b, k in zip(barcodes, ck) if k]
    create_sparse_from_csc(counts, f"{out_prefix}{gsfx}", genes, barcodes)
    print(f"wrote backend: {out_prefix}{gsfx} "
          f"({counts.shape[0]} genes x {counts.shape[1]} cells)")


def _run_faba_pileup_tracks(args):
    """`faba pileup --data`: the reference's original matrix-track
    pileup (pileup.rs run_pileup, non-figure path): select positions
    from the backends' locus-keyed rows by gene span or region,
    aggregate per position (`--signal`), bin along the span, print the
    ASCII histogram and/or write the TSV. An optional `--sites`
    parquet adds the second track (`--site-signal`)."""
    import pandas as pd

    from ..data.sparse_io import open_sparse_matrix

    if not args.genes and not args.regions:
        raise SystemExit("pileup --data needs --genes or --regions")
    spans = []  # (chrom, lb, ub, label)
    if args.regions:
        for reg in args.regions.split(","):
            chrom, rng = reg.rsplit(":", 1)
            lb, ub = (int(x) for x in rng.replace(",", "").split("-"))
            spans.append((chrom, lb, ub, reg))
    if args.genes:
        if not args.gff:
            raise SystemExit(
                "pileup --genes needs --gff: matrix rows key by locus "
                "({chr}:{pos}/...), so gene symbols resolve via the "
                "gene model (declared divergence from the reference's "
                "gene-keyed rows)"
            )
        from ..faba.genes import parse_gff_genes

        model = parse_gff_genes(args.gff)
        want = {g.strip() for g in args.genes.split(",")}
        for gi, name in enumerate(model.names):
            if name in want:
                spans.append((
                    model.chrom_names[int(model.chrom[gi])],
                    int(model.start[gi]), int(model.end[gi]), name,
                ))
                want.discard(name)
        if want:
            raise SystemExit(f"genes not in the GFF: {sorted(want)}")

    mods = (
        {m.strip().lower() for m in args.modalities.split(",")}
        if args.modalities else None
    )
    # gather (pos, value) per span from every backend
    positions, values = [], []
    for path in args.data.split(","):
        be = open_sparse_matrix(path)
        names = be.row_names()
        rows = []
        metas = []
        for ri, name in enumerate(names):
            head, *rest = str(name).split("/")
            if mods is not None and not any(
                r.lower() in mods for r in rest
            ):
                continue
            if ":" not in head:
                continue
            chrom, _, ptxt = head.rpartition(":")
            try:
                pos = int(ptxt)
            except ValueError:
                continue
            for sc, lb, ub, label in spans:
                if chrom == sc and lb <= pos <= ub:
                    rows.append(ri)
                    metas.append((pos, label))
                    break
        if not rows:
            continue
        sub = be.read_columns_csc(np.arange(be.num_columns))[rows]
        row_sum = np.asarray(sub.sum(axis=1)).ravel()
        row_nnz = np.asarray((sub > 0).sum(axis=1)).ravel()
        for (pos, label), s, nz in zip(metas, row_sum, row_nnz):
            v = {
                "sum": s, "nnz": nz, "log10-sum": np.log10(1.0 + s)
            }[args.signal]
            positions.append(pos)
            values.append(v)
    positions = np.asarray(positions, np.int64)
    values = np.asarray(values, np.float64)

    lo = min(lb for _, lb, _, _ in spans)
    hi = max(ub for _, _, ub, _ in spans)
    nb = min(args.bins, max(len(np.unique(positions)), 1))
    edges = np.linspace(lo, hi + 1, nb + 1)
    tracks = []
    if len(positions):
        idx = np.clip(np.searchsorted(edges, positions, "right") - 1,
                      0, nb - 1)
        hist = np.zeros(nb)
        np.add.at(hist, idx, values)
        tracks.append(("matrix", args.signal, hist))
    if args.sites:
        df = pd.read_parquet(args.sites)
        insel = np.zeros(len(df), bool)
        ch = df["chrom"].astype(str).to_numpy()
        pp = df["pos"].to_numpy()
        for sc, lb, ub, _ in spans:
            insel |= (ch == sc) & (pp >= lb) & (pp <= ub)
        sel = df[insel]
        col = {
            "count": None,
            "wt-coverage": next(
                (c for c in sel.columns if "cov" in c.lower()
                 or c in ("wt_coverage", "coverage")), None),
            "mut-coverage": next(
                (c for c in sel.columns if "alt" in c.lower()
                 or "mut" in c.lower() or "converted" in c.lower()),
                None),
            "neglog10pv": next(
                (c for c in sel.columns if "pvalue" in c.lower()
                 or c == "p"), None),
        }[args.site_signal]
        sv = (
            np.ones(len(sel)) if col is None
            else (-np.log10(np.maximum(sel[col].to_numpy(float), 1e-300))
                  if args.site_signal == "neglog10pv"
                  else sel[col].to_numpy(float))
        )
        idx = np.clip(
            np.searchsorted(edges, sel["pos"].to_numpy(), "right") - 1,
            0, nb - 1,
        )
        hist = np.zeros(nb)
        np.add.at(hist, idx, sv)
        tracks.append(("sites", args.site_signal, hist))
    if not tracks:
        raise SystemExit("pileup: no matrix rows or sites in the "
                         "selected span")

    if not args.quiet:
        for label, signal, hist in tracks:
            peak = hist.max() or 1.0
            h = args.plot_height
            print(f"# {label} ({signal}) over {lo}-{hi}")
            for level in range(h, 0, -1):
                line = "".join(
                    "#" if hist[b] / peak * h >= level - 0.5 else " "
                    for b in range(nb)
                )
                print(f"{'':>2}|{line}")
            print(f"  +{'-' * nb}")
    if args.output:
        out_rows = []
        for label, signal, hist in tracks:
            for b in range(nb):
                out_rows.append({
                    "track": label, "signal": signal, "bin": b,
                    "lb": edges[b], "ub": edges[b + 1],
                    "value": hist[b],
                })
        pd.DataFrame(out_rows).to_csv(args.output, sep="\t", index=False)
        print(f"wrote pileup TSV to {args.output}")


def _run_faba_annotate(args):
    """`faba annotate --from PREFIX`: the reference's gem-prefix
    annotator (annotate/run.rs run_annotate). Projection mode scores
    the co-embedded feature rows against the cell table per track;
    enrichment mode routes through the topic dictionary + θ."""
    import pandas as pd

    from ..faba.annotate import (
        UNASSIGNED,
        annotate_enrichment,
        annotate_projection,
        resolve_mode,
    )

    if args.frm is None:
        raise SystemExit("faba annotate: need --from PREFIX (or the "
                         "legacy --backend/--clusters pair)")
    prefix = args.frm
    out = args.out or prefix
    mode = resolve_mode(prefix, args.mode)

    def read_tbl(path):
        df = pd.read_parquet(path)
        return (df.iloc[:, 0].astype(str).tolist(),
                df.iloc[:, 1:].to_numpy(np.float32))

    if mode == "enrichment":
        if args.track == "velocity":
            raise SystemExit(
                "--track velocity does not apply to --mode enrichment: "
                "the velocity is a displacement, not a membership on "
                "the simplex. Use --track nascent (the nascent PROGRAM) "
                "— reading it against spliced is the well-posed form "
                "of the same question."
            )
        ignored = [
            f for f, on in [
                ("--panel-perm", args.panel_perm > 0),
                ("--support-perm", args.support_perm > 0),
                ("--obo", args.obo is not None),
                ("--label-cl", args.label_cl is not None),
                ("--no-assign-qc", args.no_assign_qc),
            ] if on
        ]
        if ignored:
            raise SystemExit(
                "these flags belong to --mode projection and do "
                f"nothing under --mode enrichment: {', '.join(ignored)}"
            )
        tracks = {
            "spliced": [("", "")],
            "nascent": [(".nascent", "_nascent")],
            "both": [("", ""), (".nascent", "_nascent")],
        }[args.track]
        for tag_sfx, tbl_sfx in tracks:
            dic_path = f"{prefix}.dictionary{tbl_sfx}.parquet"
            lat_path = f"{prefix}.latent{tbl_sfx}.parquet"
            if not (os.path.exists(dic_path) and os.path.exists(lat_path)):
                if args.track == "both" and tbl_sfx:
                    print(f"nascent track skipped: missing {dic_path} "
                          f"and/or {lat_path}")
                    continue
                raise SystemExit(f"--mode enrichment needs {dic_path} + "
                                 f"{lat_path} (a topic-model run)")
            genes, log_beta = read_tbl(dic_path)
            cells, log_theta = read_tbl(lat_path)
            pb_gene = pb_log_theta = None
            pbg = f"{prefix}.pb_gene{tbl_sfx}.parquet"
            pbl = f"{prefix}.pb_latent{tbl_sfx}.parquet"
            if os.path.exists(pbg) and os.path.exists(pbl):
                _, pb_gene = read_tbl(pbg)
                _, pb_log_theta = read_tbl(pbl)
            res = annotate_enrichment(
                log_beta, genes, log_theta, cells, args.markers,
                min_markers=args.min_markers,
                min_panel_coverage=args.min_panel_coverage,
                n_perm=args.num_perm, fdr_alpha=args.fdr_alpha,
                q_temperature=args.q_temperature, seed=args.seed,
                bootstrap=not args.no_bootstrap_markers,
                n_boot=args.n_boot, min_support=args.min_support,
                pb_gene=pb_gene, pb_log_theta=pb_log_theta,
            )
            tag = f"enrichment{tag_sfx}"
            pd.DataFrame({
                "cell": cells, "annotation": res["cell_labels"],
                "score": res["cell_scores"].max(1),
            }).to_parquet(f"{out}.{tag}.annotation.parquet")
            fac = {
                "factor": [f"t{k}" for k in range(len(res["factor_call"]))],
                "call": res["factor_call"],
            }
            if res["factor_support"] is not None:
                fac["support"] = res["factor_support"]
            pd.DataFrame(fac).to_parquet(f"{out}.{tag}.factors.parquet")
            pd.DataFrame(
                res["qmatrix"], columns=res["labels"],
            ).assign(factor=fac["factor"]).to_parquet(
                f"{out}.{tag}.qmatrix.parquet")
            n_called = sum(lab != UNASSIGNED for lab in res["cell_labels"])
            print(f"wrote {out}.{tag}.* ({n_called}/{len(cells)} cells "
                  "annotated)")
        return

    # --mode projection
    if args.track == "nascent":
        raise SystemExit(
            "--track nascent applies to --mode enrichment, not "
            "projection; projection's unspliced side is --track velocity"
        )
    fe_path = f"{prefix}.feature_embedding.parquet"
    if not os.path.exists(fe_path):
        raise SystemExit(f"--mode projection needs {fe_path} "
                         "(run `faba gem` to produce it)")
    feat_names, feat = read_tbl(fe_path)

    def modality_rows(suffix):
        keep = [i for i, n in enumerate(feat_names) if n.endswith(suffix)]
        genes = [feat_names[i][: -len(suffix)] for i in keep]
        return genes, feat[keep]

    ce_path = f"{prefix}.cell_embedding.parquet"
    if not os.path.exists(ce_path):
        ce_path = f"{prefix}.latent.parquet"
    specs = []
    if args.track in ("spliced", "both"):
        specs.append(("/count/spliced", ce_path, "spliced"))
    if args.track in ("velocity", "both"):
        vpath = f"{prefix}.velocity.parquet"
        if os.path.exists(vpath):
            specs.append(("/count/unspliced", vpath, "velocity"))
        elif args.track == "velocity":
            raise SystemExit("--track velocity requested but "
                             f"{vpath} is absent")
        else:
            print(f"velocity track skipped: missing {vpath}")
    for mod_suffix, cell_path, tag in specs:
        genes, gene_emb = modality_rows(mod_suffix)
        if not genes:
            if tag == "velocity":
                print("velocity track skipped: no unspliced feature rows")
                continue
            raise SystemExit(f"{fe_path} has no `{mod_suffix}` rows")
        cells, cell_emb = read_tbl(cell_path)
        res = annotate_projection(
            gene_emb, genes, cell_emb, cells, args.markers,
            use_idf=not args.no_idf, min_markers=args.min_markers,
            min_panel_coverage=args.min_panel_coverage,
            knn=args.knn, resolution=args.resolution, seed=args.seed,
            n_perm=args.num_perm, assign_qc=not args.no_assign_qc,
            assign_mad=args.assign_mad, fdr_alpha=args.fdr_alpha,
            q_temperature=args.q_temperature,
            panel_perm=args.panel_perm, support_perm=args.support_perm,
            bootstrap=not args.no_bootstrap_markers, n_boot=args.n_boot,
            recluster=not args.no_recluster,
            min_support=args.min_support,
            abstain_separable=args.abstain_separable,
            abstain_alpha=args.abstain_alpha,
            set_coverage=args.set_coverage,
            max_set_size=args.max_set_size,
            obo=args.obo, label_cl=args.label_cl,
            ontology_fdr_q=args.ontology_fdr_q,
            ontology_by=args.ontology_by,
        )
        c_ids = list(np.unique(res.clusters))
        cl_of = {c: i for i, c in enumerate(c_ids)}
        cell_label = [
            res.cluster_call[cl_of[c]] for c in res.clusters
        ]
        pd.DataFrame({
            "cell": cells,
            "cluster": res.clusters,
            "assigned_type": [
                res.type_names[a] if a >= 0 else UNASSIGNED
                for a in res.cell_assign
            ],
            "assign_dist": res.assign_dist,
            "annotation": cell_label,
        }).to_parquet(f"{out}.{tag}.annotation.parquet")
        cl_tbl = {
            "cluster": c_ids,
            "call": res.cluster_call,
            "p": res.cluster_p, "q": res.cluster_q,
        }
        if res.support is not None:
            cl_tbl["label_support"] = res.support
            cl_tbl["label_set"] = res.label_sets
        if res.support_p is not None:
            cl_tbl["support_p"] = res.support_p
        pd.DataFrame(cl_tbl).to_parquet(f"{out}.{tag}.clusters.parquet")
        pd.DataFrame(
            res.qmatrix, columns=res.type_names,
        ).assign(cluster=c_ids).to_parquet(f"{out}.{tag}.qmatrix.parquet")
        if res.panel_bias_p is not None:
            pd.DataFrame({
                "type": res.type_names, "panel_bias_p": res.panel_bias_p,
            }).to_parquet(f"{out}.{tag}.panel_bias.parquet")
        if res.ontology_q:
            pd.DataFrame({
                "term": list(res.ontology_q),
                "q": list(res.ontology_q.values()),
            }).to_parquet(f"{out}.{tag}.ontology.parquet")
        n_ann = sum(lab != UNASSIGNED for lab in cell_label)
        print(f"wrote {out}.{tag}.* ({n_ann}/{len(cells)} cells annotated, "
              f"{len(c_ids)} clusters)")


def _run_faba_plot(args):
    """`faba plot`: render a lineage fit — {from}.pseudotime + the
    forest backbone — over a 2D layout of the cell latent (reference
    `faba/src/plot/mod.rs` role; matplotlib instead of the SVG layer
    stack). Reads the reference-schema tables ({from}.nodes/.edges/
    .trees, and {from}.cells_2d when the lineage already laid out);
    falls back to the legacy .lineage_nodes/.lineage_edges pair."""
    import pandas as pd

    from ..utils.plot import trajectory_figure

    zdf = pd.read_parquet(args.latent)
    cells = zdf.iloc[:, 0].astype(str).to_numpy()
    z = zdf.iloc[:, 1:].to_numpy(np.float32)
    pt = pd.read_parquet(f"{args.frm}.pseudotime.parquet")
    pt = pt.set_index(pt.columns[0]).reindex(cells)
    if os.path.exists(f"{args.frm}.nodes.parquet"):
        nodes_df = pd.read_parquet(f"{args.frm}.nodes.parquet")
        nodes = nodes_df[
            [c for c in nodes_df.columns if c.startswith("T")]
        ].to_numpy(np.float32)
        edges_df = pd.read_parquet(f"{args.frm}.edges.parquet")
        sel = edges_df[edges_df["selected"] > 0]
        edges = sel[["from", "to"]].to_numpy(np.float32).astype(np.int64)
        trees = pd.read_parquet(f"{args.frm}.trees.parquet")
        root = int(trees["root"].iloc[0])
    else:  # legacy round-2 outputs
        nodes_df = pd.read_parquet(f"{args.frm}.lineage_nodes.parquet")
        hcols = [c for c in nodes_df.columns if c.startswith("h")]
        nodes = nodes_df[hcols].to_numpy(np.float32)
        root = int(nodes_df.index[nodes_df["is_root"].to_numpy()][0]) \
            if "is_root" in nodes_df else 0
        edges_df = pd.read_parquet(f"{args.frm}.lineage_edges.parquet")
        edges = edges_df[["src", "dst"]].to_numpy(np.int64)

    if os.path.exists(f"{args.frm}.cells_2d.parquet") and args.layout == "auto":
        xy = pd.read_parquet(f"{args.frm}.cells_2d.parquet")
        coords = xy.set_index(xy.columns[0]).reindex(cells)[
            ["x", "y"]].to_numpy(np.float32)
        nxy = pd.read_parquet(f"{args.frm}.nodes_2d.parquet")
        node_xy = nxy[["x", "y"]].to_numpy(np.float32)
        _finish_faba_plot(args, coords, node_xy, edges, root, pt, cells)
        return
    if args.layout == "auto":
        args.layout = "tumap"
    if args.layout == "phate":
        from ..ops.layouts import phate

        coords = phate(z, seed=args.seed)
    elif args.layout == "tsne":
        from ..ops.layouts import tsne

        coords = tsne(z, seed=args.seed)
    else:
        from ..ops.umap import umap

        coords = umap(
            z, seed=args.seed,
            kernel="tumap" if args.layout == "tumap" else "umap",
            pcs=min(args.layout_pcs, max(z.shape[1] - 1, 0)),
        )
    coords = np.asarray(coords, np.float32)

    # node positions in layout space: mean layout coords of the cells nearest
    # each node in latent space (nodes live in latent space, the layout is
    # non-linear, so projecting through member cells is the faithful lift)
    d2 = ((z[:, None, :] - nodes[None, :, :]) ** 2).sum(-1)  # [N, M]
    assign = d2.argmin(1)
    node_xy = np.zeros((nodes.shape[0], 2), np.float32)
    for m in range(nodes.shape[0]):
        sel = assign == m
        if sel.any():
            node_xy[m] = coords[sel].mean(0)
        else:  # empty node: nearest single cell
            node_xy[m] = coords[d2[:, m].argmin()]

    _finish_faba_plot(args, coords, node_xy, edges, root, pt, cells)


def _finish_faba_plot(args, coords, node_xy, edges, root, pt, cells):
    import pandas as pd

    from ..utils.plot import trajectory_figure

    labels = None
    color = None
    if args.color_by == "label":
        if not args.annot:
            raise SystemExit("--color-by label needs --annot")
        an = pd.read_parquet(args.annot)
        an = an.set_index(an.columns[0]).reindex(cells)
        labels = an.iloc[:, 0].fillna("NA").astype(str).to_numpy()
    elif args.color_by == "celltype":
        # the lineage's own node calls, carried to cells via their
        # nearest node (plot/mod.rs coarse-label colouring)
        ta_path = f"{args.frm}.trajectory_annotation.parquet"
        if not os.path.exists(ta_path):
            raise SystemExit(
                "--color-by celltype needs the lineage run's --markers "
                f"outputs ({ta_path})"
            )
        ta = pd.read_parquet(ta_path)
        node_of = _nearest_node_of_cells(args, coords, node_xy, cells)
        labels = ta["cell_type"].to_numpy(object)[node_of]
        if not args.show_unassigned:
            keep = labels != "unassigned"
            coords, labels = coords[keep], labels[keep]
    else:
        ramp = pt.iloc[:, 0].to_numpy(np.float32)
        if args.pt_ramp == "sqrt":
            lo = np.nanmin(ramp) if np.isfinite(ramp).any() else 0.0
            color = np.sqrt(np.maximum(ramp - lo, 0.0))
        elif args.pt_ramp == "rank":
            order = np.argsort(np.nan_to_num(ramp))
            color = np.empty(len(ramp), np.float32)
            color[order] = np.arange(len(ramp), dtype=np.float32)
        else:
            color = ramp

    curves = curve_w = arrows = node_labels = None
    if args.backbone != "tree" and os.path.exists(
        f"{args.frm}.curves_2d.parquet"
    ):
        cdf = pd.read_parquet(f"{args.frm}.curves_2d.parquet")
        curves = [
            g[["x", "y"]].to_numpy(np.float32)
            for _, g in cdf.groupby("lineage", sort=True)
        ]
        wpath = f"{args.frm}.cell_lineage_weights.parquet"
        if os.path.exists(wpath):
            w = pd.read_parquet(wpath)
            curve_w = w.iloc[:, 1:].to_numpy(np.float64).sum(0)[
                : len(curves)]
    if not args.no_velocity_field and os.path.exists(
        f"{args.frm}.velocity_grid_2d.parquet"
    ):
        arrows = pd.read_parquet(
            f"{args.frm}.velocity_grid_2d.parquet"
        ).to_numpy(np.float32)
    if not args.no_type_labels and os.path.exists(
        f"{args.frm}.trajectory_annotation.parquet"
    ):
        ta = pd.read_parquet(f"{args.frm}.trajectory_annotation.parquet")
        # one label per TYPE at its best node (plot/mod.rs default)
        node_labels = []
        best: dict = {}
        for ni, (ct, conf) in enumerate(
            zip(ta["cell_type"], ta.get("confidence", [0.0] * len(ta)))
        ):
            if str(ct) == "unassigned":
                continue
            if ct not in best or conf > best[ct][1]:
                best[ct] = (ni, conf)
        node_labels = [(ni, ct) for ct, (ni, _) in best.items()]

    out = args.out or f"{args.frm}.plot.pdf"
    trajectory_figure(
        coords, node_xy, edges, root, out,
        color=color, labels=labels,
        title=f"lineage: {args.frm.rsplit('/', 1)[-1]}",
        point_size=args.point_size, alpha=args.alpha,
        width=args.width, height=args.height, dpi=args.dpi,
        label_font_size=args.label_font_size,
        curves=curves, curve_weights=curve_w,
        arrows=arrows, velocity_scale=args.velocity_scale,
        node_labels=node_labels, also_svg=args.svg,
    )
    print(f"wrote {out}")


def _nearest_node_of_cells(args, coords, node_xy, cells):
    """Cell -> nearest trajectory node in LAYOUT space (for the
    celltype colouring; the lineage's own labels live on nodes)."""
    d2 = ((coords[:, None, :] - node_xy[None, :, :]) ** 2).sum(-1)
    return d2.argmin(1)
