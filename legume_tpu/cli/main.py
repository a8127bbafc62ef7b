"""Unified CLI: `python -m legume_tpu <binary> <subcommand> ...`.

Mirrors the reference's 8 installed binaries (`Makefile:1`):
senna, pinto, cocoa, faba, chickpea, data-beans, data-beans-sim,
fagioli — each a subcommand tree (`senna/src/main.rs:140-186` etc.).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

if os.environ.get("LEGUME_CPU") == "1":
    # pin JAX to host CPU before any jax import triggers accelerator
    # discovery (overrides site-injected platform lists)
    import jax

    jax.config.update("jax_platforms", "cpu")


def _add_topic_parser(sub):
    p = sub.add_parser("topic", help="multilevel pseudobulk VAE topic model")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-files", nargs="+", default=None)
    p.add_argument("--n-latent-topics", "-k", type=int, default=10)
    p.add_argument("--encoder-layers", type=int, nargs="+", default=[128, 1024, 128])
    p.add_argument("--epochs", "-i", type=int, default=1000)
    p.add_argument("--minibatch-size", type=int, default=100)
    p.add_argument("--learning-rate", "--lr", type=float, default=0.01)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument(
        "--decoder", choices=["multinomial", "nb", "poisson", "nb-mixture"], default="nb"
    )
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
    p.add_argument("--seed", type=int, default=None)
    return p


def run_senna(argv):
    ap = argparse.ArgumentParser(prog="senna", description="embedding suite")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _add_topic_parser(sub)

    p = sub.add_parser("predict", help="held-out latent inference")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--model", required=True, help="output prefix of a senna topic run")
    p.add_argument("--out", required=True)
    p.add_argument("--block-size", type=int, default=4096)

    p = sub.add_parser("clustering", help="kmeans/leiden on a latent parquet")
    p.add_argument("--latent", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--method", choices=["kmeans", "leiden"], default="leiden")
    p.add_argument("--n-clusters", type=int, default=10)
    p.add_argument("--knn", type=int, default=15)
    p.add_argument("--resolution", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("svd", help="streaming Nystrom rSVD embedding")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-files", nargs="+", default=None)
    p.add_argument("--n-factors", type=int, default=20)
    p.add_argument("--block-size", type=int, default=8192)

    p = sub.add_parser("layout", help="2D layout of a latent parquet")
    p.add_argument("--latent", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--method", choices=["umap", "tsne", "phate"], default="umap")
    p.add_argument("--n-neighbors", type=int, default=15)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--perplexity", type=float, default=30.0, help="tsne only")

    p = sub.add_parser("pseudotime", help="principal-graph pseudotime")
    p.add_argument("--latent", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--n-nodes", type=int, default=50)
    p.add_argument("--root-cell", type=int, default=None)
    p.add_argument(
        "--velocity",
        default=None,
        help="parquet of per-cell velocity in latent space (e.g. senna bge"
        " --velocity output); orients the tree and overrides --root-cell",
    )

    p = sub.add_parser("plot", help="scatter a layout colored by clusters")
    p.add_argument("--layout", required=True, help="layout/latent parquet")
    p.add_argument("--clusters", default=None, help="clusters parquet")
    p.add_argument("--out", required=True, help="output image (.png/.svg/.pdf)")

    p = sub.add_parser("plot-topic", help="structure bars + top genes per topic")
    p.add_argument("--latent", required=True, help="log topic proportions parquet")
    p.add_argument("--out", required=True, help="output image (.png/.svg/.pdf)")
    p.add_argument("--clusters", default=None, help="order cells by these labels")
    p.add_argument("--dictionary", default=None, help="{out}.dictionary.parquet")
    p.add_argument("--top-genes", type=int, default=10)

    p = sub.add_parser("deconvolve", help="bulk deconvolution against a reference")
    p.add_argument("--bulk", required=True, help="TSV/parquet: samples x genes counts")
    p.add_argument("--reference", required=True, help="parquet: genes x components rates")
    p.add_argument("--out", required=True)
    p.add_argument("--sweeps", type=int, default=300)
    p.add_argument("--burn-in", type=int, default=100)

    p = sub.add_parser("probe", help="drift/novelty verdict for held-out latents")
    p.add_argument("--train-latent", required=True)
    p.add_argument("--heldout-latent", required=True)
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
        p.add_argument("--epochs", type=int, default=100)
        p.add_argument("--minibatch-size", type=int, default=256)
        p.add_argument("--mask-frac", type=float, default=0.15)
        if _name == "masked-topic":
            p.add_argument("--latent", choices=["simplex", "sbp"], default="simplex")

    p = sub.add_parser("bge", help="count-NCE joint embedding")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--embed-dim", "-d", type=int, default=16)
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--sort-dim", type=int, default=8)
    p.add_argument("--proj-dim", type=int, default=50)

    p = sub.add_parser("qmatrix", help="gene-set x topic enrichment Q-matrix")
    p.add_argument("--dictionary", required=True, help="{out}.dictionary.parquet")
    p.add_argument("--markers", required=True, help="GMT gene sets")
    p.add_argument("--out", required=True)
    p.add_argument("--permutations", type=int, default=500)

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

    p = sub.add_parser(
        "annotate-by-enrichment", help="marker-panel cluster annotation"
    )
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--clusters", required=True, help="clusters parquet")
    p.add_argument("--markers", required=True, help="GMT marker sets")
    p.add_argument("--out", required=True)

    args = ap.parse_args(argv)

    if args.cmd == "deconvolve":
        import numpy as _np
        import pandas as pd

        from ..senna.deconvolve import DeconvConfig, deconvolve

        bulk_df = (
            pd.read_parquet(args.bulk)
            if args.bulk.endswith(".parquet")
            else pd.read_csv(args.bulk, sep="\t", index_col=0)
        )
        ref_df = pd.read_parquet(args.reference)
        ref = ref_df.set_index(ref_df.columns[0]) if ref_df.iloc[:, 0].dtype == object else ref_df
        shared = [g for g in ref.index if g in bulk_df.columns]
        y = bulk_df[shared].to_numpy(_np.float32)
        mu = ref.loc[shared].to_numpy(_np.float32)
        res = deconvolve(
            y, mu, config=DeconvConfig(n_sweeps=args.sweeps, burn_in=args.burn_in)
        )
        pd.DataFrame(
            res.fractions, index=bulk_df.index, columns=list(ref.columns)
        ).reset_index(names="sample").to_parquet(f"{args.out}.fractions.parquet")
        print(f"wrote {args.out}.fractions.parquet (worst Rhat {res.rhat.max():.2f})")
        return
    if args.cmd == "probe":
        import pandas as pd

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
        vec = load_data_vec(args.data_files)
        data = build_topk_windows(vec, args.window)
        model = MaskedTopicModel(
            n_genes=vec.num_rows,
            n_topics=args.n_latent_topics,
            embed_dim=args.embed_dim,
            latent=latent,
        )
        variables, trace = train_masked(
            model, data,
            MaskedTrainConfig(
                epochs=args.epochs,
                minibatch=args.minibatch_size,
                mask_frac=args.mask_frac,
            ),
        )
        raw = latent == "gaussian"
        log_theta = encode_all(model, variables, data, raw_latent=raw)
        import numpy as _np

        col = "z" if raw else "topic"
        pd.DataFrame(
            log_theta, index=vec.column_names(),
            columns=[f"{col}{k}" for k in range(args.n_latent_topics)],
        ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")
        pd.DataFrame({"epoch": _np.arange(len(trace)), "loss": trace}).to_parquet(
            f"{args.out}.loss.parquet"
        )
        RunManifest(
            command=args.cmd,
            inputs={"data_files": list(args.data_files)},
            outputs={"latent": f"{args.out}.latent.parquet"},
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

        vec = load_data_vec(args.data_files)
        _, proj = _rp.project_columns(vec, args.proj_dim)
        codes = _rp.binary_sort_columns(proj, args.sort_dim)
        groups, s = _rp.compact_group_codes(codes)
        stat = _clp.collect_basic_stats(vec, groups, s)
        pb = stat.observed_sum_ds.T  # [P, D]
        res = fit_bge(
            [pb], data=vec,
            config=NceConfig(embedding_dim=args.embed_dim, epochs=args.epochs),
        )
        pd.DataFrame(
            res.e_feat, index=vec.row_names(),
            columns=[f"h{i}" for i in range(args.embed_dim)],
        ).reset_index(names="gene").to_parquet(f"{args.out}.feature_embedding.parquet")
        pd.DataFrame(
            res.e_cell, index=vec.column_names(),
            columns=[f"h{i}" for i in range(args.embed_dim)],
        ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")
        RunManifest(
            command="bge",
            inputs={"data_files": list(args.data_files)},
            outputs={
                "latent": f"{args.out}.latent.parquet",
                "feature_embedding": f"{args.out}.feature_embedding.parquet",
            },
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
            log_beta, genes, read_gmt(args.markers), n_perm=args.permutations
        )
        topics = dic.columns[1:].tolist()
        pd.DataFrame(out["z"], index=out["labels"], columns=topics).reset_index(
            names="gene_set"
        ).to_parquet(f"{args.out}.qmatrix.parquet")
        pd.DataFrame(out["q"], index=out["labels"], columns=topics).reset_index(
            names="gene_set"
        ).to_parquet(f"{args.out}.qvalues.parquet")
        print(f"wrote {args.out}.qmatrix.parquet and {args.out}.qvalues.parquet")
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
        names, scores = annotate_by_markers(
            profiles, vec.row_names(), read_gmt(args.markers)
        )
        pd.DataFrame(
            {"cluster": uniq, "annotation": names, "score": scores.max(1)}
        ).to_parquet(f"{args.out}.annotation.parquet")
        print(f"wrote {args.out}.annotation.parquet")
        return

    if args.cmd == "layout":
        import pandas as pd

        from ..ops.umap import umap

        df = pd.read_parquet(args.latent)
        z = df.iloc[:, 1:].to_numpy(np.float32) if False else df.iloc[:, 1:].to_numpy()
        import numpy as _np

        z = z.astype("float32")
        if _np.all(z <= 0):
            z = _np.exp(z)
        if args.method == "tsne":
            from ..ops.layouts import tsne

            emb = tsne(z, perplexity=args.perplexity, n_iter=max(args.epochs, 300))
        elif args.method == "phate":
            from ..ops.layouts import phate

            emb = phate(z, knn=args.n_neighbors, n_iter=args.epochs)
        else:
            emb = umap(z, n_neighbors=args.n_neighbors, n_epochs=args.epochs)
        pd.DataFrame(
            {"cell": df.iloc[:, 0], "x": emb[:, 0], "y": emb[:, 1]}
        ).to_parquet(f"{args.out}.layout.parquet")
        print(f"wrote {args.out}.layout.parquet")
        return
    if args.cmd == "pseudotime":
        import pandas as pd

        from ..ops.principal_graph import pseudotime as fit_pt

        df = pd.read_parquet(args.latent)
        z = df.iloc[:, 1:].to_numpy("float32")
        import numpy as _np

        if _np.all(z <= 0):
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
            pg = fit_pt(z, n_nodes=args.n_nodes, root_cell=args.root_cell)
            out_df = pd.DataFrame(
                {
                    "cell": df.iloc[:, 0],
                    "pseudotime": pg.pseudotime,
                    "branch": pg.branch,
                    "node": pg.cell_to_node,
                }
            )
        out_df.to_parquet(f"{args.out}.pseudotime.parquet")
        print(f"wrote {args.out}.pseudotime.parquet")
        return
    if args.cmd == "plot-topic":
        import numpy as _np
        import pandas as pd

        from ..utils.plot import structure_bars

        df = pd.read_parquet(args.latent)
        theta = df.iloc[:, 1:].to_numpy("float64")
        if _np.all(theta <= 0):
            theta = _np.exp(theta)
        theta = theta / _np.maximum(theta.sum(1, keepdims=True), 1e-12)
        order_by = None
        if args.clusters:
            cl = pd.read_parquet(args.clusters).set_index(
                pd.read_parquet(args.clusters).columns[0]
            )
            order_by = cl.reindex(df.iloc[:, 0]).iloc[:, 0].to_numpy()
        structure_bars(theta, args.out, order_by=order_by, title="topic proportions")
        msg = f"wrote {args.out}"
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
        print(msg)
        return
    if args.cmd == "plot":
        import pandas as pd

        from ..utils.plot import scatter_by_label

        lay = pd.read_parquet(args.layout)
        coords = lay.iloc[:, 1:3].to_numpy("float32")
        if args.clusters:
            cl = pd.read_parquet(args.clusters)
            labels = cl.iloc[:, 1].to_numpy()
        else:
            import numpy as _np

            labels = _np.zeros(len(coords), int)
        scatter_by_label(coords, labels, args.out)
        print(f"wrote {args.out}")
        return

    if args.cmd == "predict":
        from ..senna.predict import PredictArgs, predict_model

        predict_model(
            PredictArgs(
                data_files=args.data_files,
                model=args.model,
                out=args.out,
                block_size=args.block_size,
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
                seed=args.seed,
            )
        )
        return
    if args.cmd == "svd":
        from ..senna.svd import SvdArgs, fit_svd

        fit_svd(
            SvdArgs(
                data_files=args.data_files,
                out=args.out,
                batch_files=args.batch_files,
                n_factors=args.n_factors,
                block_size=args.block_size,
            )
        )
        return

    if args.cmd == "topic":
        from ..senna.topic import TopicArgs, fit_topic_model
        from ..utils.prng import DEFAULT_PROJECTION_SEED

        fit_topic_model(
            TopicArgs(
                data_files=args.data_files,
                out=args.out,
                batch_files=args.batch_files,
                n_latent_topics=args.n_latent_topics,
                encoder_layers=tuple(args.encoder_layers),
                epochs=args.epochs,
                minibatch_size=args.minibatch_size,
                learning_rate=args.learning_rate,
                grad_clip=args.grad_clip,
                decoder=args.decoder,
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
                seed=args.seed if args.seed is not None else DEFAULT_PROJECTION_SEED,
            )
        )


def run_sim(argv):
    ap = argparse.ArgumentParser(prog="data-beans-sim", description="synthetic generators")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("topic", help="factored count matrix with topic + batch structure")
    p.add_argument("--rows", type=int, default=2000)
    p.add_argument("--cols", type=int, default=1000)
    p.add_argument("--factors", type=int, default=8)
    p.add_argument("--batches", type=int, default=1)
    p.add_argument("--pve-topic", type=float, default=0.7)
    p.add_argument("--pve-batch", type=float, default=0.3)
    p.add_argument("--beta-scale", type=float, default=1.0)
    p.add_argument("--depth", type=float, default=1000.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", required=True)
    p.add_argument(
        "--reference", default=None,
        help="real backend: sample via NB + Gaussian copula conditioned on it",
    )
    p.add_argument("--copula-rank", type=int, default=10)
    p = sub.add_parser("faba", help="m6A/A-to-I/APA site tracks (faba naming)")
    p.add_argument("--genes", type=int, default=50)
    p.add_argument("--cols", type=int, default=500)
    p.add_argument("--states", type=int, default=3)
    p.add_argument("--depth", type=float, default=30.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    if args.cmd == "faba":
        import pandas as pd

        from ..data.sim import simulate_faba
        from ..data.sparse_io import create_sparse_from_csc

        sim = simulate_faba(
            n_genes=args.genes, n_cells=args.cols, n_states=args.states,
            depth=args.depth, seed=args.seed,
        )
        path = args.output if args.output.endswith((".zarr", ".h5")) else args.output + ".zarr"
        create_sparse_from_csc(sim.counts, path, sim.site_names, sim.col_names)
        pd.DataFrame(
            {"cell": sim.col_names, "state": sim.state}
        ).to_parquet(args.output + ".state.parquet")
        pd.DataFrame(
            sim.true_rates, index=sim.site_names,
            columns=[f"state{k}" for k in range(args.states)],
        ).reset_index(names="site").to_parquet(args.output + ".rates.parquet")
        print(f"wrote backend: {path} ({len(sim.site_names)} sites)")
        return

    if args.cmd == "topic" and args.reference:
        import numpy as np

        from ..data.sim import simulate_from_reference
        from ..data.sparse_io import create_sparse_from_csc, open_sparse_matrix

        ref = open_sparse_matrix(args.reference)
        counts, params = simulate_from_reference(
            ref.read_columns_csc(np.arange(ref.num_columns)),
            n_cells=args.cols, rank=args.copula_rank, seed=args.seed,
        )
        path = args.output if args.output.endswith((".zarr", ".h5")) else args.output + ".zarr"
        create_sparse_from_csc(
            counts, path, ref.row_names(),
            [f"sim{i}" for i in range(counts.shape[1])],
        )
        print(f"wrote backend: {path} (copula rank {args.copula_rank})")
        return

    if args.cmd == "topic":
        from ..data.sim import simulate_topic, write_topic_sim

        sim = simulate_topic(
            rows=args.rows,
            cols=args.cols,
            factors=args.factors,
            batches=args.batches,
            pve_topic=args.pve_topic,
            pve_batch=args.pve_batch,
            beta_scale=args.beta_scale,
            depth=args.depth,
            seed=args.seed,
        )
        path = write_topic_sim(sim, args.output)
        print(f"wrote backend: {path}")


def run_beans(argv):
    ap = argparse.ArgumentParser(prog="data-beans", description="sparse matrix backends")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("from-mtx", help="build a backend from MatrixMarket")
    p.add_argument("--mtx", required=True)
    p.add_argument("--rows", default=None, help="row (gene) names file")
    p.add_argument("--cols", default=None, help="column (cell) names file")
    p.add_argument("--output", required=True)
    p = sub.add_parser("from-h5ad", help="build from AnnData .h5ad")
    p.add_argument("--h5ad", required=True)
    p.add_argument("--output", required=True)
    p = sub.add_parser("from-10x-matrix", help="build from CellRanger .h5")
    p.add_argument("--h5", required=True)
    p.add_argument("--output", required=True)
    p = sub.add_parser("from-10x-molecule", help="build from molecule_info.h5")
    p.add_argument("--h5", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--min-umi", type=int, default=1, help="min reads per molecule")
    p = sub.add_parser("from-triplets", help="Xenium/transcript triplet table")
    p.add_argument("--table", required=True, help="parquet/csv, one row per transcript")
    p.add_argument("--output", required=True)
    p.add_argument("--feature-col", default="feature_name")
    p.add_argument("--cell-col", default="cell_id")
    p = sub.add_parser("from-fragments", help="ATAC fragments -> tile/peak counts")
    p.add_argument("--fragments", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--tile-size", type=int, default=5000)
    p = sub.add_parser("align", help="rewrite backends onto the shared row union")
    p.add_argument("backends", nargs="+")
    p.add_argument("--suffix", default=".aligned", help="output suffix per backend")
    p = sub.add_parser("reorder", help="reorder columns by a name list")
    p.add_argument("backend")
    p.add_argument("--columns", required=True, help="file with one column name per line")
    p.add_argument("--output", required=True)
    p = sub.add_parser("squeeze", help="drop all-zero feature rows")
    p.add_argument("backend")
    p.add_argument("--output", required=True)
    p.add_argument("--min-row-total", type=float, default=1.0)
    p = sub.add_parser("subsample", help="uniform column subsample")
    p.add_argument("backend")
    p.add_argument("--output", required=True)
    p.add_argument("-n", "--n-columns", type=int, required=True)
    p.add_argument("--seed", type=int, default=0)
    p = sub.add_parser("subset", help="subset columns and/or rows by name file")
    p.add_argument("backend")
    p.add_argument("--output", required=True)
    p.add_argument("--columns", default=None, help="file: one column name per line")
    p.add_argument("--rows", default=None, help="file: one row name per line")
    p = sub.add_parser("stat", help="summary statistics JSON")
    p.add_argument("backend")
    p.add_argument("--peaks", default=None, help="BED of peaks (else tiles)")
    p = sub.add_parser("to-mtx", help="export MEX (mtx + features + barcodes)")
    p.add_argument("backend")
    p.add_argument("--output", required=True)
    p = sub.add_parser("to-h5ad", help="export AnnData .h5ad")
    p.add_argument("backend")
    p.add_argument("--output", required=True)
    p = sub.add_parser("merge-backend", help="merge backends column-wise")
    p.add_argument("backends", nargs="+")
    p.add_argument("--output", required=True)
    p = sub.add_parser("qc", help="cell QC stats + keep mask")
    p.add_argument("backend")
    p.add_argument("--output", required=True)
    p.add_argument("--min-total", type=float, default=0)
    p.add_argument("--min-genes", type=int, default=0)
    p.add_argument("--max-mito-frac", type=float, default=1.0)
    p = sub.add_parser("info", help="backend shape and nnz")
    p.add_argument("backend")
    p = sub.add_parser("histogram", help="ASCII histogram of per-cell totals")
    p.add_argument("backend")
    p.add_argument("--bins", type=int, default=20)
    args = ap.parse_args(argv)

    from ..data import open_sparse_matrix

    if args.cmd == "histogram":
        import numpy as np

        from ..data.qc import compute_cell_qc

        be = open_sparse_matrix(args.backend)
        qc = compute_cell_qc(be)
        lx = np.log10(np.maximum(qc.total, 1))
        hist, edges = np.histogram(lx, bins=args.bins)
        peak = max(hist.max(), 1)
        for h, e in zip(hist, edges):
            bar = "#" * int(50 * h / peak)
            print(f"10^{e:5.2f} | {bar} {h}")
        print(f"median total: {np.median(qc.total):.0f}")
        return

    if args.cmd == "from-mtx":
        from ..data.builders import from_mtx

        from_mtx(args.mtx, args.output, rows_file=args.rows, cols_file=args.cols)
        print(f"wrote backend: {args.output}")
    elif args.cmd == "from-h5ad":
        from ..data.builders import from_h5ad

        from_h5ad(args.h5ad, args.output)
        print(f"wrote backend: {args.output}")
    elif args.cmd == "from-10x-matrix":
        from ..data.builders import from_10x_h5

        from_10x_h5(args.h5, args.output)
        print(f"wrote backend: {args.output}")
    elif args.cmd == "align":
        from ..data.builders import align_backends

        outs = [b.rstrip("/").rsplit(".zarr", 1)[0] + args.suffix for b in args.backends]
        align_backends(list(args.backends), outs)
        print(f"wrote aligned backends: {' '.join(outs)}")
    elif args.cmd == "reorder":
        from ..data.builders import _read_name_file, reorder_backend

        reorder_backend(args.backend, args.output, _read_name_file(args.columns))
        print(f"wrote backend: {args.output}")
    elif args.cmd == "squeeze":
        from ..data.builders import squeeze_backend

        be = squeeze_backend(
            args.backend, args.output, min_row_total=args.min_row_total
        )
        print(f"wrote backend: {args.output} ({be.num_rows} rows kept)")
    elif args.cmd == "subsample":
        from ..data.builders import subsample_backend

        subsample_backend(args.backend, args.output, args.n_columns, seed=args.seed)
        print(f"wrote backend: {args.output}")
    elif args.cmd == "subset":
        import numpy as np

        from ..data.builders import _read_name_file, subset_backend
        from ..data.sparse_io import open_sparse_matrix

        be = open_sparse_matrix(args.backend)
        cols = rows = None
        if args.columns:
            want = set(_read_name_file(args.columns))
            cols = np.asarray(
                [i for i, n in enumerate(be.column_names()) if n in want]
            )
        if args.rows:
            want = set(_read_name_file(args.rows))
            rows = np.asarray([i for i, n in enumerate(be.row_names()) if n in want])
        subset_backend(args.backend, args.output, columns=cols, rows=rows)
        print(f"wrote backend: {args.output}")
    elif args.cmd == "stat":
        import json as _json

        from ..data.builders import backend_stat

        print(_json.dumps(backend_stat(args.backend)))
    elif args.cmd == "from-10x-molecule":
        from ..data.builders import from_10x_molecule

        from_10x_molecule(args.h5, args.output, min_umi=args.min_umi)
        print(f"wrote backend: {args.output}")
    elif args.cmd == "from-triplets":
        from ..data.builders import from_triplets_table

        from_triplets_table(
            args.table, args.output,
            feature_col=args.feature_col, cell_col=args.cell_col,
        )
        print(f"wrote backend: {args.output}")
    elif args.cmd == "from-fragments":
        from ..data.builders import from_fragments

        from_fragments(
            args.fragments, args.output,
            tile_size=args.tile_size, peaks_bed=args.peaks,
        )
        print(f"wrote backend: {args.output}")
    elif args.cmd == "to-mtx":
        from ..data.builders import to_mtx

        to_mtx(args.backend, args.output)
        print(f"wrote {args.output}.matrix.mtx.gz")
    elif args.cmd == "to-h5ad":
        from ..data.builders import to_h5ad

        to_h5ad(args.backend, args.output)
        print(f"wrote {args.output}")
    elif args.cmd == "merge-backend":
        from ..data.builders import merge_backends

        merge_backends(args.backends, args.output)
        print(f"wrote backend: {args.output}")
    elif args.cmd == "qc":
        import pandas as pd

        from ..data.qc import compute_cell_qc

        be = open_sparse_matrix(args.backend)
        qc = compute_cell_qc(be)
        keep = qc.keep_mask(
            min_total=args.min_total,
            min_genes=args.min_genes,
            max_mito_frac=args.max_mito_frac,
        )
        pd.DataFrame(
            {
                "cell": be.column_names(),
                "total": qc.total,
                "n_genes": qc.n_genes,
                "mito_frac": qc.mito_frac,
                "keep": keep,
            }
        ).to_parquet(f"{args.output}.qc.parquet")
        print(f"wrote {args.output}.qc.parquet ({keep.sum()}/{len(keep)} kept)")
    elif args.cmd == "info":
        be = open_sparse_matrix(args.backend)
        print(f"rows: {be.num_rows}\ncols: {be.num_columns}\nnnz: {be.num_nonzeros}")


def run_faba(argv):
    ap = argparse.ArgumentParser(prog="faba", description="BAM feature extraction")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("genes", help="per-cell gene counts from BAM")
    p.add_argument("--bam", required=True)
    p.add_argument("--gff", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--min-mapq", type=int, default=20)
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument(
        "--splice", action="store_true",
        help="emit spliced + unspliced backends (velocity input)",
    )
    for _name, _help in [
        ("dartseq", "m6A C->T WT-vs-control site calling"),
        ("atoi", "A-to-I (A->G) editing site calling"),
    ]:
        p = sub.add_parser(_name, help=_help)
        p.add_argument("--bam", required=True, help="WT/DART BAM")
        p.add_argument("--control-bam", required=True)
        p.add_argument("--output", required=True)
        p.add_argument("--max-p", type=float, default=0.05)
        p.add_argument("--min-alt", type=int, default=3)
    p = sub.add_parser("all", help="pipeline: genes -> apa -> snp -> m6a/atoi")
    p.add_argument("--bam", required=True)
    p.add_argument("--gff", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--control-bam", default=None)
    p.add_argument("--min-mapq", type=int, default=20)
    p = sub.add_parser("pwm", help="sequence-context PWM around called sites")
    p.add_argument("--sites", required=True, help="parquet with chrom,pos[,strand]")
    p.add_argument("--fasta", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--flank", type=int, default=5)
    p = sub.add_parser("metagene", help="site density over normalized gene coords")
    p.add_argument("--sites", required=True, help="parquet with chrom,pos")
    p.add_argument("--gff", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--bins", type=int, default=50)
    p = sub.add_parser("pileup", help="base composition around sites from BAM")
    p.add_argument("--bam", required=True)
    p.add_argument("--sites", required=True, help="parquet with chrom,pos")
    p.add_argument("--output", required=True)
    p.add_argument("--flank", type=int, default=2)
    p.add_argument("--fasta", default=None)
    for _name, _help in [
        ("gem", "geodesic embedding + motion (NCE, velocity delta)"),
        ("gem-encoder", "masked generative sibling (u+delta->s)"),
    ]:
        p = sub.add_parser(_name, help=_help)
        p.add_argument("--spliced", required=True, help="spliced pb backend")
        p.add_argument("--unspliced", required=True, help="unspliced pb backend")
        p.add_argument("--output", required=True)
        p.add_argument("-d", "--embedding-dim", type=int, default=16)
        p.add_argument("--epochs", type=int, default=600)
    p = sub.add_parser("dyn-assoc", help="between-branch Bayesian modality contrast")
    p.add_argument("--backend", required=True, help="site x cell counts backend")
    p.add_argument("--branches", required=True, help="parquet: cell, branch|pseudotime")
    p.add_argument("--output", required=True)
    p.add_argument("--exposure", default=None, help="optional coverage backend")
    args = ap.parse_args(argv)

    if args.cmd == "genes":
        from ..data.sparse_io import create_sparse_from_csc
        from ..faba.genes import count_genes, count_genes_spliced

        if args.splice:
            s, u, genes, barcodes = count_genes_spliced(
                args.bam, args.gff,
                min_mapq=args.min_mapq, dedup_umi=not args.no_dedup,
            )
            create_sparse_from_csc(s, f"{args.output}.spliced", genes, barcodes)
            create_sparse_from_csc(u, f"{args.output}.unspliced", genes, barcodes)
            print(
                f"wrote backends: {args.output}.spliced / .unspliced "
                f"({s.nnz} spliced, {u.nnz} unspliced entries)"
            )
            return
        counts, genes, barcodes = count_genes(
            args.bam, args.gff, min_mapq=args.min_mapq, dedup_umi=not args.no_dedup
        )
        create_sparse_from_csc(counts, args.output, genes, barcodes)
        print(f"wrote backend: {args.output} ({counts.shape[0]} genes x {counts.shape[1]} cells)")
    elif args.cmd in ("dartseq", "atoi"):
        import pandas as pd

        from ..data.sparse_io import create_sparse_from_csc
        from ..faba.bam import read_bam
        from ..faba.dartseq import run_atoi, run_dartseq

        runner = run_dartseq if args.cmd == "dartseq" else run_atoi
        res = runner(
            args.bam, args.control_bam, max_p=args.max_p, min_alt=args.min_alt
        )
        ref_names = read_bam(args.bam).ref_names
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
        print(f"wrote {args.output}.sites.parquet ({len(df)} sites)")
    elif args.cmd == "all":
        from ..faba.pipeline import run_all

        res = run_all(
            args.bam, args.gff, args.output,
            control_bam=args.control_bam, min_mapq=args.min_mapq,
        )
        print(f"wrote: {' '.join(sorted(res.outputs))}")
    elif args.cmd == "pwm":
        import json as _json

        import numpy as np
        import pandas as pd

        from ..faba.context import pwm_at_sites, read_fasta

        df = pd.read_parquet(args.sites)
        strand = df["strand"].to_numpy() if "strand" in df else None
        pwm = pwm_at_sites(
            read_fasta(args.fasta), df["chrom"].tolist(),
            df["pos"].to_numpy(), flank=args.flank, strand=strand,
        )
        out = pd.DataFrame(pwm.freqs, columns=list("ACGT"))
        out["offset"] = np.arange(-args.flank, args.flank + 1)
        out["info_bits"] = pwm.info_bits
        out.to_parquet(f"{args.output}.pwm.parquet")
        print(
            _json.dumps(
                {"consensus": pwm.consensus, "n_sites": pwm.n_sites,
                 "out": f"{args.output}.pwm.parquet"}
            )
        )
    elif args.cmd == "metagene":
        import pandas as pd

        from ..faba.context import metagene_profile
        from ..faba.genes import parse_gff_genes

        df = pd.read_parquet(args.sites)
        model = parse_gff_genes(args.gff)
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
    elif args.cmd in ("gem", "gem-encoder"):
        import numpy as np
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
        if args.cmd == "gem":
            res = fit_gem(s, u, embedding_dim=args.embedding_dim, epochs=args.epochs)
            delta, emb = res.delta, res.e_feat
            vel = res.cell_velocity(u)
        else:
            res = fit_gem_encoder(
                s, u, latent_dim=args.embedding_dim, epochs=args.epochs
            )
            delta, emb = res.delta, res.rho
            vel = res.cell_velocity(u)
        pd.DataFrame(
            emb, index=genes, columns=[f"h{j}" for j in range(emb.shape[1])]
        ).reset_index(names="gene").to_parquet(f"{args.output}.gene_embedding.parquet")
        out_v = pd.DataFrame(
            vel, index=sb.column_names(),
            columns=[f"v{j}" for j in range(vel.shape[1])],
        ).reset_index(names="cell")
        out_v.to_parquet(f"{args.output}.velocity.parquet")
        pd.DataFrame(
            {"gene": genes, "velocity_norm": np.linalg.norm(delta, axis=1)}
        ).to_parquet(f"{args.output}.gene_velocity.parquet")
        print(f"wrote {args.output}.{{gene_embedding,velocity,gene_velocity}}.parquet")
    elif args.cmd == "dyn-assoc":
        import numpy as np
        import pandas as pd

        from ..data.sparse_io import open_sparse_matrix
        from ..faba.assoc import dyn_assoc, dyn_assoc_pseudotime

        be = open_sparse_matrix(args.backend)
        counts = np.asarray(
            be.read_columns_csc(np.arange(be.num_columns)).todense()
        )  # [S, N]
        cells = be.column_names()
        lab = pd.read_parquet(args.branches).set_index(
            pd.read_parquet(args.branches).columns[0]
        )
        lab = lab.reindex(cells)
        if args.exposure:
            ex_be = open_sparse_matrix(args.exposure)
            exposure = np.asarray(
                ex_be.read_columns_csc(np.arange(ex_be.num_columns)).todense()
            ).sum(0)
        else:
            exposure = counts.sum(0) + 1.0
        branch_col = next((c for c in ("branch", "state") if c in lab.columns), None)
        if branch_col is not None:
            out = dyn_assoc(counts, exposure, lab[branch_col].to_numpy())
            df = pd.DataFrame(
                {
                    "site": be.row_names(),
                    "branch": out["branch"],
                    "log_fold_change": out["log_fold_change"],
                    "z": out["z"],
                    "log_bf": out["log_bf"],
                    "pvalue": out["pvalue"],
                }
            )
        else:
            pt_col = "pseudotime" if "pseudotime" in lab.columns else lab.columns[0]
            out = dyn_assoc_pseudotime(counts, exposure, lab[pt_col].to_numpy())
            df = pd.DataFrame(
                {
                    "site": be.row_names(),
                    "slope": out["slope"],
                    "z": out["z"],
                    "pvalue": out["pvalue"],
                }
            )
        df.to_parquet(f"{args.output}.assoc.parquet")
        print(f"wrote {args.output}.assoc.parquet ({len(df)} sites)")
    elif args.cmd == "pileup":
        import pandas as pd

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


def run_cocoa(argv):
    ap = argparse.ArgumentParser(prog="cocoa", description="counterfactual confounder-adjusted DE")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("diff", help="counterfactual differential expression")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--indv", required=True, help="cell -> individual labels, one per line")
    p.add_argument("--exposure", required=True, help="individual TAB exposure table")
    p.add_argument("--topic", default=None, help="cell topic proportions parquet")
    p.add_argument("--n-pb-samples", type=int, default=10)
    p.add_argument("--knn", type=int, default=10)
    p.add_argument("--iter-opt", type=int, default=100)
    p.add_argument("--permutations", type=int, default=0)
    p.add_argument("--no-collider-fix", action="store_true")
    args = ap.parse_args(argv)

    from ..cocoa.diff import CocoaDiffArgs, run_cocoa_diff

    run_cocoa_diff(
        CocoaDiffArgs(
            data_files=args.data_files,
            out=args.out,
            indv_file=args.indv,
            exposure_file=args.exposure,
            topic_file=args.topic,
            n_pb_samples=args.n_pb_samples,
            knn=args.knn,
            n_opt_iter=args.iter_opt,
            n_permutations=args.permutations,
            collider_fix=not args.no_collider_fix,
        )
    )


def run_pinto(argv):
    ap = argparse.ArgumentParser(prog="pinto", description="spatial transcriptomics")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("lc", help="spatial link-community segmentation")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--coords", required=True, help="TSV: cell x y")
    p.add_argument("--out", required=True)
    p.add_argument("--n-communities", "-k", type=int, default=10)
    p.add_argument("--knn", type=int, default=10)
    p.add_argument("--sweeps", type=int, default=30)
    p = sub.add_parser("cascade", help="multilevel V-cycle link-community refinement")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--coords", required=True, help="TSV: cell x y")
    p.add_argument("--out", required=True)
    p.add_argument("--levels", type=int, nargs="+", default=[6, 4])
    p.add_argument("--knn", type=int, default=10)
    p.add_argument("--sweeps", type=int, default=30)
    p = sub.add_parser("annotate", help="marker enrichment labels for communities")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--edges", required=True, help="{out}.edges.parquet from lc/cascade")
    p.add_argument("--markers", required=True, help="GMT marker sets")
    p.add_argument("--out", required=True)
    p = sub.add_parser("p", help="spatial hex plot of a propensity/value column")
    p.add_argument("--coords", required=True, help="TSV: cell x y")
    p.add_argument("--values", required=True, help="parquet with a value column")
    p.add_argument("--column", default=None, help="column name (default: 2nd)")
    p.add_argument("--out", required=True)

    args = ap.parse_args(argv)

    if args.cmd == "cascade":
        import numpy as np
        import pandas as pd

        from ..pinto.cascade import cascade_link_community
        from ..senna.topic import load_data_vec

        vec = load_data_vec(args.data_files)
        coords = np.loadtxt(args.coords, usecols=(1, 2))
        res = cascade_link_community(
            vec, coords, levels=tuple(args.levels),
            knn=args.knn, n_sweeps=args.sweeps,
        )
        pd.DataFrame(
            {"src": res.edges[:, 0], "dst": res.edges[:, 1],
             "community": res.edge_labels}
        ).to_parquet(f"{args.out}.edges.parquet")
        pd.DataFrame(
            res.propensity, columns=res.leaf_names
        ).reset_index(names="cell").to_parquet(f"{args.out}.propensity.parquet")
        print(
            f"wrote {args.out}.edges.parquet + .propensity.parquet "
            f"({len(res.leaf_names)} leaf communities)"
        )
        return
    if args.cmd == "annotate":
        import numpy as np
        import pandas as pd

        from ..data.knowledge import read_gmt
        from ..ops.enrichment import annotate_by_markers
        from ..senna.topic import load_data_vec

        vec = load_data_vec(args.data_files)
        ed = pd.read_parquet(args.edges)
        labels, uniq = pd.factorize(ed["community"])
        edges = ed[["src", "dst"]].to_numpy()
        profiles = np.zeros((len(uniq), vec.num_rows))
        for i in range(len(uniq)):
            cells = np.unique(edges[labels == i].ravel())
            profiles[i] = np.log1p(
                np.asarray(vec.read_columns_csc(cells).mean(axis=1)).ravel()
            )
        names, scores = annotate_by_markers(
            profiles, vec.row_names(), read_gmt(args.markers)
        )
        pd.DataFrame(
            {"community": list(uniq), "annotation": names, "score": scores.max(1)}
        ).to_parquet(f"{args.out}.annotation.parquet")
        print(f"wrote {args.out}.annotation.parquet")
        return

    if args.cmd == "p":
        import numpy as np
        import pandas as pd

        from ..utils.plot import spatial_hex

        coords = np.loadtxt(args.coords, usecols=(1, 2))
        df = pd.read_parquet(args.values)
        col = args.column or df.columns[1]
        spatial_hex(coords, df[col].to_numpy(), args.out, title=col)
        print(f"wrote {args.out}")
        return

    from ..pinto.lc import PintoLcArgs, run_lc

    run_lc(
        PintoLcArgs(
            data_files=args.data_files,
            coord_file=args.coords,
            out=args.out,
            n_communities=args.n_communities,
            knn=args.knn,
            n_sweeps=args.sweeps,
        )
    )


def run_fagioli(argv):
    ap = argparse.ArgumentParser(prog="fagioli", description="genetics fine-mapping")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("map-sumstat", help="SuSiE-RSS fine-mapping from z-scores")
    p.add_argument("--zscores", required=True, help="TSV: variant z")
    p.add_argument("--geno", required=True, help="reference genotype .npy [n, p]")
    p.add_argument("--out", required=True)
    p.add_argument("-L", type=int, default=5)
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument(
        "--multilevel", action="store_true",
        help="hierarchical block/within-block selection (LD-blocked)",
    )
    p = sub.add_parser("fit-prs-susie", help="sparse PRS weights via SuSiE")
    p.add_argument("--zscores", required=True, help="TSV: variant z")
    p.add_argument("--geno", required=True, help="LD reference .npy [n, p]")
    p.add_argument("--out", required=True)
    p.add_argument("-L", type=int, default=10)
    p.add_argument("--score-geno", default=None, help=".npy panel to score")
    p.add_argument("--steps", type=int, default=1500)
    p = sub.add_parser("fit-sumstat-mcmc", help="ESS posterior over RSS effects")
    p.add_argument("--zscores", required=True)
    p.add_argument("--geno", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--samples", type=int, default=1000)
    p.add_argument("--burn-in", type=int, default=200)
    p.add_argument("--prior-sd", type=float, default=0.3)
    p = sub.add_parser("sim-sumstat", help="simulate GWAS summary stats")
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=500)
    p.add_argument("--p", type=int, default=200)
    p.add_argument("--n-causal", type=int, default=3)
    p.add_argument("--h2", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import numpy as np
    import pandas as pd

    if args.cmd == "sim-sumstat":
        from ..fagioli.sumstat import simulate_sumstat

        sim = simulate_sumstat(
            n=args.n, p=args.p, n_causal=args.n_causal, h2=args.h2, seed=args.seed
        )
        np.save(args.out + ".geno.npy", sim.genotypes)
        pd.DataFrame(
            {"variant": [f"v{i}" for i in range(args.p)], "z": sim.z,
             "beta_true": sim.beta, "causal": sim.causal}
        ).to_csv(args.out + ".sumstat.tsv", sep="\t", index=False)
        print(f"wrote {args.out}.sumstat.tsv and {args.out}.geno.npy")
    elif args.cmd == "fit-prs-susie":
        from ..fagioli.sumstat import fit_prs
        from ..models.sgvb import SgvbConfig

        df = pd.read_csv(args.zscores, sep="\t")
        geno = np.load(args.geno)
        score = np.load(args.score_geno) if args.score_geno else None
        out = fit_prs(
            df["z"].to_numpy(), geno, L=args.L, score_genotypes=score,
            config=SgvbConfig(num_steps=args.steps),
        )
        pd.DataFrame(
            {"variant": df.iloc[:, 0], "weight": out["weights"], "pip": out["pip"]}
        ).to_parquet(args.out + ".prs_weights.parquet")
        msg = f"wrote {args.out}.prs_weights.parquet"
        if "prs" in out:
            pd.DataFrame(
                {"sample": np.arange(len(out["prs"])), "prs": out["prs"]}
            ).to_parquet(args.out + ".prs.parquet")
            msg += f" and {args.out}.prs.parquet"
        print(msg)
    elif args.cmd == "fit-sumstat-mcmc":
        from ..fagioli.sumstat import fit_sumstat_mcmc

        df = pd.read_csv(args.zscores, sep="\t")
        geno = np.load(args.geno)
        out = fit_sumstat_mcmc(
            df["z"].to_numpy(), geno,
            num_samples=args.samples, burn_in=args.burn_in,
            prior_sd=args.prior_sd,
        )
        pd.DataFrame(
            {"variant": df.iloc[:, 0], "beta_mean": out["beta_mean"],
             "beta_sd": out["beta_sd"], "rhat": out["rhat"], "ess": out["ess"]}
        ).to_parquet(args.out + ".mcmc.parquet")
        print(
            f"wrote {args.out}.mcmc.parquet "
            f"(max rhat {out['rhat'].max():.3f}, min ess {out['ess'].min():.0f})"
        )
    else:
        from ..fagioli.sumstat import map_sumstat
        from ..models.sgvb import SgvbConfig

        df = pd.read_csv(args.zscores, sep="\t")
        geno = np.load(args.geno)
        out = map_sumstat(
            df["z"].to_numpy(), geno, L=args.L,
            config=SgvbConfig(num_steps=args.steps),
            multilevel=args.multilevel,
        )
        pd.DataFrame(
            {"variant": df.iloc[:, 0], "pip": out["pip"],
             "effect": out["theta_mean"][:, 0]}
        ).to_parquet(args.out + ".finemap.parquet")
        print(f"wrote {args.out}.finemap.parquet")


BINARIES = {
    "senna": run_senna,
    "data-beans-sim": run_sim,
    "data-beans": run_beans,
    "cocoa": run_cocoa,
    "pinto": run_pinto,
    "fagioli": run_fagioli,
    "faba": run_faba,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    # CLI runs render stage progress (library callers stay silent)
    os.environ.setdefault("LEGUME_PROGRESS", "1")
    logging.basicConfig(level=logging.INFO, format="[%(levelname)s %(name)s] %(message)s")
    from ..utils.stop import install_sigint_handler

    install_sigint_handler()
    # multi-host: LEGUME_COORDINATOR/LEGUME_NUM_PROCESSES/LEGUME_PROCESS_ID
    # (or LEGUME_DISTRIBUTED=1 on pods with runtime discovery) turn on
    # jax.distributed before any backend touch (parallel/multihost.py)
    from ..parallel.multihost import maybe_initialize_distributed

    maybe_initialize_distributed()
    if not argv or argv[0] not in BINARIES:
        print(f"usage: legume <binary> ...; binaries: {', '.join(sorted(BINARIES))}")
        return 1
    BINARIES[argv[0]](argv[1:])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
