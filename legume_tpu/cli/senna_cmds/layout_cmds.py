"""senna geometry family: layout (incl. tree), pseudotime, plot*.

Extracted verbatim from the former monolithic cli/senna_cli.py (one
module per command family; senna_cli keeps the parser tree and the
--from prologue and dispatches here).
"""

from __future__ import annotations

import numpy as np

from .._util import _manifest_prefix  # noqa: F401 (handlers use it)


def _cmd_layout_tree(args):
    # Reingold-Tilford tree layout from a pseudotime run's principal
    # graph (`senna layout tree`, fit_layout_tree.rs:55): y is
    # geodesic pseudotime, x is sibling order; cells lerp along
    # their projected edge with perpendicular jitter.
    import pandas as pd

    from ...ops.principal_graph import (
        place_cells_on_tree,
        project_cells_to_edges,
        reingold_tilford_layout,
    )
    from ...utils.manifest import ArtifactScale, RunManifest

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


def _cmd_layout(args):
    import pandas as pd

    from ...ops.umap import umap

    df = pd.read_parquet(args.latent)
    z = df.iloc[:, 1:].to_numpy(np.float32) if False else df.iloc[:, 1:].to_numpy()
    import numpy as _np

    z = z.astype("float32")
    from ...utils.manifest import ArtifactScale

    # content-detected scale guard (run_manifest.rs:308-345): only a
    # log-simplex exponentiates; signed latents (vae/svd) pass raw
    if ArtifactScale.detect(z, axis=1) == ArtifactScale.LOG_SIMPLEX_COLUMNS:
        z = _np.exp(z)
    if args.method == "tsne":
        from ...ops.layouts import tsne

        emb = tsne(z, perplexity=args.perplexity, n_iter=max(args.epochs, 300))
    elif args.method == "phate":
        from ...ops.layouts import phate

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
    from ...utils.manifest import RunManifest

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


def _cmd_pseudotime(args):
    import pandas as pd

    from ...ops.principal_graph import pseudotime as fit_pt

    df = pd.read_parquet(args.latent)
    z = df.iloc[:, 1:].to_numpy("float32")
    import numpy as _np

    from ...utils.manifest import ArtifactScale

    # content-detected scale guard (run_manifest.rs:308-345): only a
    # log-simplex exponentiates; signed latents (vae/svd) pass raw
    if ArtifactScale.detect(z, axis=1) == ArtifactScale.LOG_SIMPLEX_COLUMNS:
        z = _np.exp(z)
    if args.velocity is not None:
        from ...embedding.lineage import velocity_oriented_lineage

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
        from ...ops.principal_graph import edge_list_from_adjacency

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
    from ...utils.manifest import RunManifest as _RM

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


def _cmd_plot_topic(args):
    import numpy as _np
    import pandas as pd

    from ...utils.plot import structure_bars

    df = pd.read_parquet(args.latent)
    theta = df.iloc[:, 1:].to_numpy("float64")
    from ...utils.manifest import ArtifactScale

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
        from ...utils.plot import hinton

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


def _cmd_plot(args):
    import numpy as _np
    import pandas as pd

    from ...utils.plot import scatter_figure

    layout_path = args.layout
    clusters_path = args.clusters
    if args.from_run:
        from ...utils.manifest import RunManifest

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


def _cmd_plot_strand(args):
    import pandas as pd

    from ...faba.genes import parse_gff_genes
    from ...utils.plot import strand_ideogram

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


