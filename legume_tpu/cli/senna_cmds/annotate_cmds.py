"""senna annotation + inference utilities: annotate-*, qmatrix, deconvolve, probe, impute.

Extracted verbatim from the former monolithic cli/senna_cli.py (one
module per command family; senna_cli keeps the parser tree and the
--from prologue and dispatches here).
"""

from __future__ import annotations

import numpy as np

from .._util import _manifest_prefix  # noqa: F401 (handlers use it)


def _cmd_annotate_by_projection(args):
    import pandas as pd

    from ...ops.knn import knn_search

    if args.from_run:
        # marker projection into the shared cell+gene space
        # (annotate/args.rs marker-projection path): each label's
        # score is the IDF-weighted mean similarity of the cell to
        # the label's marker-gene embeddings
        import numpy as _np

        from ...data.knowledge import read_gmt
        from ...utils.manifest import RunManifest

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


def _cmd_qmatrix(args):
    import numpy as _np
    import pandas as pd

    from ...data.knowledge import read_gmt
    from ...ops.enrichment import geneset_topic_qmatrix

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
        from ...ops.enrichment import label_cells

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


def _cmd_annotate_ontology(args):
    import numpy as _np
    import pandas as pd

    from ...data.knowledge import parse_obo, read_gaf
    from ...ops.enrichment import annotate_ontology
    from ...senna.topic import load_data_vec

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
        from ...ops.enrichment import ontology_module_score

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


def _cmd_annotate_by_enrichment(args):
    import numpy as _np
    import pandas as pd

    from ...data.knowledge import read_gmt
    from ...ops.enrichment import annotate_by_markers
    from ...senna.topic import load_data_vec

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
        from ...ops.enrichment import marker_bootstrap

        bs = marker_bootstrap(
            profiles, vec.row_names(), sets, n_boot=args.bootstrap,
            support_threshold=args.support_threshold,
        )
        table["annotation"] = bs["annotation"]
        table["cluster_label_support"] = bs["cluster_label_support"]
    pd.DataFrame(table).to_parquet(f"{args.out}.annotation.parquet")
    print(f"wrote {args.out}.annotation.parquet")
    return


def _cmd_deconvolve(args):
    import numpy as _np
    import pandas as pd

    from ...senna.deconvolve import DeconvConfig, deconvolve

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
        from ...senna.deconvolve import build_archetype_reference
        from ...senna.topic import load_data_vec
        from ...utils.manifest import RunManifest

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


def _cmd_probe(args):
    import pandas as pd

    if args.model:
        # model-based conformal probe (probe.rs)
        import json as _json

        from ...senna.probe import probe_model

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
    from ...senna.impute import probe_latent

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


def _cmd_impute(args):
    import pandas as pd
    import scipy.sparse as sp

    from ...data.sparse_io import create_sparse_from_csc
    from ...senna.impute import impute_counts, impute_from_reference
    from ...senna.topic import load_data_vec

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
        from ...senna.predict import PredictArgs, predict_model

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


