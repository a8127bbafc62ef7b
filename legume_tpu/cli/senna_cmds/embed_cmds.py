"""senna embedding family: bge, fne, rest, svd, joint-svd, clustering.

Extracted verbatim from the former monolithic cli/senna_cli.py (one
module per command family; senna_cli keeps the parser tree and the
--from prologue and dispatches here).
"""

from __future__ import annotations

import numpy as np

from .._util import _manifest_prefix  # noqa: F401 (handlers use it)


def _cmd_bge(args):
    import numpy as _np
    import pandas as pd

    from ...embedding.nce import NceConfig, fit_bge
    from ...ops import collapse as _clp
    from ...ops import random_projection as _rp
    from ...senna.topic import load_data_vec
    from ...utils.manifest import RunManifest

    if args.multiome:
        # paired RNA+ATAC: stack feature axes on the SHARED cells,
        # the second modality's counts scaled by the bridge weight
        # (cross-modality co-occurrence flows through the shared
        # cell side of the NCE)
        import scipy.sparse as _sp

        from ...data import SparseIoVec as _Vec
        from ...data.sparse_io import MemoryBackend as _Mem
        from ...data.sparse_io import open_sparse_matrix as _open

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

        from ...parallel.mesh import make_mesh

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
        from ...ops.leiden import knn_adjacency, leiden_clustering

        if args.num_topics > 0:
            from ...senna.deconvolve import leiden_at_count

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
        from ...embedding.posterior import pb_gibbs

        post = pb_gibbs(
            pb, res.e_feat, res.b_feat,
            res.pb_embeddings[0], _np.zeros(pb.shape[0]),
            n_sweeps=args.posterior,
            burnin=max(args.posterior // 4, 2),
            mesh=mesh,  # --data-parallel dp-shards the anchor axis
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


def _cmd_fne(args):
    import pandas as pd

    from ...senna.fne import fit_fne

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


def _cmd_rest(args):
    import pandas as pd

    if args.from_run:
        # reference semantics: frozen-theta NCE co-embedding
        # (resolve_embedding_space.rs)
        import numpy as _np

        from ...embedding.resolve import rest_fit
        from ...senna.topic import load_data_vec
        from ...utils.manifest import RunManifest

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
    from ...embedding.resolve import resolve_embedding_spaces

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


def _cmd_svd(args):
    from ...senna.svd import SvdArgs, fit_svd
    from ...utils.prng import DEFAULT_PROJECTION_SEED

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
            data_parallel=args.data_parallel,
        )
    )
    return


def _cmd_joint_svd(args):
    from ...senna.svd import fit_joint_svd
    from ...utils.prng import DEFAULT_PROJECTION_SEED

    fit_joint_svd(
        args.data_files, args.out,
        n_factors=args.n_factors, proj_dim=args.proj_dim,
        sort_dim=args.sort_dim, block_size=args.block_size,
        seed=args.seed if args.seed is not None else DEFAULT_PROJECTION_SEED,
    )
    print(f"wrote {args.out}.latent.parquet + .dictionary.parquet")
    return


def _cmd_clustering(args):
    from ...senna.clustering import ClusteringArgs, run_clustering

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
        from ...utils.manifest import RunManifest

        src = (
            args.from_run if args.from_run.endswith(".json")
            else args.from_run + ".senna.json"
        )
        prev = RunManifest.load(src)
        prev.outputs["clusters"] = f"{args.out}.clusters.parquet"
        prev.save(_manifest_prefix(src))
    return


