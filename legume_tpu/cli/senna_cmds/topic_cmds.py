"""senna topic-model family: topic, vae, joint-topic, predict/eval-topic.

Extracted verbatim from the former monolithic cli/senna_cli.py (one
module per command family; senna_cli keeps the parser tree and the
--from prologue and dispatches here).
"""

from __future__ import annotations

import numpy as np

from .._util import _manifest_prefix  # noqa: F401 (handlers use it)


def _cmd_vae(args):
    from ...senna.vae import VaeArgs, fit_vae
    from ...utils.prng import DEFAULT_PROJECTION_SEED

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
            data_parallel=args.data_parallel,
        )
    )
    print(f"wrote {args.out}.latent.parquet")
    return


def _cmd_joint_topic(args):
    import pandas as pd

    from ...senna.joint import JointTopicArgs, fit_joint_topic
    from ...senna.topic import load_data_vec
    from ...utils.manifest import RunManifest
    from ...utils.prng import DEFAULT_PROJECTION_SEED

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


def _cmd_predict(args):
    from ...senna.predict import PredictArgs, predict_model

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


def _cmd_topic(args):
    from ...models.decoders import DECODERS
    from ...senna.topic import TopicArgs, fit_topic_model
    from ...utils.prng import DEFAULT_PROJECTION_SEED

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


