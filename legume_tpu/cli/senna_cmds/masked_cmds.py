"""senna masked-* family (indexed top-K window models).

Extracted verbatim from the former monolithic cli/senna_cli.py (one
module per command family; senna_cli keeps the parser tree and the
--from prologue and dispatches here).
"""

from __future__ import annotations

import numpy as np

from .._util import _manifest_prefix  # noqa: F401 (handlers use it)


def _cmd_masked(args):
    import pandas as pd

    from ...models.indexed import (
        MaskedTopicModel,
        MaskedTrainConfig,
        build_topk_windows,
        encode_all,
        train_masked,
    )
    from ...senna.topic import load_data_vec
    from ...utils.manifest import RunManifest

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

        from ...senna.topic import TopicArgs as _TArgs
        from ...senna.topic import load_and_collapse as _collapse

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

        from ...data.knowledge import load_frozen_features

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

        from ...data.knowledge import load_frozen_features

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
    mesh = None
    if getattr(args, "data_parallel", False):
        import jax

        if jax.device_count() > 1:
            from ...parallel.mesh import make_mesh

            mesh = make_mesh()
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
            mesh=mesh,
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
    from ...senna.topic import save_model

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


