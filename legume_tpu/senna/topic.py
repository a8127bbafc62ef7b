"""`senna topic` equivalent — the flagship multilevel pseudobulk topic
model (call-stack parity: SURVEY.md section 3.1; `senna/src/topic/cmd.rs:273`).

Pipeline:

1. load backends into a `SparseIoVec`;
2. streaming JL projection (+ batch centering) of all cells;
3. binary-sort cells into fine pseudobulk groups
   (`random_projection.rs:535`), level ladder by masking sort bits
   (`refine.rs:606-622`);
4. per level: sufficient stats (basic / batch / counterfactual
   matched) -> Poisson-Gamma `optimize` -> `CollapsedOut`;
5. per-level training triples by posterior SAMPLING of the collapsed
   planes (`topic/common.rs:142-159`): encoder input ~ mu_observed,
   batch null ~ mu_residual, target ~ mu_adjusted;
6. shared `LogSoftmaxEncoder` + one decoder per level, `train_mixed`;
7. write `{out}.latent.parquet` (per-cell log-topic proportions via a
   streaming encoder pass), `{out}.pb_latent.parquet`, `{out}.dictionary.parquet`,
   llik/kl traces, model weights + metadata, and a `{out}.senna.json`
   manifest.
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass, field
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data import SparseIoVec, open_sparse_matrix
from ..models.decoders import DECODERS
from ..models.encoders import LogSoftmaxEncoder
from ..models.train import LevelData, MixedTrainer, TrainConfig
from ..ops import collapse as clp
from ..ops import random_projection as rp
from ..ops import sparse as sparse_ops
from ..ops.gamma import GammaParam
from ..utils.manifest import RunManifest
from ..utils.prng import DEFAULT_PROJECTION_SEED

log = logging.getLogger(__name__)

DEFAULT_COARSEST_SORT_DIM = 7  # stats.rs:598


@dataclass
class TopicArgs:
    """CLI-parity defaults (senna/src/topic/cmd.rs:37-270,
    refine_weighting.rs:126-185)."""

    data_files: Sequence[str] = ()
    out: str = "topic"
    batch_files: Optional[Sequence[str]] = None
    n_latent_topics: int = 10
    encoder_layers: Sequence[int] = (128, 1024, 128)
    epochs: int = 1000
    minibatch_size: int = 100
    learning_rate: float = 0.01
    grad_clip: float = 1.0
    decoder: str = "nb"  # reference default "nbmixture"; nb/multinomial/poisson/nb-mixture
    topic_smoothing: float = 1e-4
    proj_dim: int = 50
    sort_dim: int = 10
    knn_cells: int = 10
    num_levels: int = 3
    iter_opt: int = 30
    ignore_batch: bool = False
    block_size: int = 8192
    init_from: Optional[str] = None  # warm start from a prior run's prefix
    from_run: Optional[str] = None  # inherit inputs from a {prefix}.senna.json
    # feature coarsening: cap decoder dims per level (cmd.rs:344-373
    # level ladder; 0 = off, full-D decoders). Coarser levels get
    # proportionally smaller targets down to >= 50 meta-features.
    max_coarse_features: int = 0
    # CNV side-channel during the fit (cmd.rs:536-556 cnv_pseudobulk):
    # HMM copy-number states on the pseudobulk adjusted-mean log-ratios
    cnv: bool = False
    cnv_genes_per_bin: int = 25
    seed: int = DEFAULT_PROJECTION_SEED


def compute_level_sort_dims(finest: int, num_levels: int) -> list[int]:
    """Finest-first sort-dim ladder (refine.rs:606-622)."""
    if num_levels <= 1:
        return [finest]
    coarsest = min(DEFAULT_COARSEST_SORT_DIM, finest)
    dims = []
    for level in range(num_levels):
        t = level / (num_levels - 1)
        dim = round(finest - t * (finest - coarsest))
        if not dims or dims[-1] != dim:
            dims.append(dim)
    return dims


def load_data_vec(data_files: Sequence[str], batch_files=None) -> SparseIoVec:
    vec = SparseIoVec()
    for f in data_files:
        vec.push(open_sparse_matrix(f))
    if batch_files:
        labels = []
        for f in batch_files:
            with open(f) as fh:
                labels.extend(line.strip() for line in fh if line.strip())
        vec.register_batches(np.asarray(labels))
    elif len(data_files) > 1:
        # one batch per backend, the common default
        memb = np.concatenate(
            [
                np.full(open_sparse_matrix(f).num_columns, i, np.int32)
                for i, f in enumerate(data_files)
            ]
        )
        vec.register_batches(memb.astype(str))
    return vec


@dataclass
class CollapsedLevels:
    collapsed: list[clp.CollapsedOut]
    groups_per_level: list[np.ndarray]  # cell -> pb per level, finest first
    num_groups_per_level: list[int]
    proj_kn: np.ndarray
    basis_dk: np.ndarray
    fine_codes: np.ndarray


def load_and_collapse(vec: SparseIoVec, args: TopicArgs) -> CollapsedLevels:
    """Projection + binary sort + multilevel collapse
    (topic/common.rs:419 `load_and_collapse`)."""
    batches = vec.batch_membership()
    num_batches = vec.num_batches if not args.ignore_batch else 1

    basis, proj_kn = rp.project_columns(
        vec,
        max(args.proj_dim, args.n_latent_topics),
        block_size=args.block_size,
        batch_membership=batches if num_batches > 1 else None,
        seed=args.seed,
    )

    level_dims = compute_level_sort_dims(args.sort_dim, args.num_levels)
    fine_codes = rp.binary_sort_columns(proj_kn, level_dims[0], seed=args.seed)

    collapsed = []
    groups_per_level = []
    num_groups_per_level = []
    fine_groups, _ = rp.compact_group_codes(fine_codes)

    # finest-level stats once; coarser levels merge (merge_stat path)
    finest_dim = level_dims[0]
    stats_fine: clp.CollapsedStat | None = None
    for dim in level_dims:
        mask = (1 << dim) - 1
        codes_l = fine_codes & mask
        groups_l, s_l = rp.compact_group_codes(codes_l)
        if stats_fine is None:
            stat_l = clp.collect_basic_stats(
                vec,
                groups_l,
                s_l,
                num_batches=num_batches,
                batches=batches,
                block_size=args.block_size,
            )
            if num_batches > 1:
                stat_l = clp.collect_matched_stats(
                    vec,
                    groups_l,
                    s_l,
                    batches,
                    num_batches,
                    proj_kn.T.copy(),
                    knn=args.knn_cells,
                    stat=stat_l,
                )
            stats_fine = stat_l
            fine_groups_l = groups_l
        else:
            # map finest groups -> this level's groups by masking codes
            fine_code_of_group = np.zeros(len(np.unique(fine_groups_l)), np.int64)
            fine_code_of_group[fine_groups_l] = fine_codes
            coarse_codes = fine_code_of_group & mask
            _, f2c = np.unique(coarse_codes, return_inverse=True)
            stat_l = clp.merge_stat(stats_fine, f2c, int(f2c.max()) + 1)
            groups_l = f2c[fine_groups_l].astype(np.int32)
            s_l = stat_l.num_groups
        out_l = clp.optimize(stat_l, num_iter=args.iter_opt)
        collapsed.append(out_l)
        groups_per_level.append(groups_l)
        num_groups_per_level.append(s_l)

    return CollapsedLevels(
        collapsed=collapsed,
        groups_per_level=groups_per_level,
        num_groups_per_level=num_groups_per_level,
        proj_kn=proj_kn,
        basis_dk=basis,
        fine_codes=fine_codes,
    )


def sample_collapsed_data(
    out: clp.CollapsedOut, key: jax.Array
) -> LevelData:
    """Posterior-sample the training triple (topic/common.rs:142-159)."""
    k1, k2, k3 = jax.random.split(key, 3)
    mixed = np.asarray(out.mu_observed.sample(k1)).T  # [P, D]
    null = (
        np.asarray(out.mu_residual.sample(k2)).T if out.mu_residual is not None else None
    )
    target = (
        np.asarray(out.mu_adjusted.sample(k3)).T if out.mu_adjusted is not None else mixed
    )
    return LevelData(input=mixed, input_null=null, output=target)


def fit_topic_model(args: TopicArgs) -> dict:
    """End-to-end `senna topic` (cmd.rs:273)."""
    import pandas as pd

    if args.from_run:
        # --from inheritance: prefill inputs from a prior run's manifest
        # (run_manifest.rs:848 inherit_from)
        prev = RunManifest.load(
            args.from_run if args.from_run.endswith(".json") else args.from_run + ".senna.json"
        )
        if not args.data_files:
            args.data_files = prev.inputs.get("data_files", [])
        log.info("inherited inputs from %s", args.from_run)

    vec = load_data_vec(args.data_files, args.batch_files)
    d = vec.num_rows
    n = vec.num_columns
    log.info("topic fit: D=%d genes, N=%d cells", d, n)

    levels = load_and_collapse(vec, args)
    key = jax.random.key(args.seed & 0x7FFFFFFF)
    key, *level_keys = jax.random.split(key, 1 + len(levels.collapsed))
    level_data = [
        sample_collapsed_data(out, k) for out, k in zip(levels.collapsed, level_keys)
    ]

    # optional per-level feature coarsening of the DECODER targets
    # (cmd.rs:344-373: finest level gets max_coarse_features, coarser
    # levels linearly down to >= 50; the encoder keeps full D)
    coarsenings = [None] * len(level_data)
    if args.max_coarse_features and args.max_coarse_features < d:
        from ..ops.feature_coarsening import compute_feature_coarsening

        n_levels = len(level_data)
        finest_profile = np.asarray(levels.collapsed[0].mu_observed.mean())
        for i in range(n_levels):
            frac = i / (n_levels - 1) if n_levels > 1 else 0.0
            target = int(
                round(
                    args.max_coarse_features
                    - frac * (args.max_coarse_features - max(args.max_coarse_features // n_levels, 50))
                )
            )
            fc = compute_feature_coarsening(finest_profile, target, seed=args.seed & 0x7FFFFFFF)
            coarsenings[i] = fc
            level_data[i].output = fc.aggregate_columns_nd(level_data[i].target).astype(
                np.float32
            )

    encoder = LogSoftmaxEncoder(n_topics=args.n_latent_topics, layers=tuple(args.encoder_layers))
    dec_cls = DECODERS[args.decoder]
    decoders = [
        dec_cls(
            n_features=(coarsenings[i].num_coarse if coarsenings[i] is not None else d),
            n_topics=args.n_latent_topics,
        )
        for i in range(len(level_data))
    ]

    cfg = TrainConfig(
        epochs=args.epochs,
        minibatch_size=args.minibatch_size,
        learning_rate=args.learning_rate,
        topic_smoothing=args.topic_smoothing,
        grad_clip=args.grad_clip,
        seed=args.seed & 0x7FFFFFFF,
    )
    trainer = MixedTrainer(encoder, decoders, cfg)

    if args.init_from:
        # warm start: strict architecture check before loading
        # (topic/warm_start.rs:18-40)
        meta, warm_vars, warm_genes = load_model(args.init_from)
        if (
            meta["n_topics"] != args.n_latent_topics
            or meta["n_features"] != d
            or list(meta["encoder_layers"]) != list(args.encoder_layers)
        ):
            raise ValueError(
                "init-from architecture mismatch: "
                f"{meta} vs K={args.n_latent_topics}, D={d}, layers={args.encoder_layers}"
            )
        variables, _, scores = trainer.train(
            level_data, key, init_params=warm_vars["params"]
        )
        log.info("warm start from %s applied", args.init_from)
    else:
        variables, _, scores = trainer.train(level_data, key)

    # ---- outputs -------------------------------------------------------
    finest = levels.collapsed[0]
    cell_names = vec.column_names()
    gene_names = vec.row_names()

    # per-cell latent: stream blocks through the encoder at eval
    z = evaluate_latent_by_encoder(
        vec,
        trainer,
        variables,
        finest,
        levels.groups_per_level[0],
        block_size=args.minibatch_size * 8,
    )
    pd.DataFrame(
        z, index=cell_names, columns=[f"topic{k}" for k in range(args.n_latent_topics)]
    ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")

    # pseudobulk latent (finest level)
    pb_input = level_data[0].input
    pb_null = level_data[0].input_null
    pb_log_z = trainer.encode(variables, pb_input, pb_null)
    pd.DataFrame(
        np.exp(pb_log_z), columns=[f"topic{k}" for k in range(args.n_latent_topics)]
    ).to_parquet(f"{args.out}.pb_latent.parquet")

    # dictionary (finest decoder): log beta [D, K]; a coarsened decoder
    # expands back to full D with the -ln(group size) correction
    # (feature_coarsening.rs expand_log_dict_dk)
    dec_params = variables["params"]["decoder_0"]
    log_beta = np.asarray(
        decoders[0].apply({"params": dec_params}, method="get_dictionary")
    )
    if coarsenings[0] is not None:
        log_beta = coarsenings[0].expand_log_dict_dk(log_beta)
    pd.DataFrame(
        log_beta, index=gene_names, columns=[f"topic{k}" for k in range(args.n_latent_topics)]
    ).reset_index(names="gene").to_parquet(f"{args.out}.dictionary.parquet")

    # traces
    pd.DataFrame({"epoch": np.arange(len(scores.llik)), "llik": scores.llik, "kl": scores.kl}).to_parquet(
        f"{args.out}.log_likelihood.parquet"
    )

    # CNV side-channel (cmd.rs:536-556): per-pseudobulk copy-number
    # states from the adjusted means vs their cross-pb shared profile
    if args.cnv:
        from ..cocoa.cnv_call import call_cnv_on_residuals

        # adjusted means when batch correction ran, observed otherwise
        plane = finest.mu_adjusted if finest.mu_adjusted is not None else finest.mu_observed
        mu_dp = np.asarray(plane.mean())  # [D, P]
        cnv = call_cnv_on_residuals(
            mu_dp, mu_dp.mean(1), genes_per_bin=args.cnv_genes_per_bin
        )
        n_pb, n_bins = cnv.states.shape
        pd.DataFrame(
            {
                "pseudobulk": np.repeat(np.arange(n_pb), n_bins),
                "bin": np.tile(np.arange(n_bins), n_pb),
                "state": cnv.states.ravel(),
                "log_ratio": cnv.log_ratio.ravel(),
            }
        ).to_parquet(f"{args.out}.cnv.parquet")
        log.info("cnv side-channel: %d pbs x %d bins", n_pb, n_bins)

    save_model(args.out, variables, args, d, gene_names)

    manifest = RunManifest(
        command="topic",
        inputs={"data_files": list(args.data_files)},
        outputs={
            "latent": f"{args.out}.latent.parquet",
            "pb_latent": f"{args.out}.pb_latent.parquet",
            "dictionary": f"{args.out}.dictionary.parquet",
            "log_likelihood": f"{args.out}.log_likelihood.parquet",
            "model": f"{args.out}.model.npz",
            "model_metadata": f"{args.out}.model.json",
        },
        params=dataclasses.asdict(args),
    )
    manifest.save(args.out)

    return {
        "scores": scores,
        "variables": variables,
        "levels": levels,
        "latent": z,
        "log_beta": log_beta,
    }


def evaluate_latent_by_encoder(
    vec: SparseIoVec,
    trainer: MixedTrainer,
    variables: dict,
    finest: clp.CollapsedOut,
    groups: np.ndarray,
    *,
    block_size: int = 800,
) -> np.ndarray:
    """Per-cell latent: stream dense cell blocks through the eval
    encoder with the cell's pseudobulk batch-null column
    (`topic/eval.rs:18-63`)."""
    from ..data.visitors import visit_columns_by_block

    d = vec.num_rows
    n = vec.num_columns
    null_ds = (
        np.asarray(finest.mu_residual.mean()) if finest.mu_residual is not None else None
    )
    out = np.zeros((n, trainer.encoder.n_topics), np.float32)
    for blk in visit_columns_by_block(vec, block_size=block_size):
        x = np.asarray(
            sparse_ops.densify_block(
                jnp.asarray(blk.row_ids),
                jnp.asarray(blk.col_ids),
                jnp.asarray(blk.vals),
                ncols=blk.ncols,
                num_genes=d,
            )
        )
        null = (
            null_ds[:, groups[blk.lb : blk.lb + blk.ncols]].T if null_ds is not None else None
        )
        out[blk.lb : blk.lb + blk.ncols] = trainer.encode(variables, x, null)
    return out


def save_model(out: str, variables: dict, args: TopicArgs, n_features: int, gene_names):
    """Weights + strict metadata round-trip
    (`topic/model_metadata.rs:130-226`)."""
    import json

    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    np.savez(f"{out}.model.npz", **{k: np.asarray(v) for k, v in flat.items()})
    meta = {
        "model_type": "topic",
        "n_topics": args.n_latent_topics,
        "n_features": n_features,
        "encoder_layers": list(args.encoder_layers),
        "decoder": args.decoder,
        "num_levels": args.num_levels,
        "gene_names_file": f"{out}.genes.txt",
    }
    with open(f"{out}.model.json", "w") as f:
        json.dump(meta, f, indent=2)
    with open(f"{out}.genes.txt", "w") as f:
        f.write("\n".join(str(g) for g in gene_names) + "\n")


def load_model(out: str):
    """Strict shape-checked model load (model_metadata.rs:130-149)."""
    import json

    import flax

    with open(f"{out}.model.json") as f:
        meta = json.load(f)
    with np.load(f"{out}.model.npz") as z:
        flat = {k: z[k] for k in z.files}
    variables = flax.traverse_util.unflatten_dict(flat, sep="/")
    with open(meta["gene_names_file"]) as f:
        gene_names = [line.strip() for line in f if line.strip()]
    if len(gene_names) != meta["n_features"]:
        raise ValueError("gene name count disagrees with metadata n_features")
    return meta, variables, gene_names
