"""`senna vae` — scVI-style Gaussian-latent VAE on the multilevel
pseudobulk ladder (`senna/src/main.rs` Train group `vae`;
`encoder/gaussian.rs` + gene-axis-softmax NB decoder).

Rides the same load/collapse machinery as `senna topic`; the latent is
a free Gaussian (no simplex map), the decoder a linear gene-axis
softmax with NB noise, so the dictionary read is the factor-loading
matrix rather than topic profiles.
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoders import GaussianNbDecoder
from ..models.encoders import GaussianEncoder
from ..models.train import LevelData, MixedTrainer, TrainConfig
from ..ops import sparse as sparse_ops
from ..utils.manifest import RunManifest
from ..utils.prng import DEFAULT_PROJECTION_SEED
from .topic import TopicArgs, load_and_collapse, load_data_vec, sample_collapsed_data

log = logging.getLogger(__name__)


@dataclass
class VaeArgs:
    data_files: Sequence[str] = ()
    out: str = "vae"
    batch_files: Optional[Sequence[str]] = None
    n_latent: int = 16
    encoder_layers: Sequence[int] = (128, 64)
    epochs: int = 500
    minibatch_size: int = 100
    learning_rate: float = 0.01
    grad_clip: float = 1.0
    proj_dim: int = 50
    sort_dim: int = 10
    num_levels: int = 2
    iter_opt: int = 30
    ignore_batch: bool = False
    block_size: int = 8192
    # manifest chaining + warm start (vae.rs from/init_from fields)
    from_run: Optional[str] = None
    init_from: Optional[str] = None
    # eval null plane selection (vae.rs adj_method)
    adj_method: str = "residual"
    # QC keep mask + HVG sketch gate (vae.rs qc/hvg flattened args)
    qc: bool = False
    qc_min_total: float = 0.0
    qc_min_genes: int = 0
    qc_max_mito_frac: float = 1.0
    hvg_genes: int = 5000
    seed: int = DEFAULT_PROJECTION_SEED
    # dp-shard pseudobulk rows over all visible devices (MixedTrainer
    # mesh path; params replicate, XLA inserts the grad psum)
    data_parallel: bool = False


def fit_vae(args: VaeArgs) -> dict:
    import pandas as pd

    if args.from_run:
        from ..utils.manifest import RunManifest as _RM

        prev = _RM.load(
            args.from_run if args.from_run.endswith(".json")
            else args.from_run + ".senna.json"
        )
        if not args.data_files:
            args.data_files = prev.inputs.get("data_files", [])
        if args.batch_files is None and prev.inputs.get("batch_files"):
            args.batch_files = prev.inputs["batch_files"]

    vec = load_data_vec(args.data_files, args.batch_files)
    if args.qc:
        from ..data.qc import compute_cell_qc

        qs = compute_cell_qc(vec, block_size=args.block_size)
        keep = qs.keep_mask(
            min_total=args.qc_min_total,
            min_genes=args.qc_min_genes,
            max_mito_frac=args.qc_max_mito_frac,
        )
        log.info("vae qc: keeping %d/%d cells", int(keep.sum()), vec.num_columns)
        vec = vec.subset_columns(keep)
    d = vec.num_rows
    topic_args = TopicArgs(
        data_files=args.data_files,
        proj_dim=args.proj_dim,
        sort_dim=args.sort_dim,
        num_levels=args.num_levels,
        iter_opt=args.iter_opt,
        ignore_batch=args.ignore_batch,
        block_size=args.block_size,
        hvg_genes=args.hvg_genes,
        seed=args.seed,
    )
    levels = load_and_collapse(vec, topic_args)
    key = jax.random.key(args.seed & 0x7FFFFFFF)
    key, *lkeys = jax.random.split(key, 1 + len(levels.collapsed))
    level_data = [
        sample_collapsed_data(out, k) for out, k in zip(levels.collapsed, lkeys)
    ]

    encoder = GaussianEncoder(n_latent=args.n_latent, layers=tuple(args.encoder_layers))
    decoders = [GaussianNbDecoder(n_features=d, n_topics=args.n_latent) for _ in level_data]
    mesh = None
    if args.data_parallel and jax.device_count() > 1:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
    trainer = MixedTrainer(
        encoder,
        decoders,
        TrainConfig(
            epochs=args.epochs,
            minibatch_size=args.minibatch_size,
            learning_rate=args.learning_rate,
            grad_clip=args.grad_clip,
            topic_smoothing=0.0,  # Gaussian latent: no simplex smoothing
            seed=args.seed & 0x7FFFFFFF,
        ),
        mesh=mesh,
    )
    init_params = None
    if args.init_from:
        from .topic import load_model

        meta, warm_vars, _ = load_model(args.init_from)
        if meta.get("n_topics") != args.n_latent or meta.get("n_features") != d:
            raise ValueError(
                f"vae init-from architecture mismatch: {meta} vs "
                f"H={args.n_latent}, D={d}"
            )
        init_params = warm_vars["params"]
        log.info("vae warm start from %s", args.init_from)
    variables, _, scores = trainer.train(level_data, key, init_params=init_params)

    # per-cell latent: stream blocks through the eval encoder
    from ..data.visitors import visit_columns_by_block

    finest = levels.collapsed[0]
    groups = levels.groups_per_level[0]
    # null plane by adj_method (topic/common.rs:55-85 convention)
    if args.adj_method == "batch" and finest.delta is not None:
        null_ds = np.asarray(finest.delta.mean())
        groups = vec.batch_membership()
    else:
        null_ds = (
            np.asarray(finest.mu_residual.mean())
            if finest.mu_residual is not None
            else None
        )
    n = vec.num_columns
    z = np.zeros((n, args.n_latent), np.float32)
    for blk in visit_columns_by_block(vec, block_size=args.minibatch_size * 8):
        x = np.asarray(
            sparse_ops.densify_block(
                jnp.asarray(blk.row_ids), sparse_ops.block_col_ids(blk),
                jnp.asarray(blk.vals), ncols=blk.ncols, num_genes=d,
            )
        )
        null = (
            null_ds[:, groups[blk.lb : blk.lb + blk.ncols]].T
            if null_ds is not None
            else None
        )
        z[blk.lb : blk.lb + blk.ncols] = trainer.encode(variables, x, null)

    pd.DataFrame(
        z, index=vec.column_names(), columns=[f"z{k}" for k in range(args.n_latent)]
    ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")
    loadings = np.asarray(
        decoders[0].apply(
            {"params": variables["params"]["decoder_0"]}, method="get_dictionary"
        )
    )
    pd.DataFrame(
        loadings, index=vec.row_names(),
        columns=[f"z{k}" for k in range(args.n_latent)],
    ).reset_index(names="gene").to_parquet(f"{args.out}.loadings.parquet")
    pd.DataFrame(
        {"epoch": np.arange(len(scores.llik)), "llik": scores.llik, "kl": scores.kl}
    ).to_parquet(f"{args.out}.log_likelihood.parquet")
    from .topic import save_model

    save_model(
        args.out, variables, args, d, vec.row_names(), model_type="vae"
    )
    RunManifest(
        command="vae",
        inputs={"data_files": list(args.data_files)},
        outputs={
            "latent": f"{args.out}.latent.parquet",
            "loadings": f"{args.out}.loadings.parquet",
            "log_likelihood": f"{args.out}.log_likelihood.parquet",
        },
        params=dataclasses.asdict(args),
    ).save(args.out)
    log.info("vae: wrote %s.latent.parquet", args.out)
    return {"latent": z, "loadings": loadings, "scores": scores}
