"""`senna predict` equivalent — held-out latent inference
(`senna/src/predict.rs:242`; eval machinery `topic/eval.rs`).

Loads a trained model (weights + metadata + training gene names),
aligns the held-out backend's gene rows to the training vocabulary
(case-insensitive exact match, many-to-one scatter —
`build_gene_remap`, eval.rs:95-150), then streams cell blocks through
the encoder-only forward at eval and writes the latent parquet.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..data import SparseIoVec
from ..models.encoders import LogSoftmaxEncoder
from ..ops import sparse as sparse_ops
from ..utils.manifest import RunManifest
from .topic import load_data_vec, load_model

log = logging.getLogger(__name__)


@dataclass
class GeneRemap:
    """new-data row -> training gene position (eval.rs:66-76)."""

    new_to_train: np.ndarray  # [D_new] int64, -1 = unmapped
    d_train: int

    @property
    def n_mapped(self) -> int:
        return int((self.new_to_train >= 0).sum())


def build_gene_remap(training_genes: Sequence[str], new_genes: Sequence[str]) -> GeneRemap:
    """Case-insensitive exact match with a flexible fallback on
    `_`-delimited tokens (ENSG..._CD8A <-> CD8A; eval.rs:95-150)."""
    train_pos = {str(g).lower(): i for i, g in enumerate(training_genes)}
    # token index for the flexible fallback
    token_pos: dict[str, int] = {}
    for i, g in enumerate(training_genes):
        for tok in str(g).lower().split("_"):
            token_pos.setdefault(tok, i)

    out = np.full(len(new_genes), -1, np.int64)
    for j, g in enumerate(new_genes):
        gl = str(g).lower()
        if gl in train_pos:
            out[j] = train_pos[gl]
            continue
        for tok in gl.split("_"):
            if tok in token_pos:
                out[j] = token_pos[tok]
                break
    return GeneRemap(new_to_train=out, d_train=len(training_genes))


def refine_topic_proportions(
    log_z: jnp.ndarray,  # [N, K] encoder log-softmax output
    x: jnp.ndarray,  # [N, D] counts (training-vocab aligned)
    log_dict: jnp.ndarray,  # [D, K] bias-free log dictionary
    *,
    steps: int = 10,
    lr: float = 0.01,
    reg: float = 1.0,
) -> jnp.ndarray:
    """Inference-time per-cell refinement (`senna eval-topic
    --refine-steps`; candle_util/topic_refinement.rs): gradient steps on
    the topic logits against the frozen decoder's multinomial
    likelihood, L2-anchored to the encoder output. Returns refined
    log-probabilities."""
    import jax

    init = jax.lax.stop_gradient(log_z)
    beta_kd = jnp.exp(log_dict.T)  # [K, D] simplex rows over D
    x_pos = jnp.maximum(x, 0.0)

    def loss_fn(logits):
        lz = jax.nn.log_softmax(logits, axis=1)
        # log_recon = logsumexp_k(lz + log_dict) as ONE MXU matmul in
        # linear space (decoders._forward_log rationale: beta columns
        # are softmaxes over D so products stay above f32 denormals;
        # the [N, K, D] broadcast form is 1 GB at D=34k, block N=800)
        log_recon = jnp.log(jnp.exp(lz) @ beta_kd + 1e-30)
        llik = (x_pos * log_recon).sum(axis=1)
        l2 = ((logits - init) ** 2).sum()
        return reg * l2 - llik.mean()

    grad_fn = jax.grad(loss_fn)

    def step(logits, _):
        return logits - lr * grad_fn(logits), None

    import jax.lax as lax

    out, _ = lax.scan(step, init, None, length=steps)
    return jax.nn.log_softmax(out, axis=1)


@dataclass
class PredictArgs:
    data_files: Sequence[str] = ()
    model: str = ""  # output prefix of a `senna topic` run
    out: str = "predict"
    block_size: int = 4096
    # eval-topic extras (senna/src/eval_topic.rs): per-batch null
    # stream + inference-time refinement against the frozen dictionary
    batch_files: Optional[Sequence[str]] = None
    refine_steps: int = 0
    refine_lr: float = 0.01
    refine_reg: float = 1.0
    # decoder-only latent inference (predict.rs:288 LatentMode): skip
    # the encoder, optimize theta against the frozen dictionary from a
    # uniform start (steps default 100, lr default 0.05)
    decoder_only: bool = False
    # TMLE delta refinement sweeps over the plug-in per-batch delta
    # (predict_tmle.rs:143 iterate_delta_dense; 0 = plug-in only)
    delta_iters: int = 0
    # residual-expression backend: x / (mu * lambda) per cell, entries
    # > threshold written to a NEW .zarr/.h5 (predict.rs:1355)
    residual_out: Optional[str] = None
    residual_include_delta: bool = False
    residual_threshold: float = 0.0


# delta estimation guards (predict_common.rs:19-23)
_DELTA_CLAMP_MIN = 0.01
_DELTA_CLAMP_MAX = 100.0
_DELTA_PRED_EPS = 1e-10


def estimate_plugin_delta(
    vec: SparseIoVec,
    remap: GeneRemap,
    cell_batch: np.ndarray,
    log_dict: np.ndarray,  # [D_train, K]
    theta_mean: np.ndarray | None,
    *,
    block_size: int = 4096,
) -> np.ndarray:
    """Plug-in per-batch delta on the TRAINING gene axis
    (predict_common.rs:140 estimate_delta): delta[d, b] =
    (pb_new[d, b] / lib_b) / predicted[d], predicted = theta-bar-
    weighted dictionary marginal, clamped to [0.01, 100]."""
    from ..data.visitors import visit_columns_by_block

    d_train, k = log_dict.shape
    n_batches = int(cell_batch.max()) + 1
    w = (
        theta_mean / max(float(theta_mean.sum()), 1e-12)
        if theta_mean is not None and theta_mean.sum() > 0
        else np.full(k, 1.0 / k, np.float32)
    )
    predicted = np.exp(log_dict) @ w.astype(np.float32)  # [D_train]
    s = float(predicted.sum())
    if s > 0:
        predicted = predicted / s

    pb = np.zeros((d_train, n_batches), np.float64)
    row_map = np.where(remap.new_to_train >= 0, remap.new_to_train, remap.d_train)
    for blk in visit_columns_by_block(vec, block_size=block_size):
        mapped = row_map[np.clip(blk.row_ids, 0, len(row_map) - 1)]
        keep = (mapped < d_train) & (blk.col_ids < blk.ncols)
        b = cell_batch[blk.lb + blk.col_ids[keep]]
        np.add.at(pb, (mapped[keep], b), blk.vals[keep])

    delta = np.ones((d_train, n_batches), np.float32)
    for b in range(n_batches):
        lib = pb[:, b].sum()
        if lib <= 0:
            continue
        obs_prop = pb[:, b] / lib
        delta[:, b] = np.clip(
            obs_prop / np.maximum(predicted, _DELTA_PRED_EPS),
            _DELTA_CLAMP_MIN,
            _DELTA_CLAMP_MAX,
        ).astype(np.float32)
    return delta


def iterate_delta_dense(
    n_iters: int,
    delta: np.ndarray,  # [D_train, B]
    vec: SparseIoVec,
    encoder,
    variables: dict,
    remap: GeneRemap,
    log_dict: np.ndarray,  # [D_train, K]
    phi: np.ndarray | None,  # [D_train] NB dispersion or None
    cell_batch: np.ndarray,
    *,
    block_size: int = 4096,
) -> np.ndarray:
    """TMLE delta sweeps (predict_tmle.rs:143): each iteration encodes
    every cell with the CURRENT delta as its null column, forms the
    per-cell predicted rate mu = lib * (theta @ exp(beta).T), and
    re-solves delta[d, b] = sum_b w x / sum_b w mu with NB-Fisher
    weights w = phi / (mu + phi) (uniform when phi is None)."""
    import jax

    from ..data.visitors import visit_columns_by_block
    from ..ops import sparse as sparse_ops

    d_train = log_dict.shape[0]
    n_batches = delta.shape[1]
    exp_beta = jnp.asarray(np.exp(log_dict))  # [D_train, K]
    phi_j = jnp.asarray(phi) if phi is not None else None
    enc_vars = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }
    row_map = np.where(remap.new_to_train >= 0, remap.new_to_train, remap.d_train)

    @partial(jax.jit, static_argnames=("ncols",))
    def block_sums(rows, cols, vals, null_nd, *, ncols):
        x = sparse_ops.densify_block(
            rows, cols, vals, ncols=ncols, num_genes=d_train + 1
        )[:, :d_train]
        log_z, _ = encoder.apply(enc_vars, x, null_nd, train=False)
        theta = jnp.exp(log_z)  # [N, K]
        lib = x.sum(axis=1, keepdims=True)
        mu = lib * (theta @ exp_beta.T)  # [N, D_train]
        w = phi_j / (mu + phi_j) if phi_j is not None else jnp.ones_like(mu)
        return w * x, w * mu  # [N, D_train] each

    for _ in range(max(n_iters, 0)):
        obs = np.zeros((d_train, n_batches), np.float64)
        pred = np.zeros((d_train, n_batches), np.float64)
        for blk in visit_columns_by_block(vec, block_size=block_size):
            mapped = row_map[np.clip(blk.row_ids, 0, len(row_map) - 1)]
            b_ids = cell_batch[blk.lb : blk.lb + blk.ncols]
            null_nd = jnp.asarray(delta[:, b_ids].T)  # [N, D_train]
            o, p = block_sums(
                jnp.asarray(mapped.astype(np.int32)),
                sparse_ops.block_col_ids(blk),
                jnp.asarray(blk.vals),
                null_nd,
                ncols=blk.ncols,
            )
            o, p = np.asarray(o, np.float64), np.asarray(p, np.float64)
            np.add.at(obs.T, b_ids, o)
            np.add.at(pred.T, b_ids, p)
        delta = np.clip(
            obs / np.maximum(pred, _DELTA_PRED_EPS),
            _DELTA_CLAMP_MIN,
            _DELTA_CLAMP_MAX,
        ).astype(np.float32)
    return delta


def write_residual_backend(
    args: PredictArgs,
    vec: SparseIoVec,
    z_nk: np.ndarray,  # [N, K] log-topic proportions
    log_dict: np.ndarray,  # [D_train, K]
    delta_db: np.ndarray | None,
    remap: GeneRemap,
    cell_batch: np.ndarray | None,
) -> None:
    """Residual expression backend (predict.rs:1355
    write_residual_backend): per cell j, x_dj <- x_dj / (mu_dj l_j)
    with l_j = sum x / sum mu over x's support and mu = exp(beta) theta
    scattered through the gene remap (optionally times the per-batch
    delta). Entries > threshold write to a NEW .zarr/.h5 with names."""
    import scipy.sparse as sp

    from ..data.sparse_io import create_sparse_from_csc

    path = args.residual_out
    exp_beta = np.exp(log_dict)  # [D_train, K]
    theta = np.exp(z_nk)  # [N, K]
    d_test = vec.num_rows
    n = vec.num_columns
    # new-axis gene -> train-axis gene (or -1 = absent, mu 0, pass through)
    new_to_train = remap.new_to_train

    blocks = []
    bs = args.block_size
    for lb in range(0, n, bs):
        ub = min(lb + bs, n)
        csc = vec.read_columns_csc(np.arange(lb, ub))
        pred_dn = exp_beta @ theta[lb:ub].T  # [D_train, n_block]
        data = csc.data.copy()
        for jloc in range(ub - lb):
            s, e = csc.indptr[jloc], csc.indptr[jloc + 1]
            rows = csc.indices[s:e]
            tr = new_to_train[rows]
            mu = np.where(tr >= 0, pred_dn[np.maximum(tr, 0), jloc], 0.0)
            if delta_db is not None and args.residual_include_delta and cell_batch is not None:
                mu = mu * np.where(
                    tr >= 0, delta_db[np.maximum(tr, 0), cell_batch[lb + jloc]], 1.0
                )
            x = csc.data[s:e]
            mu_sum = float(mu.sum())
            lam = float(x.sum()) / mu_sum if mu_sum > 0 else 1.0
            denom = mu * lam
            data[s:e] = np.where(denom > 0, x / np.maximum(denom, 1e-30), x)
        out = sp.csc_matrix((data, csc.indices.copy(), csc.indptr.copy()), shape=csc.shape)
        if args.residual_threshold > 0:
            out.data[out.data <= args.residual_threshold] = 0.0
            out.eliminate_zeros()
        blocks.append(out)

    residual = sp.hstack(blocks, format="csc") if blocks else sp.csc_matrix((d_test, 0))
    backend = create_sparse_from_csc(residual, path)
    backend.register_row_names(vec.row_names())
    backend.register_column_names(vec.column_names())
    log.info(
        "wrote residual backend %s (%d x %d, %d nnz)",
        path, d_test, n, residual.nnz,
    )


def predict_model(args: PredictArgs) -> np.ndarray:
    import pandas as pd

    meta, variables, train_genes = load_model(args.model)
    import jax

    # npz round-trip yields numpy leaves; indexed-model gathers index
    # params with traced ids, which numpy arrays reject
    variables = jax.tree.map(jnp.asarray, variables)
    vec = load_data_vec(args.data_files)
    remap = build_gene_remap(train_genes, vec.row_names())
    log.info(
        "predict: %d/%d held-out genes map to training vocab",
        remap.n_mapped,
        len(remap.new_to_train),
    )

    # model-type dispatch (predict.rs:287): dense topic / vae / masked
    # per-batch null stream (eval_topic.rs batch-delta re-estimation
    # role, expressed in this architecture's encoder-null convention:
    # each cell's null input is its batch's mean profile on the
    # training gene axis)
    cell_batch = batch_profiles = None
    if args.batch_files:
        labels = []
        for bf in args.batch_files:
            with open(bf) as f:
                labels.extend(line.strip() for line in f if line.strip())
        if len(labels) != vec.num_columns:
            raise ValueError(
                f"batch files list {len(labels)} cells, backend has {vec.num_columns}"
            )
        _, cell_batch = np.unique(np.asarray(labels), return_inverse=True)
        batch_profiles = _batch_mean_profiles(
            vec, remap, cell_batch, block_size=args.block_size
        )

    log_dict = None
    if (
        args.refine_steps > 0
        or args.decoder_only
        or args.residual_out
        or (cell_batch is not None and args.delta_iters > 0)
    ):
        log_dict = _load_log_dictionary(args.model, train_genes)

    kind = meta.get("model_type", "topic")
    if kind.startswith("masked"):
        z = score_masked_backend(vec, meta, variables, remap)
        col = "topic" if meta.get("latent", "simplex") != "gaussian" else "z"
    elif kind == "vae":
        from ..models.encoders import GaussianEncoder

        encoder = GaussianEncoder(
            n_latent=meta["n_topics"], layers=tuple(meta["encoder_layers"])
        )
        z = score_dense_backend(
            vec, encoder, variables, remap, block_size=args.block_size,
            cell_batch=cell_batch, batch_profiles=batch_profiles,
        )
        col = "z"
    else:
        encoder = LogSoftmaxEncoder(
            n_topics=meta["n_topics"], layers=tuple(meta["encoder_layers"])
        )
        # per-batch delta on the training axis: plug-in estimate
        # (predict_common.rs:140) + optional TMLE sweeps
        # (predict_tmle.rs:143); feeds the residual backend and is
        # written as {out}.delta.parquet
        delta_db = None
        if cell_batch is not None and log_dict is not None and args.delta_iters >= 0:
            theta_mean = _load_theta_mean(args.model)
            delta_db = estimate_plugin_delta(
                vec, remap, cell_batch, log_dict, theta_mean,
                block_size=args.block_size,
            )
            if args.delta_iters > 0:
                phi = _load_dispersion(args.model, train_genes)
                delta_db = iterate_delta_dense(
                    args.delta_iters, delta_db, vec, encoder, variables,
                    remap, log_dict, phi, cell_batch,
                    block_size=args.block_size,
                )
        # decoder-only inference defaults (predict.rs:365-377)
        refine_steps = args.refine_steps
        refine_lr = args.refine_lr
        if args.decoder_only:
            if refine_steps == 0:
                refine_steps = 100
            if refine_lr <= 0.01:
                refine_lr = 0.05
        z = score_dense_backend(
            vec, encoder, variables, remap, block_size=args.block_size,
            cell_batch=cell_batch, batch_profiles=batch_profiles,
            log_dict=log_dict, refine_steps=refine_steps,
            refine_lr=refine_lr, refine_reg=args.refine_reg,
            decoder_only=args.decoder_only,
        )
        col = "topic"
        if args.residual_out:
            write_residual_backend(
                args, vec, z, log_dict, delta_db, remap, cell_batch
            )
        if delta_db is not None:
            pd.DataFrame(
                delta_db,
                index=[str(g) for g in train_genes],
                columns=[f"batch{b}" for b in range(delta_db.shape[1])],
            ).reset_index(names="gene").to_parquet(f"{args.out}.delta.parquet")

    cells = vec.column_names()
    pd.DataFrame(
        z, index=cells, columns=[f"{col}{k}" for k in range(z.shape[1])]
    ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")
    outputs = {"latent": f"{args.out}.latent.parquet"}
    if args.residual_out:
        outputs["residual"] = str(args.residual_out)
    RunManifest(
        command="predict",
        inputs={"data_files": list(args.data_files), "model": args.model},
        outputs=outputs,
    ).save(args.out)
    return z


def _load_theta_mean(model_prefix: str) -> np.ndarray | None:
    """Training topic marginal theta-bar from {model}.pb_latent.parquet
    (stored in linear space); None -> uniform fallback."""
    import os

    import pandas as pd

    path = f"{model_prefix}.pb_latent.parquet"
    if not os.path.exists(path):
        return None
    df = pd.read_parquet(path)
    cols = [c for c in df.columns if c.startswith("topic")]
    return df[cols].to_numpy(np.float32).mean(0) if cols else None


def _load_dispersion(model_prefix: str, train_genes) -> np.ndarray | None:
    """Per-gene NB dispersion phi from {model}.dispersion.parquet,
    reindexed onto the training gene order (model_metadata.rs:298)."""
    import os

    import pandas as pd

    path = f"{model_prefix}.dispersion.parquet"
    if not os.path.exists(path):
        return None
    df = pd.read_parquet(path).set_index("gene")
    phi = np.full(len(train_genes), 2.0, np.float32)
    for i, g in enumerate(train_genes):
        if str(g) in df.index:
            phi[i] = float(df.loc[str(g), "dispersion"])
    return phi


def _load_log_dictionary(model_prefix: str, train_genes) -> np.ndarray:
    """[D_train, K] log dictionary from `{model}.dictionary.parquet`,
    reindexed onto the training gene order."""
    import pandas as pd

    df = pd.read_parquet(f"{model_prefix}.dictionary.parquet")
    df = df.set_index(df.columns[0])
    mat = df.to_numpy(np.float32)
    if np.all(mat <= 0):  # stored as log already
        logd = mat
    else:
        logd = np.log(np.maximum(mat, 1e-12))
    pos = {str(g): i for i, g in enumerate(df.index)}
    out = np.full((len(train_genes), mat.shape[1]), np.log(1e-12), np.float32)
    for i, g in enumerate(train_genes):
        j = pos.get(str(g))
        if j is not None:
            out[i] = logd[j]
    return out


def _batch_mean_profiles(
    vec: SparseIoVec, remap: GeneRemap, cell_batch: np.ndarray, *, block_size: int
) -> np.ndarray:
    """[B, D_train] per-batch mean expression on the training gene
    axis (the encoder-null stream for held-out batches)."""
    from ..data.visitors import visit_columns_by_block

    n_batches = int(cell_batch.max()) + 1
    sums = np.zeros((n_batches, remap.d_train), np.float64)
    counts = np.zeros(n_batches, np.int64)
    row_map = np.where(remap.new_to_train >= 0, remap.new_to_train, remap.d_train)
    for blk in visit_columns_by_block(vec, block_size=block_size):
        mapped = row_map[np.clip(blk.row_ids, 0, len(row_map) - 1)]
        # skip padded entries (col sentinel = ncols) and unmapped genes
        keep = (mapped < remap.d_train) & (blk.col_ids < blk.ncols)
        b = cell_batch[blk.lb + blk.col_ids[keep]]
        np.add.at(sums, (b, mapped[keep]), blk.vals[keep])
        bc = np.bincount(cell_batch[blk.lb : blk.lb + blk.ncols], minlength=n_batches)
        counts += bc
    return (sums / np.maximum(counts, 1)[:, None]).astype(np.float32)


def score_dense_backend(
    vec: SparseIoVec,
    encoder,
    variables: dict,
    remap: GeneRemap,
    *,
    block_size: int = 4096,
    cell_batch: np.ndarray | None = None,
    batch_profiles: np.ndarray | None = None,
    log_dict: np.ndarray | None = None,
    refine_steps: int = 0,
    refine_lr: float = 0.01,
    refine_reg: float = 1.0,
    decoder_only: bool = False,
) -> np.ndarray:
    """Stream blocks -> scatter counts into training gene positions ->
    encoder eval forward (predict.rs:444 `score_dense_backend`);
    optional per-batch null stream + inference-time refinement.
    `decoder_only` skips the encoder and optimizes theta against the
    frozen dictionary from a uniform start (predict.rs:288
    LatentMode::DecoderOnly)."""
    from ..data.visitors import visit_columns_by_block

    n = vec.num_columns
    # remap rows at the COO level: new row id -> train row id (or discard)
    row_map = np.where(remap.new_to_train >= 0, remap.new_to_train, remap.d_train)
    enc_vars = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }
    ld = jnp.asarray(log_dict) if log_dict is not None else None
    out = None
    for blk in visit_columns_by_block(vec, block_size=block_size):
        mapped_rows = row_map[blk.row_ids]
        keep = mapped_rows < remap.d_train
        # scatter into [B, D_train + 1] then trim the discard gene slot
        x = np.asarray(
            sparse_ops.densify_block(
                jnp.asarray(np.where(keep, mapped_rows, remap.d_train).astype(np.int32)),
                sparse_ops.block_col_ids(blk),
                jnp.asarray(blk.vals),
                ncols=blk.ncols,
                num_genes=remap.d_train + 1,
            )
        )[:, : remap.d_train]
        null = (
            jnp.asarray(batch_profiles[cell_batch[blk.lb : blk.lb + blk.ncols]])
            if batch_profiles is not None
            else None
        )
        if decoder_only:
            if ld is None:
                raise ValueError("decoder-only inference needs the model dictionary")
            k = ld.shape[1]
            log_z = jnp.full((x.shape[0], k), -np.log(k), jnp.float32)
            log_z = refine_topic_proportions(
                log_z, jnp.asarray(x), ld,
                steps=refine_steps, lr=refine_lr, reg=refine_reg,
            )
        else:
            log_z, _ = encoder.apply(enc_vars, jnp.asarray(x), null, train=False)
            if refine_steps > 0 and ld is not None:
                log_z = refine_topic_proportions(
                    log_z, jnp.asarray(x), ld,
                    steps=refine_steps, lr=refine_lr, reg=refine_reg,
                )
        if out is None:
            out = np.zeros((n, log_z.shape[1]), np.float32)
        out[blk.lb : blk.lb + blk.ncols] = np.asarray(log_z)
    return out if out is not None else np.zeros((0, 0), np.float32)


def score_masked_backend(vec, meta: dict, variables: dict, remap: GeneRemap) -> np.ndarray:
    """Held-out inference for the masked/indexed models
    (predict.rs:886 `score_masked_backend`): build top-K windows on the
    held-out data, remap window gene ids into the TRAINING vocabulary
    (unmapped genes drop to the pad slot), and run the indexed encoder
    at eval."""
    from ..models.indexed import MaskedTopicModel, build_topk_windows, encode_all

    window = int(meta.get("window", 128))
    data = build_topk_windows(vec, window)
    d_train = remap.d_train
    row_map = np.where(remap.new_to_train >= 0, remap.new_to_train, d_train)
    # held-out ids index the NEW gene axis (pad = d_new); remap into the
    # training axis with pad -> d_train
    ids = data.ids.copy()
    pad_mask = ids >= vec.num_rows
    ids = row_map[np.clip(ids, 0, vec.num_rows - 1)]
    ids[pad_mask] = d_train
    data.ids = ids.astype(np.int32)
    data.n_genes = d_train
    # log_q over the training axis (selection-frequency of the remapped ids)
    counts = np.zeros(d_train + 1, np.float64)
    np.add.at(counts, data.ids.reshape(-1), 1.0)
    freq = counts / max(counts[:d_train].sum(), 1.0)
    data.log_q = np.log(np.maximum(freq, 1e-12)).astype(np.float32)

    model = MaskedTopicModel(
        n_genes=d_train,
        n_topics=int(meta["n_topics"]),
        embed_dim=int(meta.get("embed_dim", 64)),
        latent=meta.get("latent", "simplex"),
        n_gene_modules=int(meta.get("gene_modules", 0)),
    )
    raw = meta.get("latent") == "gaussian"
    return encode_all(model, variables, data, raw_latent=raw)
