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


@dataclass
class PredictArgs:
    data_files: Sequence[str] = ()
    model: str = ""  # output prefix of a `senna topic` run
    out: str = "predict"
    block_size: int = 4096


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
            vec, encoder, variables, remap, block_size=args.block_size
        )
        col = "z"
    else:
        encoder = LogSoftmaxEncoder(
            n_topics=meta["n_topics"], layers=tuple(meta["encoder_layers"])
        )
        z = score_dense_backend(
            vec, encoder, variables, remap, block_size=args.block_size
        )
        col = "topic"

    cells = vec.column_names()
    pd.DataFrame(
        z, index=cells, columns=[f"{col}{k}" for k in range(z.shape[1])]
    ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")
    RunManifest(
        command="predict",
        inputs={"data_files": list(args.data_files), "model": args.model},
        outputs={"latent": f"{args.out}.latent.parquet"},
    ).save(args.out)
    return z


def score_dense_backend(
    vec: SparseIoVec,
    encoder,
    variables: dict,
    remap: GeneRemap,
    *,
    block_size: int = 4096,
) -> np.ndarray:
    """Stream blocks -> scatter counts into training gene positions ->
    encoder eval forward (predict.rs:444 `score_dense_backend`)."""
    from ..data.visitors import visit_columns_by_block

    n = vec.num_columns
    d_new = vec.num_rows
    # remap rows at the COO level: new row id -> train row id (or discard)
    row_map = np.where(remap.new_to_train >= 0, remap.new_to_train, remap.d_train)
    enc_vars = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }
    out = None
    for blk in visit_columns_by_block(vec, block_size=block_size):
        mapped_rows = row_map[blk.row_ids]
        keep = mapped_rows < remap.d_train
        # scatter into [B, D_train + 1] then trim the discard gene slot
        x = np.asarray(
            sparse_ops.densify_block(
                jnp.asarray(np.where(keep, mapped_rows, remap.d_train).astype(np.int32)),
                jnp.asarray(blk.col_ids),
                jnp.asarray(blk.vals),
                ncols=blk.ncols,
                num_genes=remap.d_train + 1,
            )
        )[:, : remap.d_train]
        log_z, _ = encoder.apply(enc_vars, jnp.asarray(x), None, train=False)
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
    )
    raw = meta.get("latent") == "gaussian"
    return encode_all(model, variables, data, raw_latent=raw)
