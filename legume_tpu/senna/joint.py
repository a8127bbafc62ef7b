"""`senna joint-topic` — multi-modality topic model
(`senna/src/topic/train_joint.rs` equivalent).

Modalities share the cells (same columns); the feature axes
concatenate. One shared encoder sees the concatenated pseudobulk
profile; each modality gets its own decoder scoring its feature slice,
with a `decoder_weights`-weighted likelihood sum — one topic posterior
per cell across modalities.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Sequence

import jax
import numpy as np

from ..models.decoders import DECODERS
from ..models.train import LevelData, MixedTrainer, TrainConfig
from ..ops import collapse as clp
from ..ops import random_projection as rp
from ..utils.prng import DEFAULT_PROJECTION_SEED

log = logging.getLogger(__name__)


@dataclass
class JointTopicArgs:
    n_topics: int = 10
    encoder_layers: Sequence[int] = (128, 128)
    epochs: int = 300
    minibatch_size: int = 100
    learning_rate: float = 0.01
    decoder: str = "nb"
    decoder_weights: Sequence[float] | None = None
    proj_dim: int = 50
    sort_dim: int = 8
    iter_opt: int = 30
    seed: int = DEFAULT_PROJECTION_SEED


def fit_joint_topic(modalities: Sequence, args: JointTopicArgs) -> dict:
    """`modalities`: backends/vecs sharing the SAME cells (columns)."""
    n = modalities[0].num_columns
    for m in modalities[1:]:
        if m.num_columns != n:
            raise ValueError("joint-topic modalities must share cells")

    # groups from the first (primary) modality's projection
    _, proj = rp.project_columns(modalities[0], args.proj_dim, seed=args.seed)
    codes = rp.binary_sort_columns(proj, args.sort_dim, seed=args.seed)
    groups, s = rp.compact_group_codes(codes)

    # per-modality pseudobulk posterior samples with SHARED groups
    key = jax.random.key(args.seed & 0x7FFFFFFF)
    inputs, dims = [], []
    for m in modalities:
        stat = clp.collect_basic_stats(m, groups, s)
        out = clp.optimize(stat, num_iter=args.iter_opt)
        key, k_s = jax.random.split(key)
        inputs.append(np.asarray(out.mu_observed.sample(k_s)).T)  # [P, D_m]
        dims.append(m.num_rows)

    concat = np.concatenate(inputs, axis=1).astype(np.float32)
    slices = []
    off = 0
    for d in dims:
        slices.append((off, off + d))
        off += d

    # per-modality trunks with summed latents (joint_softmax.rs:8-110),
    # NOT one trunk over the concatenation: per-modality BatchNorm keeps
    # a wide modality from dominating a narrow one
    from ..models.encoders import LogSoftmaxJointEncoder

    enc = LogSoftmaxJointEncoder(
        n_topics=args.n_topics, layers=tuple(args.encoder_layers),
        n_features=tuple(dims),
    )
    if args.decoder == "delta":
        # shared-feature-axis modalities: one base dictionary + chain
        # deltas (decoder/delta_topic.rs) instead of per-modality slices
        from ..models.decoders import DeltaTopicDecoder

        if len(set(dims)) != 1:
            raise ValueError(
                "delta decoder needs every modality on the SAME feature axis; "
                f"got dims {dims}"
            )
        decoders = [
            DeltaTopicDecoder(
                n_features=dims[0], n_topics=args.n_topics,
                n_modalities=len(dims),
            )
        ]
    else:
        dec_cls = DECODERS[args.decoder]
        decoders = [[dec_cls(n_features=d, n_topics=args.n_topics) for d in dims]]

    trainer = MixedTrainer(
        enc,
        decoders,
        TrainConfig(
            epochs=args.epochs,
            minibatch_size=args.minibatch_size,
            learning_rate=args.learning_rate,
            seed=args.seed & 0x7FFFFFFF,
        ),
        decoder_weights=list(args.decoder_weights) if args.decoder_weights else None,
    )
    if args.decoder != "delta":
        trainer.target_slices = slices
    variables, _, scores = trainer.train([LevelData(input=concat, input_null=None)], key)

    pb_log_z = trainer.encode(variables, concat)
    return {
        "variables": variables,
        "scores": scores,
        "pb_latent": np.exp(pb_log_z),
        "groups": groups,
        "slices": slices,
    }
