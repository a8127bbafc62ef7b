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
from functools import partial
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
    # one name, or several comma/space-separated names for joint
    # multi-decoder training on the same target (cmd.rs --decoder a,b,c)
    decoder: str = "nb"  # reference default "nbmixture"; nb/multinomial/poisson/nb-mixture
    decoder_weights: Optional[Sequence[float]] = None  # per-decoder loss weights
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

    # which plane feeds the per-cell encoder NULL column at eval
    # (cmd.rs AdjMethod / topic/common.rs:55-85): "residual" indexes
    # mu_residual by pb group, "batch" indexes delta by batch label
    adj_method: str = "residual"

    # Beta prior on the NB-mixture ambient fraction rho
    # (nb_mixture.rs:78-87; 0 = off)
    rho_prior_weight: float = 0.0
    rho_prior_alpha: float = 2.0
    rho_prior_beta: float = 18.0

    # inference-time per-cell refinement of the final latent against the
    # frozen finest dictionary (refine_weighting.rs AmortRefineArgs)
    amort_refine_steps: int = 0
    amort_refine_lr: float = 0.01
    amort_refine_reg: float = 1.0

    # load all columns into one in-memory backend before training
    # (cmd.rs hidden --preload-data)
    preload_data: bool = False
    # ---- full call-stack stages (SURVEY.md section 3.1) ----------------
    # cell QC keep mask before projection (qc_lib.rs:297; off unless
    # requested, matching the reference's Option<QcConfig>)
    qc: bool = False
    qc_min_total: float = 0.0
    qc_min_genes: int = 0
    qc_max_mito_frac: float = 1.0
    # HVG selection gating the projection sketch (hvg.rs:370; reference
    # default n-hvg = 5000; every gene still trains)
    hvg_genes: int = 5000
    # BBKNN + DC-Poisson refinement of the fine partition
    # (refine_multilevel.rs:117, dc_poisson.rs:778)
    refine: bool = True
    refine_gibbs: int = 3
    refine_greedy: int = 3
    # per-gene NB-Fisher decoder weights per level (gene_weighting.rs
    # via cmd.rs:440-463)
    gene_weighting: str = "nb-fisher"  # or "none"
    # anchor prior (anchor_prior.rs; cmd.rs:468-476): beta always
    # initializes from anchors; lambda > 0 adds the CE penalty
    anchor_penalty: float = 0.0
    # feature coarsening: cap decoder dims per level (cmd.rs:344-373
    # level ladder; 0 = off, full-D decoders). Coarser levels get
    # proportionally smaller targets down to >= 50 meta-features.
    max_coarse_features: int = 0
    # CNV side-channel during the fit (cmd.rs:536-556 cnv_pseudobulk):
    # HMM copy-number states on the pseudobulk adjusted-mean log-ratios
    cnv: bool = False
    cnv_genes_per_bin: int = 25
    # dp-shard each level's pseudobulk rows over all visible devices
    # (params replicate; NEW capability vs the single-device reference,
    # SURVEY.md section 2.7 north star)
    data_parallel: bool = False
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
        import gzip

        labels = []
        for f in batch_files:
            opener = gzip.open if str(f).endswith(".gz") else open
            with opener(f, "rt") as fh:
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
    level_maps: list[np.ndarray] = field(default_factory=list)  # fine-pb -> group


def refine_hierarchy_maps(
    proj_kn: np.ndarray,
    fine_groups: np.ndarray,
    uniq_codes: np.ndarray,
    level_dims: Sequence[int],
    args: TopicArgs,
) -> list[np.ndarray]:
    """BBKNN + DC-Poisson refinement of the pb-sample hierarchy
    (refine_multilevel.rs `refine_assignments` + dc_poisson.rs:778).

    Entities are the FINE pb-samples (the hash partition stays put for
    cells, as in the reference); each coarser level's fine->coarse map
    starts from the masked sort codes and is refined coarsest->finest.
    Scoring uses PROJECTED pb centroids with negative dims dropped
    (`Profiles::from_projection`, dc_poisson.rs:164) — the projection is
    batch-centered, so moves follow biology, not batch. Candidates are
    groups of kNN-neighbor pb-samples intersected with siblings (same
    parent at the next-coarser level), sibling fallback when empty.

    Returns the per-level fine->coarse maps (level 0 = identity)."""
    import scipy.sparse as sp

    from ..ops.dc_poisson import refine_with_candidates
    from ..ops.knn import knn_within

    s_fine = len(uniq_codes)
    kdim = proj_kn.shape[0]
    cent = np.zeros((s_fine, kdim), np.float64)
    np.add.at(cent, fine_groups, proj_kn.T)
    profiles = np.maximum(cent, 0.0)  # keep positive dims only
    size = profiles.sum(1).astype(np.float32)

    # initial maps from masked codes (nested by construction)
    maps = []
    for dim in level_dims:
        mask = (1 << dim) - 1
        _, f2c = np.unique(uniq_codes & mask, return_inverse=True)
        maps.append(f2c.astype(np.int32))

    if s_fine < 3 or len(level_dims) < 2:
        return maps

    n_nbr = min(max(args.knn_cells, 2), s_fine - 1)
    _, nbr = knn_within(cent.astype(np.float32), n_nbr)  # [s_fine, n_nbr]
    prof_sp = sp.csr_matrix(profiles)

    # refine coarsest -> finest (level 0 stays the identity partition)
    for li in range(len(level_dims) - 1, 0, -1):
        if li + 1 < len(maps):
            # re-nest under the REFINED coarser level first
            # (`project_to_refinement`, refine_multilevel.rs:269): the
            # finer group id becomes the (refined parent, old group) pair
            parent_of_samp = maps[li + 1]
            pair = parent_of_samp.astype(np.int64) * (maps[li].max() + 1) + maps[li]
            _, renest = np.unique(pair, return_inverse=True)
            maps[li] = renest.astype(np.int32)
        else:
            parent_of_samp = np.zeros(s_fine, np.int32)
        labels = maps[li]
        n_groups = int(labels.max()) + 1
        if n_groups < 2:
            continue
        parent_of_group = np.zeros(n_groups, np.int32)
        parent_of_group[labels] = parent_of_samp
        cand = np.zeros((s_fine, n_groups), bool)
        sib_ok = parent_of_group[None, :] == parent_of_samp[:, None]  # [E, G]
        nbr_groups = labels[nbr]  # [E, n_nbr]
        cand[np.repeat(np.arange(s_fine), nbr.shape[1]), nbr_groups.ravel()] = True
        cand &= sib_ok
        cand[np.arange(s_fine), labels] = True
        empty = ~cand.any(1)
        if empty.any():  # sibling fallback
            cand[empty] = sib_ok[empty]
        res = refine_with_candidates(
            prof_sp,
            labels,
            n_groups,
            candidates=cand,
            size_factors=size,
            num_gibbs=args.refine_gibbs,
            num_greedy=args.refine_greedy,
            seed=args.seed & 0x7FFFFFFF,
        )
        new, moves = res.labels, res.n_moves_per_sweep
        log.info("refine level %d: moves per sweep %s", li, moves)
        # compact (emptied groups drop; nesting within parents preserved)
        _, new_c = np.unique(new, return_inverse=True)
        maps[li] = new_c.astype(np.int32)
    return maps


def load_and_collapse(
    vec: SparseIoVec, args: TopicArgs, *, partition: dict | None = None,
    timings: dict | None = None, dist=None,
) -> CollapsedLevels:
    """Projection + binary sort + partition refinement + multilevel
    collapse (topic/common.rs:419 `load_and_collapse`; stages per
    SURVEY.md section 3.1).

    `partition` (from a prior run's `{out}.partition.npz` via `--from`,
    `topic/common.rs:404-419`) supplies `fine_groups` + `level_maps`
    and SKIPS binary sort + DC-Poisson refinement; the projection still
    runs (the matched-stat kNN needs cell coordinates).

    `dist` (a `parallel.multihost.DistContext`) runs every streaming
    pass over THIS PROCESS's nnz-balanced column range only, merging
    the global statistics explicitly: raw projections allgather before
    the (global) centering + binary sort, sufficient-statistic planes
    psum (SURVEY.md section 2.7 layout over the full section 3.1 stack)."""
    import time as _time

    timings = timings if timings is not None else {}
    batches = vec.batch_membership()
    num_batches = vec.num_batches if not args.ignore_batch else 1
    d = vec.num_rows

    view, bounds, lb, ub = vec, None, 0, vec.num_columns
    if dist is not None:
        bounds = dist.column_bounds(vec)
        lb, ub = dist.local_range(bounds)
        view = dist.local_view(vec, bounds)
        log.info(
            "distributed load_and_collapse: process %d/%d owns cells [%d, %d)",
            dist.process_index, dist.process_count, lb, ub,
        )

    # HVG gate on the projection sketch only (hvg.rs long_help: every
    # gene still trains)
    row_weights = None
    if args.hvg_genes and args.hvg_genes < d:
        from ..ops.gene_stats import hvg_row_weights

        stats = None
        if dist is not None:
            from ..ops.gene_stats import reduce_gene_stats, streaming_gene_stats

            stats = reduce_gene_stats(
                streaming_gene_stats(view, block_size=args.block_size),
                dist.reduce_sums,
            )
        row_weights = hvg_row_weights(
            vec, args.hvg_genes, block_size=args.block_size, stats=stats
        )
        log.info("hvg: projection sketch gated to %d genes", int(row_weights.sum()))

    _t0 = _time.time()
    if dist is None:
        basis, proj_kn = rp.project_columns(
            vec,
            max(args.proj_dim, args.n_latent_topics),
            block_size=args.block_size,
            batch_membership=batches if num_batches > 1 else None,
            row_weights=row_weights,
            seed=args.seed,
        )
    else:
        # raw local shard projection (the basis is seed-deterministic,
        # identical on every host) -> allgather -> GLOBAL batch
        # centering + per-cell standardization
        basis, raw_local = rp.project_columns(
            view,
            max(args.proj_dim, args.n_latent_topics),
            block_size=args.block_size,
            row_weights=row_weights,
            seed=args.seed,
            raw=True,
        )
        raw_full = dist.allgather_rows(raw_local, bounds)
        basis, proj_kn = rp.finish_projection(
            basis, raw_full, batches if num_batches > 1 else None
        )
    timings["projection_s"] = round(_time.time() - _t0, 2)

    level_dims = compute_level_sort_dims(args.sort_dim, args.num_levels)
    _t0 = _time.time()

    if partition is not None:
        # cell->pb partition reuse (topic/common.rs:404-419): no sort,
        # no refinement — the prior run's hierarchy is the hierarchy
        fine_groups = np.asarray(partition["fine_groups"], np.int32)
        if len(fine_groups) != vec.num_columns:
            raise ValueError(
                f"inherited partition covers {len(fine_groups)} cells but the "
                f"data has {vec.num_columns}"
            )
        level_maps = [np.asarray(m, np.int32) for m in partition["level_maps"]]
        level_dims = level_dims[: len(level_maps)]
        fine_codes = fine_groups.astype(np.int64)
        s_fine = int(fine_groups.max()) + 1
        log.info("reusing inherited cell->pb partition (%d fine pbs)", s_fine)
    else:
        fine_codes = rp.binary_sort_columns(proj_kn, level_dims[0], seed=args.seed)

        # group id <-> sort code registry
        uniq_codes, fine_groups = np.unique(fine_codes, return_inverse=True)
        fine_groups = fine_groups.astype(np.int32)
        s_fine = len(uniq_codes)

        # per-level fine-pb -> coarse-group maps: masked codes, refined
        # by BBKNN + DC-Poisson on projected centroids when requested
        if args.refine:
            level_maps = refine_hierarchy_maps(
                proj_kn, fine_groups, uniq_codes, level_dims, args
            )
        else:
            level_maps = []
            for dim in level_dims:
                mask = (1 << dim) - 1
                _, f2c = np.unique(uniq_codes & mask, return_inverse=True)
                level_maps.append(f2c.astype(np.int32))

    timings["sort_refine_s"] = round(_time.time() - _t0, 2)

    _t0 = _time.time()
    collapsed = []
    groups_per_level = []
    num_groups_per_level = []

    # finest-level stats once; coarser levels merge (merge_stat path)
    stats_fine: clp.CollapsedStat | None = None
    for li, dim in enumerate(level_dims):
        if stats_fine is None:
            groups_l, s_l = fine_groups, s_fine
            stat_l = clp.collect_basic_stats(
                view if dist is not None else vec,
                groups_l[lb:ub] if dist is not None else groups_l,
                s_l,
                num_batches=num_batches,
                batches=batches[lb:ub] if dist is not None else batches,
                block_size=args.block_size,
            )
            if dist is not None:
                stat_l = dist.reduce_stat(stat_l)
            if num_batches > 1:
                if dist is None:
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
                else:
                    # local queries only (partners read globally); the
                    # partial imputed/residual planes sum across hosts
                    # onto the already-reduced basic stats
                    part = clp.collect_matched_stats(
                        vec,
                        groups_l,
                        s_l,
                        batches,
                        num_batches,
                        proj_kn.T.copy(),
                        knn=args.knn_cells,
                        query_range=(lb, ub),
                    )
                    imputed, residual = dist.reduce_sums(
                        part.imputed_sum_ds, part.residual_sum_ds
                    )
                    stat_l.imputed_sum_ds += imputed
                    stat_l.residual_sum_ds += residual
            stats_fine = stat_l
        else:
            f2c = level_maps[li]
            stat_l = clp.merge_stat(stats_fine, f2c, int(f2c.max()) + 1)
            groups_l = f2c[fine_groups]
            s_l = stat_l.num_groups
        out_l = clp.optimize(stat_l, num_iter=args.iter_opt)
        collapsed.append(out_l)
        groups_per_level.append(groups_l)
        num_groups_per_level.append(s_l)

    timings["collapse_s"] = round(_time.time() - _t0, 2)

    return CollapsedLevels(
        collapsed=collapsed,
        groups_per_level=groups_per_level,
        num_groups_per_level=num_groups_per_level,
        proj_kn=proj_kn,
        basis_dk=basis,
        fine_codes=fine_codes,
        level_maps=level_maps,
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
    import time as _time

    import pandas as pd

    timings: dict[str, float] = {}
    _t_all = _time.time()
    partition = None
    if args.from_run:
        # --from inheritance: prefill inputs from a prior run's manifest
        # (run_manifest.rs:848 inherit_from); reuse its cell->pb
        # partition when available (topic/common.rs:404-419)
        prev = RunManifest.load(
            args.from_run if args.from_run.endswith(".json") else args.from_run + ".senna.json"
        )
        if not args.data_files:
            args.data_files = prev.inputs.get("data_files", [])
        if args.batch_files is None and prev.inputs.get("batch_files"):
            args.batch_files = prev.inputs["batch_files"]
        part_path = prev.outputs.get("partition")
        if part_path and list(args.data_files) == list(
            prev.inputs.get("data_files", [])
        ):
            with np.load(part_path) as z:
                partition = {
                    "fine_groups": z["fine_groups"],
                    "level_maps": [z[k] for k in sorted(z.files) if k.startswith("map")],
                }
            log.info("inherited cell->pb partition from %s", part_path)
        log.info("inherited inputs from %s", args.from_run)

    vec = load_data_vec(args.data_files, args.batch_files)
    d = vec.num_rows
    n = vec.num_columns
    log.info("topic fit: D=%d genes, N=%d cells", d, n)

    # multi-process execution (SURVEY.md section 2.7): live whenever
    # `jax.distributed` initialized (cli/main.py via LEGUME_COORDINATOR
    # / LEGUME_DISTRIBUTED). Streaming passes split by cell range;
    # file outputs write once, from process 0.
    from ..parallel.multihost import DistContext

    dist = DistContext.detect()
    primary = dist is None or dist.primary
    if dist is not None:
        log.info(
            "topic fit distributed over %d processes (this is %d)",
            dist.process_count, dist.process_index,
        )

    if args.preload_data:
        # hidden --preload-data (cmd.rs): one in-memory CSC for all
        # columns so the streaming passes skip backend decode
        from ..data.sparse_io import MemoryBackend

        mem = MemoryBackend(
            vec.read_columns_csc(np.arange(n)),
            row_names=vec.row_names(),
            column_names=vec.column_names(),
        )
        pre = SparseIoVec()
        pre.push(mem)
        if vec.num_batches > 1:
            pre.register_batches(
                np.asarray(vec.batch_names())[vec.batch_membership()]
            )
        vec = pre
        log.info("preloaded %d columns into memory", n)

    # cell QC keep mask before any other stage (qc_lib.rs:297 via
    # load_and_project; kept cells drive the whole pipeline + outputs)
    if args.qc:
        from ..data.qc import CellQcStats, compute_cell_qc

        if dist is None:
            qc_stats = compute_cell_qc(vec, block_size=args.block_size)
        else:
            # per-shard scan; the per-cell fields allgather so every
            # host applies the identical (global-MAD) keep mask
            qb = dist.column_bounds(vec)
            qc_local = compute_cell_qc(
                dist.local_view(vec, qb), block_size=args.block_size
            )
            qc_stats = CellQcStats(
                total=dist.allgather_rows(qc_local.total, qb),
                n_genes=dist.allgather_rows(qc_local.n_genes, qb),
                mito_frac=dist.allgather_rows(qc_local.mito_frac, qb),
            )
        keep = qc_stats.keep_mask(
            min_total=args.qc_min_total,
            min_genes=args.qc_min_genes,
            max_mito_frac=args.qc_max_mito_frac,
        )
        if primary:
            pd.DataFrame(
                {
                    "cell": vec.column_names(),
                    "total": qc_stats.total,
                    "n_genes": qc_stats.n_genes,
                    "mito_frac": qc_stats.mito_frac,
                    "keep": keep,
                }
            ).to_parquet(f"{args.out}.qc.parquet")
        log.info("qc: keeping %d/%d cells", int(keep.sum()), n)
        vec = vec.subset_columns(keep)
        n = vec.num_columns

    levels = load_and_collapse(
        vec, args, partition=partition, timings=timings, dist=dist
    )
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
    decoder_names = [s for s in args.decoder.replace(",", " ").split() if s]
    multi_decoder = len(decoder_names) > 1

    def _make_decoder(name: str, n_feat: int):
        kw = {}
        if name == "nb-mixture":
            kw = dict(
                rho_prior_weight=args.rho_prior_weight,
                rho_prior_alpha=args.rho_prior_alpha,
                rho_prior_beta=args.rho_prior_beta,
            )
        return DECODERS[name](n_features=n_feat, n_topics=args.n_latent_topics, **kw)

    decoders = []
    for i in range(len(level_data)):
        n_feat = coarsenings[i].num_coarse if coarsenings[i] is not None else d
        if multi_decoder:
            # joint multi-decoder: every family scores the SAME target,
            # per-decoder loss weights (cmd.rs --decoder a,b,c +
            # --decoder-weights; train_mixed_multi_decoder)
            decoders.append([_make_decoder(nm, n_feat) for nm in decoder_names])
        else:
            decoders.append(_make_decoder(decoder_names[0], n_feat))

    # per-level NB-Fisher decoder weights (gene_weighting.rs via
    # cmd.rs:440-463 compute_nb_fisher_weights_coarsened): housekeeping
    # genes downweight; coarse features average their members' weights
    feature_weights = [None] * len(level_data)
    if args.gene_weighting == "nb-fisher":
        from ..ops.gene_stats import nb_fisher_weights

        fw_stats = None
        if dist is not None:
            from ..ops.gene_stats import reduce_gene_stats, streaming_gene_stats

            fb = dist.column_bounds(vec)
            fw_stats = reduce_gene_stats(
                streaming_gene_stats(
                    dist.local_view(vec, fb), block_size=args.block_size
                ),
                dist.reduce_sums,
            )
        fw_full = nb_fisher_weights(vec, block_size=args.block_size, stats=fw_stats)
        for i, fc in enumerate(coarsenings):
            if fc is None:
                feature_weights[i] = fw_full
            else:
                sums = np.bincount(
                    fc.fine_to_coarse, weights=fw_full, minlength=fc.num_coarse
                )
                cnts = np.bincount(fc.fine_to_coarse, minlength=fc.num_coarse)
                feature_weights[i] = (sums / np.maximum(cnts, 1)).astype(np.float32)

    # anchor prior (anchor_prior.rs; cmd.rs:468-476): archetypal PBs of
    # the finest level -> beta init (+ optional CE penalty)
    anchor_prior = None
    anchor_level_weights = None
    finest_plane = (
        levels.collapsed[0].mu_adjusted
        if levels.collapsed[0].mu_adjusted is not None
        else levels.collapsed[0].mu_observed
    )
    n_pb_finest = np.asarray(finest_plane.mean()).shape[1]
    if n_pb_finest >= 2:
        from .anchor import AnchorPrior

        anchor_prior = AnchorPrior.from_pseudobulk(
            np.asarray(finest_plane.mean()),
            args.n_latent_topics,
            finest_coarsening=coarsenings[0],
        )
        if args.anchor_penalty > 0:
            anchor_level_weights = [
                jnp.asarray(w) for w in anchor_prior.per_level_weights(coarsenings)
            ]

    loss_hook = None
    if anchor_level_weights is not None:
        lam = float(args.anchor_penalty)

        def loss_hook(loss, level, aux):
            # CE(anchor, log beta) on the level's dictionary logits
            # (anchor_prior.rs anchor_penalty_at_level); with multiple
            # decoders every softmax dictionary gets the penalty
            dec_params = aux["params"][f"decoder_{level}"]
            plist = dec_params if isinstance(dec_params, (list, tuple)) else [dec_params]
            for p in plist:
                if "dictionary" not in p:
                    continue
                logits = p["dictionary"]["dictionary"]
                log_beta = jax.nn.log_softmax(logits, axis=-1)
                ce = -jnp.mean(jnp.sum(anchor_level_weights[level] * log_beta, axis=-1))
                loss = loss + lam * ce
            return loss

    cfg = TrainConfig(
        epochs=args.epochs,
        minibatch_size=args.minibatch_size,
        learning_rate=args.learning_rate,
        topic_smoothing=args.topic_smoothing,
        grad_clip=args.grad_clip,
        seed=args.seed & 0x7FFFFFFF,
    )
    mesh = None
    if (args.data_parallel or dist is not None) and jax.device_count() > 1:
        # under jax.distributed the mesh spans every process's devices:
        # the SGD rows dp-shard globally and XLA's grad psums ride the
        # inter-host links (the trainer's device_put accepts the
        # replicated host arrays from each process)
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
    trainer = MixedTrainer(
        encoder, decoders, cfg,
        feature_weights=feature_weights, loss_hook=loss_hook,
        decoder_weights=list(args.decoder_weights) if args.decoder_weights else None,
        mesh=mesh,
    )

    _t_train = _time.time()
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
        # beta initializes from the anchor prior (cmd.rs:468-476): the
        # softmax of the anchor logits reproduces the prior columns.
        # With several decoder families the params are per-decoder
        # lists that the deep-merge overlay cannot partially address;
        # the anchor then acts through the CE penalty only.
        init_overrides = None
        if anchor_prior is not None and multi_decoder:
            log.info("multi-decoder: anchor prior via CE penalty only")
        if anchor_prior is not None and not multi_decoder:
            init_overrides = {
                f"decoder_{i}": {
                    "dictionary": {
                        "dictionary": jnp.asarray(anchor_prior.init_logits(coarsenings[i]))
                    }
                }
                for i in range(len(level_data))
            }
        variables, _, scores = trainer.train(level_data, key, init_params=init_overrides)

    timings["train_s"] = round(_time.time() - _t_train, 2)

    if dist is not None:
        # the trained params are fully replicated over the global mesh;
        # pull them to host numpy so the downstream eval jits stay
        # process-local (each host encodes DIFFERENT cell shards)
        variables = jax.tree.map(lambda x: np.asarray(x), variables)

    # ---- outputs -------------------------------------------------------
    finest = levels.collapsed[0]
    cell_names = vec.column_names()
    gene_names = vec.row_names()

    # dictionary (finest decoder; first family when several): log beta
    # [D, K]; a coarsened decoder expands back to full D with the
    # -ln(group size) correction (feature_coarsening.rs expand_log_dict_dk)
    dec_params = variables["params"]["decoder_0"]
    finest_decs = decoders[0] if multi_decoder else [decoders[0]]
    finest_dec_params = dec_params if multi_decoder else [dec_params]

    def _full_log_dict(dec, params):
        ld = np.asarray(dec.apply({"params": params}, method="get_dictionary"))
        return coarsenings[0].expand_log_dict_dk(ld) if coarsenings[0] is not None else ld

    log_beta = _full_log_dict(finest_decs[0], finest_dec_params[0])
    if primary:
        pd.DataFrame(
            log_beta, index=gene_names, columns=[f"topic{k}" for k in range(args.n_latent_topics)]
        ).reset_index(names="gene").to_parquet(f"{args.out}.dictionary.parquet")
    if multi_decoder and primary:
        # per-family dictionaries: {out}.{name}.dictionary.parquet
        # (cmd.rs:79-80 "With --decoder a,b,c")
        for nm, dc, pr in zip(decoder_names, finest_decs, finest_dec_params):
            pd.DataFrame(
                _full_log_dict(dc, pr),
                index=gene_names,
                columns=[f"topic{k}" for k in range(args.n_latent_topics)],
            ).reset_index(names="gene").to_parquet(
                f"{args.out}.{nm}.dictionary.parquet"
            )

    # per-cell latent: stream blocks through the encoder at eval, null
    # plane by --adj-method, optional amortization refinement against
    # the frozen full-D dictionary
    _t_eval = _time.time()
    eval_kwargs = dict(
        block_size=args.minibatch_size * 8,
        adj_method=args.adj_method,
        refine_log_dict=log_beta if args.amort_refine_steps > 0 else None,
        refine_steps=args.amort_refine_steps,
        refine_lr=args.amort_refine_lr,
        refine_reg=args.amort_refine_reg,
    )
    if dist is None:
        # --data-parallel extends to the per-cell eval stage: the
        # stacked-block axis shard_maps over the trainer's mesh (in
        # the multi-process branch below each process already owns a
        # disjoint cell range on its local device, so no mesh there)
        z = evaluate_latent_by_encoder(
            vec, trainer, variables, finest, levels.groups_per_level[0],
            mesh=mesh, **eval_kwargs,
        )
    else:
        # each process encodes only its own cell range; the per-cell
        # latents allgather so the outputs (and the returned z) match
        # the single-process run exactly
        eb = dist.column_bounds(vec)
        elb, eub = dist.local_range(eb)
        z_local = evaluate_latent_by_encoder(
            dist.local_view(vec, eb), trainer, variables, finest,
            levels.groups_per_level[0][elb:eub], **eval_kwargs,
        )
        z = dist.allgather_rows(z_local, eb)
    timings["cell_eval_s"] = round(_time.time() - _t_eval, 2)
    if primary:
        pd.DataFrame(
            z, index=cell_names, columns=[f"topic{k}" for k in range(args.n_latent_topics)]
        ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")

    # pseudobulk latent (finest level)
    pb_input = level_data[0].input
    pb_null = level_data[0].input_null
    pb_log_z = trainer.encode(variables, pb_input, pb_null)
    if primary:
        pd.DataFrame(
            np.exp(pb_log_z), columns=[f"topic{k}" for k in range(args.n_latent_topics)]
        ).to_parquet(f"{args.out}.pb_latent.parquet")

    # per-batch effects (cmd.rs:70 {out}.delta.parquet): posterior-mean
    # delta [D, B] from the finest collapse when batch correction ran
    if finest.delta is not None and primary:
        pd.DataFrame(
            np.asarray(finest.delta.mean()),
            index=gene_names,
            columns=vec.batch_names(),
        ).reset_index(names="gene").to_parquet(f"{args.out}.delta.parquet")

    # decoder nuisance artifacts (decoder_output.rs:131; cmd.rs:74-76):
    # per-gene NB dispersion, ambient profile + rho sigmoid coefficients
    multi_family = len(decoder_names) > 1
    for nm, dc, pr in zip(
        decoder_names, finest_decs, finest_dec_params
    ) if primary else ():
        # with several decoder families, suffix artifacts by family so
        # the last family doesn't silently overwrite the others
        tag = f".{nm}" if multi_family else ""
        if "log_phi" in pr:
            phi = np.exp(np.asarray(pr["log_phi"])).ravel()
            if coarsenings[0] is not None:
                phi = phi[coarsenings[0].fine_to_coarse]
            pd.DataFrame({"gene": gene_names, "dispersion": phi}).to_parquet(
                f"{args.out}{tag}.dispersion.parquet"
            )
        if nm == "nb-mixture":
            alpha = jax.nn.softmax(
                jnp.asarray(pr["log_alpha"]).ravel()
            )
            alpha = np.asarray(alpha)
            if coarsenings[0] is not None:
                # coarse simplex -> fine: spread mass evenly in-group
                sizes = np.bincount(
                    coarsenings[0].fine_to_coarse, minlength=coarsenings[0].num_coarse
                )
                alpha = (alpha / np.maximum(sizes, 1))[coarsenings[0].fine_to_coarse]
            pd.DataFrame({"gene": gene_names, "alpha": alpha}).to_parquet(
                f"{args.out}{tag}.alpha.parquet"
            )
            pd.DataFrame(
                {
                    "coef": ["rho_a", "rho_b"],
                    "value": [
                        float(np.asarray(pr["rho_a"]).ravel()[0]),
                        float(np.asarray(pr["rho_b"]).ravel()[0]),
                    ],
                }
            ).to_parquet(f"{args.out}{tag}.rho.parquet")

    # traces
    if primary:
        pd.DataFrame({"epoch": np.arange(len(scores.llik)), "llik": scores.llik, "kl": scores.kl}).to_parquet(
            f"{args.out}.log_likelihood.parquet"
        )

    # CNV side-channel (cmd.rs:536-556): per-pseudobulk copy-number
    # states from the adjusted means vs their cross-pb shared profile
    if args.cnv and primary:
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

    if primary:
        save_model(args.out, variables, args, d, gene_names)

    # cell->pb partition for `--from` reuse (topic/common.rs:404-419)
    part_path = f"{args.out}.partition.npz"
    if primary:
        np.savez(
            part_path,
            fine_groups=levels.groups_per_level[0].astype(np.int32),
            **{f"map{i:02d}": m.astype(np.int32) for i, m in enumerate(levels.level_maps)},
        )

    from ..utils.manifest import ArtifactScale

    manifest = RunManifest(
        command="topic",
        inputs={
            "data_files": list(args.data_files),
            "batch_files": list(args.batch_files) if args.batch_files else [],
        },
        outputs={
            "log_likelihood": f"{args.out}.log_likelihood.parquet",
            "model": f"{args.out}.model.npz",
            "model_metadata": f"{args.out}.model.json",
        },
        params=dataclasses.asdict(args),
    )
    timings["total_s"] = round(_time.time() - _t_all, 2)
    manifest.timings = timings
    manifest.record_artifact(
        "latent", f"{args.out}.latent.parquet", "cell_latent",
        ArtifactScale.detect(z, axis=1),
    )
    manifest.record_artifact(
        "pb_latent", f"{args.out}.pb_latent.parquet", "pb_latent",
        ArtifactScale.PROBABILITY_SIMPLEX_COLUMNS,
    )
    manifest.record_artifact(
        "dictionary", f"{args.out}.dictionary.parquet", "topic_dictionary",
        ArtifactScale.detect(log_beta, axis=0),
    )
    manifest.record_artifact(
        "partition", part_path, "cell_pb_partition", ArtifactScale.SIGNED
    )
    if primary:
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
    adj_method: str = "residual",
    refine_log_dict: np.ndarray | None = None,
    refine_steps: int = 0,
    refine_lr: float = 0.01,
    refine_reg: float = 1.0,
    mesh=None,
) -> np.ndarray:
    """Per-cell latent: stream dense cell blocks through the eval
    encoder with the cell's null column (`topic/eval.rs:18-63`).

    `adj_method` selects the null plane + its membership axis
    (topic/common.rs:55-85 block_membership / expand_delta_for_block):
    "residual" indexes mu_residual [D, S] by pseudobulk group,
    "batch" indexes delta [D, B] by the cell's batch label.
    `refine_steps > 0` runs inference-time gradient refinement of each
    block's logits against the frozen `refine_log_dict`
    (refine_weighting.rs AmortRefineArgs; cmd.rs:990-1010)."""
    from ..data.visitors import visit_columns_by_block

    d = vec.num_rows
    n = vec.num_columns
    if adj_method == "batch" and finest.delta is not None:
        null_ds = np.asarray(finest.delta.mean())  # [D, B]
        membership = vec.batch_membership()
    else:
        null_ds = (
            np.asarray(finest.mu_residual.mean())
            if finest.mu_residual is not None
            else None
        )
        membership = groups
    out = np.zeros((n, trainer.encoder.n_topics), np.float32)

    refine_ld = None
    if refine_steps > 0 and refine_log_dict is not None:
        from .predict import refine_topic_proportions

        refine_ld = jnp.asarray(refine_log_dict)

    # batch the densify+encode of consecutive same-shape blocks into one
    # scanned dispatch (docs/BENCH_NOTES.md dispatch lesson); flushes
    # zero-pad to the full batch so one program compiles
    import os

    # default batches 8 blocks per dispatch; at >=500k cells the relay
    # round-trip (~0.4 s/dispatch on the tunnel) dominates the stage,
    # so the batch widens to 32 (156 -> 39 dispatches at 1M) unless
    # the env pins it (r5 stage table: eval 189.7 s of the 548.7 s run)
    _default_db = 32 if n >= 500_000 else 8
    dispatch_batch = int(
        os.environ.get("LEGUME_DISPATCH_BATCH", str(_default_db))
    )
    enc = trainer.encoder
    enc_vars = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }

    # the null plane ships to the device ONCE as [S, D] (or [B, D]);
    # per-block we ship only [ncols] membership ids and gather on
    # device — the old host-side `null_ds[:, membership[...]].T` built
    # and transferred a dense [ncols, D] plane per block, ~8 GB at 1M
    # cells vs ~7 MB once (predict.rs:444's per-block x0 lookup, moved
    # device-side)
    null_sd = jnp.asarray(null_ds.T, jnp.float32) if null_ds is not None else None
    # gene ids fit uint16 for D <= 65535: halves the per-nnz row bytes
    row_dtype = np.uint16 if d <= 0xFFFF else np.int32

    def _block_body(ncols, cap):
        def body(_, inp):
            r, cc, v, mb = inp
            c = sparse_ops.col_ids_from_counts(cc, cap=cap, ncols=ncols)
            x = sparse_ops.densify_block(
                r.astype(jnp.int32), c, v, ncols=ncols, num_genes=d
            )
            nu = None if mb is None else null_sd[mb]  # gathered on device
            log_z, _ = enc.apply(enc_vars, x, nu, train=False)
            if refine_ld is not None:
                log_z = refine_topic_proportions(
                    log_z, x, refine_ld,
                    steps=refine_steps, lr=refine_lr, reg=refine_reg,
                )
            return None, log_z

        return body

    # dp over the mesh (VERDICT r4 weak #5: the per-cell eval was the #2
    # stage at 1M with no dp path; reference: senna/src/predict.rs:444):
    # the STACKED-BLOCK axis shard_maps over dp — each device densifies
    # and encodes its own blocks, no collectives (cells are disjoint)
    n_dev = 1
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS

        n_dev = mesh.shape[DATA_AXIS]

    @partial(jax.jit, static_argnames=("ncols",))
    def encode_blocks(rows_g, counts_g, vals_g, memb_g, null_plane, *, ncols):
        cap = rows_g.shape[-1]
        body = _block_body(ncols, cap)

        def scan_all(r_g, c_g, v_g, m_g):
            _, zs = jax.lax.scan(body, None, (r_g, c_g, v_g, m_g))
            return zs

        if mesh is None:
            return scan_all(rows_g, counts_g, vals_g, memb_g)
        from jax.sharding import PartitionSpec as P

        shard_scan = partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
        )(scan_all)
        return shard_scan(rows_g, counts_g, vals_g, memb_g)

    buf: list = []

    def _stacked(buf, g_pad):
        """Device-stacked (rows, counts, vals) with zero-block padding
        to g_pad (host np.stack + expanded col_ids measured seconds per
        pass on this host — BENCH_NOTES teardown table)."""
        rows_l = [jnp.asarray(b.row_ids.astype(row_dtype)) for b in buf]
        cnts_l = [jnp.asarray(b.col_counts) for b in buf]
        vals_l = [jnp.asarray(b.vals) for b in buf]
        pad = g_pad - len(buf)
        if pad:
            rows_l += [jnp.zeros_like(rows_l[0])] * pad
            cnts_l += [jnp.zeros_like(cnts_l[0])] * pad
            vals_l += [jnp.zeros_like(vals_l[0])] * pad
        return jnp.stack(rows_l), jnp.stack(cnts_l), jnp.stack(vals_l)

    def flush():
        if not buf:
            return
        g = len(buf)
        g_pad = 1 << (g - 1).bit_length()
        if n_dev > 1:  # the stacked-block axis splits evenly over dp
            g_pad = ((g_pad + n_dev - 1) // n_dev) * n_dev
        ncols = buf[0].ncols
        rows_g, cnts_g, vals_g = _stacked(buf, g_pad)
        membs = [
            membership[b.lb : b.lb + b.ncols].astype(np.int32) for b in buf
        ] + [np.zeros(ncols, np.int32)] * (g_pad - g)
        memb_g = jnp.asarray(np.stack(membs))
        zs = np.asarray(
            encode_blocks(rows_g, cnts_g, vals_g, memb_g, null_sd, ncols=ncols)
        )
        for i, b in enumerate(buf):
            out[b.lb : b.lb + b.ncols] = zs[i]
        buf.clear()

    @partial(jax.jit, static_argnames=("ncols",))
    def encode_blocks_nonull(rows_g, counts_g, vals_g, *, ncols):
        cap = rows_g.shape[-1]
        body3 = _block_body(ncols, cap)

        def scan_all(r_g, c_g, v_g):
            _, zs = jax.lax.scan(
                lambda carry, inp: body3(carry, (*inp, None)),
                None, (r_g, c_g, v_g),
            )
            return zs

        if mesh is None:
            return scan_all(rows_g, counts_g, vals_g)
        from jax.sharding import PartitionSpec as P

        shard_scan = partial(
            jax.shard_map, mesh=mesh,
            in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS),
        )(scan_all)
        return shard_scan(rows_g, counts_g, vals_g)

    def flush_nonull():
        if not buf:
            return
        g = len(buf)
        g_pad = 1 << (g - 1).bit_length()
        if n_dev > 1:
            g_pad = ((g_pad + n_dev - 1) // n_dev) * n_dev
        ncols = buf[0].ncols
        rows_g, cnts_g, vals_g = _stacked(buf, g_pad)
        zs = np.asarray(encode_blocks_nonull(rows_g, cnts_g, vals_g, ncols=ncols))
        for i, b in enumerate(buf):
            out[b.lb : b.lb + b.ncols] = zs[i]
        buf.clear()

    if null_ds is None:
        for blk in visit_columns_by_block(vec, block_size=block_size):
            if buf and (
                buf[0].ncols != blk.ncols or len(buf[0].row_ids) != len(blk.row_ids)
            ):
                flush_nonull()
            buf.append(blk)
            if len(buf) >= dispatch_batch:
                flush_nonull()
        flush_nonull()
        return out

    for blk in visit_columns_by_block(vec, block_size=block_size):
        if buf and (
            buf[0].ncols != blk.ncols or len(buf[0].row_ids) != len(blk.row_ids)
        ):
            flush()
        buf.append(blk)
        if len(buf) >= dispatch_batch:
            flush()
    flush()
    return out


def save_model(
    out: str, variables: dict, args, n_features: int, gene_names,
    *, model_type: str = "topic", extra_meta: dict | None = None,
):
    """Weights + strict metadata round-trip
    (`topic/model_metadata.rs:130-226`); `model_type` selects the
    predict dispatch (dense topic / vae / masked, predict.rs:287)."""
    import json

    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep="/")
    np.savez(f"{out}.model.npz", **{k: np.asarray(v) for k, v in flat.items()})
    meta = {
        "model_type": model_type,
        "n_topics": getattr(args, "n_latent_topics", getattr(args, "n_latent", 0)),
        "n_features": n_features,
        "encoder_layers": list(getattr(args, "encoder_layers", ())),
        "decoder": getattr(args, "decoder", ""),
        "num_levels": getattr(args, "num_levels", 1),
        "gene_names_file": f"{out}.genes.txt",
        **(extra_meta or {}),
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
