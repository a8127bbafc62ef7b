"""`cocoa diff` — counterfactual confounder-adjusted differential
expression (`cocoa/src/run_diff.rs:242`; call stack SURVEY.md 3.3).

Flow: inputs -> optional collider fix on topic proportions ->
pseudobulk partition -> match cache -> topic-weighted matched stats ->
per-topic Gamma fit -> exposure contrast -> permutation null (replay
the cache with permuted exposure; run_diff.rs:341-380) -> parquet
outputs (.effect / .shared / .residual / .pvalue).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

from ..ops import random_projection as rp
from ..utils.manifest import RunManifest
from ..utils.prng import DEFAULT_PROJECTION_SEED
from .collapse import build_match_cache, collect_cocoa_stat
from .stat import (
    CocoaStat,
    compute_exposure_contrast,
    estimate_parameters,
    remove_exposure_effect_from_topic_proportions,
    z_to_pvalue,
)

log = logging.getLogger(__name__)


@dataclass
class CocoaDiffArgs:
    data_files: Sequence[str] = ()
    out: str = "cocoa"
    indv_file: str = ""  # cell -> individual (one label per line)
    exposure_file: str = ""  # individual TAB exposure
    topic_file: Optional[str] = None  # latent parquet (cell topic proportions)
    n_pb_samples: int = 10
    knn: int = 10
    n_opt_iter: int = 100
    n_permutations: int = 0
    proj_dim: int = 30
    collider_fix: bool = True
    # hold counts in memory across the permutation replays (the role of
    # the reference's MatchCache.y0_mat caching + --preload-data);
    # gated by nnz so 1M-cell runs keep streaming
    preload_max_nnz: int = 200_000_000
    seed: int = DEFAULT_PROJECTION_SEED


def assign_pseudobulk(
    cell_indv: np.ndarray, proj_nk: np.ndarray, n_samples: int, seed: int
) -> np.ndarray:
    """Random partition of cells into pseudobulk samples, stratified by
    projection sign codes (`randomly_partition_data.rs` spirit: balanced
    random groups informed by expression structure)."""
    codes = rp.binary_sort_columns(proj_nk.T.copy(), int(np.ceil(np.log2(n_samples))), seed=seed)
    groups, s = rp.compact_group_codes(codes)
    if s > n_samples:
        groups = groups % n_samples
    return groups.astype(np.int64)


def run_cocoa_diff(args: CocoaDiffArgs) -> dict:
    import pandas as pd

    from ..senna.topic import load_data_vec

    vec = load_data_vec(args.data_files)
    n = vec.num_columns
    d = vec.num_rows

    # preload: the matched-read pattern is scattered single-column
    # gathers repeated once per permutation — memory-resident CSC wins
    if args.n_permutations > 0:
        import numpy as _np

        total_nnz = sum(
            b.num_nonzeros for b in vec._backends
        ) if vec._backends else 0
        if total_nnz <= args.preload_max_nnz:
            from ..data.sparse_io import MemoryBackend

            csc = vec.read_columns_csc(_np.arange(n))
            mem = MemoryBackend(csc, vec.row_names(), vec.column_names())
            from ..data import SparseIoVec as _Vec

            newvec = _Vec()
            newvec.push(mem)
            vec = newvec

    with open(args.indv_file) as f:
        indv_labels = np.asarray([line.strip() for line in f if line.strip()])
    indv_names, cell_indv = np.unique(indv_labels, return_inverse=True)
    n_indv = len(indv_names)

    exposure = np.zeros(n_indv, np.int64)
    with open(args.exposure_file) as f:
        table = {
            parts[0]: int(parts[1])
            for parts in (line.split() for line in f if line.strip())
        }
    for i, name in enumerate(indv_names):
        exposure[i] = table[str(name)]

    if args.topic_file:
        z = pd.read_parquet(args.topic_file).iloc[:, 1:].to_numpy(np.float32)
        if np.all(z <= 0):
            z = np.exp(z)
    else:
        z = np.ones((n, 1), np.float32)
    z = z / np.maximum(z.sum(1, keepdims=True), 1e-30)

    if args.collider_fix and z.shape[1] > 1:
        z, max_shift = remove_exposure_effect_from_topic_proportions(
            z, cell_indv, exposure
        )
        z = z / np.maximum(z.sum(1, keepdims=True), 1e-30)
        log.info("collider fix: max |shift| per topic %s", np.round(max_shift, 3))

    basis, proj_kn = rp.project_columns(vec, args.proj_dim, seed=args.seed)
    proj_nk = proj_kn.T.copy()

    pb = assign_pseudobulk(cell_indv, proj_nk, args.n_pb_samples, args.seed)
    n_samples = int(pb.max()) + 1

    cache = build_match_cache(proj_nk, cell_indv, n_indv, args.knn)
    stat = collect_cocoa_stat(
        vec, z, cell_indv, pb, n_samples, exposure, cache
    )
    params = estimate_parameters(stat, n_opt_iter=args.n_opt_iter)
    effect = compute_exposure_contrast(params, exposure)

    # permutation null (run_diff.rs:341-380): replay with permuted
    # exposure assignments over individuals
    pvalue = None
    if args.n_permutations > 0:
        rng = np.random.default_rng(args.seed & 0x7FFFFFFF)
        null = np.zeros((args.n_permutations, d), np.float32)
        for t in range(args.n_permutations):
            perm = rng.permutation(exposure)
            stat_t = collect_cocoa_stat(vec, z, cell_indv, pb, n_samples, perm, cache)
            params_t = estimate_parameters(stat_t, n_opt_iter=args.n_opt_iter)
            null[t] = compute_exposure_contrast(params_t, perm)
        mu0 = null.mean(0)
        sd0 = np.maximum(null.std(0), 1e-12)
        zscore = (effect - mu0) / sd0
        pvalue = z_to_pvalue(zscore)

    genes = vec.row_names()
    out = {"gene": genes, "effect": effect}
    pd.DataFrame(out).to_parquet(f"{args.out}.effect.parquet")
    shared = np.asarray(params.shared.mean()).mean(axis=(0, 2))
    resid = np.asarray(params.residual.mean()).mean(axis=(0, 2))
    pd.DataFrame({"gene": genes, "shared": shared}).to_parquet(f"{args.out}.shared.parquet")
    pd.DataFrame({"gene": genes, "residual": resid}).to_parquet(
        f"{args.out}.residual.parquet"
    )
    outputs = {
        "effect": f"{args.out}.effect.parquet",
        "shared": f"{args.out}.shared.parquet",
        "residual": f"{args.out}.residual.parquet",
    }
    if pvalue is not None:
        pd.DataFrame({"gene": genes, "pvalue": pvalue, "z": zscore}).to_parquet(
            f"{args.out}.pvalue.parquet"
        )
        outputs["pvalue"] = f"{args.out}.pvalue.parquet"

    RunManifest(
        command="cocoa-diff",
        inputs={"data_files": list(args.data_files)},
        outputs=outputs,
    ).save(args.out, "cocoa.json")
    return {"effect": effect, "pvalue": pvalue, "params": params, "stat": stat}
