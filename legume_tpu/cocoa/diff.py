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
    # hard per-cell topic labels, one per line (run_diff.rs
    # topic_assignment_files) — one-hot alternative to --topic
    topic_assignment_file: Optional[str] = None
    # scale of the soft proportion matrix (run_diff.rs TopicValue)
    topic_proportion_value: str = "prob"  # prob | logit
    # known individual-level covariates V [I, C] tsv(.gz), fed into the
    # residual collider adjustment (run_diff.rs covariate_file)
    covariate_file: Optional[str] = None
    n_pb_samples: int = 10
    knn: int = 10
    n_opt_iter: int = 100
    n_permutations: int = 0
    permutation_seed: Optional[int] = None  # defaults to seed
    proj_dim: int = 30
    collider_fix: bool = True
    # NB-Fisher housekeeping gene attenuation of the sufficient stats
    # (collapse_cocoa_data.rs:16; default ON like the reference)
    adjust_housekeeping: bool = True
    a0: float = 1.0
    b0: float = 1.0
    # hold counts in memory across the permutation replays (the role of
    # the reference's MatchCache.y0_mat caching + --preload-data);
    # gated by nnz so 1M-cell runs keep streaming
    preload_max_nnz: int = 200_000_000
    # CNV side-channel (cocoa/src/cnv_call.rs): per-(indv, topic) HMM
    # on the adjusted exposure log-means, genome-ordered via --gff or a
    # simulation ground-truth TSV
    gff: Optional[str] = None
    cnv_ground_truth: Optional[str] = None
    cnv_states: int = 3
    cnv_gmm_k_max: int = 0  # >0: kmeans-BIC selects the state count
    cnv_ref_iters: int = 2
    seed: int = DEFAULT_PROJECTION_SEED
    # dp over the device mesh: match-cache build shards the query axis,
    # the replay collector shards the exposure/permutation axis (the
    # mesh analog of the reference's rayon loop, run_diff.rs:361)
    data_parallel: bool = False
    # persist the exposure-agnostic match cache next to the backend
    # (MatchCache, run_diff.rs:341-346, extended across invocations)
    match_cache: bool = True


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

    if args.topic_assignment_file:
        # hard labels -> one-hot proportions (TopicAssignment path)
        with open(args.topic_assignment_file) as f:
            lab = np.asarray([line.strip() for line in f if line.strip()])
        if len(lab) != n:
            raise ValueError(f"topic assignment lists {len(lab)} cells, data has {n}")
        _, codes = np.unique(lab, return_inverse=True)
        z = np.eye(int(codes.max()) + 1, dtype=np.float32)[codes]
    elif args.topic_file:
        z = pd.read_parquet(args.topic_file).iloc[:, 1:].to_numpy(np.float32)
        if args.topic_proportion_value == "logit":
            z = np.exp(z - z.max(1, keepdims=True))
        elif np.all(z <= 0):
            z = np.exp(z)
    else:
        z = np.ones((n, 1), np.float32)
    z = z / np.maximum(z.sum(1, keepdims=True), 1e-30)

    covariates = None
    if args.covariate_file:
        covariates = pd.read_csv(
            args.covariate_file, sep="\t", header=None
        ).to_numpy(np.float64)
        if len(covariates) != n_indv:
            raise ValueError(
                f"covariate file has {len(covariates)} rows, data has {n_indv} "
                "individuals"
            )

    if args.collider_fix and z.shape[1] > 1:
        z, max_shift = remove_exposure_effect_from_topic_proportions(
            z, cell_indv, exposure, covariates=covariates
        )
        z = z / np.maximum(z.sum(1, keepdims=True), 1e-30)
        log.info("collider fix: max |shift| per topic %s", np.round(max_shift, 3))

    gene_weights = None
    if args.adjust_housekeeping:
        from ..ops.gene_stats import nb_fisher_weights

        gene_weights = nb_fisher_weights(vec)
        log.info("NB-Fisher housekeeping weights on (median %.3f)",
                 float(np.median(gene_weights)))

    import time as _time

    timings: dict[str, float] = {}
    _t0 = _time.time()
    basis, proj_kn = rp.project_columns(vec, args.proj_dim, seed=args.seed)
    proj_nk = proj_kn.T.copy()
    timings["projection_s"] = round(_time.time() - _t0, 2)

    pb = assign_pseudobulk(cell_indv, proj_nk, args.n_pb_samples, args.seed)
    n_samples = int(pb.max()) + 1

    mesh = None
    if args.data_parallel:
        import jax

        from ..parallel.mesh import make_mesh

        mesh = make_mesh(len(jax.devices()))
        log.info("data-parallel over %d devices", len(jax.devices()))

    _t0 = _time.time()
    cache = None
    cache_path = None
    if args.match_cache and args.data_files:
        from .collapse import load_match_cache, match_cache_file, match_cache_key

        key = match_cache_key(
            n, args.knn, n_indv, args.proj_dim, args.seed, cell_indv
        )
        cache_path = match_cache_file(args.data_files[0], key)
        cache = load_match_cache(cache_path)
        if cache is not None:
            log.info("match cache reused: %s", cache_path)
            timings["match_cache_reused"] = True
    if cache is None:
        cache = build_match_cache(proj_nk, cell_indv, n_indv, args.knn, mesh=mesh)
        if cache_path is not None:
            from .collapse import save_match_cache

            save_match_cache(cache, cache_path)
    timings["match_cache_s"] = round(_time.time() - _t0, 2)

    # permutation null (run_diff.rs:341-380): replay with permuted
    # exposure assignments over individuals. Observed + all permuted
    # exposures ride ONE streaming pass — the reads/gathers amortize
    # and the per-permutation coefficient+segment work scans on device
    # (collect_cocoa_stat_multi; the reference re-collects per
    # permutation on rayon threads).
    pvalue = None
    if args.n_permutations > 0:
        from .collapse import collect_cocoa_stat_multi

        perm_seed = (
            args.permutation_seed if args.permutation_seed is not None else args.seed
        )
        rng = np.random.default_rng(perm_seed & 0x7FFFFFFF)
        perms = [rng.permutation(exposure) for _ in range(args.n_permutations)]
        exposures_ti = np.stack([exposure] + perms)
        _t0 = _time.time()
        stats = collect_cocoa_stat_multi(
            vec, z, cell_indv, pb, n_samples, exposures_ti, cache,
            gene_weights=gene_weights, mesh=mesh,
        )
        timings["stat_collect_all_exposures_s"] = round(_time.time() - _t0, 2)
        stat = stats[0]
        _t0 = _time.time()
        params = estimate_parameters(
            stat, n_opt_iter=args.n_opt_iter, a0=args.a0, b0=args.b0
        )
        effect = compute_exposure_contrast(params, exposure)
        null = np.zeros((args.n_permutations, d), np.float32)
        for t in range(args.n_permutations):
            params_t = estimate_parameters(
                stats[t + 1], n_opt_iter=args.n_opt_iter, a0=args.a0, b0=args.b0
            )
            null[t] = compute_exposure_contrast(params_t, perms[t])
        timings["gamma_fit_all_s"] = round(_time.time() - _t0, 2)
        mu0 = null.mean(0)
        sd0 = np.maximum(null.std(0), 1e-12)
        zscore = (effect - mu0) / sd0
        pvalue = z_to_pvalue(zscore)
    else:
        _t0 = _time.time()
        stat = collect_cocoa_stat(
            vec, z, cell_indv, pb, n_samples, exposure, cache,
            gene_weights=gene_weights,
        )
        timings["stat_collect_s"] = round(_time.time() - _t0, 2)
        _t0 = _time.time()
        params = estimate_parameters(
            stat, n_opt_iter=args.n_opt_iter, a0=args.a0, b0=args.b0
        )
        effect = compute_exposure_contrast(params, exposure)
        timings["gamma_fit_s"] = round(_time.time() - _t0, 2)

    genes = vec.row_names()

    # CNV side-channel on the adjusted exposure posterior (cnv_call.rs
    # run_cnv_calling): states/cn_score parquet, normal-sample TSV,
    # non-neutral segments BED, DEG concordance columns
    cnv_run = None
    if args.gff or args.cnv_ground_truth:
        import gzip

        from scipy.special import digamma

        from .cnv_call import (
            call_per_sample_cnv,
            genome_order_from_gff,
            genome_order_from_truth_tsv,
            segments_bed_rows,
        )

        order = (
            genome_order_from_gff(genes, args.gff)
            if args.gff
            else genome_order_from_truth_tsv(d, args.cnv_ground_truth)
        )
        log_tau = np.asarray(
            digamma(np.asarray(params.exposure.a))
            - np.log(np.asarray(params.exposure.b))
        )  # [K, D, I]
        topic_names = [f"topic{k}" for k in range(log_tau.shape[0])]
        cnv_run = call_per_sample_cnv(
            log_tau, order, [str(n) for n in indv_names], topic_names,
            n_states=args.cnv_states, gmm_k_max=args.cnv_gmm_k_max,
            ref_iters=args.cnv_ref_iters,
            seed=args.seed & 0x7FFFFFFF,
        )
        gene_ord = [genes[i] for i in order.ordered]
        pd.DataFrame(
            cnv_run.states, index=gene_ord, columns=cnv_run.sample_names
        ).reset_index(names="gene").to_parquet(f"{args.out}.cnv.states.parquet")
        pd.DataFrame(
            cnv_run.cn_score, index=gene_ord, columns=cnv_run.sample_names
        ).reset_index(names="gene").to_parquet(f"{args.out}.cnv.cn_score.parquet")
        with gzip.open(f"{args.out}.cnv.normal_samples.tsv.gz", "wt") as f:
            for k, refs in enumerate(cnv_run.refs_per_topic):
                for i in refs:
                    f.write(f"{topic_names[k]}\t{indv_names[int(i)]}\n")
        with gzip.open(f"{args.out}.cnv.segments.bed.gz", "wt") as f:
            for row in segments_bed_rows(cnv_run):
                f.write("\t".join(str(x) for x in row) + "\n")
        log.info(
            "CNV outputs: %s.cnv.{states,cn_score}.parquet + "
            "normal_samples.tsv.gz + segments.bed.gz", args.out,
        )

    out = {"gene": genes, "effect": effect}
    if cnv_run is not None:
        from .cnv_call import deg_concordance as _conc

        r, p, state = _conc(cnv_run, d)
        out["cnv_concordance_r"] = r
        out["cnv_concordance_p"] = p
        out["cnv_state"] = state
    pd.DataFrame(out).to_parquet(f"{args.out}.effect.parquet")
    shared = np.asarray(params.shared.mean()).mean(axis=(0, 2))
    resid = np.asarray(params.residual.mean()).mean(axis=(0, 2))
    pd.DataFrame({"gene": genes, "shared": shared}).to_parquet(f"{args.out}.shared.parquet")
    pd.DataFrame({"gene": genes, "residual": resid}).to_parquet(
        f"{args.out}.residual.parquet"
    )
    outputs = {
        "effect": f"{args.out}.effect.parquet",
        **({
            "cnv_states": f"{args.out}.cnv.states.parquet",
            "cnv_cn_score": f"{args.out}.cnv.cn_score.parquet",
            "cnv_segments": f"{args.out}.cnv.segments.bed.gz",
        } if cnv_run is not None else {}),
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
        timings=timings,
    ).save(args.out, "cocoa.json")
    return {"effect": effect, "pvalue": pvalue, "params": params, "stat": stat}
