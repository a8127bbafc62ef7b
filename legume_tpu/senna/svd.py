"""`senna svd` equivalent — streaming Nystrom randomized SVD embedding
(`senna/src/svd/fit.rs:100`).

Nystrom scheme: fit the spectral basis on the (batch-adjusted)
pseudobulk matrix (small, dense, on device), then stream all cells
through the basis for per-cell factors — dense O(N x D) work never
materializes, matching the reference's scale ladder
(SURVEY.md section 5 "long-context" analog).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import collapse as clp
from ..ops import random_projection as rp
from ..ops.rsvd import rsvd
from ..utils.manifest import RunManifest
from ..utils.prng import DEFAULT_PROJECTION_SEED, key_from_seed
from .topic import TopicArgs, load_and_collapse, load_data_vec

log = logging.getLogger(__name__)


@dataclass
class SvdArgs:
    data_files: Sequence[str] = ()
    out: str = "svd"
    batch_files: Optional[Sequence[str]] = None
    n_factors: int = 20
    proj_dim: int = 50
    sort_dim: int = 10
    knn_cells: int = 10
    iter_opt: int = 30
    block_size: int = 8192
    # normalize each cell to this total before log1p (svd/fit.rs
    # column_sum_norm; 0 = off)
    column_sum_norm: float = 0.0
    # write the batch-adjusted counts to {out}.adjusted.zarr
    # (svd/fit.rs:149-170 triplets_adjusted_by_pseudobulk)
    save_adjusted: bool = False
    # cell QC keep mask before the collapse (qc_lib role)
    qc: bool = False
    qc_min_total: float = 0.0
    qc_min_genes: int = 0
    qc_max_mito_frac: float = 1.0
    # HVG gate on the basis genes (hvg.rs role; 0 = all genes)
    hvg_genes: int = 0
    # CNV side-channel on the pseudobulk planes (cnv_pseudobulk.rs)
    cnv: bool = False
    cnv_genes_per_bin: int = 25
    seed: int = DEFAULT_PROJECTION_SEED
    # dp-shard the streaming per-cell Nystrom projection over all
    # visible devices (stacked-block shard_map; basis replicates)
    data_parallel: bool = False


def fit_svd(args: SvdArgs) -> dict:
    import pandas as pd

    vec = load_data_vec(args.data_files, args.batch_files)

    if args.qc:
        from ..data.qc import compute_cell_qc

        qs = compute_cell_qc(vec, block_size=args.block_size)
        keep = qs.keep_mask(
            min_total=args.qc_min_total,
            min_genes=args.qc_min_genes,
            max_mito_frac=args.qc_max_mito_frac,
        )
        log.info("svd qc: keeping %d/%d cells", int(keep.sum()), vec.num_columns)
        vec = vec.subset_columns(keep)

    # single-level collapse reusing the topic loader
    targs = TopicArgs(
        data_files=args.data_files,
        proj_dim=args.proj_dim,
        sort_dim=args.sort_dim,
        knn_cells=args.knn_cells,
        num_levels=1,
        iter_opt=args.iter_opt,
        block_size=args.block_size,
        seed=args.seed,
    )
    levels = load_and_collapse(vec, targs)
    finest = levels.collapsed[0]
    groups = levels.groups_per_level[0]
    # batch-adjusted pseudobulk profile (adjusted if batches, else observed)
    mu = finest.mu_adjusted if finest.mu_adjusted is not None else finest.mu_observed
    pb_dp = np.asarray(mu.mean())  # [D, P]

    # HVG gate: basis restricted to the top-variance genes; excluded
    # rows carry zero loadings so the per-cell projection is unchanged
    # in shape (hvg.rs gate role)
    hvg_mask = None
    if args.hvg_genes and args.hvg_genes < vec.num_rows:
        from ..ops.gene_stats import select_hvg_streaming

        hvg_mask = np.zeros(vec.num_rows, bool)
        hvg_mask[select_hvg_streaming(vec, args.hvg_genes, block_size=args.block_size)] = True
        log.info("svd hvg: basis restricted to %d genes", args.hvg_genes)

    pb_for_basis = pb_dp if hvg_mask is None else pb_dp[hvg_mask]
    if args.column_sum_norm > 0:
        csum = pb_for_basis.sum(0, keepdims=True)
        pb_for_basis = pb_for_basis * (
            args.column_sum_norm / np.maximum(csum, 1e-12)
        )

    # log1p-stabilized spectral basis
    x = jnp.log1p(jnp.asarray(pb_for_basis))
    k = min(args.n_factors, min(x.shape) - 1)
    u_h, s, vt = rsvd(x, k, key=key_from_seed(args.seed, 23))
    if hvg_mask is None:
        u = np.asarray(u_h)  # [D, k] gene basis
    else:
        u = np.zeros((vec.num_rows, k), np.float32)
        u[hvg_mask] = np.asarray(u_h)

    # stream cells through the basis: f_cell = U^T log1p(x_cell)
    from ..data.visitors import visit_columns_by_block
    from ..ops.sparse import block_col_ids, project_block

    n = vec.num_columns
    factors = np.zeros((n, k), np.float32)
    u_j = jnp.asarray(u)
    mesh = None
    if args.data_parallel and jax.device_count() > 1:
        from ..parallel.mesh import DATA_AXIS, make_mesh

        mesh = make_mesh()

    def _project_vals(blk):
        vals = jnp.asarray(blk.vals, jnp.float32)
        if args.column_sum_norm > 0:
            from ..ops.sparse import block_col_sums

            cols_dev = block_col_ids(blk)
            csums = block_col_sums(cols_dev, vals, ncols=blk.ncols)
            scale = args.column_sum_norm / jnp.maximum(csums, 1e-12)
            vals = vals * jnp.concatenate([scale, jnp.zeros(1)])[
                jnp.minimum(cols_dev, blk.ncols)
            ]
        return vals

    if mesh is None:
        for blk in visit_columns_by_block(vec, block_size=args.block_size):
            f = project_block(
                u_j,
                jnp.asarray(blk.row_ids),
                block_col_ids(blk),
                jnp.log1p(_project_vals(blk)),
                ncols=blk.ncols,
            )
            factors[blk.lb : blk.lb + blk.ncols] = np.asarray(f)
    else:
        # dp: same-shape blocks stack and shard over the mesh, each
        # device projecting its slice against the replicated basis
        from ..ops.sparse import project_blocks_sharded

        n_dev = mesh.shape[DATA_AXIS]
        buf: list = []

        def flush():
            if not buf:
                return
            g_pad = ((len(buf) + n_dev - 1) // n_dev) * n_dev
            ncols = buf[0].ncols
            rows_l = [jnp.asarray(b.row_ids, jnp.int32) for b in buf]
            cnts_l = [jnp.asarray(b.col_counts) for b in buf]
            vals_l = [jnp.log1p(_project_vals(b)) for b in buf]
            pad = g_pad - len(buf)
            if pad:
                rows_l += [jnp.zeros_like(rows_l[0])] * pad
                cnts_l += [jnp.zeros_like(cnts_l[0])] * pad
                vals_l += [jnp.zeros_like(vals_l[0])] * pad
            fs = np.asarray(project_blocks_sharded(
                mesh, u_j, jnp.stack(rows_l), jnp.stack(cnts_l),
                jnp.stack(vals_l), ncols=ncols,
            ))
            for i, b in enumerate(buf):
                factors[b.lb : b.lb + b.ncols] = fs[i]
            buf.clear()

        for blk in visit_columns_by_block(vec, block_size=args.block_size):
            if buf and (
                buf[0].ncols != blk.ncols
                or len(buf[0].row_ids) != len(blk.row_ids)
            ):
                flush()
            buf.append(blk)
            if len(buf) >= max(n_dev, 8):
                flush()
        flush()

    if args.save_adjusted:
        _write_adjusted_backend(args, vec, finest, groups)

    if args.cnv:
        from ..cocoa.cnv_call import call_cnv_on_residuals

        cnv = call_cnv_on_residuals(
            pb_dp, pb_dp.mean(1), genes_per_bin=args.cnv_genes_per_bin
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
        log.info("svd cnv side-channel: %d pbs x %d bins", n_pb, n_bins)

    cells = vec.column_names()
    genes = vec.row_names()
    pd.DataFrame(
        factors, index=cells, columns=[f"f{i}" for i in range(k)]
    ).reset_index(names="cell").to_parquet(f"{args.out}.latent.parquet")
    pd.DataFrame(u, index=genes, columns=[f"f{i}" for i in range(k)]).reset_index(
        names="gene"
    ).to_parquet(f"{args.out}.dictionary.parquet")
    pd.DataFrame({"singular_value": np.asarray(s)}).to_parquet(
        f"{args.out}.singular_values.parquet"
    )
    RunManifest(
        command="svd",
        inputs={"data_files": list(args.data_files)},
        outputs={
            "latent": f"{args.out}.latent.parquet",
            "dictionary": f"{args.out}.dictionary.parquet",
        },
    ).save(args.out)
    return {"factors": factors, "basis": u, "singular_values": np.asarray(s)}


def _write_adjusted_backend(args: SvdArgs, vec, finest, groups: np.ndarray) -> None:
    """{out}.adjusted.zarr — batch-adjusted counts (svd/fit.rs:149-170):
    per cell j in pseudobulk group p, x_dj <- x_dj / (plane[d, p] l_j)
    with the self-normalizing scale l_j = sum x / sum plane on x's
    support (adjust_by_division_of_selected_inplace semantics); the
    plane is the per-group batch flavor mu_residual (observed mean when
    no batches)."""
    import scipy.sparse as sp

    from ..data.sparse_io import create_sparse_from_csc

    plane = finest.mu_residual if finest.mu_residual is not None else finest.mu_observed
    plane_dp = np.asarray(plane.mean())  # [D, P]
    n = vec.num_columns
    blocks = []
    bs = args.block_size
    for lb in range(0, n, bs):
        ub = min(lb + bs, n)
        csc = vec.read_columns_csc(np.arange(lb, ub))
        data = csc.data.copy()
        for jloc in range(ub - lb):
            s_, e_ = csc.indptr[jloc], csc.indptr[jloc + 1]
            rows = csc.indices[s_:e_]
            mu = plane_dp[rows, groups[lb + jloc]]
            x = csc.data[s_:e_]
            mu_sum = float(mu.sum())
            lam = float(x.sum()) / mu_sum if mu_sum > 0 else 1.0
            denom = mu * lam
            data[s_:e_] = np.where(denom > 0, x / np.maximum(denom, 1e-30), x)
        blocks.append(
            sp.csc_matrix((data, csc.indices.copy(), csc.indptr.copy()), shape=csc.shape)
        )
    adjusted = sp.hstack(blocks, format="csc") if blocks else sp.csc_matrix((vec.num_rows, 0))
    path = f"{args.out}.adjusted.zarr"
    create_sparse_from_csc(adjusted, path, vec.row_names(), vec.column_names())
    log.info("wrote adjusted backend %s (%d nnz)", path, adjusted.nnz)


def fit_joint_svd(
    modality_files: Sequence[Sequence[str]],
    out: str,
    *,
    n_factors: int = 20,
    proj_dim: int = 50,
    sort_dim: int = 10,
    iter_opt: int = 30,
    block_size: int = 8192,
    seed: int = DEFAULT_PROJECTION_SEED,
) -> dict:
    """`senna joint-svd`: modalities sharing cells -> shared pseudobulk
    groups (from the primary modality's projection) -> concatenated
    log1p pb features -> one rSVD; per-cell factors stream each
    modality through its slice of the gene basis and sum."""
    import pandas as pd

    from ..ops import collapse as clp
    from ..ops import random_projection as rp

    vecs = [load_data_vec(list(files)) for files in modality_files]
    n = vecs[0].num_columns
    for v in vecs[1:]:
        if v.num_columns != n:
            raise ValueError("joint-svd modalities must share cells")

    _, proj = rp.project_columns(vecs[0], proj_dim, block_size=block_size, seed=seed)
    codes = rp.binary_sort_columns(proj, sort_dim, seed=seed)
    groups, s_groups = rp.compact_group_codes(codes)

    pbs = []
    for v in vecs:
        stat = clp.collect_basic_stats(v, groups, s_groups, block_size=block_size)
        o = clp.optimize(stat, num_iter=iter_opt)
        pbs.append(np.log1p(np.asarray(o.mu_observed.mean())))  # [D_m, P]
    concat = np.concatenate(pbs, axis=0)  # [sum_D, P]

    k = min(n_factors, min(concat.shape) - 1)
    u, s, vt = rsvd(jnp.asarray(concat), k, key=key_from_seed(seed, 29))
    u = np.asarray(u)  # [sum_D, k]

    # per-cell factors: sum over modalities of U_m^T log1p(x_cell_m)
    from ..data.visitors import visit_columns_by_block
    from ..ops.sparse import project_block

    factors = np.zeros((n, k), np.float32)
    off = 0
    for v in vecs:
        d_m = v.num_rows
        u_m = jnp.asarray(u[off : off + d_m])
        for blk in visit_columns_by_block(v, block_size=block_size):
            from ..ops.sparse import block_col_ids

            f = project_block(
                u_m,
                jnp.asarray(blk.row_ids),
                block_col_ids(blk),
                jnp.log1p(jnp.asarray(blk.vals)),
                ncols=blk.ncols,
            )
            factors[blk.lb : blk.lb + blk.ncols] += np.asarray(f)
        off += d_m

    pd.DataFrame(
        factors, index=vecs[0].column_names(), columns=[f"f{i}" for i in range(k)]
    ).reset_index(names="cell").to_parquet(f"{out}.latent.parquet")
    rows = []
    for m, v in enumerate(vecs):
        rows.extend(f"m{m}:{g}" for g in v.row_names())
    pd.DataFrame(
        u, index=rows, columns=[f"f{i}" for i in range(k)]
    ).reset_index(names="feature").to_parquet(f"{out}.dictionary.parquet")
    RunManifest(
        command="joint-svd",
        inputs={"modalities": [list(f) for f in modality_files]},
        outputs={"latent": f"{out}.latent.parquet"},
    ).save(out)
    return {"factors": factors, "basis": u}
