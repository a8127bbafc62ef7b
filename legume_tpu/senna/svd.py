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
    seed: int = DEFAULT_PROJECTION_SEED


def fit_svd(args: SvdArgs) -> dict:
    import pandas as pd

    vec = load_data_vec(args.data_files, args.batch_files)
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
    # batch-adjusted pseudobulk profile (adjusted if batches, else observed)
    mu = finest.mu_adjusted if finest.mu_adjusted is not None else finest.mu_observed
    pb_dp = np.asarray(mu.mean())  # [D, P]

    # log1p-stabilized spectral basis
    x = jnp.log1p(jnp.asarray(pb_dp))
    k = min(args.n_factors, min(x.shape) - 1)
    u, s, vt = rsvd(x, k, key=key_from_seed(args.seed, 23))
    u = np.asarray(u)  # [D, k] gene basis

    # stream cells through the basis: f_cell = U^T log1p(x_cell)
    from ..data.visitors import visit_columns_by_block
    from ..ops.sparse import project_block

    n = vec.num_columns
    factors = np.zeros((n, k), np.float32)
    u_j = jnp.asarray(u)
    for blk in visit_columns_by_block(vec, block_size=args.block_size):
        from ..ops.sparse import block_col_ids

        f = project_block(
            u_j,
            jnp.asarray(blk.row_ids),
            block_col_ids(blk),
            jnp.log1p(jnp.asarray(blk.vals)),
            ncols=blk.ncols,
        )
        factors[blk.lb : blk.lb + blk.ncols] = np.asarray(f)

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
