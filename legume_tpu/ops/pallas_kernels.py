"""Pallas TPU kernels for the sparse hot loops.

`coo_project_pallas` fuses the JL-projection inner kernel — gather
basis rows at nonzero gene ids, scale by values, accumulate by (sorted)
cell segment — into one kernel that streams the nonzero arrays through
VMEM in fixed-size chunks while the basis stays VMEM-resident
(D x K x 4 bytes <= ~8 MB for D=34k, K=64, comfortably under the
16 MB/core budget). The XLA fallback materializes an [nnz, K] gather
intermediate in HBM; the kernel never does, so the op becomes
HBM-bandwidth-bound on exactly the nnz + output traffic.

Grid: one program per nnz chunk; the output block index map pins every
program to the SAME [B, K] accumulator block, which Pallas keeps
resident across sequential grid steps (TPU grid execution is
sequential), so accumulation is in-VMEM.

Validated in interpreter mode on CPU (tests) and used on TPU behind
`LEGUME_PALLAS=1` (`project_block` dispatch in `ops/sparse.py`).

STATUS (resolved, round 1): real-TPU lowering REJECTS this kernel —
Mosaic does not support per-element integer indexing
(`ValueError: Cannot do int indexing on TPU`), so the gather
(`basis[rows]`) and scatter (`.at[cols].add`) at the heart of a COO
SpMM cannot be expressed inside a TPU Pallas body. This is a
programming-model constraint, not a bug: Mosaic indexing must be
block-structured (scalar-prefetch index maps select BLOCKS, not
elements). XLA's segment_sum path lowers the same computation through
TPU-optimized embedding-style gather/scatter and IS the production
path (`ops/sparse.py`); on the dev chip it compiles and runs in ~6 s.
The kernel is retained for interpret-mode reference and as a template
for GPU-side Pallas (Triton), where int indexing is supported.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

CHUNK = 8192  # nonzeros per grid step


def _kernel(row_ref, col_ref, val_ref, basis_ref, out_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    rows = row_ref[:]  # [CHUNK] gene ids of this chunk
    cols = col_ref[:]  # [CHUNK] cell ids (sorted; pad -> B)
    vals = val_ref[:]  # [CHUNK]
    contrib = basis_ref[rows, :] * vals[:, None]  # [CHUNK, K]
    # chunk-local segment accumulation with VALUE semantics —
    # `ref[idx] += v` silently drops duplicate indices, `.at[].add`
    # accumulates them; the final full-block add has no duplicates
    seg = jnp.zeros_like(out_ref).at[cols, :].add(contrib)
    out_ref[:, :] += seg


def coo_project_pallas(
    basis_dk: jax.Array,  # [D, K]
    row_ids: jax.Array,  # [nnz] int32, padded with 0
    col_ids: jax.Array,  # [nnz] int32, sorted; padding -> ncols
    vals: jax.Array,  # [nnz] f32, padding -> 0
    *,
    ncols: int,
    interpret: bool = False,
) -> jax.Array:
    """[ncols, K] projected block; matches `sparse.project_block`."""
    nnz = row_ids.shape[0]
    k = basis_dk.shape[1]
    num_chunks = max(nnz // CHUNK, 1)
    assert nnz % CHUNK == 0 or nnz < CHUNK, "pad nnz to a CHUNK multiple"
    chunk = min(CHUNK, nnz)

    out = pl.pallas_call(
        _kernel,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,)),
            pl.BlockSpec((chunk,), lambda i: (i,)),
            pl.BlockSpec((chunk,), lambda i: (i,)),
            pl.BlockSpec(basis_dk.shape, lambda i: (0, 0)),  # resident
        ],
        out_specs=pl.BlockSpec((ncols + 1, k), lambda i: (0, 0)),  # pinned
        out_shape=jax.ShapeDtypeStruct((ncols + 1, k), basis_dk.dtype),
        interpret=interpret,
    )(row_ids, col_ids, vals, basis_dk)
    return out[:ncols]
