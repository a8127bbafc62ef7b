"""Exact chunked kNN over projected coordinates.

The reference uses hand-SIMD L2 + seeded HNSW for anything above 8,192
points (`matrix-util/src/knn/backend.rs:16-33`, `metric.rs:13-52`).
On TPU the right primitive is an exact chunked matmul top-k: with
cells projected to K ~ 50 dims, distances are one [chunk, K] x [K, N]
MXU matmul per chunk and `lax.top_k` — deterministic by construction,
so the HNSW seeding machinery disappears (SURVEY.md section 2.6).

Also provides the per-batch *matched* lookup the counterfactual
collapse rides on (`sparse_io_vector/matched.rs:23-525`): for each
query cell, the k nearest cells in every OTHER batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("k",))
def _topk_chunk(
    q_ck: jax.Array,  # [C, K] query chunk
    r_nk: jax.Array,  # [N, K] reference points
    r_sq: jax.Array,  # [N] reference squared norms
    mask_n: jax.Array,  # [N] bool: candidates allowed
    *,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-k by L2 distance: returns (sq_distances [C, k], indices [C, k])."""
    # ||q - r||^2 = ||q||^2 - 2 q.r + ||r||^2 ; ||q||^2 is rank-constant
    cross = q_ck @ r_nk.T  # [C, N] — the MXU does the heavy lifting
    neg_d = 2.0 * cross - r_sq[None, :]
    neg_d = jnp.where(mask_n[None, :], neg_d, -jnp.inf)
    val, idx = jax.lax.top_k(neg_d, k)
    q_sq = jnp.sum(q_ck * q_ck, axis=-1, keepdims=True)
    return jnp.maximum(q_sq - val, 0.0), idx


#  The one-shot [C, N] score plane caps at this many bytes; beyond it
#  the points axis TILES inside one jitted scan (running top-k merge in
#  the carry) — a [4096, 1M] f32 plane is 16 GB and cannot exist on a
#  16 GB-HBM v5e, which is exactly the 1M-cell cocoa match-cache shape.
_TOPK_PLANE_BUDGET = 1 << 31  # 2 GB


def knn_search(
    queries: np.ndarray,  # [M, K]
    points: np.ndarray,  # [N, K]
    k: int,
    *,
    chunk: int = 4096,
    mask: np.ndarray | None = None,
    exclude_self_offset: int | None = None,
    mesh=None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact kNN: returns (distances [M, k] L2, indices [M, k]).

    `mask` restricts candidates; `exclude_self_offset`, when queries are
    points[offset:offset+M], removes each query's self-match by
    distance-0 suppression.

    Every chunk pads to exactly `chunk` query rows, so one config
    compiles ONE program regardless of M (remote-compile hygiene).
    `mesh`: shard the padded query chunk's rows over dp (points
    replicated) — the score matmul and top-k are row-separable, so XLA
    partitions them with no collectives (`cocoa diff --data-parallel`
    match-cache build; the reference's per-cell rayon loop analog).
    """
    m = queries.shape[0]
    n = points.shape[0]
    k = min(k, n)
    q_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
        chunk = -(-chunk // n_dev) * n_dev
        q_sharding = NamedSharding(mesh, P(DATA_AXIS))
    tiled = (
        exclude_self_offset is None and 4 * chunk * n > _TOPK_PLANE_BUDGET
    )
    if tiled:
        tile = max(_TOPK_PLANE_BUDGET // (4 * chunk), 1024)
        # round DOWN to a power of two: rounding up could double the
        # [chunk, tile] score plane past the budget it exists to bound
        tile = min(max(1 << int(np.floor(np.log2(tile))), 1024), n)
        n_pad = -(-n // tile) * tile
        r_t = np.zeros((n_pad, points.shape[1]), np.float32)
        r_t[:n] = points
        r = jnp.asarray(r_t.reshape(n_pad // tile, tile, -1))
        r_sq = jnp.sum(r * r, axis=-1)  # [T, tile]
        mask_np = np.zeros(n_pad, bool)
        mask_np[:n] = True if mask is None else np.asarray(mask)
        mask_t = jnp.asarray(mask_np.reshape(n_pad // tile, tile))
    else:
        r = jnp.asarray(points, jnp.float32)
        r_sq = jnp.sum(r * r, axis=-1)
        mask_n = jnp.ones(n, bool) if mask is None else jnp.asarray(mask)

    from ..utils.progress import progress

    dists = np.empty((m, k), np.float32)
    idxs = np.empty((m, k), np.int64)
    prog = progress.stage("knn-search", -(-m // chunk)) if m > chunk else None
    for lb in range(0, m, chunk):
        ub = min(lb + chunk, m)
        c = ub - lb
        if c < chunk:  # pad the tail chunk: one program shape per config
            q_np = np.zeros((chunk, queries.shape[1]), np.float32)
            q_np[:c] = queries[lb:ub]
        else:
            q_np = queries[lb:ub]
        q = jnp.asarray(q_np, jnp.float32)
        if q_sharding is not None:
            q = jax.device_put(q, q_sharding)
        if exclude_self_offset is not None:
            # mask self by index, chunk-local (pad rows self-mask out
            # of nothing: their ids land beyond the point range)
            self_ids = jnp.arange(lb, lb + chunk) + exclude_self_offset
            d2, idx = _topk_chunk_excl(q, r, r_sq, mask_n, self_ids, k=k)
        elif tiled:
            d2, idx = _topk_chunk_tiled(q, r, r_sq, mask_t, k=k)
        else:
            d2, idx = _topk_chunk(q, r, r_sq, mask_n, k=k)
        dists[lb:ub] = np.sqrt(np.asarray(d2[:c]))
        idxs[lb:ub] = np.asarray(idx[:c])
        if prog is not None:
            prog.update()
    if prog is not None:
        prog.finish()
    return dists, idxs


@partial(jax.jit, static_argnames=("k",))
def _topk_chunk_tiled(q_ck, r_tnk, r_sq_tn, mask_tn, *, k: int):
    """Points-axis-tiled exact top-k: one `lax.scan` over point tiles
    with the running (neg-distance, global-index) top-k in the carry —
    the [C, tile] plane is the only large transient, so N is unbounded
    by HBM. Semantics identical to `_topk_chunk`."""
    c = q_ck.shape[0]
    n_tiles, tile = r_sq_tn.shape

    def body(carry, xs):
        best_v, best_i = carry  # [C, k] neg distances + global ids
        t_idx, r_nk, r_sq, m_n = xs
        cross = q_ck @ r_nk.T  # [C, tile]
        neg_d = 2.0 * cross - r_sq[None, :]
        neg_d = jnp.where(m_n[None, :], neg_d, -jnp.inf)
        gids = t_idx * tile + jnp.arange(tile)
        cat_v = jnp.concatenate([best_v, neg_d], axis=1)
        cat_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(gids[None, :], (c, tile))], axis=1
        )
        val, pos = jax.lax.top_k(cat_v, k)
        return (val, jnp.take_along_axis(cat_i, pos, axis=1)), None

    init = (
        jnp.full((c, k), -jnp.inf),
        jnp.zeros((c, k), jnp.int32),
    )
    (val, idx), _ = jax.lax.scan(
        body, init, (jnp.arange(n_tiles), r_tnk, r_sq_tn, mask_tn)
    )
    q_sq = jnp.sum(q_ck * q_ck, axis=-1, keepdims=True)
    return jnp.maximum(q_sq - val, 0.0), idx


@partial(jax.jit, static_argnames=("k",))
def _topk_chunk_excl(q_ck, r_nk, r_sq, mask_n, self_ids, *, k: int):
    cross = q_ck @ r_nk.T
    neg_d = 2.0 * cross - r_sq[None, :]
    neg_d = jnp.where(mask_n[None, :], neg_d, -jnp.inf)
    cols = jnp.arange(r_nk.shape[0])[None, :]
    neg_d = jnp.where(cols == self_ids[:, None], -jnp.inf, neg_d)
    val, idx = jax.lax.top_k(neg_d, k)
    q_sq = jnp.sum(q_ck * q_ck, axis=-1, keepdims=True)
    return jnp.maximum(q_sq - val, 0.0), idx


def knn_within(points: np.ndarray, k: int, *, chunk: int = 4096):
    """kNN of a set against itself, self-matches excluded
    (ColumnDict-style, `matrix-util/src/knn/mod.rs:62`)."""
    return knn_search(points, points, k, chunk=chunk, exclude_self_offset=0)


def matched_neighbors_across_batches(
    proj_nk: np.ndarray,  # [N, K] projected cells
    batches: np.ndarray,  # [N] batch codes in [0, B)
    num_batches: int,
    k: int,
    *,
    chunk: int = 4096,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """For every cell, its k nearest cells in each OTHER batch.

    Returns `(indices [N, (B-1)*k], distances [N, (B-1)*k], valid
    [N, (B-1)*k])` — global cell indices, L2 distances, and a validity
    mask (False where a batch has fewer than k cells). Parity target:
    `read_neighbouring_columns_csc` (matched.rs) without the HNSW
    approximation.
    """
    n = proj_nk.shape[0]
    fill = max(num_batches - 1, 1) * k
    out_idx = np.zeros((n, fill), np.int64)
    out_dist = np.full((n, fill), np.inf, np.float32)
    out_valid = np.zeros((n, fill), bool)

    col = 0
    for b in range(num_batches):
        in_b = batches == b
        nb = int(in_b.sum())
        if nb == 0:
            continue
        # queries: all cells NOT in batch b match INTO batch b
        # (each query sees every other batch exactly once)
        d, i = knn_search(proj_nk, proj_nk, min(k, nb), chunk=chunk, mask=in_b)
        kk = d.shape[1]
        # place into each query's slot for "its matched batch b"; queries
        # in batch b itself skip (handled by slot bookkeeping below)
        for q_b in range(num_batches):
            if q_b == b:
                continue
            rows = batches == q_b
            slot = _slot_of(q_b, b)
            out_idx[rows, slot * k : slot * k + kk] = i[rows]
            out_dist[rows, slot * k : slot * k + kk] = d[rows]
            out_valid[rows, slot * k : slot * k + kk] = True
    return out_idx, out_dist, out_valid


def _slot_of(query_batch: int, target_batch: int) -> int:
    """Dense slot index for target batch within a query's matched set."""
    return target_batch - 1 if target_batch > query_batch else target_batch
