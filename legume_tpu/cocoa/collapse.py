"""Topic-weighted counterfactual matched-stat collection
(`cocoa/src/collapse_cocoa_data.rs` equivalent).

For each cell j (individual i(j), exposure x_i, pseudobulk sample p(j))
and topic k with z_jk >= 1e-8:

    weights over matched set M_j (kNN cells from opposite-exposure
    individuals):  w_a = exp(-dist_a) * z_matched[a, k], normalized
    y0[g,k,p] += z_jk * sum_a w_a y[g, a] / sum_a w_a
    y1[g,k,p] += z_jk * y[g, j];   y1_di[g,k,i] += z_jk * y[g, j]
    size[k,p] += z_jk;             size_ip[k,i,p] += z_jk

(collapse_cocoa_data.rs:86-215). Matching is exact on-device top-k per
individual (`knn_batches = n_indv` in the reference means k matches
from EVERY other individual, collapse_cocoa_data.rs:110-133); the
match cache (indices/distances per cell) is retained so permutation
replays only re-filter by exposure (MatchCache::replay_with_exposure,
collapse_cocoa_data.rs:241-315) — no re-matching.

Device shapes: the y0 accumulation is a [nnz]-gather of per-(pair,
topic) coefficients + gene segment-sum; y1 terms are [nnz] x [K]
contributions segmented by gene — all VPU/segment work with one
coefficient matmul per block.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.visitors import csc_to_coo_block
from ..ops import sparse as sparse_ops
from .stat import CocoaStat


def _malloc_trim() -> None:
    """Return freed glibc arenas to the OS (no-op off glibc). The
    streaming replay allocates/frees ~6 MB of transfer staging per
    block; glibc keeps those arenas resident, ratcheting RSS by GBs
    per pass at 1M cells (r5: the 125 GB OOM kill)."""
    try:
        import ctypes

        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


@dataclass
class MatchCache:
    """Per-cell kNN matches from every other individual
    (collapse_cocoa_data.rs:222-244)."""

    idx: np.ndarray  # [N, M] global matched cell ids
    dist: np.ndarray  # [N, M] L2 distances
    valid: np.ndarray  # [N, M]
    matched_indv: np.ndarray  # [N, M] individual of each matched cell


def build_match_cache(
    proj_nk: np.ndarray,
    cell_indv: np.ndarray,
    n_indv: int,
    knn: int,
    *,
    chunk: int = 4096,
    mesh=None,
) -> MatchCache:
    """kNN per OTHER individual for every cell (exposure-agnostic).
    `mesh` shards the query axis of the exact top-k over dp."""
    from ..ops.knn import knn_search

    n = proj_nk.shape[0]
    m = max(n_indv - 1, 1) * knn
    idx = np.zeros((n, m), np.int32)
    dist = np.full((n, m), np.inf, np.float32)
    valid = np.zeros((n, m), bool)

    slot_of = lambda q_i, t_i: (t_i - 1 if t_i > q_i else t_i)
    for i in range(n_indv):
        in_i = cell_indv == i
        ni = int(in_i.sum())
        if ni == 0:
            continue
        kk = min(knn, ni)
        d, ix = knn_search(proj_nk, proj_nk, kk, chunk=chunk, mask=in_i, mesh=mesh)
        for q_i in range(n_indv):
            if q_i == i:
                continue
            rows = cell_indv == q_i
            s = slot_of(q_i, i)
            idx[rows, s * knn : s * knn + kk] = ix[rows]
            dist[rows, s * knn : s * knn + kk] = d[rows]
            valid[rows, s * knn : s * knn + kk] = True
    return MatchCache(
        idx=idx, dist=dist, valid=valid, matched_indv=cell_indv[idx]
    )


# ----------------------------------------------------------------------------
# Match-cache persistence (run_diff.rs:341-346 `MatchCache` — the
# reference retains it in memory so permutation replays skip
# re-matching; persisting next to the backend extends the reuse across
# INVOCATIONS and permutation configs, like the ingest tile cache)
# ----------------------------------------------------------------------------


def match_cache_key(
    n: int, knn: int, n_indv: int, proj_dim: int, seed: int,
    cell_indv: np.ndarray,
) -> str:
    """Config fingerprint: the cache depends only on the projection
    (deterministic under seed/dim), the individual assignment, and knn
    — NOT on exposures/topics/permutations."""
    import hashlib

    h = hashlib.sha1()
    h.update(np.asarray([n, knn, n_indv, proj_dim, seed], np.int64).tobytes())
    h.update(np.ascontiguousarray(cell_indv, np.int64).tobytes())
    return h.hexdigest()[:16]


def match_cache_file(backend_path: str, key: str) -> str:
    import os

    if os.path.isdir(backend_path):
        return os.path.join(backend_path, "match_cache", f"{key}.npz")
    return f"{backend_path}.match_cache.{key}.npz"


def save_match_cache(cache: MatchCache, path: str) -> None:
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    np.savez_compressed(
        tmp, idx=cache.idx, dist=cache.dist, valid=cache.valid,
        matched_indv=cache.matched_indv,
    )
    os.replace(tmp + (".npz" if not tmp.endswith(".npz") else ""), path)


def load_match_cache(path: str) -> MatchCache | None:
    import os

    if not os.path.exists(path):
        return None
    try:
        z = np.load(path)
        return MatchCache(
            idx=z["idx"], dist=z["dist"], valid=z["valid"],
            matched_indv=z["matched_indv"],
        )
    except Exception:
        return None


@jax.jit
def _pair_coeffs(dist, valid, z_query_k, z_matched_k):
    """Per-(cell, pair, topic) normalized weights:
    c[j,a,k] = z_jk * exp(-d_a) z0[a,k] / sum_a' exp(-d_a') z0[a',k],
    zeroed when z_jk < 1e-8 or denom < 1e-8
    (collapse_cocoa_data.rs:151-175)."""
    ed = jnp.where(valid, jnp.exp(-dist), 0.0)  # [C, M]
    w = ed[:, :, None] * z_matched_k  # [C, M, K]
    denom = jnp.sum(w, axis=1, keepdims=True)  # [C, 1, K]
    w = jnp.where(denom > 1e-8, w / jnp.maximum(denom, 1e-30), 0.0)
    zq = jnp.where(z_query_k >= 1e-8, z_query_k, 0.0)  # [C, K]
    active = (denom[:, 0, :] > 1e-8).astype(zq.dtype) * zq  # z_jk where matched
    return w * zq[:, None, :], active  # coeffs [C, M, K], z-active [C, K]


def collect_cocoa_stat(
    data,
    cell_topic_nk: np.ndarray,  # [N, K] proportions
    cell_indv: np.ndarray,  # [N] individual of each cell
    pb_sample: np.ndarray,  # [N] pseudobulk sample of each cell
    n_samples: int,
    exposure: np.ndarray,  # [I] exposure of each individual
    cache: MatchCache,
    *,
    gene_weights: np.ndarray | None = None,
    cell_block: int = 1024,
) -> CocoaStat:
    """One pass over cell blocks; replayable with a permuted exposure
    by calling again with the same cache."""
    n, k = cell_topic_nk.shape
    d = data.num_rows
    n_indv = len(exposure)
    stat = CocoaStat.zeros(k, d, n_indv, n_samples)

    exposure = np.asarray(exposure)
    y1_kdp = jnp.zeros((d, n_samples, k))
    y0_kdp = jnp.zeros((d, n_samples, k))
    y1_kdi = jnp.zeros((d, n_indv, k))

    m = cache.idx.shape[1]
    for lb in range(0, n, cell_block):
        ub = min(lb + cell_block, n)
        c = ub - lb
        # exposure filter: match only into opposite-exposure individuals
        q_exp = exposure[cell_indv[lb:ub]][:, None]  # [c, 1]
        m_exp = exposure[cache.matched_indv[lb:ub]]  # [c, M]
        valid = cache.valid[lb:ub] & (m_exp != q_exp)

        zq = cell_topic_nk[lb:ub]  # [c, K]
        zm = cell_topic_nk[cache.idx[lb:ub].reshape(-1)].reshape(c, m, k)
        coeffs, z_active = _pair_coeffs(
            jnp.asarray(cache.dist[lb:ub]), jnp.asarray(valid), jnp.asarray(zq), jnp.asarray(zm)
        )
        coeffs_flat = jnp.concatenate(
            [jnp.asarray(coeffs).reshape(c * m, k), jnp.zeros((1, k))], axis=0
        )  # pad slot c*m

        # y0: read matched columns (duplicated per pair), accumulate per
        # (gene, query-sample, topic) via flat segment ids:
        pair_cols = cache.idx[lb:ub].reshape(-1)
        y0_blk = csc_to_coo_block(data.read_columns_csc(pair_cols))
        pair_sample = np.full(c * m + 1, n_samples, np.int32)
        pair_sample[: c * m] = pb_sample[lb:ub].repeat(m)
        # y0[g, p, k] += val * coeff[pair, k] grouped by pair sample
        y0_blk_cols = sparse_ops.col_ids_from_counts(
            jnp.asarray(y0_blk.col_counts),
            cap=len(y0_blk.row_ids), ncols=y0_blk.ncols,
        )
        contrib = jnp.asarray(y0_blk.vals)[:, None] * coeffs_flat[
            jnp.minimum(y0_blk_cols, c * m)
        ]  # [nnz, K]
        flat = jnp.asarray(y0_blk.row_ids).astype(jnp.int32) * (n_samples + 1) + jnp.asarray(
            pair_sample
        )[jnp.minimum(y0_blk_cols, c * m)]
        y0_dpk = jax.ops.segment_sum(
            contrib, flat, num_segments=d * (n_samples + 1)
        ).reshape(d, n_samples + 1, k)[:, :n_samples, :]
        y0_kdp = y0_kdp + y0_dpk

        # y1 terms: block of query cells
        y_blk = csc_to_coo_block(data.read_columns_csc(np.arange(lb, ub)))
        z_active_flat = jnp.concatenate([jnp.asarray(z_active), jnp.zeros((1, k))], 0)
        q_sample = np.full(c + 1, n_samples, np.int32)
        q_sample[:c] = pb_sample[lb:ub]
        q_indv = np.full(c + 1, n_indv, np.int32)
        q_indv[:c] = cell_indv[lb:ub]
        y_cols = jnp.minimum(
            sparse_ops.col_ids_from_counts(
                jnp.asarray(y_blk.col_counts),
                cap=len(y_blk.row_ids), ncols=y_blk.ncols,
            ),
            c,
        )
        contrib1 = jnp.asarray(y_blk.vals)[:, None] * z_active_flat[y_cols]
        flat_p = jnp.asarray(y_blk.row_ids).astype(jnp.int32) * (n_samples + 1) + jnp.asarray(
            q_sample
        )[y_cols]
        y1_kdp = y1_kdp + jax.ops.segment_sum(
            contrib1, flat_p, num_segments=d * (n_samples + 1)
        ).reshape(d, n_samples + 1, k)[:, :n_samples, :]
        flat_i = jnp.asarray(y_blk.row_ids).astype(jnp.int32) * (n_indv + 1) + jnp.asarray(
            q_indv
        )[y_cols]
        y1_kdi = y1_kdi + jax.ops.segment_sum(
            contrib1, flat_i, num_segments=d * (n_indv + 1)
        ).reshape(d, n_indv + 1, k)[:, :n_indv, :]

        # sizes
        za = np.asarray(z_active)  # [c, K]
        np.add.at(stat.size_kp.transpose(1, 0), pb_sample[lb:ub], za)
        ip = np.zeros((n_indv, n_samples, k), np.float32)
        np.add.at(ip, (cell_indv[lb:ub], pb_sample[lb:ub]), za)
        stat.size_kip += ip.transpose(2, 0, 1)

    stat.y1_sum_kdp = np.asarray(y1_kdp).transpose(2, 0, 1)
    stat.y0_sum_kdp = np.asarray(y0_kdp).transpose(2, 0, 1)
    stat.y1_sum_kdi = np.asarray(y1_kdi).transpose(2, 0, 1)
    if gene_weights is not None:
        stat.apply_gene_weights(gene_weights)
    return stat


# ----------------------------------------------------------------------------
# Permutation replay: two-pass, each column read ONCE
# ----------------------------------------------------------------------------


def _accumulate_match_weights_impl(
    w_acc,  # [T, N*P, K] flattened per-(matched cell, query sample) weights
    a_acc,  # [T, N, K] per-query z-active
    exposures_ti,  # [T, I]
    q_indv_c,  # [C]
    m_indv_cm,  # [C, M]
    dist,  # [C, M]
    valid_base,  # [C, M]
    zq,  # [C, K]
    zm,  # [C, M, K]
    pair_cols,  # [C*M] global matched cell ids
    pb_blk,  # [C] query pseudobulk samples
    q_ids,  # [C] global query ids
    *,
    n_samples: int,
):
    """Pass A of the replay collector: for one query block, compute the
    normalized counterfactual coefficients under EVERY exposure
    assignment and scatter them into the per-(matched cell, query
    sample, topic) weight plane W (y0 = Y @ W in pass B) and the
    per-query z-active plane A (y1 terms). No count data is touched."""
    c, m = dist.shape
    k = zq.shape[1]
    flat_pair = pair_cols * n_samples + jnp.repeat(pb_blk, m)  # [C*M]

    def body(accs, xs):
        t, exp_i = xs
        w_a, a_a = accs
        valid = valid_base & (exp_i[m_indv_cm] != exp_i[q_indv_c][:, None])
        coeffs, z_active = _pair_coeffs(dist, valid, zq, zm)
        w_a = w_a.at[t].add(
            jnp.zeros_like(w_a[t]).at[flat_pair].add(coeffs.reshape(c * m, k))
        )
        a_a = a_a.at[t, q_ids].add(z_active)
        return (w_a, a_a), None

    t_total = exposures_ti.shape[0]
    (w_acc, a_acc), _ = jax.lax.scan(
        body, (w_acc, a_acc), (jnp.arange(t_total), exposures_ti)
    )
    return w_acc, a_acc


_accumulate_match_weights = partial(
    jax.jit, static_argnames=("n_samples",), donate_argnums=(0, 1)
)(_accumulate_match_weights_impl)


def _apply_weights_block_impl(
    y0_acc,  # [T, D, P, K]
    y1_acc,  # [T, D, P, K]
    y1i_acc,  # [T, D, I, K]
    w_blk,  # [T, C*P, K] weight rows of this block's columns
    a_blk,  # [T, C, K] z-active rows of this block's columns
    vals,  # [nnz_pad] (padding: 0)
    rows,  # [nnz_pad] gene ids
    cols,  # [nnz_pad] local col ids (padding marker: C)
    pb_blk,  # [C] pseudobulk of each column-as-query
    indv_blk,  # [C]
    *,
    n_samples: int,
    n_indv: int,
    d: int,
):
    """Pass B of the replay collector: one slab of columns (each read
    ONCE for all T exposures), turned into y0/y1 sufficient stats by
    gathering the pass-A weight rows per nonzero and segment-summing
    by gene (x query sample / individual)."""
    c = pb_blk.shape[0]
    k = y0_acc.shape[3]
    cols_c = jnp.minimum(cols, c)  # pad marker -> slot c
    q_sample = jnp.concatenate(
        [pb_blk, jnp.full((1,), n_samples, pb_blk.dtype)]
    )
    q_indv = jnp.concatenate([indv_blk, jnp.full((1,), n_indv, indv_blk.dtype)])
    flat_p = rows * (n_samples + 1) + q_sample[cols_c]
    flat_i = rows * (n_indv + 1) + q_indv[cols_c]

    def body(accs, xs):
        w_t, a_t = xs  # [C*P, K], [C, K]
        y0a, y1a, y1ia = accs
        # y0: per-nnz gather of the column's [P, K] weight rows
        w_rows = w_t.reshape(c, n_samples, k)
        w_pad = jnp.concatenate(
            [w_rows, jnp.zeros((1, n_samples, k), w_t.dtype)], axis=0
        )
        contrib0 = vals[:, None, None] * w_pad[cols_c]  # [nnz, P, K]
        y0_dpk = jax.ops.segment_sum(
            contrib0.reshape(-1, n_samples * k), rows, num_segments=d
        ).reshape(d, n_samples, k)
        # y1 terms: per-nnz z-active of the column (as query)
        a_pad = jnp.concatenate([a_t, jnp.zeros((1, k), a_t.dtype)], axis=0)
        contrib1 = vals[:, None] * a_pad[cols_c]  # [nnz, K]
        y1_dpk = jax.ops.segment_sum(
            contrib1, flat_p, num_segments=d * (n_samples + 1)
        ).reshape(d, n_samples + 1, k)[:, :n_samples, :]
        y1_dik = jax.ops.segment_sum(
            contrib1, flat_i, num_segments=d * (n_indv + 1)
        ).reshape(d, n_indv + 1, k)[:, :n_indv, :]
        return (y0a + y0_dpk[None], y1a + y1_dpk[None], y1ia + y1_dik[None]), None

    # scan over T with per-t accumulator slices via dynamic updates
    def body_idx(accs, xs):
        t, w_t, a_t = xs
        y0a, y1a, y1ia = accs
        (d0, d1, d1i), _ = body(
            (jnp.zeros_like(y0a[0:1]), jnp.zeros_like(y1a[0:1]),
             jnp.zeros_like(y1ia[0:1])),
            (w_t, a_t),
        )
        return (
            y0a.at[t].add(d0[0]),
            y1a.at[t].add(d1[0]),
            y1ia.at[t].add(d1i[0]),
        ), None

    t_total = w_blk.shape[0]
    (y0_acc, y1_acc, y1i_acc), _ = jax.lax.scan(
        body_idx,
        (y0_acc, y1_acc, y1i_acc),
        (jnp.arange(t_total), w_blk, a_blk),
    )
    return y0_acc, y1_acc, y1i_acc


_apply_weights_block = partial(
    jax.jit,
    static_argnames=("n_samples", "n_indv", "d"),
    donate_argnums=(0, 1, 2),
)(_apply_weights_block_impl)


# ---- grouped-dispatch forms (r5): G blocks per device dispatch -------------
#
# Per-block dispatches are the root cause of the 1M OOM kill: every
# dispatch through the tunneled backend is an allocation event in the
# proxy client's host pool, which grows with DISPATCH COUNT and never
# shrinks (BENCH_NOTES r5 ratchet trail) — and each costs a relay
# round-trip. Scanning G blocks inside one program cuts both by G.
# Group shapes are uniform (full cell_block blocks; the ragged tail
# rides the single-block fns above).


@partial(jax.jit, static_argnames=("n_samples",), donate_argnums=(0, 1))
def _acc_blocks_grouped(
    w_acc, a_acc, exposures_ti, z_full, q_indv_g, m_indv_g, dist_g,
    valid_g, idx_g, pb_g, qid_g, *, n_samples,
):
    k = z_full.shape[1]

    def body(accs, xs):
        q_indv, m_indv, dist, valid, idx_flat, pb_b, q_ids = xs
        c, m = dist.shape
        # the query/matched topic rows gather on device from the one
        # resident [N, K] plane (the per-block path shipped a gathered
        # [C, M, K] from host per dispatch)
        zq = z_full[q_ids]
        zm = z_full[idx_flat].reshape(c, m, k)
        out = _accumulate_match_weights_impl(
            accs[0], accs[1], exposures_ti, q_indv, m_indv, dist, valid,
            zq, zm, idx_flat, pb_b, q_ids, n_samples=n_samples,
        )
        return out, None

    (w_acc, a_acc), _ = jax.lax.scan(
        body, (w_acc, a_acc),
        (q_indv_g, m_indv_g, dist_g, valid_g, idx_g, pb_g, qid_g),
    )
    return w_acc, a_acc


@partial(
    jax.jit,
    static_argnames=("n_samples", "n_indv", "d", "c"),
    donate_argnums=(0, 1, 2),
)
def _apply_blocks_grouped(
    y0_acc, y1_acc, y1i_acc, w_acc, a_acc, lbs, vals_g, rows_g, cols_g,
    pb_g, indv_g, *, n_samples, n_indv, d, c,
):
    tc = y0_acc.shape[0]
    k = y0_acc.shape[3]
    n = a_acc.shape[1]
    w_mat4 = w_acc.reshape(tc, n, n_samples, k)

    def body(accs, xs):
        lb, vals, rows, cols, pb_b, indv_b = xs
        w_blk = jax.lax.dynamic_slice_in_dim(w_mat4, lb, c, axis=1).reshape(
            tc, c * n_samples, k
        )
        a_blk = jax.lax.dynamic_slice_in_dim(a_acc, lb, c, axis=1)
        out = _apply_weights_block_impl(
            accs[0], accs[1], accs[2], w_blk, a_blk, vals, rows, cols,
            pb_b, indv_b, n_samples=n_samples, n_indv=n_indv, d=d,
        )
        return out, None

    (y0_acc, y1_acc, y1i_acc), _ = jax.lax.scan(
        body, (y0_acc, y1_acc, y1i_acc),
        (lbs, vals_g, rows_g, cols_g, pb_g, indv_g),
    )
    return y0_acc, y1_acc, y1i_acc


# ----------------------------------------------------------------------------
# dp over the exposure (permutation) axis — the mesh analog of the
# reference's rayon-parallel permutation replays (run_diff.rs:361)
# ----------------------------------------------------------------------------

_SHARDED_CACHE: dict = {}


def _sharded_replay_fns(mesh, n_samples: int, n_indv: int, d: int):
    """shard_map wrappers of the two replay-collector programs with the
    EXPOSURE axis split over dp: permutations are conditionally
    independent given the match cache, so each device owns T/n_dev
    exposure rows, their W/A planes, and their sufficient-stat
    accumulators — no collectives at all, and per-device HBM for the W
    plane drops by the mesh size (the 1M-cell constraint). The wrapped
    functions are the single-device programs applied to the local T
    slice, so mesh and no-mesh paths share one implementation."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    key = (mesh, n_samples, n_indv, d)
    if key in _SHARDED_CACHE:
        return _SHARDED_CACHE[key]

    t_spec = P(DATA_AXIS)
    rep = P()

    acc = jax.jit(
        jax.shard_map(
            partial(_accumulate_match_weights_impl, n_samples=n_samples),
            mesh=mesh,
            in_specs=(t_spec, t_spec, t_spec) + (rep,) * 9,
            out_specs=(t_spec, t_spec),
        ),
        donate_argnums=(0, 1),
    )
    apply_ = jax.jit(
        jax.shard_map(
            partial(
                _apply_weights_block_impl,
                n_samples=n_samples, n_indv=n_indv, d=d,
            ),
            mesh=mesh,
            in_specs=(t_spec, t_spec, t_spec, t_spec, t_spec) + (rep,) * 5,
            out_specs=(t_spec, t_spec, t_spec),
        ),
        donate_argnums=(0, 1, 2),
    )
    _SHARDED_CACHE[key] = (acc, apply_)
    return acc, apply_


def collect_cocoa_stat_multi(
    data,
    cell_topic_nk: np.ndarray,  # [N, K]
    cell_indv: np.ndarray,  # [N]
    pb_sample: np.ndarray,  # [N]
    n_samples: int,
    exposures_ti: np.ndarray,  # [T, I] — row 0 is usually the OBSERVED
    cache: MatchCache,
    *,
    gene_weights: np.ndarray | None = None,
    cell_block: int = 1024,
    t_chunk: int | None = None,
    mesh=None,
) -> list[CocoaStat]:
    """Permutation-replay collector, TPU-shaped: two passes, each data
    column read ONCE regardless of T.

    Pass A streams NO count data: per query block it computes the
    normalized counterfactual coefficients under every exposure row
    (only the opposite-exposure filter changes per permutation —
    MatchCache::replay_with_exposure, collapse_cocoa_data.rs:241-315)
    and scatters them into a device-resident weight plane
    W[t, matched_cell, query_sample, topic] plus the per-query z-active
    plane A[t, cell, topic].

    Pass B streams every column once and forms
    y0[t, g, p, k] = sum_u y[g, u] * W[t, u, p, k] (and the y1/y1i
    planes from A) as gathers + gene segment-sums — the naive replay
    re-reads each matched column once per (query, permutation), ~K*I x
    more I/O (the reference pays it in rayon threads; a tunneled TPU
    cannot).

    W costs T*N*(P)*K floats of HBM, so T is processed in chunks of
    `t_chunk` (default sized to ~2 GB); each chunk re-streams the data,
    still arbitrarily better than per-permutation re-reads. Returns one
    CocoaStat per exposure row; row t reproduces `collect_cocoa_stat`
    with that exposure to float tolerance.

    `mesh`: dp-shard the EXPOSURE axis — each device owns T/n_dev
    exposure rows end-to-end (coefficients, W/A planes, sufficient
    stats), the mesh analog of the reference's rayon permutation loop
    (run_diff.rs:361). Per-device W memory drops by the mesh size, so
    the HBM T-chunk budget scales up accordingly."""
    n, k = cell_topic_nk.shape
    d = data.num_rows
    t_total, n_indv = exposures_ti.shape
    m = cache.idx.shape[1]
    n_dev = 1
    if mesh is not None:
        n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if t_chunk is None:
        import os

        # W + A cost ~4x bytes_per_t of peak HBM through the pass-A
        # scan (carry + donated copy + the per-t scatter plane), so the
        # budget is deliberately conservative; 1M cells x P=10 x K=8
        # measured a ~20 GB compile-time buffer at the old 2 GB budget.
        # Sharded, the plane splits over devices: budget scales by n_dev.
        budget = float(os.environ.get("LEGUME_COCOA_W_BUDGET", 5e8)) * n_dev
        bytes_per_t = n * (n_samples + 1) * k * 4
        t_chunk = max(int(budget // max(bytes_per_t, 1)), n_dev)
    t_chunk = min(t_chunk, t_total)
    if mesh is not None:
        # T chunks pad to the mesh size (pad rows replay exposure 0)
        t_chunk = max(t_chunk - t_chunk % n_dev, n_dev)
        acc_fn, apply_fn = _sharded_replay_fns(mesh, n_samples, n_indv, d)
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        t_shard = lambda a: jax.device_put(a, NamedSharding(mesh, P(DATA_AXIS)))
    else:
        acc_fn = partial(_accumulate_match_weights, n_samples=n_samples)
        apply_fn = partial(
            _apply_weights_block, n_samples=n_samples, n_indv=n_indv, d=d
        )
        t_shard = lambda a: a

    z_j = jnp.asarray(cell_topic_nk.astype(np.float32))
    stats_out: list[CocoaStat] = []
    for t_lo in range(0, t_total, t_chunk):
        t_hi = min(t_lo + t_chunk, t_total)
        tc_real = t_hi - t_lo
        tc = tc_real if mesh is None else -(-tc_real // n_dev) * n_dev
        exp_chunk = exposures_ti[t_lo:t_hi].astype(np.int32)
        if tc != tc_real:
            exp_chunk = np.concatenate(
                [exp_chunk, np.repeat(exposures_ti[:1].astype(np.int32),
                                      tc - tc_real, axis=0)]
            )
        exp_j = t_shard(jnp.asarray(exp_chunk))

        from ..utils.progress import progress

        # ---- pass A: match-weight accumulation (no count reads) ----
        import os as _os

        w_acc = t_shard(jnp.zeros((tc, n * n_samples, k)))
        a_acc = t_shard(jnp.zeros((tc, n, k)))
        # grouped dispatches (single-device path): G blocks per device
        # program — the proxy client's host pool grows with DISPATCH
        # COUNT (r5 ratchet, BENCH_NOTES), and each dispatch is a
        # relay round-trip; G=8 cuts both 8x. LEGUME_COCOA_GROUP=1
        # restores per-block dispatch.
        group = (
            max(int(_os.environ.get("LEGUME_COCOA_GROUP", "8")), 1)
            if mesh is None else 1
        )
        prog_a = progress.stage(
            f"cocoa-pass-a t[{t_lo}:{t_hi}]", -(-n // cell_block)
        )
        ga: list = []

        def _flush_a():
            if not ga:
                return None, None
            stack = [np.stack([b[i] for b in ga]) for i in range(7)]
            ga.clear()
            return _acc_blocks_grouped(
                w_acc, a_acc, exp_j, z_j, *(jnp.asarray(s) for s in stack),
                n_samples=n_samples,
            )

        for lb in range(0, n, cell_block):
            ub = min(lb + cell_block, n)
            c = ub - lb
            idx_blk = cache.idx[lb:ub]
            if group > 1 and c == cell_block:
                ga.append((
                    cell_indv[lb:ub].astype(np.int32),
                    cache.matched_indv[lb:ub].astype(np.int32),
                    np.asarray(cache.dist[lb:ub]),
                    np.asarray(cache.valid[lb:ub]),
                    idx_blk.reshape(-1).astype(np.int32),
                    pb_sample[lb:ub].astype(np.int32),
                    np.arange(lb, ub, dtype=np.int32),
                ))
                if len(ga) >= group:
                    w_acc, a_acc = _flush_a()
                prog_a.update()
                continue
            if ga:  # ragged tail next: flush the pending full blocks
                w_acc, a_acc = _flush_a()
            w_acc, a_acc = acc_fn(
                w_acc, a_acc, exp_j,
                jnp.asarray(cell_indv[lb:ub].astype(np.int32)),
                jnp.asarray(cache.matched_indv[lb:ub].astype(np.int32)),
                jnp.asarray(cache.dist[lb:ub]),
                jnp.asarray(cache.valid[lb:ub]),
                z_j[lb:ub],
                z_j[jnp.asarray(idx_blk.reshape(-1).astype(np.int32))].reshape(
                    c, m, k
                ),
                jnp.asarray(idx_blk.reshape(-1).astype(np.int32)),
                jnp.asarray(pb_sample[lb:ub].astype(np.int32)),
                jnp.arange(lb, ub, dtype=jnp.int32),
            )
            prog_a.update()
        if ga:
            w_acc, a_acc = _flush_a()
        jax.block_until_ready(w_acc)
        _malloc_trim()
        prog_a.finish()

        # ---- pass B: one streaming pass over all columns -----------
        y0_acc = t_shard(jnp.zeros((tc, d, n_samples, k)))
        y1_acc = t_shard(jnp.zeros((tc, d, n_samples, k)))
        y1i_acc = t_shard(jnp.zeros((tc, d, n_indv, k)))
        w_mat = w_acc.reshape(tc, n, n_samples, k)
        prog_b = progress.stage(
            f"cocoa-pass-b t[{t_lo}:{t_hi}]", -(-n // cell_block)
        )
        gb: list = []

        def _flush_b(accs):
            if not gb:
                return accs
            # pad every block's COO to one power-of-two nnz bucket so
            # group size/bucket give O(1) distinct compiled programs
            nnz_pad = 1 << (max(len(b[1]) for b in gb) - 1).bit_length()
            lbs, vals_g, rows_g, cols_g, pb_g, iv_g = [], [], [], [], [], []
            for lb_b, vals, rows_b, cols_b, pb_b, iv_b in gb:
                pad = nnz_pad - len(vals)
                lbs.append(lb_b)
                vals_g.append(np.pad(vals, (0, pad)))
                rows_g.append(np.pad(rows_b, (0, pad)))
                # pad marker: local col id C -> the zero slot
                cols_g.append(np.pad(cols_b, (0, pad),
                                     constant_values=cell_block))
                pb_g.append(pb_b)
                iv_g.append(iv_b)
            gb.clear()
            return _apply_blocks_grouped(
                *accs, w_acc, a_acc,
                jnp.asarray(np.asarray(lbs, np.int32)),
                jnp.asarray(np.stack(vals_g)),
                jnp.asarray(np.stack(rows_g)),
                jnp.asarray(np.stack(cols_g)),
                jnp.asarray(np.stack(pb_g)),
                jnp.asarray(np.stack(iv_g)),
                n_samples=n_samples, n_indv=n_indv, d=d, c=cell_block,
            )

        accs = (y0_acc, y1_acc, y1i_acc)
        for lb in range(0, n, cell_block):
            ub = min(lb + cell_block, n)
            c = ub - lb
            blk = csc_to_coo_block(data.read_columns_csc(np.arange(lb, ub)))
            if group > 1 and c == cell_block:
                gb.append((
                    lb,
                    np.asarray(blk.vals, np.float32),
                    blk.row_ids.astype(np.int32),
                    np.asarray(blk.col_ids, np.int32),
                    pb_sample[lb:ub].astype(np.int32),
                    cell_indv[lb:ub].astype(np.int32),
                ))
                if len(gb) >= group:
                    accs = _flush_b(accs)
                prog_b.update()
                continue
            if gb:
                accs = _flush_b(accs)
            accs = apply_fn(
                *accs,
                w_mat[:, lb:ub].reshape(tc, c * n_samples, k),
                a_acc[:, lb:ub],
                jnp.asarray(blk.vals, jnp.float32),
                jnp.asarray(blk.row_ids.astype(np.int32)),
                jnp.asarray(blk.col_ids.astype(np.int32)),
                jnp.asarray(pb_sample[lb:ub].astype(np.int32)),
                jnp.asarray(cell_indv[lb:ub].astype(np.int32)),
            )
            prog_b.update()
        if gb:
            accs = _flush_b(accs)
        y0_acc, y1_acc, y1i_acc = accs
        jax.block_until_ready(y0_acc)
        _malloc_trim()
        prog_b.finish()

        # ---- sizes from the z-active plane -------------------------
        pb_j = jnp.asarray(pb_sample.astype(np.int32))
        iv_j = jnp.asarray(cell_indv.astype(np.int32))
        szkp = jax.vmap(
            lambda a: jax.ops.segment_sum(a, pb_j, num_segments=n_samples)
        )(a_acc)  # [tc, P, K]
        szkip = jax.vmap(
            lambda a: jax.ops.segment_sum(
                a, iv_j * n_samples + pb_j, num_segments=n_indv * n_samples
            ).reshape(n_indv, n_samples, k)
        )(a_acc)

        y0_np = np.asarray(y0_acc)
        y1_np = np.asarray(y1_acc)
        y1i_np = np.asarray(y1i_acc)
        szkp_np = np.asarray(szkp)
        szkip_np = np.asarray(szkip)
        for t in range(tc_real):
            stat = CocoaStat.zeros(k, d, n_indv, n_samples)
            stat.y1_sum_kdp = y1_np[t].transpose(2, 0, 1)
            stat.y0_sum_kdp = y0_np[t].transpose(2, 0, 1)
            stat.y1_sum_kdi = y1i_np[t].transpose(2, 0, 1)
            stat.size_kp = szkp_np[t].T.copy()
            stat.size_kip = szkip_np[t].transpose(2, 0, 1).copy()
            if gene_weights is not None:
                stat.apply_gene_weights(gene_weights)
            stats_out.append(stat)
    return stats_out
