"""Roofline measurement for the sparse hot ops (SURVEY hard-part 1 /
VERDICT round-1 item 8): is the XLA segment_sum path within ~2x of
HBM speed-of-light for the projection/collapse shapes?

Stages (one process, one TPU client — axon tunnel is single-client):
1. practical HBM bandwidth: saxpy over a 256 MB f32 array (the
   achievable ceiling, not the datasheet number);
2. `project_block` (JL projection: gather basis rows at nonzero gene
   ids, scale, segment-sum by cell) at the production shape;
3. `collapse_block` (pseudobulk segment reduction);
4. the same ops at a second nnz scale (shape-scaling check).

Traffic model per nonzero (f32):
  project: read row/col ids + val (12 B) + basis row gather (K*4 B);
           write [B, K] once per block (amortized).
  collapse: read ids + val (12 B) + scatter-add into [D, S] (atomic
           read-modify-write ~8 B effective).

Prints one JSON line per stage to stdout; run manually, results land
in docs/BENCH_NOTES.md.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def timed(fn, *args, n=40):
    """Two-point chained timing. Iteration i+1 CONSUMES iteration i's
    output (the first positional arg is threaded), so neither XLA async
    dispatch nor relay-level memoization can overlap or skip work; a
    tiny READBACK is the barrier (the tunnel's block_until_ready
    returns early). The per-iteration time is the slope between an
    n-run and an n/2-run, cancelling fixed RPC overhead."""
    import jax
    import numpy as np

    def chain(m):
        cur = args[0]
        out = None
        t0 = time.time()
        for _ in range(m):
            out = fn(cur, *args[1:])
            cur = _thread(out, cur)
        jax.block_until_ready(cur)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:4])  # readback barrier
        return time.time() - t0, out

    chain(3)  # warm op + threading add compiles
    t_half, _ = chain(n // 2)
    t_full, out = chain(n)
    dt = max(t_full - t_half, 1e-9) / (n - n // 2)
    return dt, out


def _thread(out, prev):
    """Derive the next iteration's first arg from this output so the
    chain has a real data dependency, preserving shape/dtype. When the
    output IS shape/dtype-compatible (saxpy), chain it directly with no
    extra traffic; otherwise fold a scalar probe into `prev` (one extra
    full pass over `prev`, accounted small vs the op's own traffic)."""
    import jax.numpy as jnp

    if out.shape == prev.shape and out.dtype == prev.dtype:
        return out
    flat = out.ravel() if out.ndim else out[None]
    probe = (flat[:1] * 1e-20).astype(prev.dtype)
    return prev + jnp.broadcast_to(probe, prev.shape)


def main():
    results = {}
    # internal deadline: a clean in-process exit wedges the axon relay
    # far less than an external kill (docs/BENCH_NOTES.md)
    import signal

    def _bail(sig, frame):
        print(json.dumps({"error": "roofline deadline hit", **results}))
        sys.exit(0)

    signal.signal(signal.SIGALRM, _bail)
    signal.alarm(int(float(__import__("os").environ.get("ROOFLINE_DEADLINE", "900"))))

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"[roofline] device: {dev}", file=sys.stderr, flush=True)

    # ---- 1. practical HBM bandwidth (saxpy) ---------------------------
    n_el = 1 << 26  # 256 MB f32
    x = jnp.ones(n_el, jnp.float32)

    @jax.jit
    def saxpy(x):
        return x * 1.000001 + 0.5

    t, _ = timed(saxpy, x)
    bw = 2 * 4 * n_el / t  # read + write
    results["hbm_saxpy_GBps"] = round(bw / 1e9, 1)
    print(f"[roofline] saxpy: {t*1e3:.2f} ms -> {bw/1e9:.1f} GB/s", file=sys.stderr, flush=True)

    from legume_tpu.ops.sparse import collapse_block, project_block

    rng = np.random.default_rng(0)
    d_genes, kdim = 34_008, 64
    basis = jnp.asarray(rng.standard_normal((d_genes, kdim)).astype(np.float32))

    for label, nnz, ncols in (("prod", 1 << 23, 8192), ("small", 1 << 21, 2048)):
        rows = jnp.asarray(rng.integers(0, d_genes, nnz).astype(np.int32))
        cols = jnp.asarray(np.sort(rng.integers(0, ncols, nnz)).astype(np.int32))
        vals = jnp.asarray(rng.random(nnz).astype(np.float32))

        t, _ = timed(
            lambda r, c, v: project_block(basis, r, c, v, ncols=ncols),
            rows, cols, vals,
        )
        bytes_proj = nnz * (12 + kdim * 4) + ncols * kdim * 4
        gbps = bytes_proj / t / 1e9
        results[f"project_{label}_ms"] = round(t * 1e3, 2)
        results[f"project_{label}_GBps"] = round(gbps, 1)
        results[f"project_{label}_frac_of_saxpy"] = round(gbps / (bw / 1e9), 3)
        print(
            f"[roofline] project[{label}]: {t*1e3:.1f} ms, {gbps:.1f} GB/s "
            f"({gbps/(bw/1e9):.2f}x saxpy)",
            file=sys.stderr, flush=True,
        )

        s_groups = 607
        seg = np.full(ncols + 1, s_groups, np.int32)
        seg[:ncols] = rng.integers(0, s_groups, ncols)
        seg_j = jnp.asarray(seg)
        t, _ = timed(
            lambda r, c, v: collapse_block(
                r, c, v, seg_j, num_genes=d_genes, num_groups=s_groups
            ),
            rows, cols, vals,
        )
        bytes_clp = nnz * (12 + 8) + d_genes * s_groups * 4
        gbps = bytes_clp / t / 1e9
        results[f"collapse_{label}_ms"] = round(t * 1e3, 2)
        results[f"collapse_{label}_GBps"] = round(gbps, 1)
        results[f"collapse_{label}_frac_of_saxpy"] = round(gbps / (bw / 1e9), 3)
        print(
            f"[roofline] collapse[{label}]: {t*1e3:.1f} ms, {gbps:.1f} GB/s "
            f"({gbps/(bw/1e9):.2f}x saxpy)",
            file=sys.stderr, flush=True,
        )

    results["device"] = str(dev)
    print(json.dumps(results))


def tiled_dtype_bench():
    """Time the tiled Pallas projection kernel with f32 vs bf16 basis
    planes at the production shape — the roofline push (the kernel's
    dominant HBM traffic is one [TILE_G, K] basis tile per chunk;
    bf16 halves it). One JSON line."""
    import jax
    import jax.numpy as jnp

    from legume_tpu.ops.pallas_kernels import (
        TILE_C, TILE_G, prepare_tiles, tiled_call,
    )
    from legume_tpu.utils.jax_cache import ensure_compile_cache

    ensure_compile_cache()
    rng = np.random.default_rng(0)
    d_genes, kdim, nnz, ncols = 34_008, 64, 1 << 23, 8192
    rows = rng.integers(0, d_genes, nnz).astype(np.int64)
    cols = np.sort(rng.integers(0, ncols, nnz)).astype(np.int64)
    vals = rng.random(nnz).astype(np.float32)
    tiles = prepare_tiles(rows, cols, vals, ncols=ncols)
    k_pad = 128
    d_pad = -(-d_genes // TILE_G) * TILE_G
    n_ct = -(-ncols // TILE_C)
    basis = rng.standard_normal((d_pad, k_pad)).astype(np.float32)
    args = tuple(
        jnp.asarray(tiles[k]) for k in ("gi", "cj", "new", "lr", "lc", "vv")
    )
    out = {"n_chunks": int(tiles["gi"].shape[0]), "nnz": nnz}
    for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        bp = jnp.asarray(basis.astype(dt))
        t, r = timed(
            lambda *a: tiled_call(*a, bp, n_ct=n_ct, k_pad=k_pad), *args, n=20
        )
        out[f"tiled_{name}_ms"] = round(t * 1e3, 2)
        basis_bytes = tiles["gi"].shape[0] * TILE_G * k_pad * (4 if name == "f32" else 2)
        out[f"tiled_{name}_basis_GBps"] = round(basis_bytes / t / 1e9, 1)
        if name == "f32":
            ref = np.asarray(r)
        else:
            rel = np.abs(np.asarray(r, np.float32) - ref) / (np.abs(ref) + 1e-3)
            out["bf16_max_rel_err"] = float(rel.max())
    out["speedup_bf16"] = round(out["tiled_f32_ms"] / out["tiled_bf16_ms"], 2)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


def collapse_tiled_bench():
    """VERDICT r3 item 8: bound-or-beat the collapse kernel. A/B the
    XLA segment path vs the group-tiled kernel at the roofline shape
    (d=34008, n=8192, g=607, nnz=8.4M, RANDOM groups = worst-case tile
    locality), separating host bucketing from device time. Set
    LEGUME_COLLAPSE_CHUNK before invoking to sweep the chunk size (the
    kernel is grid-step bound, so chunk size is the lever). One JSON
    line."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from legume_tpu.ops.pallas_kernels import (
        COLLAPSE_CHUNK, TILE_G, TILE_GRP, bucket_coo_for_collapse,
        collapse_tiled_call,
    )
    from legume_tpu.ops.sparse import collapse_block
    from legume_tpu.utils.jax_cache import ensure_compile_cache

    ensure_compile_cache()
    rng = np.random.default_rng(0)
    d_genes, ncols, n_groups, nnz = 34_008, 8192, 607, 1 << 23
    rows = rng.integers(0, d_genes, nnz).astype(np.int64)
    cols = np.sort(rng.integers(0, ncols, nnz)).astype(np.int64)
    vals = rng.random(nnz).astype(np.float32)
    seg_of_col = np.append(
        rng.integers(0, n_groups, ncols), n_groups
    ).astype(np.int64)

    out = {"nnz": nnz, "n_groups": n_groups, "collapse_chunk": COLLAPSE_CHUNK}

    # XLA segment path
    t, ref = timed(
        lambda r, c, v: collapse_block(
            r, c, v, jnp.asarray(seg_of_col),
            num_genes=d_genes, num_groups=n_groups,
        ),
        jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals), n=10,
    )
    out["xla_ms"] = round(t * 1e3, 2)
    ref = np.asarray(ref)

    # host bucketing (one-time per block; ingest-cacheable)
    t0 = _time.time()
    seg = seg_of_col[cols]
    real = seg < n_groups
    tiles = bucket_coo_for_collapse(rows[real], seg[real], vals[real])
    out["bucket_host_s"] = round(_time.time() - t0, 2)
    n_chunks = int(tiles["gi"].shape[0])
    out["n_chunks"] = n_chunks
    out["pad_frac"] = round(
        1.0 - nnz / (n_chunks * COLLAPSE_CHUNK), 3
    )
    n_gt = -(-d_genes // TILE_G)
    n_grpt = -(-n_groups // TILE_GRP)
    args = tuple(
        jnp.asarray(tiles[k]) for k in ("gi", "gj", "new", "lr", "lg", "vv")
    )
    t, got = timed(
        lambda *a: collapse_tiled_call(*a, n_gt=n_gt, n_grpt=n_grpt), *args, n=10
    )
    out["tiled_ms"] = round(t * 1e3, 2)
    out["speedup_vs_xla"] = round(out["xla_ms"] / out["tiled_ms"], 2)
    got = np.asarray(got)[:d_genes, :n_groups]
    rel = np.abs(got - ref) / (np.abs(ref) + 1e-3)
    out["max_rel_err"] = float(rel.max())
    # MXU cost model: 2 * C * (TILE_G + TILE_GRP) * ... one dot per chunk
    mxu_flop = 2 * n_chunks * COLLAPSE_CHUNK * TILE_G * TILE_GRP
    out["onehot_GFLOP"] = round(mxu_flop / 1e9, 1)
    out["achieved_TFLOPs"] = round(mxu_flop / (out["tiled_ms"] / 1e3) / 1e12, 2)
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


if __name__ == "__main__" and "--collapse-tiled" in sys.argv:
    collapse_tiled_bench()
    sys.exit(0)

if __name__ == "__main__" and "--tiled" in sys.argv:
    tiled_dtype_bench()
    sys.exit(0)

if __name__ == "__main__":
    main()
