"""gem posterior per-sweep anchor (VERDICT r4 #6): re-measure
gem_gibbs vs pb_gibbs at the reference bench shape (34,179 genes x
1,460 pseudobulks, H=16;
graph-embedding-util/tests/posterior_gem_sweep_bench.rs:9-18) after
the eta-plane rank-1 carry landed on gem's gene-side term passes.
Prints one JSON line with both walls and the structural ratio
(reference's own ratio is ~3x — gem runs 3 likelihood-term passes
where bge runs 1)."""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(n_sweeps: int = 15) -> None:
    import jax

    from legume_tpu.embedding.posterior import gem_gibbs, pb_gibbs
    from legume_tpu.utils.jax_cache import ensure_compile_cache

    ensure_compile_cache()
    d, p, h = 34_179, 1_460, 16
    rng = np.random.default_rng(0)
    # model-drawn counts at the reference's sparsity regime
    beta = (0.3 * rng.standard_normal((d, h))).astype(np.float32)
    delta = (0.1 * rng.standard_normal((d, h))).astype(np.float32)
    e_pb = (0.3 * rng.standard_normal((p, h))).astype(np.float32)
    logits_s = np.clip(e_pb @ beta.T - 4.0, -30, 3)
    logits_u = np.clip(e_pb @ (beta + delta).T - 5.0, -30, 3)
    s_pd = rng.poisson(np.exp(logits_s)).astype(np.float32)
    u_pd = rng.poisson(np.exp(logits_u)).astype(np.float32)
    b_s = np.zeros(d, np.float32)
    b_u = np.zeros(d, np.float32)
    b_pb = np.zeros(p, np.float32)

    dev = str(jax.devices()[0])

    def timed(fn):
        # cold = compile + run (the relay compile lottery dominates);
        # warm = identical second call off the jit cache — the
        # per-sweep number the reference's bench reports
        t0 = time.time()
        fn()
        cold = time.time() - t0
        t0 = time.time()
        fn()
        return cold, time.time() - t0

    gem_cold, gem_warm = timed(lambda: gem_gibbs(
        s_pd, u_pd, beta, delta, b_s, b_u, e_pb, b_pb,
        n_sweeps=n_sweeps, burnin=2, seed=0,
    ))
    pb_cold, pb_warm = timed(lambda: pb_gibbs(
        s_pd, beta, b_s, e_pb, b_pb, n_sweeps=n_sweeps, burnin=2, seed=0,
    ))

    print(json.dumps({
        "metric": "gem posterior per-sweep anchor (34179 x 1460, H=16)",
        "n_sweeps": n_sweeps,
        "gem_wall_cold_s": round(gem_cold, 1),
        "gem_wall_warm_s": round(gem_warm, 1),
        "gem_per_sweep_warm_s": round(gem_warm / n_sweeps, 2),
        "pb_wall_cold_s": round(pb_cold, 1),
        "pb_wall_warm_s": round(pb_warm, 1),
        "pb_per_sweep_warm_s": round(pb_warm / n_sweeps, 2),
        "gem_over_pb_warm": round(gem_warm / pb_warm, 2),
        "reference_structural_ratio": "~3x (posterior_gem_sweep_bench.rs)",
        "device": dev,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)
