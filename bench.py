"""Benchmark driver: prints ONE JSON line with the headline metric.

Headline (BASELINE.json): cell-epochs/s of the senna topic-model SGD
hot loop (SURVEY.md section 3.1, vae/topic.rs:107-145) on the standard
10k x 2k sim config. `vs_baseline` compares against the reference's
only published anchor: the CUDA gbe run at 93.8k cell-epochs/s
(28 s / 1000 epochs / 2,627 cells; plans/posterior-feature-gate.md:91-93).

Structure: the SGD-loop benchmark runs FIRST (one compiled program —
remote compiles through the axon tunnel have minutes-scale variance,
so the headline can never be starved by auxiliary stages). The
streaming collapse stages run after, only while the BENCH_DEADLINE
budget (default 480 s) lasts; their timings land in `detail`.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

DEADLINE = float(os.environ.get("BENCH_DEADLINE", "480"))
_START = time.time()


def _left():
    return DEADLINE - (time.time() - _START)


def _t(label, t0):
    print(f"[bench] {label}: {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    return time.time()


def _device_init_ok(timeout_s: float = 150.0) -> bool:
    """Probe accelerator init in a SUBPROCESS: a wedged TPU relay hangs
    `jax.devices()` indefinitely (docs/BENCH_NOTES.md), and an
    interrupted in-process init leaves jax unusable — so probe out of
    process and fall back to CPU in the parent if it never comes up."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax

    if not _device_init_ok():
        print(
            "[bench] accelerator init timed out (wedged relay?) -> CPU",
            file=sys.stderr, flush=True,
        )
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from legume_tpu.data.sim import simulate_topic
    from legume_tpu.data.sparse_io import MemoryBackend
    from legume_tpu.models.decoders import NbTopicDecoder
    from legume_tpu.models.encoders import LogSoftmaxEncoder
    from legume_tpu.models.train import LevelData, MixedTrainer, TrainConfig

    # BASELINE config 1: 10k cells x 2k genes sim
    t0 = time.time()
    n_cells, n_genes, k = 10_000, 2_000, 10
    sim = simulate_topic(rows=n_genes, cols=n_cells, factors=k, batches=1, seed=7)
    be = MemoryBackend(sim.counts)
    t0 = _t("sim", t0)

    # ---- headline: the SGD hot loop (vae/topic.rs:107-145) -------------
    # pseudobulk-resolution training data: group sums of the sim counts
    # (the collapse result's posterior-mean scale), P ~ 600 rows
    groups = np.random.default_rng(0).integers(0, 607, n_cells)
    pb = np.zeros((607, n_genes), np.float32)
    cols = sim.counts.tocoo()
    np.add.at(pb, (groups[cols.col], cols.row), cols.data)
    level = LevelData(input=pb, input_null=None)
    t0 = _t("pseudobulk", t0)

    enc = LogSoftmaxEncoder(n_topics=k, layers=(128, 1024, 128))
    dec = NbTopicDecoder(n_features=n_genes, n_topics=k)
    bench_epochs = 60

    # The axon remote-compile service hangs nondeterministically on the
    # large whole-run program (observed ~50% of runs; see
    # docs/BENCH_NOTES.md). Guard the compile with SIGALRM and fall
    # back to the smaller 10-epochs-per-dispatch program, which has
    # compiled reliably every run.
    import signal

    class _CompileTimeout(Exception):
        pass

    def _alarm(sig, frame):
        raise _CompileTimeout()

    signal.signal(signal.SIGALRM, _alarm)

    def build_and_warm(epc):
        cfg = TrainConfig(
            epochs=bench_epochs,
            minibatch_size=100,
            learning_rate=0.01,
            epochs_per_call=epc,
        )
        tr = MixedTrainer(enc, [dec], cfg)
        tr.train([level], jax.random.key(1))  # warm-up (compile)
        return tr

    trainer = None
    for epc, deadline in ((bench_epochs, int(_left() * 0.5) or 240), (10, 10**6)):
        try:
            signal.alarm(max(deadline, 120))
            trainer = build_and_warm(epc)
            signal.alarm(0)
            break
        except _CompileTimeout:
            print(
                f"[bench] warmup compile (epochs_per_call={epc}) timed out; falling back",
                file=sys.stderr, flush=True,
            )
    t0 = _t("train_warmup_compile", t0)
    t_train0 = time.time()
    _, _, scores = trainer.train([level], jax.random.key(2))
    t_train = time.time() - t_train0
    _t(f"train_{bench_epochs}ep", t_train0)

    cells_per_s = n_cells * bench_epochs / t_train
    ref_cell_epochs_per_s = 2627 * 1000 / 28.0
    detail = {
        "train_s_60ep": round(t_train, 2),
        "pb_rows": level.n,
        "pb_rows_per_s": round(level.n * bench_epochs / t_train, 1),
        "final_llik": float(scores.llik[-1]),
        "device": str(jax.devices()[0]),
    }

    # ---- auxiliary: streaming collapse path, budget permitting ---------
    if _left() > 60:
        try:
            from legume_tpu.ops import collapse as clp
            from legume_tpu.ops import random_projection as rp

            t0 = time.time()
            basis, proj = rp.project_columns(be, 50, block_size=8192)
            t0 = _t("projection", t0)
            bits = (proj[:10] > 0).astype(np.int64)
            codes = (bits * (1 << np.arange(10))[:, None]).sum(axis=0)
            g2, s = rp.compact_group_codes(codes)
            stat = clp.collect_basic_stats(be, g2, s, block_size=8192)
            out = clp.optimize(stat, num_iter=30)
            jax.block_until_ready(out.mu_observed.a)
            detail["collapse_s"] = round(time.time() - t0, 2)
            _t("collapse_total", t0)
        except Exception as e:  # auxiliary stage must not kill the headline
            detail["collapse_error"] = str(e)[:120]
    else:
        detail["collapse_s"] = "skipped (deadline)"

    print(
        json.dumps(
            {
                "metric": "senna-topic cell-epochs/s (10k x 2k sim, SGD loop)",
                "value": round(cells_per_s, 1),
                "unit": "cell-epochs/s",
                "vs_baseline": round(cells_per_s / ref_cell_epochs_per_s, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
