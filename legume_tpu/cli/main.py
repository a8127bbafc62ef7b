"""Unified CLI: `python -m legume_tpu <binary> <subcommand> ...`.

Mirrors the reference's 8 installed binaries (`Makefile:1`):
senna, pinto, cocoa, faba, chickpea, data-beans, data-beans-sim,
fagioli — each a subcommand tree (`senna/src/main.rs:140-186` etc.).
"""

from __future__ import annotations

import argparse
import logging
import sys


def _add_topic_parser(sub):
    p = sub.add_parser("topic", help="multilevel pseudobulk VAE topic model")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--batch-files", nargs="+", default=None)
    p.add_argument("--n-latent-topics", "-k", type=int, default=10)
    p.add_argument("--encoder-layers", type=int, nargs="+", default=[128, 1024, 128])
    p.add_argument("--epochs", "-i", type=int, default=1000)
    p.add_argument("--minibatch-size", type=int, default=100)
    p.add_argument("--learning-rate", "--lr", type=float, default=0.01)
    p.add_argument("--grad-clip", type=float, default=1.0)
    p.add_argument(
        "--decoder", choices=["multinomial", "nb", "poisson", "nb-mixture"], default="nb"
    )
    p.add_argument("--topic-smoothing", type=float, default=1e-4)
    p.add_argument("--proj-dim", type=int, default=50)
    p.add_argument("--sort-dim", type=int, default=10)
    p.add_argument("--knn-cells", type=int, default=10)
    p.add_argument("--num-levels", type=int, default=3)
    p.add_argument("--iter-opt", type=int, default=30)
    p.add_argument("--ignore-batch", action="store_true")
    p.add_argument("--block-size", type=int, default=8192)
    p.add_argument("--seed", type=int, default=None)
    return p


def run_senna(argv):
    ap = argparse.ArgumentParser(prog="senna", description="embedding suite")
    sub = ap.add_subparsers(dest="cmd", required=True)
    _add_topic_parser(sub)
    args = ap.parse_args(argv)

    if args.cmd == "topic":
        from ..senna.topic import TopicArgs, fit_topic_model
        from ..utils.prng import DEFAULT_PROJECTION_SEED

        fit_topic_model(
            TopicArgs(
                data_files=args.data_files,
                out=args.out,
                batch_files=args.batch_files,
                n_latent_topics=args.n_latent_topics,
                encoder_layers=tuple(args.encoder_layers),
                epochs=args.epochs,
                minibatch_size=args.minibatch_size,
                learning_rate=args.learning_rate,
                grad_clip=args.grad_clip,
                decoder=args.decoder,
                topic_smoothing=args.topic_smoothing,
                proj_dim=args.proj_dim,
                sort_dim=args.sort_dim,
                knn_cells=args.knn_cells,
                num_levels=args.num_levels,
                iter_opt=args.iter_opt,
                ignore_batch=args.ignore_batch,
                block_size=args.block_size,
                seed=args.seed if args.seed is not None else DEFAULT_PROJECTION_SEED,
            )
        )


def run_sim(argv):
    ap = argparse.ArgumentParser(prog="data-beans-sim", description="synthetic generators")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("topic", help="factored count matrix with topic + batch structure")
    p.add_argument("--rows", type=int, default=2000)
    p.add_argument("--cols", type=int, default=1000)
    p.add_argument("--factors", type=int, default=8)
    p.add_argument("--batches", type=int, default=1)
    p.add_argument("--pve-topic", type=float, default=0.7)
    p.add_argument("--pve-batch", type=float, default=0.3)
    p.add_argument("--beta-scale", type=float, default=1.0)
    p.add_argument("--depth", type=float, default=1000.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--output", required=True)
    args = ap.parse_args(argv)

    if args.cmd == "topic":
        from ..data.sim import simulate_topic, write_topic_sim

        sim = simulate_topic(
            rows=args.rows,
            cols=args.cols,
            factors=args.factors,
            batches=args.batches,
            pve_topic=args.pve_topic,
            pve_batch=args.pve_batch,
            beta_scale=args.beta_scale,
            depth=args.depth,
            seed=args.seed,
        )
        path = write_topic_sim(sim, args.output)
        print(f"wrote backend: {path}")


def run_beans(argv):
    ap = argparse.ArgumentParser(prog="data-beans", description="sparse matrix backends")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("from-mtx", help="build a backend from MatrixMarket")
    p.add_argument("--mtx", required=True)
    p.add_argument("--rows", default=None, help="row (gene) names file")
    p.add_argument("--cols", default=None, help="column (cell) names file")
    p.add_argument("--output", required=True)
    p = sub.add_parser("info", help="backend shape and nnz")
    p.add_argument("backend")
    args = ap.parse_args(argv)

    from ..data import open_sparse_matrix

    if args.cmd == "from-mtx":
        import scipy.io as sio

        from ..data.sparse_io import create_sparse_from_csc

        m = sio.mmread(args.mtx).tocsc()
        row_names = col_names = None
        if args.rows:
            row_names = [line.split()[0] for line in open(args.rows)]
        if args.cols:
            col_names = [line.split()[0] for line in open(args.cols)]
        create_sparse_from_csc(m, args.output, row_names, col_names)
        print(f"wrote backend: {args.output}")
    elif args.cmd == "info":
        be = open_sparse_matrix(args.backend)
        print(f"rows: {be.num_rows}\ncols: {be.num_columns}\nnnz: {be.num_nonzeros}")


BINARIES = {
    "senna": run_senna,
    "data-beans-sim": run_sim,
    "data-beans": run_beans,
}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    logging.basicConfig(level=logging.INFO, format="[%(levelname)s %(name)s] %(message)s")
    if not argv or argv[0] not in BINARIES:
        print(f"usage: legume <binary> ...; binaries: {', '.join(sorted(BINARIES))}")
        return 1
    BINARIES[argv[0]](argv[1:])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
