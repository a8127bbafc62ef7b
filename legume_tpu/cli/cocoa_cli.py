"""`cocoa` binary: counterfactual DE CLI (extracted from cli/main.py; one module per installed binary)."""

from __future__ import annotations

import argparse
import numpy as np


def run_cocoa(argv):
    ap = argparse.ArgumentParser(prog="cocoa", description="counterfactual confounder-adjusted DE")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("diff", help="counterfactual differential expression")
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--indv", required=True, help="cell -> individual labels, one per line")
    p.add_argument("--exposure", required=True, help="individual TAB exposure table")
    p.add_argument("--topic", default=None, help="cell topic proportions parquet")
    p.add_argument("--topic-assignment", default=None,
                   help="hard per-cell topic labels, one per line "
                        "(one-hot alternative to --topic)")
    p.add_argument("--topic-proportion-value", choices=["prob", "logit"],
                   default="prob", help="scale of the --topic matrix")
    p.add_argument("--covariate-file", default=None,
                   help="individual-level covariates V [I, C] tsv; enters "
                        "the residual collider adjustment")
    p.add_argument("--n-pb-samples", type=int, default=10)
    p.add_argument("--knn", type=int, default=10)
    p.add_argument("--proj-dim", type=int, default=30)
    p.add_argument("--iter-opt", type=int, default=100)
    p.add_argument("--a0", type=float, default=1.0)
    p.add_argument("--b0", type=float, default=1.0)
    p.add_argument("--permutations", type=int, default=0)
    p.add_argument("--permutation-seed", type=int, default=None)
    p.add_argument("--no-collider-fix", action="store_true")
    p.add_argument("--no-adjust-housekeeping", action="store_true",
                   help="disable the NB-Fisher housekeeping attenuation "
                        "of the sufficient stats")
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--gff", default=None,
                   help="GFF gene coordinates: run the per-(indv,topic) CNV HMM")
    p.add_argument("--cnv-ground-truth", default=None,
                   help="simulation alternative to --gff: TSV gene_idx/chr/pos")
    p.add_argument("--cnv-states", type=int, default=3)
    p.add_argument("--cnv-gmm-k-max", type=int, default=0,
                   help=">0: kmeans-BIC selects the HMM state count in "
                        "3..k_max (cnv kmeans_init.rs)")
    p.add_argument("--cnv-ref-iters", type=int, default=2)
    p.add_argument("--data-parallel", action="store_true",
                   help="dp over the device mesh: query-sharded match "
                        "cache + exposure-sharded permutation replay")
    p.add_argument("--no-match-cache", action="store_true",
                   help="do not persist/reuse the match cache next to "
                        "the backend")

    p = sub.add_parser(
        "collapse", help="per-individual pseudobulk Gamma means (cocoa collapse)"
    )
    p.add_argument("--data-files", nargs="+", required=True)
    p.add_argument("--indv", required=True, help="cell -> individual labels, one per line")
    p.add_argument("--out", required=True)
    p.add_argument("--iter-opt", type=int, default=30)
    p.add_argument("--a0", type=float, default=1.0)
    p.add_argument("--b0", type=float, default=1.0)
    p.add_argument("--no-adjust-housekeeping", action="store_true",
                   help="disable the NB-Fisher housekeeping attenuation")
    p.add_argument("--block-size", type=int, default=8192)

    p = sub.add_parser(
        "simulate-one", help="single-cell-type confounded DE generator"
    )
    p.add_argument("--output", required=True)
    p.add_argument("--genes", type=int, default=200)
    p.add_argument("--indv", type=int, default=20)
    p.add_argument("--cells-per-indv", type=int, default=50)
    p.add_argument("--n-causal", type=int, default=20)
    p.add_argument("--pve-exposure-gene", type=float, default=0.3)
    p.add_argument("--depth", type=float, default=2000.0)
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser(
        "simulate-collider", help="multi-cell-type collider DAG generator"
    )
    p.add_argument("--output", required=True)
    p.add_argument("--genes", type=int, default=200)
    p.add_argument("--types", type=int, default=3)
    p.add_argument("--indv", type=int, default=20)
    p.add_argument("--cells-per-indv", type=int, default=50)
    p.add_argument("--n-causal", type=int, default=20)
    p.add_argument("--depth", type=float, default=2000.0)
    p.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.cmd == "collapse":
        import pandas as pd

        from ..ops import collapse as clp
        from ..senna.topic import load_data_vec
        from ..utils.manifest import RunManifest

        vec = load_data_vec(args.data_files)
        with open(args.indv) as f:
            labels = np.asarray([line.strip() for line in f if line.strip()])
        names, groups = np.unique(labels, return_inverse=True)
        stat = clp.collect_basic_stats(
            vec, groups.astype(np.int32), len(names), block_size=args.block_size
        )
        if not args.no_adjust_housekeeping:
            # NB-Fisher housekeeping attenuation (run_collapse.rs:140,
            # collapse_cocoa_data.rs:16): row-scale the accumulated stats
            from ..ops.gene_stats import nb_fisher_weights

            w = nb_fisher_weights(vec, block_size=args.block_size)
            # out-of-place: the plane may be a read-only device view
            stat.observed_sum_ds = stat.observed_sum_ds * w[:, None]
        out = clp.optimize(stat, num_iter=args.iter_opt, a0=args.a0, b0=args.b0)
        mu = np.asarray(out.mu_observed.mean())  # [D, I]
        pd.DataFrame(
            mu, index=vec.row_names(), columns=[str(n) for n in names]
        ).reset_index(names="gene").to_parquet(f"{args.out}.pseudobulk.parquet")
        RunManifest(
            command="collapse",
            inputs={"data_files": list(args.data_files), "indv": args.indv},
            outputs={"pseudobulk": f"{args.out}.pseudobulk.parquet"},
        ).save(args.out, "cocoa.json")
        print(f"wrote {args.out}.pseudobulk.parquet ({len(names)} individuals)")
        return
    if args.cmd in ("simulate-one", "simulate-collider"):
        import pandas as pd

        from ..cocoa.sim import simulate_collider, simulate_one
        from ..data.sparse_io import create_sparse_from_csc

        if args.cmd == "simulate-one":
            sim = simulate_one(
                n_genes=args.genes, n_indv=args.indv,
                cells_per_indv=args.cells_per_indv, n_causal=args.n_causal,
                pve_exposure_gene=args.pve_exposure_gene,
                depth=args.depth, seed=args.seed,
            )
        else:
            sim = simulate_collider(
                n_genes=args.genes, n_types=args.types, n_indv=args.indv,
                cells_per_indv=args.cells_per_indv, n_causal=args.n_causal,
                depth=args.depth, seed=args.seed,
            )
        n = sim.counts.shape[1]
        create_sparse_from_csc(
            sim.counts, f"{args.output}.zarr",
            [f"g{i}" for i in range(args.genes)],
            [f"cell{j}" for j in range(n)],
        )
        with open(f"{args.output}.indv.txt", "w") as f:
            f.write("\n".join(f"i{v:04d}" for v in sim.cell_indv) + "\n")
        with open(f"{args.output}.exposure.tsv", "w") as f:
            for i, x in enumerate(sim.exposure):
                f.write(f"i{i:04d}\t{int(x)}\n")
        truth = {
            "gene": [f"g{i}" for i in range(args.genes)],
            "causal": sim.causal_genes,
            "beta": sim.beta,
        }
        pd.DataFrame(truth).to_parquet(f"{args.output}.truth.parquet")
        extra = ""
        if args.cmd == "simulate-collider":
            pd.DataFrame(
                {"cell": [f"cell{j}" for j in range(n)], "type": sim.cell_type}
            ).to_parquet(f"{args.output}.celltype.parquet")
            extra = " + .celltype.parquet"
        print(
            f"wrote {args.output}.zarr + .indv.txt + .exposure.tsv + "
            f".truth.parquet{extra}"
        )
        return

    from ..cocoa.diff import CocoaDiffArgs, run_cocoa_diff

    run_cocoa_diff(
        CocoaDiffArgs(
            data_files=args.data_files,
            out=args.out,
            indv_file=args.indv,
            exposure_file=args.exposure,
            topic_file=args.topic,
            topic_assignment_file=args.topic_assignment,
            topic_proportion_value=args.topic_proportion_value,
            covariate_file=args.covariate_file,
            n_pb_samples=args.n_pb_samples,
            knn=args.knn,
            proj_dim=args.proj_dim,
            n_opt_iter=args.iter_opt,
            a0=args.a0,
            b0=args.b0,
            n_permutations=args.permutations,
            permutation_seed=args.permutation_seed,
            collider_fix=not args.no_collider_fix,
            adjust_housekeeping=not args.no_adjust_housekeeping,
            gff=args.gff,
            cnv_ground_truth=args.cnv_ground_truth,
            cnv_states=args.cnv_states,
            cnv_gmm_k_max=args.cnv_gmm_k_max,
            cnv_ref_iters=args.cnv_ref_iters,
            data_parallel=args.data_parallel,
            match_cache=not args.no_match_cache,
            **(
                {"seed": args.seed} if args.seed is not None else {}
            ),
        )
    )
