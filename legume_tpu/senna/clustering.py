"""`senna clustering` equivalent (`senna/src/clustering.rs:209`):
kmeans / leiden / hsblock on a latent parquet.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np

from ..ops.kmeans import kmeans
from ..ops.leiden import knn_adjacency, leiden_clustering
from ..utils.manifest import RunManifest

log = logging.getLogger(__name__)


@dataclass
class ClusteringArgs:
    latent: str = ""  # {prefix}.latent.parquet
    out: str = "clusters"
    method: str = "leiden"  # kmeans | leiden | hsblock
    hsblock_depth: int = 4  # hsblock: K = 2^(depth-1) tree leaves
    n_clusters: int = 10  # kmeans K
    knn: int = 15
    resolution: float = 1.0
    max_iter: int = 10  # leiden hierarchy sweeps (clustering.rs max_iter)
    # hsblock knobs (clustering.rs:122-132)
    degree_corrected: bool = True
    edge_scale: float = 1.0
    # clusters smaller than this unassign to -1 (clustering.rs:270)
    min_cluster_size: int = 1
    # BHC postprocess over the hard labels (cluster_bhc.rs): aggregate
    # counts per cluster and write the DM Bayes-factor merge tree +
    # consensus cut
    data_files: "list[str] | None" = None
    bhc_gamma_per_gene: float = 1.0
    bhc_cut: float = 0.0
    bhc_block_size: int = 4096
    seed: int = 0
    exp_latent: bool = True  # latent is log-proportions; exp first


def run_clustering(args: ClusteringArgs) -> np.ndarray:
    import pandas as pd

    df = pd.read_parquet(args.latent)
    names = df.iloc[:, 0].to_numpy()
    z = df.iloc[:, 1:].to_numpy(np.float32)
    if args.exp_latent and np.all(z <= 0):
        z = np.exp(z)  # log-softmax latent -> proportions

    if args.method == "kmeans":
        _, labels = kmeans(z, args.n_clusters, seed=args.seed)
    elif args.method == "leiden":
        adj = knn_adjacency(z, k=args.knn)
        res = leiden_clustering(
            adj, resolution=args.resolution, max_iter=args.max_iter, seed=args.seed
        )
        labels = res.membership
        log.info("leiden: %d communities, quality %.4f", res.n_communities, res.quality)
    elif args.method == "hsblock":
        from ..ops.hsblock import hsblock_clustering

        adj = knn_adjacency(z, k=args.knn)
        res = hsblock_clustering(
            adj, max_depth=args.hsblock_depth,
            degree_corrected=args.degree_corrected,
            edge_scale=args.edge_scale, seed=args.seed,
        )
        labels = res.membership
        log.info(
            "hsblock: %d leaves occupied (tree K=%d)",
            len(np.unique(labels)), 1 << (args.hsblock_depth - 1),
        )
    else:
        raise ValueError(f"unknown clustering method {args.method}")

    labels = np.asarray(labels, np.int64)
    if args.min_cluster_size > 1:
        # small clusters unassign to -1 (clustering.rs remove_small_clusters)
        sizes = np.bincount(labels[labels >= 0], minlength=int(labels.max()) + 1)
        small = sizes < args.min_cluster_size
        labels = np.where((labels >= 0) & small[np.maximum(labels, 0)], -1, labels)
        keepers = np.nonzero(~small)[0]
        remap = np.full(len(sizes), -1, np.int64)
        remap[keepers] = np.arange(len(keepers))
        labels = np.where(labels >= 0, remap[np.maximum(labels, 0)], -1)
        log.info(
            "min-cluster-size %d: %d cells unassigned, %d clusters kept",
            args.min_cluster_size, int((labels < 0).sum()), len(keepers),
        )

    pd.DataFrame({"cell": names, "cluster": labels}).to_parquet(
        f"{args.out}.clusters.parquet"
    )

    if args.data_files:
        _run_cluster_bhc(args, labels)

    RunManifest(
        command="clustering",
        inputs={"latent": args.latent},
        outputs={"clusters": f"{args.out}.clusters.parquet"},
        params={"method": args.method},
    ).save(args.out)
    return labels


def _run_cluster_bhc(args: ClusteringArgs, labels: np.ndarray) -> None:
    """BHC postprocess over hard labels (cluster_bhc.rs run_cluster_bhc):
    per-cluster gene sums T_kg stream through the device collapse, then
    the Dirichlet-Multinomial Bayes-factor merge tree + consensus cut
    write {out}.bhc.merges.parquet / {out}.bhc.cut.parquet."""
    import jax.numpy as jnp
    import pandas as pd

    from ..data.visitors import visit_columns_by_block
    from ..ops import sparse as sparse_ops
    from ..ops.bhc import bhc_cluster
    from .topic import load_data_vec

    vec = load_data_vec(list(args.data_files))
    n = vec.num_columns
    if n != len(labels):
        raise ValueError(f"BHC: data has {n} cells but latent has {len(labels)}")
    k = int(labels.max()) + 1
    if k < 2:
        log.info("BHC: only %d cluster(s); skipping", k)
        return
    d = vec.num_rows
    seg = np.where(labels >= 0, labels, k).astype(np.int32)
    sums = np.zeros((d, k), np.float64)
    for blk in visit_columns_by_block(vec, block_size=args.bhc_block_size):
        seg_blk = np.concatenate([seg[blk.lb : blk.lb + blk.ncols], [k]])
        plane = sparse_ops.collapse_block(
            jnp.asarray(blk.row_ids),
            sparse_ops.block_col_ids(blk),
            jnp.asarray(blk.vals),
            seg_of_col=jnp.asarray(seg_blk),
            num_genes=d,
            num_groups=k,
        )
        sums += np.asarray(plane, np.float64)

    res = bhc_cluster(
        sums.T.astype(np.float64),  # [K, D] profiles
        alpha=args.bhc_gamma_per_gene,
        cutoff=args.bhc_cut,
    )
    pd.DataFrame(
        [
            {"merge_id": i, "left": l, "right": r, "log_bf": s}
            for i, (l, r, s) in enumerate(res.merges)
        ],
        columns=["merge_id", "left", "right", "log_bf"],
    ).to_parquet(f"{args.out}.bhc.merges.parquet")
    pd.DataFrame(
        {"cluster": np.arange(k), "consensus": res.labels}
    ).to_parquet(f"{args.out}.bhc.cut.parquet")
    log.info("BHC cut (log_bf >= %.3f): %d -> %d consensus clusters",
             args.bhc_cut, k, res.n_clusters)
