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
        res = leiden_clustering(adj, resolution=args.resolution, seed=args.seed)
        labels = res.membership
        log.info("leiden: %d communities, quality %.4f", res.n_communities, res.quality)
    elif args.method == "hsblock":
        from ..ops.hsblock import hsblock_clustering

        adj = knn_adjacency(z, k=args.knn)
        res = hsblock_clustering(
            adj, max_depth=args.hsblock_depth, seed=args.seed
        )
        labels = res.membership
        log.info(
            "hsblock: %d leaves occupied (tree K=%d)",
            len(np.unique(labels)), 1 << (args.hsblock_depth - 1),
        )
    else:
        raise ValueError(f"unknown clustering method {args.method}")

    pd.DataFrame({"cell": names, "cluster": labels}).to_parquet(
        f"{args.out}.clusters.parquet"
    )
    RunManifest(
        command="clustering",
        inputs={"latent": args.latent},
        outputs={"clusters": f"{args.out}.clusters.parquet"},
        params={"method": args.method},
    ).save(args.out)
    return labels
