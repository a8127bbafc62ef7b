"""`pinto lc` — spatial-transcriptomics link-community segmentation
(`pinto/src/link_community/` equivalent; call stack SURVEY.md 3.4).

Pipeline:
1. spatial kNN graph over coordinates (exact device top-k);
2. edge expression profiles x_e = y_i + y_j (sparse gene sums of the
   two endpoints), optionally NB-Fisher gene-weighted;
3. link-community inference over edges: flat-K Poisson-Gamma mixture
   (the reference's collapsed Gibbs, `link_community/gibbs.rs:1-13`,
   reformulated as blocked device sweeps — every edge's conditional
   is computed in ONE [E, K] score matmul per sweep, then labels are
   sampled/argmaxed in parallel; the Gamma incidence is refreshed
   from segment sums. This is the blocked/chromatic strategy the
   survey prescribes for sequential-by-nature samplers,
   SURVEY.md section 7 hard-part 3);
4. component-EM with frozen incidence -> per-cell soft propensity +
   entropy (`gibbs.rs:25-41`);
5. parquet outputs + manifest.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..ops.gamma import digamma
from ..utils.manifest import RunManifest
from ..utils.prng import DEFAULT_PROJECTION_SEED

log = logging.getLogger(__name__)


def spatial_knn_edges(
    coords: np.ndarray, k: int = 10, *, reciprocal: bool = False, chunk: int = 4096
) -> np.ndarray:
    """Undirected edge list [E, 2] from a spatial kNN graph
    (`srt_pipeline.rs` preprocess; kNN on device). `reciprocal` keeps
    only MUTUAL neighbor pairs (SrtCellPairsArgs reciprocal), which
    prunes asymmetric long-range edges in uneven-density tissue."""
    from ..ops.knn import knn_within

    _, idx = knn_within(coords.astype(np.float32), k, chunk=chunk)
    n = coords.shape[0]
    src = np.repeat(np.arange(n), idx.shape[1])
    dst = idx.ravel()
    if reciprocal:
        directed = set(zip(src.tolist(), dst.tolist()))
        keep = np.asarray([(int(b), int(a)) in directed for a, b in zip(src, dst)])
        src, dst = src[keep], dst[keep]
    a, b = np.minimum(src, dst), np.maximum(src, dst)
    edges = np.unique(np.stack([a, b], 1), axis=0)
    return edges[edges[:, 0] != edges[:, 1]]


def edge_profiles(
    data, edges: np.ndarray, *, gene_weights: np.ndarray | None = None,
    batch_scale: "tuple[np.ndarray, np.ndarray] | None" = None,
    block: int = 50_000,
) -> sp.csr_matrix:
    """Sparse [E, D] edge profiles x_e = y_src + y_dst, streamed in
    column blocks so the full [D, N] matrix never materializes
    (Xenium-scale inputs; VERDICT round-1 weak item 3).
    `batch_scale = (delta_gb [D, B], membership [N])` divides each
    cell's counts by its section/batch gene flavor before profiling
    (SrtInputArgs batch_files + EstimateBatchArgs role)."""
    d = data.num_rows
    n = data.num_columns
    src, dst = edges[:, 0], edges[:, 1]
    parts_r, parts_c, parts_v = [], [], []
    for lb in range(0, n, block):
        ub = min(lb + block, n)
        csc = data.read_columns_csc(np.arange(lb, ub)).tocsc()
        if batch_scale is not None:
            delta_gb, memb = batch_scale
            csc = csc.tocsc(copy=True)
            inv = 1.0 / np.maximum(delta_gb, 1e-6)
            for jloc in range(ub - lb):
                s_, e_ = csc.indptr[jloc], csc.indptr[jloc + 1]
                csc.data[s_:e_] *= inv[csc.indices[s_:e_], memb[lb + jloc]]
        if gene_weights is not None:
            csc = sp.diags(gene_weights) @ csc
        y = csc.T.tocsr()  # [B, D]
        for ends in (src, dst):
            m = (ends >= lb) & (ends < ub)
            if m.any():
                eids = np.nonzero(m)[0]
                sel = y[ends[m] - lb].tocoo()
                parts_r.append(eids[sel.row])
                parts_c.append(sel.col)
                parts_v.append(sel.data)
    if not parts_r:
        return sp.csr_matrix((len(edges), d), dtype=np.float32)
    out = sp.coo_matrix(
        (
            np.concatenate(parts_v),
            (np.concatenate(parts_r), np.concatenate(parts_c)),
        ),
        shape=(len(edges), d),
    ).tocsr()
    out.sum_duplicates()
    return out


@partial(jax.jit, static_argnames=("k", "n_edges", "n_genes", "sample"))
def _sweep(
    key,
    row_e: jax.Array,  # [nnz] edge id per nonzero
    col_g: jax.Array,  # [nnz] gene id
    vals: jax.Array,  # [nnz]
    edge_tot: jax.Array,  # [E] per-edge profile totals
    labels: jax.Array,  # [E] current labels
    inc_scores: jax.Array,  # [E, K] frozen-incidence additive term (zeros = off)
    mask_e: jax.Array,  # [E] 1 = real edge, 0 = mesh-divisibility padding
    *,
    k: int,
    n_edges: int,
    n_genes: int,
    alpha: float,
    a0: float,
    b0: float,
    sample: bool,
):
    """One blocked sweep: refresh Gamma rates from current labels, score
    every edge against every community, resample/argmax labels."""
    # sufficient stats: per-(community, gene) counts + per-community sizes
    lab_of_nz = labels[row_e]
    flat = lab_of_nz.astype(jnp.int32) * n_genes + col_g
    cnt_kg = jax.ops.segment_sum(vals, flat, num_segments=k * n_genes).reshape(k, n_genes)
    size_k = jax.ops.segment_sum(edge_tot, labels, num_segments=k)
    n_k = jax.ops.segment_sum(mask_e, labels, num_segments=k)

    # E[log beta_kg] under Gamma(a0 + cnt, b0 + size) with per-community
    # normalization (Poisson-Gamma incidence, model.rs)
    log_rate = digamma(a0 + cnt_kg) - jnp.log(b0 + size_k[:, None])
    log_pi = jnp.log(alpha + n_k) - jnp.log(alpha * k + n_k.sum())

    # scores: [E, K] = sparse profiles . log_rate^T via gather+segment
    contrib = log_rate.T[col_g] * vals[:, None]  # [nnz, K]
    scores = jax.ops.segment_sum(contrib, row_e, num_segments=n_edges)
    # Poisson normalizer: -sum_g rate_kg * (edge total share) ~ edge_tot * log-partition;
    # for the multinomial-profile form the per-edge normalizer is constant in k
    # given normalized rates, so normalize log_rate per community:
    logz_k = jax.scipy.special.logsumexp(log_rate, axis=1)
    scores = scores - edge_tot[:, None] * logz_k[None, :] + log_pi[None, :]
    scores = scores + inc_scores

    if sample:
        g = jax.random.gumbel(key, scores.shape)
        new_labels = jnp.argmax(scores + g, axis=1)
    else:
        new_labels = jnp.argmax(scores, axis=1)
    return new_labels.astype(jnp.int32), scores


def compute_node_membership(
    edges: np.ndarray, labels: np.ndarray, n_cells: int, k: int
) -> np.ndarray:
    """[N, K] soft propensity: fraction of incident edges per community
    (propensity.rs compute_node_membership)."""
    prop = np.zeros((n_cells, k), np.float64)
    np.add.at(prop, edges[:, 0], np.eye(k)[labels])
    np.add.at(prop, edges[:, 1], np.eye(k)[labels])
    return prop / np.maximum(prop.sum(1, keepdims=True), 1.0)


def fit_log_incidence(
    edges: np.ndarray,
    labels: np.ndarray,
    propensity: np.ndarray,  # [N, K]
    k: int,
    *,
    a: float = 1.0,
    b: float = 1.0,
) -> np.ndarray:
    """Frozen variational E_q[log B[k, k']] under a Gamma(a, b) prior
    (incidence.rs fit_log_incidence):

        S[k, k'] = sum_{e: z_e = k} (theta_L + theta_R)[k']
        W[k']    = sum_e (theta_L + theta_R)[k']
        E_q[log B] = psi(a + S) - log(b + W)
    """
    th = propensity[edges[:, 0]] + propensity[edges[:, 1]]  # [E, K]
    s = np.zeros((k, k))
    np.add.at(s, labels, th)
    w = th.sum(0)
    return np.asarray(digamma(jnp.asarray(a + s))) - np.log(b + w)[None, :]


def _fit_edge_labels(
    profiles,
    k: int,
    *,
    n_genes: int,
    n_sweeps: int = 30,
    n_greedy: int = 10,
    alpha: float = 1.0,
    seed: int = DEFAULT_PROJECTION_SEED,
    edges: np.ndarray | None = None,
    n_cells: int | None = None,
    em_sweeps: int = 0,
    incidence_a: float = 1.0,
    incidence_b: float = 1.0,
    init_labels: np.ndarray | None = None,
    mesh=None,
    mesh_axis: str = "dp",
) -> tuple[np.ndarray, list]:
    """Collapsed Gibbs over edge labels on an [E, D] sparse profile
    matrix; the shared core for flat fits and the cascade.

    With `em_sweeps > 0` (and `edges`/`n_cells` given), a final
    component-EM stage runs: vertex propensity theta and the K x K
    Poisson-Gamma incidence are computed once from the post-Gibbs
    labels and FROZEN, adding sum_k' (theta_L + theta_R)[k'] *
    E_q[log B[k, k']] to every score during EM + greedy
    (gibbs.rs:25-41 IncidenceConfig + run_components_em)."""
    e = profiles.shape[0]
    coo = profiles.tocoo()
    # dp mesh: the EDGE axis (labels/profiles/scores) and the nnz axis
    # shard over `mesh_axis` — the reference's own parallel structure
    # (one blocked sweep resamples every edge given the [K, G] rates,
    # which stay replicated; the rate-refresh segment sums all-reduce).
    # Both axes pad to the mesh size; mask_e keeps padded edges out of
    # the community-size stats (their profiles are empty).
    n_shards = int(mesh.shape[mesh_axis]) if mesh is not None else 1
    e_pad = e + ((-e) % n_shards)
    nnz = len(coo.data)
    nnz_pad = nnz + ((-nnz) % n_shards)

    def _shard(a):
        if mesh is None:
            return jnp.asarray(a)
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        sh = NamedSharding(mesh, P(mesh_axis, *([None] * (a.ndim - 1))))
        return jax.make_array_from_callback(a.shape, sh, lambda i: a[i])

    def _pad(a, n, fill=0):
        return np.concatenate([a, np.full(n - len(a), fill, a.dtype)])

    # padded nnz rows point at edge 0 with val 0: no contribution
    row_e = _shard(_pad(coo.row.astype(np.int32), nnz_pad))
    col_g = _shard(_pad(coo.col.astype(np.int32), nnz_pad))
    vals = _shard(_pad(coo.data.astype(np.float32), nnz_pad))
    edge_tot = _shard(_pad(
        np.asarray(profiles.sum(1)).ravel().astype(np.float32), e_pad
    ))
    mask_e = _shard(_pad(np.ones(e, np.float32), e_pad))

    key = jax.random.key(seed & 0x7FFFFFFF)
    key, k_init = jax.random.split(key)
    if init_labels is not None:
        labels = _shard(_pad(np.asarray(init_labels, np.int32), e_pad))
    else:
        labels = _shard(np.asarray(
            jax.random.randint(k_init, (e_pad,), 0, k, dtype=jnp.int32)
        ))
    zeros_inc = _shard(np.zeros((e_pad, k), np.float32))

    trace = []

    def run(labels, n_sample, n_max, inc, phase):
        prev = None
        for sweep in range(n_sample + n_max):
            nonlocal key
            key, k_s = jax.random.split(key)
            labels, scores = _sweep(
                k_s, row_e, col_g, vals, edge_tot, labels, inc,
                mask_e,
                k=k, n_edges=e_pad, n_genes=n_genes, alpha=alpha,
                a0=1.0, b0=1.0,
                sample=sweep < n_sample,
            )
            chosen = jnp.take_along_axis(scores, labels[:, None].astype(jnp.int32), 1)
            trace.append((phase, float(jnp.sum(mask_e * chosen[:, 0]))))
            if sweep >= n_sample:
                lab_np = np.asarray(_gather(labels))
                if prev is not None and np.array_equal(prev, lab_np):
                    break  # greedy converged
                prev = lab_np
        return labels

    def _gather(x):
        if mesh is None:
            return x
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P

        return jax.jit(lambda v: v, out_shardings=NamedSharding(mesh, P()))(x)

    labels = run(labels, n_sweeps, n_greedy, zeros_inc, "gibbs")

    if em_sweeps > 0 and edges is not None and n_cells is not None:
        lab_np = np.asarray(_gather(labels))[:e]
        theta = compute_node_membership(edges, lab_np, n_cells, k)
        log_b = fit_log_incidence(
            edges, lab_np, theta, k, a=incidence_a, b=incidence_b
        )
        th_e = theta[edges[:, 0]] + theta[edges[:, 1]]  # [E, K']
        inc_np = np.concatenate([
            (th_e @ log_b.T).astype(np.float32),
            np.zeros((e_pad - e, k), np.float32),
        ])
        labels = run(labels, em_sweeps, n_greedy, _shard(inc_np), "em")

    return np.asarray(_gather(labels))[:e], trace


@dataclass
class LinkCommunityResult:
    edge_labels: np.ndarray  # [E]
    propensity: np.ndarray  # [N, K] per-cell soft community propensity
    entropy: np.ndarray  # [N]
    edges: np.ndarray  # [E, 2]
    scores_trace: list


def fit_link_community(
    data,
    coords: np.ndarray,
    *,
    n_communities: int = 10,
    knn: int = 10,
    n_sweeps: int = 30,
    n_greedy: int = 10,
    em_sweeps: int = 10,
    alpha: float = 1.0,
    incidence_a: float = 1.0,
    incidence_b: float = 1.0,
    gene_weights: np.ndarray | None = None,
    batch_scale: "tuple[np.ndarray, np.ndarray] | None" = None,
    gene_network: str | None = None,
    gene_network_allow_prefix: bool = False,
    gene_network_delimiter: str | None = None,
    snn_min_shared: int = 2,
    gene_trim_min_degree: int = 2,
    gene_modules_resolution: float = 1.0,
    reciprocal: bool = False,
    mesh=None,
    seed: int = DEFAULT_PROJECTION_SEED,
) -> LinkCommunityResult:
    n = data.num_columns
    d = data.num_rows
    k = n_communities

    edges = spatial_knn_edges(coords, knn, reciprocal=reciprocal)
    if gene_network:
        # module-pair edge basis (fit.rs:80-137): gene network -> SNN
        # augment -> k-core trim -> Leiden modules -> pair features
        from .gene_network import (
            GenePairGraph,
            ModulePairBasis,
            build_module_expression,
            kcore_trim,
            leiden_gene_modules,
            module_pair_edge_profiles,
        )

        graph = GenePairGraph.from_edge_list(
            gene_network, data.row_names(),
            allow_prefix=gene_network_allow_prefix,
            delimiter=gene_network_delimiter,
        )
        if graph.num_edges == 0:
            raise ValueError(
                "gene network matched 0 gene pairs (check name conventions)"
            )
        graph.augment_with_snn(snn_min_shared)
        keep = kcore_trim(graph, gene_trim_min_degree)
        mog = leiden_gene_modules(
            graph, keep, resolution=gene_modules_resolution, seed=seed & 0x7FFFFFFF
        )
        basis = ModulePairBasis.build(graph, mog)
        if basis.n_pairs == 0:
            raise ValueError("module-pair basis is empty; lower trim/resolution")
        module_expr, cell_totals = build_module_expression(
            data, mog, basis.n_modules, gene_weights=gene_weights
        )
        profiles = module_pair_edge_profiles(module_expr, cell_totals, edges, basis)
        n_feat = basis.n_pairs
    else:
        profiles = edge_profiles(
            data, edges, gene_weights=gene_weights, batch_scale=batch_scale
        )
        n_feat = d
    e = profiles.shape[0]
    log.info(
        "link community: %d cells, %d edges, K=%d, %d features%s",
        n, e, k, n_feat, " (module pairs)" if gene_network else "",
    )

    labels_np, trace = _fit_edge_labels(
        profiles, k,
        n_genes=n_feat, n_sweeps=n_sweeps, n_greedy=n_greedy,
        alpha=alpha, incidence_a=incidence_a, incidence_b=incidence_b,
        seed=seed,
        edges=edges, n_cells=n, em_sweeps=em_sweeps, mesh=mesh,
    )
    prop = compute_node_membership(edges, labels_np, n, k)
    p_safe = np.maximum(prop, 1e-30)
    entropy = -(prop * np.log(p_safe)).sum(1)

    return LinkCommunityResult(
        edge_labels=labels_np,
        propensity=prop.astype(np.float32),
        entropy=entropy.astype(np.float32),
        edges=edges,
        scores_trace=trace,
    )


def gene_community_rates(
    data, propensity: np.ndarray, *, a0: float = 1.0, b0: float = 1.0,
    block_size: int = 8192,
) -> np.ndarray:
    """[D, K] Poisson-Gamma gene rates per community, weighting each
    cell by its soft propensity (profiles.rs
    compute_gene_community_stat)."""
    from ..data.visitors import visit_columns_by_block

    d = data.num_rows
    k = propensity.shape[1]
    num = np.zeros((d, k))
    for blk in visit_columns_by_block(data, block_size=block_size):
        real = blk.col_ids < blk.ncols
        r, c, v = blk.row_ids[real], blk.col_ids[real], blk.vals[real]
        th = propensity[blk.lb + c]  # [nnz, K]
        np.add.at(num, r, th * v[:, None])
    den = propensity.sum(0)  # [K]
    return ((a0 + num) / (b0 + den)[None, :]).astype(np.float32)


def bhc_consensus(
    gene_rates_dk: np.ndarray, *, cutoff: float = 0.0
) -> tuple[np.ndarray, list]:
    """BHC merge of community gene profiles -> consensus label per
    community + merge trace (cluster_bhc consensus, outputs.rs;
    `cutoff` = SrtLinkCommunityArgs merge_cut)."""
    from ..ops.bhc import bhc_cluster

    res = bhc_cluster(gene_rates_dk.T, cutoff=cutoff)  # [K, D] profiles
    return np.asarray(res.labels), list(getattr(res, "merges", []))


@dataclass
class PintoLcArgs:
    data_files: Sequence[str] = ()
    coord_file: str = ""  # TSV: cell x y
    out: str = "pinto"
    n_communities: int = 10
    knn: int = 10
    n_sweeps: int = 30
    n_greedy: int = 10
    em_sweeps: int = 10
    alpha: float = 1.0  # Dirichlet concentration (SrtLinkCommunityArgs)
    incidence_a: float = 1.0  # Poisson-Gamma incidence prior
    incidence_b: float = 1.0
    # genes with total count below this drop out of the edge profiles
    # (SrtLinkCommunityArgs min_gene_count)
    min_gene_count: float = 0.0
    # NB-Fisher housekeeping weights on the edge profiles (default ON)
    fisher_weights: bool = True
    # per-cell section/batch labels; the per-batch gene flavor divides
    # out of the edge profiles (SrtInputArgs batch_files)
    batch_files: "Optional[Sequence[str]]" = None
    # cell QC keep mask before the spatial graph (SrtInputArgs qc)
    qc: bool = False
    qc_min_total: float = 0.0
    # BHC consensus merge threshold (merge_cut; log-BF >= cut merges)
    merge_cut: float = 0.0
    gene_network: Optional[str] = None
    gene_network_allow_prefix: bool = False
    gene_network_delimiter: Optional[str] = None
    snn_min_shared: int = 2
    gene_trim_min_degree: int = 2
    gene_modules_resolution: float = 1.0
    # mutual-kNN spatial edges only (SrtCellPairsArgs reciprocal)
    reciprocal: bool = False
    seed: int = DEFAULT_PROJECTION_SEED
    data_parallel: bool = False



def run_lc(args: PintoLcArgs) -> LinkCommunityResult:
    import pandas as pd

    from ..ops.gene_stats import nb_fisher_weights
    from ..senna.topic import load_data_vec

    vec = load_data_vec(args.data_files, args.batch_files)
    coords = np.loadtxt(args.coord_file, usecols=(1, 2), skiprows=0)
    if args.qc:
        from ..data.qc import compute_cell_qc

        qs = compute_cell_qc(vec)
        keep = qs.keep_mask(min_total=args.qc_min_total)
        vec = vec.subset_columns(keep)
        coords = coords[keep]
        log.info("pinto qc: keeping %d cells", int(keep.sum()))
    batch_scale = None
    if args.batch_files and vec.num_batches > 1:
        # per-batch gene flavor from batch pseudobulk means vs the
        # global mean (EstimateBatchArgs role), clamped like the
        # reference delta guards
        from ..ops import collapse as _clp

        memb = vec.batch_membership()
        stat = _clp.collect_basic_stats(vec, memb.astype(np.int32), vec.num_batches)
        pb = np.asarray(stat.observed_sum_ds, np.float64)  # [D, B]
        prop = pb / np.maximum(pb.sum(0, keepdims=True), 1e-12)
        global_prop = pb.sum(1) / max(pb.sum(), 1e-12)
        delta_gb = np.clip(
            prop / np.maximum(global_prop[:, None], 1e-12), 0.1, 10.0
        ).astype(np.float32)
        batch_scale = (delta_gb, memb)
        log.info("pinto batch correction over %d sections", vec.num_batches)
    w = nb_fisher_weights(vec) if args.fisher_weights else np.ones(vec.num_rows, np.float32)
    if args.min_gene_count > 0:
        from ..ops.gene_stats import streaming_gene_stats

        st = streaming_gene_stats(vec)
        low = (st.mean * st.n_cells) < args.min_gene_count
        w = np.where(low, 0.0, w).astype(np.float32)
        log.info("min-gene-count %g: %d/%d genes dropped",
                 args.min_gene_count, int(low.sum()), vec.num_rows)
    mesh = None
    if args.data_parallel:
        import jax as _jax

        if _jax.device_count() > 1:
            from ..parallel.mesh import make_mesh

            mesh = make_mesh()
    res = fit_link_community(
        vec, coords,
        n_communities=args.n_communities, knn=args.knn,
        n_sweeps=args.n_sweeps, n_greedy=args.n_greedy,
        em_sweeps=args.em_sweeps, alpha=args.alpha,
        incidence_a=args.incidence_a, incidence_b=args.incidence_b,
        gene_weights=w, batch_scale=batch_scale,
        gene_network=args.gene_network,
        gene_network_allow_prefix=args.gene_network_allow_prefix,
        gene_network_delimiter=args.gene_network_delimiter,
        snn_min_shared=args.snn_min_shared,
        gene_trim_min_degree=args.gene_trim_min_degree,
        gene_modules_resolution=args.gene_modules_resolution,
        reciprocal=args.reciprocal,
        seed=args.seed,
        mesh=mesh,
    )
    cells = vec.column_names()
    pd.DataFrame(
        res.propensity, index=cells,
        columns=[f"c{i}" for i in range(args.n_communities)],
    ).assign(entropy=res.entropy).reset_index(names="cell").to_parquet(
        f"{args.out}.propensity.parquet"
    )
    pd.DataFrame(
        {"src": res.edges[:, 0], "dst": res.edges[:, 1], "community": res.edge_labels}
    ).to_parquet(f"{args.out}.edges.parquet")

    # score trace per sweep (util/score_trace.rs role)
    pd.DataFrame(
        {
            "sweep": np.arange(len(res.scores_trace)),
            "phase": [p for p, _ in res.scores_trace],
            "score": [s for _, s in res.scores_trace],
        }
    ).to_parquet(f"{args.out}.score_trace.parquet")

    # gene x community Poisson-Gamma rates + BHC consensus of communities
    rates = gene_community_rates(vec, res.propensity)
    pd.DataFrame(
        rates, index=vec.row_names(),
        columns=[f"c{i}" for i in range(rates.shape[1])],
    ).reset_index(names="gene").to_parquet(f"{args.out}.gene_community.parquet")
    consensus, _merges = bhc_consensus(rates, cutoff=args.merge_cut)
    pd.DataFrame(
        {"community": np.arange(len(consensus)), "consensus": consensus}
    ).to_parquet(f"{args.out}.consensus.parquet")

    RunManifest(
        command="lc",
        inputs={"data_files": list(args.data_files), "coords": args.coord_file},
        outputs={
            "propensity": f"{args.out}.propensity.parquet",
            "edges": f"{args.out}.edges.parquet",
            "score_trace": f"{args.out}.score_trace.parquet",
            "gene_community": f"{args.out}.gene_community.parquet",
            "consensus": f"{args.out}.consensus.parquet",
        },
    ).save(args.out, "metadata.json")
    return res
