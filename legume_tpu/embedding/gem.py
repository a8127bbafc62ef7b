"""gem — geodesic embedding + motion: joint spliced/unspliced NCE with
a velocity shift (`faba/src/gem/` + graph-embedding-util beta-sharing
equivalents; `gem/mod.rs:1-13`).

Model: spliced counts score against feature embeddings beta; unspliced
counts score against beta + delta (the velocity offset — a per-gene
displacement in embedding space, `factored_feat_rows` beta-sharing).
Both tracks share the cell/pb side. Fitted with the same exact
expected-NCE objective as bge; per-gene velocity magnitude =
||delta_g||, and per-cell RNA velocity = the expected displacement of
the cell under its unspliced loadings:

    v_cell = sum_g w_g(cell) * delta_g,   w ~ unspliced share
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.losses import log_sigmoid

log = logging.getLogger(__name__)


@dataclass
class GemResult:
    e_feat: np.ndarray  # [D, H] beta
    delta: np.ndarray  # [D, H] velocity offsets
    b_feat_s: np.ndarray
    b_feat_u: np.ndarray
    pb_e: np.ndarray  # [P, H]
    pb_b: np.ndarray
    losses: list = field(default_factory=list)
    # lineage-DAG readout (only when lineage_dag ran)
    dag_edges: "np.ndarray | None" = None  # [E, 2] src -> dst
    dag_pseudotime: "np.ndarray | None" = None  # [P] in [0, 1]
    dag_fate: "np.ndarray | None" = None  # [P, n_leaves]
    dag_leaves: "np.ndarray | None" = None  # leaf row indices

    def cell_velocity(self, unspliced_nd: np.ndarray) -> np.ndarray:
        w = unspliced_nd / np.maximum(unspliced_nd.sum(1, keepdims=True), 1e-9)
        return w @ self.delta


def fit_gem(
    spliced_pd: np.ndarray,  # [P, D] pseudobulk spliced counts
    unspliced_pd: np.ndarray,  # [P, D] pseudobulk unspliced counts
    *,
    embedding_dim: int = 16,
    epochs: int = 800,
    learning_rate: float = 0.02,
    n_negatives: float = 5.0,
    neg_alpha: float = 0.75,
    delta_l2: float = 0.01,
    # phase-1 objective (gem/args.rs nce_objective): `logistic` is the
    # binary NCE against the unigram noise; `softmax` scores the full
    # gene axis per pb (exact multinomial likelihood — the pb gene
    # axis is small enough that no sampling is needed here)
    objective: str = "logistic",
    # AdamW knobs (gem/args.rs TrainArgs weight_decay / grad_clip)
    weight_decay: float = 0.0,
    grad_clip: float = 0.0,
    # sequential phase-2 velocity (gem/args.rs sequential_velocity):
    # fit theta on the spliced track first, then delta with theta
    # frozen — the DEFAULT is the joint solve
    sequential_velocity: bool = False,
    # lineage-DAG refinement (gem/args.rs lineage_dag): orient a
    # velocity-KNN lineage over the rows, run a SECOND pass with a
    # velocity-drift SEM residual, and lift pseudotime + fate
    lineage_dag: bool = False,
    lineage_smooth: bool = False,
    lineage_mst: bool = True,  # dense_dag inverts this
    lineage_knn: int = 10,
    lineage_weight: float = 1.0,
    seed: int = 0,
    # dp over a jax.sharding.Mesh: pb rows shard, params replicate,
    # XLA inserts the grad psum (VERDICT r4 #6 — the dp layer must not
    # be flagship-only; reference trains on the one candle device)
    mesh=None,
) -> GemResult:
    p, d = spliced_pd.shape
    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)

    params = {
        "beta": 0.1 * jax.random.normal(k1, (d, embedding_dim)),
        "delta": jnp.zeros((d, embedding_dim)),
        "b_s": jnp.zeros(d),
        "b_u": jnp.zeros(d),
        "pb_e": 0.1 * jax.random.normal(k2, (p, embedding_dim)),
        "pb_b": jnp.zeros(p),
    }

    def neg_q(c):
        q = c.sum(0) ** neg_alpha
        return jnp.asarray((q / max(q.sum(), 1e-30)).astype(np.float32))

    s_j = jnp.asarray(spliced_pd, jnp.float32)
    u_j = jnp.asarray(unspliced_pd, jnp.float32)
    q_s, q_u = neg_q(spliced_pd), neg_q(unspliced_pd)
    m_s, m_u = s_j.sum(1), u_j.sum(1)
    if mesh is not None:
        from ..parallel.mesh import data_sharding, replicate

        ds2, ds1 = data_sharding(mesh, 2), data_sharding(mesh, 1)
        s_j, u_j = jax.device_put(s_j, ds2), jax.device_put(u_j, ds2)
        m_s, m_u = jax.device_put(m_s, ds1), jax.device_put(m_u, ds1)
        repl = replicate(mesh)
        q_s, q_u = jax.device_put(q_s, repl), jax.device_put(q_u, repl)
        # pb-side params shard with their rows; gene side replicates
        params = {
            k: jax.device_put(v, ds2 if k == "pb_e" else
                              ds1 if k == "pb_b" else repl)
            for k, v in params.items()
        }

    def track_loss(counts, q, m, feat, bias, pb_e, pb_b):
        scores = pb_e @ feat.T + bias[None, :] + pb_b[:, None]
        if objective == "softmax":
            logp = jax.nn.log_softmax(scores, axis=1)
            return -(counts * logp).sum() / jnp.maximum(counts.sum(), 1.0)
        pos = counts * log_sigmoid(scores)
        neg = (n_negatives * m[:, None] * q[None, :]) * log_sigmoid(-scores)
        return -(pos.sum() + neg.sum()) / jnp.maximum(counts.sum(), 1.0)

    optimizer = (
        optax.adamw(learning_rate, weight_decay=weight_decay)
        if weight_decay > 0 else optax.adam(learning_rate)
    )
    if grad_clip > 0:
        optimizer = optax.chain(
            optax.clip_by_global_norm(grad_clip), optimizer
        )
    opt_state = optimizer.init(params)

    # epochs fold into chunked scan dispatches (utils/scan_train.py)
    def _loss_data(pr, data, *, freeze_theta=False, drift=None):
        s, u, qs, qu, ms, mu = data
        beta = pr["beta"]
        pb_e = pr["pb_e"]
        if freeze_theta:
            beta = jax.lax.stop_gradient(beta)
            pb_e = jax.lax.stop_gradient(pb_e)
        ls = track_loss(s, qs, ms, beta, pr["b_s"], pb_e, pr["pb_b"])
        lu = track_loss(
            u, qu, mu, beta + pr["delta"], pr["b_u"], pb_e, pr["pb_b"]
        )
        reg = delta_l2 * jnp.mean(jnp.sum(pr["delta"] ** 2, axis=1))
        loss = ls + lu + reg
        if drift is not None:
            # velocity-drift SEM residual (fit/mod.rs lineage pass):
            # the SHARED feature dictionary picks up the lineage
            # geometry — DAG edge i -> j pulls the row state
            # e(i) = s_w[i] @ beta toward e(j) along eta * v_i
            sw_src, sw_dst, v_src = drift
            e_src = sw_src @ pr["beta"]
            e_dst = sw_dst @ pr["beta"]
            pred = e_src + pr["eta"] * v_src
            loss = loss + lineage_weight * jnp.mean(
                jnp.sum((e_dst - pred) ** 2, axis=1)
            )
        return loss

    from functools import partial as _partial

    from ..utils.scan_train import fold_epochs

    def make_step(loss_fn):
        def gem_step(carry, data, _):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(params, data)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        return gem_step

    data6 = (s_j, u_j, q_s, q_u, m_s, m_u)
    if sequential_velocity:
        # phase A: theta/beta on the spliced track alone (delta frozen
        # at 0 has no effect there); phase B: delta with theta frozen
        def loss_a(pr, data):
            s, u, qs, qu, ms, mu = data
            return track_loss(s, qs, ms, pr["beta"], pr["b_s"], pr["pb_e"], pr["pb_b"])

        (params, opt_state), ls_a = fold_epochs(
            make_step(loss_a), (params, opt_state), data6, epochs,
            cache_key=("gem-seq-a", learning_rate, n_negatives, delta_l2, objective, weight_decay, grad_clip),
        )
        opt_state = optimizer.init(params)
        (params, opt_state), ls_b = fold_epochs(
            make_step(_partial(_loss_data, freeze_theta=True)),
            (params, opt_state), data6, epochs,
            cache_key=("gem-seq-b", learning_rate, n_negatives, delta_l2, objective, weight_decay, grad_clip),
        )
        ls = np.concatenate([np.asarray(ls_a), np.asarray(ls_b)])
    else:
        (params, opt_state), ls = fold_epochs(
            make_step(_loss_data), (params, opt_state), data6, epochs,
            cache_key=("gem", learning_rate, n_negatives, delta_l2, objective, weight_decay, grad_clip),
        )
    losses = np.asarray(ls)[::50].tolist()

    dag_edges = dag_pt = dag_fate = dag_leaves = None
    if lineage_dag:
        # orient the lineage over rows in the CELL-state frame
        # e(i) = s_w[i] @ beta with the future-minus-present velocity
        # v(i) = u_w[i] @ (beta + delta) - e(i); refit with the drift
        # residual, re-orient on the refined dictionary, then lift
        # pseudotime + fate
        s_w = (spliced_pd / np.maximum(spliced_pd.sum(1, keepdims=True), 1e-9)).astype(np.float32)
        u_w = (unspliced_pd / np.maximum(unspliced_pd.sum(1, keepdims=True), 1e-9)).astype(np.float32)
        for _pass in range(2):
            beta_np = np.asarray(params["beta"])
            delta_np = np.asarray(params["delta"])
            e_np = s_w @ beta_np
            v_np = u_w @ (beta_np + delta_np) - e_np
            if lineage_smooth:
                from ..ops.knn import knn_search

                _, idx = knn_search(e_np, e_np, min(lineage_knn, p - 1))
                v_np = v_np[idx].mean(1)
            dag_edges, phi = _velocity_dag(
                e_np, v_np, knn=min(lineage_knn, p - 1), mst=lineage_mst
            )
            if _pass == 1:
                break
            params = dict(params)
            params["eta"] = jnp.asarray(1.0)
            opt_state = optimizer.init(params)
            drift = (
                jnp.asarray(s_w[dag_edges[:, 0]]),
                jnp.asarray(s_w[dag_edges[:, 1]]),
                jnp.asarray(v_np[dag_edges[:, 0]]),
            )
            (params, opt_state), ls2 = fold_epochs(
                make_step(_partial(_loss_data, drift=drift)),
                (params, opt_state), data6, epochs,
                cache_key=None,
            )
            losses += np.asarray(ls2)[::50].tolist()
        dag_pt, dag_fate, dag_leaves = _dag_readout(dag_edges, p, phi)

    return GemResult(
        e_feat=np.asarray(params["beta"]),
        delta=np.asarray(params["delta"]),
        b_feat_s=np.asarray(params["b_s"]),
        b_feat_u=np.asarray(params["b_u"]),
        pb_e=np.asarray(params["pb_e"]),
        pb_b=np.asarray(params["pb_b"]),
        losses=losses,
        dag_edges=dag_edges,
        dag_pseudotime=dag_pt,
        dag_fate=dag_fate,
        dag_leaves=dag_leaves,
    )


def _velocity_dag(
    e_np: np.ndarray, v_np: np.ndarray, *, knn: int, mst: bool
) -> tuple[np.ndarray, np.ndarray]:
    """Velocity-oriented lineage edges over the embedding rows
    (gem/run.rs lineage graph). Edge orientation integrates the LOCAL
    velocity projections into a GLOBAL potential phi — least squares on
    phi_b - phi_a ~ 0.5 (v_a + v_b) . (e_b - e_a) over the kNN edges —
    so one noisy row cannot flip a whole branch; edges then point
    uphill in phi. `mst` keeps the minimum spanning tree (the
    reference's default lineage tree), else the dense graph."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import minimum_spanning_tree
    from scipy.sparse.linalg import lsqr

    from ..ops.knn import knn_search

    p = len(e_np)
    dist, idx = knn_search(e_np, e_np, min(knn + 1, p - 1))
    pairs = {}
    for i in range(p):
        for jj, dd in zip(idx[i], dist[i]):
            j = int(jj)
            if j != i:
                pairs[(min(i, j), max(i, j))] = float(dd)
    und = np.asarray(sorted(pairs), np.int64)
    # potential from local projections (gauge: mean phi = 0)
    d_ab = e_np[und[:, 1]] - e_np[und[:, 0]]
    proj = 0.5 * ((v_np[und[:, 0]] + v_np[und[:, 1]]) * d_ab).sum(1)
    ne = len(und)
    rows = np.repeat(np.arange(ne), 2)
    cols = und.reshape(-1)
    vals = np.tile([-1.0, 1.0], ne)
    a_mat = sp.csr_matrix(
        (np.concatenate([vals, np.full(p, 1e-3)]),
         (np.concatenate([rows, np.full(p, ne)]),
          np.concatenate([cols, np.arange(p)]))),
        shape=(ne + 1, p),
    )
    phi = lsqr(a_mat, np.concatenate([proj, np.zeros(1)]))[0]
    if mst:
        g = sp.csr_matrix(
            (np.maximum(list(pairs.values()), 1e-9),
             (und[:, 0], und[:, 1])),
            shape=(p, p),
        )
        tree = minimum_spanning_tree(g).tocoo()
        cand = np.stack([tree.row, tree.col], 1)
    else:
        cand = und
    edges = np.where(
        (phi[cand[:, 1]] >= phi[cand[:, 0]])[:, None],
        cand, cand[:, ::-1],
    )
    return edges.astype(np.int64), phi


def _dag_readout(edges: np.ndarray, p: int, phi: np.ndarray) -> tuple:
    """Pseudotime = the min-max-normalized velocity potential phi (the
    globally integrated signal; per-edge depth counting breaks on a
    single mis-oriented tree edge) + fate = reachable-leaf distribution
    via equal-split forward walks over the oriented edges."""
    pt = (phi - phi.min()) / max(float(phi.max() - phi.min()), 1e-12)
    adj: list[list[int]] = [[] for _ in range(p)]
    for a, b in edges:
        adj[int(a)].append(int(b))
    leaves = np.asarray([i for i in range(p) if not adj[i]], np.int64)
    leaf_pos = {int(l): li for li, l in enumerate(leaves)}
    fate = np.zeros((p, max(len(leaves), 1)), np.float64)
    for l in leaves:
        fate[l, leaf_pos[int(l)]] = 1.0
    # propagate fate backward in reverse-potential order
    order = np.argsort(-phi)
    for a in order:
        if adj[a]:
            fate[a] = np.mean([fate[b] for b in adj[a]], axis=0)
    return pt.astype(np.float32), fate.astype(np.float32), leaves


# ----------------------------------------------------------------------------
# gem-encoder: masked generative sibling (faba gem_encoder/mod.rs:1-19)
# ----------------------------------------------------------------------------


@dataclass
class GemEncoderResult:
    rho: np.ndarray  # [D, H] shared gene embeddings
    delta: np.ndarray  # [D, H] velocity offsets (u + delta -> s)
    w1: np.ndarray
    b1: np.ndarray
    bias_s: np.ndarray
    losses: list = field(default_factory=list)

    def encode(self, unspliced_nd: np.ndarray) -> np.ndarray:
        u = np.log1p(unspliced_nd)
        u = u / np.maximum(np.linalg.norm(u, axis=1, keepdims=True), 1e-9)
        h = u @ self.rho
        return np.maximum(h @ self.w1 + self.b1, 0.0)

    def cell_velocity(self, unspliced_nd: np.ndarray) -> np.ndarray:
        w = unspliced_nd / np.maximum(unspliced_nd.sum(1, keepdims=True), 1e-9)
        return w @ self.delta


def fit_gem_encoder(
    spliced_pd: np.ndarray,  # [P, D]
    unspliced_pd: np.ndarray,  # [P, D]
    *,
    latent_dim: int = 16,
    epochs: int = 600,
    learning_rate: float = 0.01,
    mask_frac: float = 0.2,
    delta_l2: float = 0.01,
    weight_decay: float = 0.0,
    grad_clip: float = 0.0,
    seed: int = 0,
    # dp: pb rows shard over the mesh, params replicate (see fit_gem)
    mesh=None,
) -> GemEncoderResult:
    """Masked generative sibling of gem (`faba gem-encoder`,
    gem_encoder/mod.rs:1-19 u+delta->s parameterization): encode the
    cell state from the UNSPLICED profile through shared gene
    embeddings rho, then generatively score the SPLICED counts against
    rho + delta — the velocity offset carries the u->s flow. Training
    is BERT-style: a random gene subset is masked out of the encoder
    input each step and the spliced multinomial is scored everywhere,
    forcing the latent to impute through co-expression."""
    p, d = spliced_pd.shape
    key = jax.random.key(seed)
    k1, k2, key = jax.random.split(key, 3)

    params = {
        "rho": 0.1 * jax.random.normal(k1, (d, latent_dim)),
        "delta": jnp.zeros((d, latent_dim)),
        "w1": 0.1 * jax.random.normal(k2, (latent_dim, latent_dim)),
        "b1": jnp.zeros(latent_dim),
        "bias_s": jnp.zeros(d),
    }

    u_log = jnp.asarray(np.log1p(unspliced_pd), jnp.float32)
    u_log = u_log / jnp.maximum(
        jnp.linalg.norm(u_log, axis=1, keepdims=True), 1e-9
    )
    s_j = jnp.asarray(spliced_pd, jnp.float32)
    if mesh is not None:
        from ..parallel.mesh import data_sharding, replicate

        ds2 = data_sharding(mesh, 2)
        u_log, s_j = jax.device_put(u_log, ds2), jax.device_put(s_j, ds2)
        params = jax.device_put(params, replicate(mesh))

    def loss_fn(pr, data, kmask):
        u, s = data
        keep = jax.random.uniform(kmask, (p, d)) > mask_frac
        h = (u * keep) @ pr["rho"]
        z = jax.nn.relu(h @ pr["w1"] + pr["b1"])  # [P, H]
        logits = z @ (pr["rho"] + pr["delta"]).T + pr["bias_s"][None, :]
        log_prob = jax.nn.log_softmax(logits, axis=1)
        ll = jnp.sum(s * log_prob) / jnp.maximum(s.sum(), 1.0)
        reg = delta_l2 * jnp.mean(jnp.sum(pr["delta"] ** 2, axis=1))
        return -ll + reg

    optimizer = (
        optax.adamw(learning_rate, weight_decay=weight_decay)
        if weight_decay > 0 else optax.adam(learning_rate)
    )
    if grad_clip > 0:
        optimizer = optax.chain(
            optax.clip_by_global_norm(grad_clip), optimizer
        )
    opt_state = optimizer.init(params)

    # chunked epoch scan with per-epoch mask keys (utils/scan_train.py)
    def enc_step(carry, data, km):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, data, km)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    from ..utils.scan_train import fold_epochs

    (params, opt_state), ls = fold_epochs(
        enc_step, (params, opt_state), (u_log, s_j), epochs, key=key,
        # p/d are baked into the mask-shape inside loss_fn, so they key
        cache_key=("gem_enc", learning_rate, mask_frac, delta_l2, p, d, weight_decay, grad_clip),
    )
    losses = ls[::50].tolist()

    return GemEncoderResult(
        rho=np.asarray(params["rho"]),
        delta=np.asarray(params["delta"]),
        w1=np.asarray(params["w1"]),
        b1=np.asarray(params["b1"]),
        bias_s=np.asarray(params["bias_s"]),
        losses=losses,
    )
