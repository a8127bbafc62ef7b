"""`senna resolve-embedding-space` — map embeddings from different
runs into one shared space (graph-embedding-util `resolve_embedding`
equivalent).

Anchored orthogonal Procrustes: runs share (a subset of) features;
each run's feature embedding is rotated/scaled onto the reference
run's via the SVD solution, and the same transform carries that run's
cell embeddings into the shared space.
"""

from __future__ import annotations

import numpy as np


def procrustes_transform(
    source: np.ndarray, target: np.ndarray, *, allow_scale: bool = True
) -> tuple[np.ndarray, float]:
    """(R, s): orthogonal map + scale minimizing ||s A R - B||_F for
    centered A, B."""
    a = source - source.mean(0)
    b = target - target.mean(0)
    u, sv, vt = np.linalg.svd(a.T @ b)
    r = u @ vt
    s = sv.sum() / max((a * a).sum(), 1e-12) if allow_scale else 1.0
    return r, float(s)


def resolve_embedding_spaces(
    runs: list[dict],
    *,
    reference: int = 0,
    allow_scale: bool = True,
) -> list[dict]:
    """Each run: {"feat_names", "e_feat" [D_r, H], optional "e_cell"}.
    Returns runs with aligned embeddings (reference unchanged)."""
    ref = runs[reference]
    ref_pos = {n: i for i, n in enumerate(ref["feat_names"])}

    out = []
    for i, run in enumerate(runs):
        if i == reference:
            out.append(dict(run))
            continue
        shared = [
            (j, ref_pos[n]) for j, n in enumerate(run["feat_names"]) if n in ref_pos
        ]
        if len(shared) < run["e_feat"].shape[1] + 1:
            raise ValueError(f"run {i}: too few shared features to resolve")
        src_idx, ref_idx = map(np.asarray, zip(*shared))
        r, s = procrustes_transform(
            run["e_feat"][src_idx], ref["e_feat"][ref_idx], allow_scale=allow_scale
        )
        mu_src = run["e_feat"][src_idx].mean(0)
        mu_ref = ref["e_feat"][ref_idx].mean(0)
        xform = lambda e: (e - mu_src) @ r * s + mu_ref
        aligned = dict(run)
        aligned["e_feat"] = xform(run["e_feat"])
        if run.get("e_cell") is not None:
            aligned["e_cell"] = xform(run["e_cell"])
        out.append(aligned)
    return out


def rest_fit(
    theta_nk: "np.ndarray",  # [N, K] FROZEN topic proportions (linear)
    data,  # backend/vec: [D, N] counts
    *,
    embedding_dim: int | None = None,  # H (default K)
    epochs: int = 400,
    learning_rate: float = 0.05,
    n_negatives: float = 5.0,
    neg_alpha: float = 0.75,
    cell_block: int = 4096,
    seed: int = 0,
) -> dict:
    """`senna resolve-embedding-space` reference semantics
    (resolve_embedding_space.rs:1-40): freeze the cell topic
    proportions theta from a finished topic run and learn a shared
    cell+gene H-space against the raw counts —
    score(c, g) = (theta_c alpha) . rho_g + b_g with the same
    partition-free exact expected-NCE family as bge/fne. The cell
    embedding is the derived Z = theta alpha; the written gene
    embedding is the SIMBA-style post-hoc co-embedding (each gene at
    the softmax-over-cells weighted average of Z), landing genes on
    the cell manifold for `annotate-by-projection`."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.losses import log_sigmoid
    from ..utils.scan_train import fold_epochs

    n, k = theta_nk.shape
    d = data.num_rows
    h = embedding_dim or k

    x_dn = data.read_columns_csc(np.arange(n))
    x_nd = np.asarray(x_dn.T.todense(), np.float32)  # [N, D]
    m_c = x_nd.sum(1)  # per-cell mass
    q = x_nd.sum(0) ** neg_alpha
    q = (q / max(q.sum(), 1e-30)).astype(np.float32)

    key = jax.random.key(seed)
    k1, k2 = jax.random.split(key)
    params = {
        "alpha": 0.1 * jax.random.normal(k1, (k, h)),
        "rho": 0.1 * jax.random.normal(k2, (d, h)),
        "b": jnp.zeros(d),
    }
    theta_j = jnp.asarray(theta_nk, jnp.float32)
    x_j = jnp.asarray(x_nd)
    m_j = jnp.asarray(m_c)
    q_j = jnp.asarray(q)

    optimizer = optax.adamw(learning_rate, weight_decay=0.01)
    opt_state = optimizer.init(params)

    def loss_fn(pr, dat):
        th, x, m, qn = dat
        z = th @ pr["alpha"]  # [N, H] frozen-theta cell embedding
        s = z @ pr["rho"].T + pr["b"][None, :]  # [N, D]
        pos = x * log_sigmoid(s)
        neg = (n_negatives * m[:, None] * qn[None, :]) * log_sigmoid(-s)
        return -(pos.sum() + neg.sum()) / jnp.maximum(x.sum(), 1.0)

    def step(carry, dat, _):
        pr, st = carry
        loss, g = jax.value_and_grad(loss_fn)(pr, dat)
        up, st = optimizer.update(g, st, pr)
        return (optax.apply_updates(pr, up), st), loss

    (params, opt_state), ls = fold_epochs(
        step, (params, opt_state), (theta_j, x_j, m_j, q_j), epochs,
        cache_key=("rest", learning_rate, n_negatives, neg_alpha),
    )

    alpha = np.asarray(params["alpha"])
    rho = np.asarray(params["rho"])
    b = np.asarray(params["b"])
    z = theta_nk @ alpha  # [N, H]

    # SIMBA si.tl.embed transform (feature_coembedding): gene g lands at
    # the softmax-over-cells weighted average of Z
    s = z @ rho.T + b[None, :]  # [N, D]
    w = np.exp(s - s.max(0, keepdims=True))
    w = w / np.maximum(w.sum(0, keepdims=True), 1e-30)
    e_gene = w.T @ z  # [D, H] on the cell manifold

    return {
        "cell_embedding": z.astype(np.float32),
        "feature_embedding": e_gene.astype(np.float32),
        "topic_embedding": alpha.astype(np.float32),
        "rho_raw": rho.astype(np.float32),
        "bias": b.astype(np.float32),
        "losses": np.asarray(ls)[::50].tolist(),
    }
