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
    seed: int = 0,
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

    def track_loss(counts, q, m, feat, bias, pb_e, pb_b):
        scores = pb_e @ feat.T + bias[None, :] + pb_b[:, None]
        pos = counts * log_sigmoid(scores)
        neg = (n_negatives * m[:, None] * q[None, :]) * log_sigmoid(-scores)
        return -(pos.sum() + neg.sum()) / jnp.maximum(counts.sum(), 1.0)

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    # epochs fold into chunked scan dispatches (utils/scan_train.py)
    def _loss_data(pr, data):
        s, u, qs, qu, ms, mu = data
        ls = track_loss(s, qs, ms, pr["beta"], pr["b_s"], pr["pb_e"], pr["pb_b"])
        lu = track_loss(
            u, qu, mu, pr["beta"] + pr["delta"], pr["b_u"], pr["pb_e"], pr["pb_b"]
        )
        reg = delta_l2 * jnp.mean(jnp.sum(pr["delta"] ** 2, axis=1))
        return ls + lu + reg

    def gem_step(carry, data, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(_loss_data)(params, data)
        updates, opt_state = optimizer.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), loss

    from ..utils.scan_train import fold_epochs

    (params, opt_state), ls = fold_epochs(
        gem_step, (params, opt_state), (s_j, u_j, q_s, q_u, m_s, m_u), epochs,
        cache_key=("gem", learning_rate, n_negatives, delta_l2),
    )
    losses = ls[::50].tolist()

    return GemResult(
        e_feat=np.asarray(params["beta"]),
        delta=np.asarray(params["delta"]),
        b_feat_s=np.asarray(params["b_s"]),
        b_feat_u=np.asarray(params["b_u"]),
        pb_e=np.asarray(params["pb_e"]),
        pb_b=np.asarray(params["pb_b"]),
        losses=losses,
    )


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
    seed: int = 0,
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

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)

    # chunked epoch scan with per-epoch mask keys (utils/scan_train.py)
    def enc_step(carry, data, km):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, data, km)
        updates, opt_state = optimizer.update(grads, opt_state)
        return (optax.apply_updates(params, updates), opt_state), loss

    from ..utils.scan_train import fold_epochs

    (params, opt_state), ls = fold_epochs(
        enc_step, (params, opt_state), (u_log, s_j), epochs, key=key,
        # p/d are baked into the mask-shape inside loss_fn, so they key
        cache_key=("gem_enc", learning_rate, mask_frac, delta_l2, p, d),
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
