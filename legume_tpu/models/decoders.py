"""Decoder modules (candle-util `decoder/` equivalent).

Contract parity with `DecoderModuleT::forward_with_llik(z, x) ->
(recon, llik)` (`traits/model.rs:51-117`). All topic decoders share a
softmax dictionary: trainable logits `W [K, D]`, `log beta_kd =
log_softmax_D(W)` (`nn/linear.rs:169-183`).

TPU note on `forward_log`: the reference computes
`logsumexp_k(log z + log beta)` by materializing an [N, K, D]
broadcast (`nn/linear.rs:237-261`). Here it is ONE MXU matmul in
linear space — `log(exp(log_z) @ exp(log_beta) + tiny)` — which is
numerically safe because the trainer's topic smoothing floors
`z >= alpha/K` and each beta column is a softmax over D (so products
sit far above the f32 denormal range). This is the `batched_dot`
gemm-rewrite insight (candle-util/src/batched_dot.rs:1-25) applied at
the decoder; XLA fuses the log into the matmul consumer.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from . import losses

_LOG_EPS = 1e-30


class _SoftmaxDictionary(nn.Module):
    """Trainable [K, D] logits -> row-softmax dictionary."""

    n_features: int
    n_topics: int

    @nn.compact
    def log_beta_kd(self) -> jax.Array:
        w = self.param(
            "dictionary",
            nn.initializers.normal(stddev=1.0),
            (self.n_topics, self.n_features),
        )
        return jax.nn.log_softmax(w, axis=-1)

    def __call__(self):
        return self.log_beta_kd()


def _forward_log(log_z_nk: jax.Array, log_beta_kd: jax.Array) -> jax.Array:
    """log(sum_k z_nk beta_kd) via one matmul (see module docstring)."""
    recon = jnp.exp(log_z_nk) @ jnp.exp(log_beta_kd)
    return jnp.log(recon + _LOG_EPS)


class MultinomTopicDecoder(nn.Module):
    """Multinomial topic decoder with optional NB-Fisher per-gene
    weights (`decoder/topic.rs:13-118`)."""

    n_features: int
    n_topics: int

    def setup(self):
        self.dictionary = _SoftmaxDictionary(self.n_features, self.n_topics)

    def __call__(
        self,
        log_z_nk: jax.Array,
        x_nd: jax.Array,
        feature_weights: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        log_recon = _forward_log(log_z_nk, self.dictionary())
        wx = x_nd if feature_weights is None else x_nd * feature_weights
        llik = jnp.sum(wx * log_recon, axis=-1)  # topic.rs:87-104
        return jnp.exp(log_recon), llik

    def get_dictionary(self) -> jax.Array:
        """log beta as [D, K] (`weight_dk`, nn/linear.rs:179-183)."""
        return self.dictionary().T


class NbTopicDecoder(nn.Module):
    """NB topic decoder: mu = libsize * softmax-dict proportions, per-gene
    learned dispersion (`decoder/topic.rs:124-236`)."""

    n_features: int
    n_topics: int

    def setup(self):
        self.dictionary = _SoftmaxDictionary(self.n_features, self.n_topics)

    @nn.compact
    def __call__(
        self,
        log_z_nk: jax.Array,
        x_nd: jax.Array,
        feature_weights: Optional[jax.Array] = None,
    ) -> tuple[jax.Array, jax.Array]:
        log_phi = self.param(
            "log_phi", nn.initializers.constant(0.693), (1, self.n_features)
        )  # ln(2), topic.rs:145
        log_recon = _forward_log(log_z_nk, self.dictionary())
        recon = jnp.exp(log_recon)
        lib = jnp.sum(x_nd, axis=-1, keepdims=True)  # topic.rs:195-196
        mu = recon * lib
        elem = losses.nb_log_likelihood_elem(x_nd, mu, log_phi)
        if feature_weights is not None:  # NB-Fisher per-gene weights
            elem = elem * feature_weights
        return recon, jnp.sum(elem, axis=-1)

    def get_dictionary(self) -> jax.Array:
        return self.dictionary().T


class PoissonTopicDecoder(nn.Module):
    """Poisson decoder: rate = libsize * proportions
    (`decoder/poisson.rs` family; loss.rs:107-118)."""

    n_features: int
    n_topics: int

    def setup(self):
        self.dictionary = _SoftmaxDictionary(self.n_features, self.n_topics)

    def __call__(self, log_z_nk, x_nd, feature_weights=None):
        log_recon = _forward_log(log_z_nk, self.dictionary())
        recon = jnp.exp(log_recon)
        lib = jnp.sum(x_nd, axis=-1, keepdims=True)
        rate = recon * lib + 1e-8
        elem = x_nd * jnp.log(rate) - rate
        if feature_weights is not None:
            elem = elem * feature_weights
        return recon, jnp.sum(elem, axis=-1)

    def get_dictionary(self) -> jax.Array:
        return self.dictionary().T


class NbMixtureTopicDecoder(nn.Module):
    """NB topic decoder with a learned ambient-RNA mixture
    (`decoder/nb_mixture.rs:13-24` generative model):

      theta_n = softmax(z_n); beta = softmax-dict; alpha_d = ambient
      rho_n   = sigmoid(a * log L_n + b)    per-SAMPLE ambient fraction
      pi_nd   = (1 - rho_n) theta beta + rho_n alpha
      y_nd ~ NB(L_n pi_nd, phi_d)

    `rho_a` inits at -0.5, `rho_b` at 0 (nb_mixture.rs:59-62: larger
    cells get smaller rho). Optional weighted Beta(alpha, beta) log
    prior on rho_n adds to the llik (nb_mixture.rs:174-192), exposed on
    the CLI as `--rho-prior-weight/alpha/beta`."""

    n_features: int
    n_topics: int
    rho_prior_weight: float = 0.0
    rho_prior_alpha: float = 2.0
    rho_prior_beta: float = 18.0

    def setup(self):
        self.dictionary = _SoftmaxDictionary(self.n_features, self.n_topics)

    @nn.compact
    def __call__(self, log_z_nk, x_nd, feature_weights=None):
        log_phi = self.param(
            "log_phi", nn.initializers.constant(0.693), (1, self.n_features)
        )
        log_alpha = self.param(
            "log_alpha", nn.initializers.zeros, (1, self.n_features)
        )
        rho_a = self.param("rho_a", nn.initializers.constant(-0.5), (1, 1))
        rho_b = self.param("rho_b", nn.initializers.zeros, (1, 1))
        log_recon = _forward_log(log_z_nk, self.dictionary())
        amb = jax.nn.softmax(log_alpha, axis=-1)
        lib = jnp.sum(x_nd, axis=-1, keepdims=True)
        rho = jax.nn.sigmoid(jnp.log(lib + 1e-8) * rho_a + rho_b)  # [N, 1]
        recon = (1.0 - rho) * jnp.exp(log_recon) + rho * amb
        elem = losses.nb_log_likelihood_elem(x_nd, recon * lib, log_phi)
        if feature_weights is not None:
            elem = elem * feature_weights
        llik = jnp.sum(elem, axis=-1)
        if self.rho_prior_weight > 0.0:
            # log Beta(a,b) prior on rho_n up to its constant normalizer
            eps = 1e-6
            log_prior = (self.rho_prior_alpha - 1.0) * jnp.log(rho + eps) + (
                self.rho_prior_beta - 1.0
            ) * jnp.log(1.0 - rho + eps)
            llik = llik + self.rho_prior_weight * log_prior[:, 0]
        return recon, llik

    def get_dictionary(self) -> jax.Array:
        return self.dictionary().T


class _LinearMap(nn.Module):
    """[K, D] loading matrix + bias; call with z for the affine map,
    with no argument for the raw kernel (dictionary reads)."""

    n_features: int
    n_latent: int

    @nn.compact
    def __call__(self, z_nk=None):
        w = self.param(
            "kernel", nn.initializers.normal(stddev=0.1),
            (self.n_latent, self.n_features),
        )
        if z_nk is None:
            return w
        b = self.param("bias", nn.initializers.zeros, (self.n_features,))
        return z_nk @ w + b


class GaussianNbDecoder(nn.Module):
    """scVI-style gene-axis softmax decoder for a GAUSSIAN latent
    (`decoder/gaussian_nb.rs` role; `senna vae`): proportions =
    softmax(Dense(z)) over genes, mu = libsize * proportions, NB llik
    with per-gene dispersion. `n_topics` names the latent dim so the
    trainer contract matches the topic decoders."""

    n_features: int
    n_topics: int

    def setup(self):
        self.dictionary = _LinearMap(self.n_features, self.n_topics)

    @nn.compact
    def __call__(self, z_nk, x_nd, feature_weights=None):
        log_phi = self.param(
            "log_phi", nn.initializers.constant(0.693), (1, self.n_features)
        )
        log_prop = jax.nn.log_softmax(self.dictionary(z_nk), axis=-1)
        lib = jnp.sum(x_nd, axis=-1, keepdims=True)
        mu = jnp.exp(log_prop) * lib
        elem = losses.nb_log_likelihood_elem(x_nd, mu, log_phi)
        if feature_weights is not None:
            elem = elem * feature_weights
        return jnp.exp(log_prop), jnp.sum(elem, axis=-1)

    def get_dictionary(self) -> jax.Array:
        """[D, K] linear loading matrix (the scVI factor loadings)."""
        return self.dictionary().T


DECODERS = {
    "multinomial": MultinomTopicDecoder,
    "nb": NbTopicDecoder,
    "poisson": PoissonTopicDecoder,
    "nb-mixture": NbMixtureTopicDecoder,
    "gaussian-nb": GaussianNbDecoder,
}


class DeltaTopicDecoder(nn.Module):
    """Shared-base + cumulative chain-delta decoder for modalities on
    the SAME feature axis (`decoder/delta_topic.rs`): modality m's
    dictionary is log_softmax(base + sum_{j<=m} delta_j) with the
    deltas zero-initialized, so modality 1 anchors and later modalities
    learn residual shifts (spliced/unspliced, multi-condition). The
    target is the [N, M*D] concatenation; the llik sums modalities."""

    n_features: int  # per modality
    n_topics: int
    n_modalities: int = 2

    @nn.compact
    def __call__(self, log_z_nk, x_nmd, feature_weights=None):
        base = self.param(
            "base", nn.initializers.normal(stddev=1.0),
            (self.n_topics, self.n_features),
        )
        deltas = [
            self.param(f"delta_{m}", nn.initializers.zeros,
                       (self.n_topics, self.n_features))
            for m in range(1, self.n_modalities)
        ]
        z = jnp.exp(log_z_nk)
        logits = base
        recons, llik = [], 0.0
        for m in range(self.n_modalities):
            if m > 0:
                logits = logits + deltas[m - 1]
            log_beta = jax.nn.log_softmax(logits, axis=-1)
            x_m = x_nmd[:, m * self.n_features : (m + 1) * self.n_features]
            wx = x_m if feature_weights is None else x_m * feature_weights
            log_recon = jnp.log(z @ jnp.exp(log_beta) + _LOG_EPS)
            llik = llik + jnp.sum(wx * log_recon, axis=-1)
            recons.append(jnp.exp(log_recon))
        return jnp.concatenate(recons, axis=-1), llik

    def get_dictionary(self) -> jax.Array:
        """Base-modality log dictionary [D, K]."""
        base = self.get_variable("params", "base")
        return jax.nn.log_softmax(base, axis=-1).T


class BipartiteDecoder(nn.Module):
    """Bipartite block decoder (`decoder/bipartite.rs`): scores
    S = z R F with a learned feature side F [K, D] and block coupling
    R [K, K]; selectable likelihood — 'block' (one softmax over the
    whole matrix), 'symmetric' (row + column softmaxes), or 'poisson'
    (scores are log-rates)."""

    n_features: int
    n_topics: int
    likelihood: str = "block"

    @nn.compact
    def __call__(self, log_z_nk, x_nd, feature_weights=None):
        r = self.param(
            "coupling", nn.initializers.normal(stddev=0.1),
            (self.n_topics, self.n_topics),
        )
        f = self.param(
            "feature", nn.initializers.normal(stddev=0.1),
            (self.n_topics, self.n_features),
        )
        z = jnp.exp(log_z_nk)
        scores = z @ r @ f  # [N, D]
        wx = x_nd if feature_weights is None else x_nd * feature_weights
        if self.likelihood == "block":
            log_p = jax.nn.log_softmax(scores.reshape(scores.shape[0], -1), axis=None)
            llik_total = jnp.sum(wx * log_p.reshape(scores.shape), axis=-1)
        elif self.likelihood == "symmetric":
            llik_total = jnp.sum(
                wx * (jax.nn.log_softmax(scores, axis=0)
                      + jax.nn.log_softmax(scores, axis=1)),
                axis=-1,
            )
        else:  # poisson: scores are log-rates
            rate = jnp.exp(jnp.clip(scores, -20.0, 20.0))
            llik_total = jnp.sum(wx * scores - rate, axis=-1)
        return scores, llik_total

    def get_dictionary(self) -> jax.Array:
        return self.get_variable("params", "feature").T
