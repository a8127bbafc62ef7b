"""Encoder modules (candle-util `encoder/` equivalent).

Contract parity with `EncoderModuleT::forward_t(x, x0, train) ->
(log_z, kl)` (`traits/model.rs:9-27`). Flax linen modules; the
reparameterization key rides the `"reparam"` RNG collection and batch
norm running stats ride the `"batch_stats"` mutable collection.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.transforms import anscombe_residual
from . import losses

CLAMP = 8.0  # nn/soft_clamp.rs MASKED_LOGIT_CLAMP


def soft_clamp(x, c: float = CLAMP):
    """Bound to (-c, c) WITHOUT killing the gradient: c*tanh(x/c)
    (nn/soft_clamp.rs). A hard clip has exactly zero gradient outside
    its range; the reference measured 99.6% of cells pinned at +8 with
    the encoder frozen while the llik trace kept improving — the soft
    bound keeps edge units recoverable."""
    return c * jnp.tanh(x / c)


class _GaussianTrunk(nn.Module):
    """Shared MLP trunk: Anscombe residual -> ReLU stack (every layer
    ReLU-activated, `nn/layers.rs:177-202`) -> BatchNorm (eps 1e-4,
    torch-momentum 0.1 == flax 0.9, `batch_norm.rs:29-37`) -> clamped
    Gaussian heads (`encoder/softmax.rs:55-78`)."""

    n_latent: int
    layers: Sequence[int]

    def setup(self):
        self.fc = [nn.Dense(dim, name=f"fc{i}") for i, dim in enumerate(self.layers)]
        self.bn_z = nn.BatchNorm(momentum=0.9, epsilon=1e-4, name="bn_z")
        self.z_mean = nn.Dense(self.n_latent, name="z_mean")
        self.z_lnvar = nn.Dense(self.n_latent, name="z_lnvar")

    def __call__(self, x_nd, x0_nd, feature_mean, *, train: bool):
        h = anscombe_residual(x_nd, x0_nd, feature_mean)
        for layer in self.fc:
            h = nn.relu(layer(h))
        h = self.bn_z(h, use_running_average=not train)
        mean = soft_clamp(self.z_mean(h))
        lnvar = soft_clamp(self.z_lnvar(h))
        return mean, lnvar


class LogSoftmaxEncoder(nn.Module):
    """Dense softmax-simplex encoder (`encoder/softmax.rs:9-127`):
    Gaussian trunk -> reparameterize -> log_softmax simplex + KL."""

    n_topics: int
    layers: Sequence[int]

    def setup(self):
        self.trunk = _GaussianTrunk(self.n_topics, self.layers)

    def __call__(
        self,
        x_nd: jax.Array,
        x0_nd: Optional[jax.Array] = None,
        feature_mean: Optional[jax.Array] = None,
        *,
        train: bool,
    ) -> tuple[jax.Array, jax.Array]:
        z_mean, z_lnvar = self.trunk(x_nd, x0_nd, feature_mean, train=train)
        if train:
            z = losses.gaussian_reparameterize(
                self.make_rng("reparam"), z_mean, z_lnvar, True
            )
        else:
            z = z_mean
        log_prob = jax.nn.log_softmax(z, axis=-1)
        return log_prob, losses.gaussian_kl(z_mean, z_lnvar)

    def latent_gaussian_params(self, x_nd, x0_nd=None, feature_mean=None, *, train: bool = False):
        """`(mu, lnvar)` heads — the `predict`/probe entry point
        (encoder/softmax.rs:55-78)."""
        return self.trunk(x_nd, x0_nd, feature_mean, train=train)


class LogSoftmaxJointEncoder(nn.Module):
    """Multi-modality softmax encoder (`encoder/joint_softmax.rs:8-110`):
    one Gaussian trunk PER modality slice of the concatenated input,
    then the modality latents and KLs SUM — product-of-experts-style
    fusion that keeps a wide modality from drowning a narrow one, with
    per-modality BatchNorm statistics. API-compatible with
    `LogSoftmaxEncoder` on the concatenated [N, sum(D_m)] input."""

    n_topics: int
    layers: Sequence[int]
    n_features: Sequence[int]  # per-modality feature dims, in input order

    def setup(self):
        self.trunks = [
            _GaussianTrunk(self.n_topics, self.layers, name=f"mod{m}")
            for m in range(len(self.n_features))
        ]

    def _slices(self):
        off = 0
        for d in self.n_features:
            yield off, off + d
            off += d

    def _modality_params(self, x_nd, x0_nd, feature_mean, *, train):
        out = []
        for (lo, hi), trunk in zip(self._slices(), self.trunks):
            x0_m = x0_nd[..., lo:hi] if x0_nd is not None else None
            mu_m = feature_mean[..., lo:hi] if feature_mean is not None else None
            out.append(trunk(x_nd[..., lo:hi], x0_m, mu_m, train=train))
        return out

    def __call__(
        self,
        x_nd: jax.Array,
        x0_nd: Optional[jax.Array] = None,
        feature_mean: Optional[jax.Array] = None,
        *,
        train: bool,
    ) -> tuple[jax.Array, jax.Array]:
        params = self._modality_params(x_nd, x0_nd, feature_mean, train=train)
        zs, kls = [], []
        for m, (z_mean, z_lnvar) in enumerate(params):
            if train:
                z = losses.gaussian_reparameterize(
                    self.make_rng("reparam"), z_mean, z_lnvar, True
                )
            else:
                z = z_mean
            zs.append(z)
            kls.append(losses.gaussian_kl(z_mean, z_lnvar))
        z = sum(zs)
        log_prob = jax.nn.log_softmax(z, axis=-1)
        return log_prob, sum(kls)

    def latent_gaussian_params(self, x_nd, x0_nd=None, feature_mean=None, *, train: bool = False):
        params = self._modality_params(x_nd, x0_nd, feature_mean, train=train)
        mean = sum(p[0] for p in params)
        # z is a sum of independent Gaussians: variances add
        lnvar = jax.scipy.special.logsumexp(
            jnp.stack([p[1] for p in params]), axis=0
        )
        return mean, lnvar


class _IafLayer(nn.Module):
    """One inverse-autoregressive-flow step (Kingma et al. 2016):
    masked autoregressive (m, s) nets; z' = sigma * z + (1 - sigma) * m
    with log-det = sum log sigma. The autoregressive constraint comes
    from a lower-triangular mask on a single dense layer (adequate at
    topic-latent widths)."""

    n_latent: int
    hidden: int = 32

    @nn.compact
    def __call__(self, z, h):
        k = self.n_latent
        mask = jnp.tril(jnp.ones((k, k)), -1)
        w_in = self.param("w_ar", nn.initializers.normal(0.05), (k, k))
        ar = z @ (w_in * mask)  # strictly autoregressive in z
        ctx = nn.Dense(k, name="ctx")(h)
        m = nn.Dense(k, name="m")(nn.tanh(ar + ctx))
        s = nn.Dense(k, name="s")(nn.tanh(ar + ctx))
        sigma = jax.nn.sigmoid(s + 2.0)  # bias toward identity at init
        z_new = sigma * z + (1.0 - sigma) * m
        log_det = jnp.sum(jnp.log(sigma + 1e-8), axis=-1)
        return z_new, log_det


class IafSoftmaxEncoder(nn.Module):
    """LogSoftmaxEncoder with an IAF posterior (`encoder/softmax_iaf.rs`):
    richer-than-Gaussian q(z|x); KL estimated as log q(z) - log p(z)
    with the flow's log-det correction."""

    n_topics: int
    layers: Sequence[int]
    n_flows: int = 2

    def setup(self):
        self.trunk = _GaussianTrunk(self.n_topics, self.layers)
        self.flows = [
            _IafLayer(self.n_topics, name=f"iaf{i}") for i in range(self.n_flows)
        ]
        self.h_proj = nn.Dense(self.layers[-1], name="h_proj")

    def __call__(self, x_nd, x0_nd=None, feature_mean=None, *, train: bool):
        z_mean, z_lnvar = self.trunk(x_nd, x0_nd, feature_mean, train=train)
        if train:
            eps = jax.random.normal(self.make_rng("reparam"), z_mean.shape)
        else:
            eps = jnp.zeros_like(z_mean)
        z = z_mean + jnp.exp(0.5 * z_lnvar) * eps
        # log q0(z): base Gaussian density of the draw
        log_q = -0.5 * jnp.sum(eps**2 + z_lnvar + jnp.log(2 * jnp.pi), axis=-1)
        h = self.h_proj(z_mean)  # flow context from the trunk
        for flow in self.flows:
            z, log_det = flow(z, h)
            log_q = log_q - log_det
        # KL(q || N(0, I)) Monte-Carlo estimate
        log_p = -0.5 * jnp.sum(z**2 + jnp.log(2 * jnp.pi), axis=-1)
        kl = log_q - log_p
        return jax.nn.log_softmax(z, axis=-1), kl


class GaussianEncoder(nn.Module):
    """Plain Gaussian-latent encoder (`encoder/gaussian.rs`): same
    trunk, latent returned without the simplex map (scVI-style `vae`)."""

    n_latent: int
    layers: Sequence[int]

    def setup(self):
        self.trunk = _GaussianTrunk(self.n_latent, self.layers)

    def __call__(
        self,
        x_nd: jax.Array,
        x0_nd: Optional[jax.Array] = None,
        feature_mean: Optional[jax.Array] = None,
        *,
        train: bool,
    ) -> tuple[jax.Array, jax.Array]:
        z_mean, z_lnvar = self.trunk(x_nd, x0_nd, feature_mean, train=train)
        if train:
            z = losses.gaussian_reparameterize(
                self.make_rng("reparam"), z_mean, z_lnvar, True
            )
        else:
            z = z_mean
        return z, losses.gaussian_kl(z_mean, z_lnvar)

    def latent_gaussian_params(self, x_nd, x0_nd=None, feature_mean=None, *, train: bool = False):
        return self.trunk(x_nd, x0_nd, feature_mean, train=train)
