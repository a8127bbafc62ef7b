"""Standalone sparse spike-slab regression MCMC
(`mcmc-util/src/sparse_regression/{prior,regression,sampler}.rs`
equivalent).

Blackbox design matching the reference: the combined effect is

    theta = sum_c alpha_c (.) effect_c,   alpha_c = sigmoid(incl_c)

with Gaussian latents `incl_c` (soft inclusion weights) and `effect_c`
(slab values) per component, both updated by elliptical-slice steps
against a BLACKBOX log-likelihood of theta — here the Gaussian
regression lnpdf, but any callable works, exactly the reference's
`F: Fn(&Theta) -> f32` contract.

TPU formulation: components stack into one [C, 2, P] state and every
chain transition is one batched ESS step (`ops.mcmc.run_ess_chains`);
PIP and posterior means read off the retained draws.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .mcmc import ess as ess_diag
from .mcmc import run_ess_chains, split_rhat


@dataclass
class SparseRegressionResult:
    pip: np.ndarray  # [P] posterior inclusion probability
    beta_mean: np.ndarray  # [P] posterior mean combined effect
    theta_draws: np.ndarray  # [S, P]
    rhat: float
    ess: float


def fit_sparse_regression_mcmc(
    x: np.ndarray,  # [n, P] design
    y: np.ndarray,  # [n]
    *,
    num_components: int = 5,
    num_samples: int = 400,
    burn_in: int = 200,
    incl_scale: float = 2.0,
    effect_scale: float = 1.0,
    noise_sd: float | None = None,
    lnpdf=None,
    seed: int = 0,
) -> SparseRegressionResult:
    """Gibbs-free blackbox sampler: one ESS chain over the stacked
    (inclusion-latent, effect) state (sampler.rs SparseModel)."""
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32).ravel()
    n, p = x.shape
    c = num_components
    if noise_sd is None:
        noise_sd = float(max(np.std(y), 1e-3))
    xj, yj = jnp.asarray(x), jnp.asarray(y)

    def theta_of(state):  # [1, C*2*P] -> [P]
        s = state.reshape(c, 2, p)
        alpha = jax.nn.sigmoid(incl_scale * s[:, 0, :])
        return jnp.sum(alpha * effect_scale * s[:, 1, :], axis=0)

    if lnpdf is None:
        def lnpdf(theta):
            r = yj - xj @ theta
            return -0.5 * jnp.sum(r * r) / (noise_sd**2)

    def chain_lnpdf(flat_state):  # [B, C*2*P] -> [B]
        return jax.vmap(lambda s: lnpdf(theta_of(s)))(flat_state)

    key = jax.random.key(seed)
    init = jnp.zeros((1, c * 2 * p))
    samples, _ = run_ess_chains(
        key, init,
        prior_draw=lambda k, s: jax.random.normal(k, s),
        lnpdf=chain_lnpdf,
        num_samples=num_samples,
        burn_in=burn_in,
    )
    draws = np.asarray(samples)[:, 0, :].reshape(num_samples, c, 2, p)
    alphas = 1.0 / (1.0 + np.exp(-incl_scale * draws[:, :, 0, :]))
    thetas = (alphas * effect_scale * draws[:, :, 1, :]).sum(axis=1)  # [S, P]
    # PIP: the soft-inclusion model has no discrete z, so inclusion is
    # read from the COMBINED effect (compute_pip role): a variable is
    # "in" on a draw when its |theta_j| exceeds a small fraction of the
    # slab scale — the likelihood pins null coordinates near zero, so
    # the indicator separates cleanly. Boundary-guarded like the
    # reference's .max(1e-15).
    pip = np.clip(
        (np.abs(thetas) > 0.1 * effect_scale).mean(axis=0), 1e-15, 1 - 1e-15
    )
    scalar = thetas[:, np.argmax(np.abs(thetas).mean(0))]
    return SparseRegressionResult(
        pip=pip,
        beta_mean=thetas.mean(0),
        theta_draws=thetas,
        rhat=float(split_rhat(scalar)),
        ess=float(ess_diag(scalar)),
    )
