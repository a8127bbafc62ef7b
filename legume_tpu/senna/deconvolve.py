"""`senna deconvolve` — hierarchical-Bayes bulk deconvolution
(`senna/src/deconvolve/gibbs.rs:1-23` model):

    eps_{s,g} ~ Gamma(r, r)                       NB overdispersion, mean 1
    y_{s,g}   ~ Poisson(eps_{s,g} sum_m u_{s,m} mu_{g,m})
    Z split   ~ Multinomial(y, p), p_m ~ u_m mu_gm  (eps cancels)
    eps       ~ Gamma(r + tau y, r + tau lam)       conjugate
    u_{s,m}   ~ Gamma(a0 + tau sum_g Z, b0 + tau sum_g eps mu)

`tau` tempers the likelihood (power posterior); `r` fixed. Fractions
map components to cell types through the readout A.

TPU formulation: the multinomial count split never materializes — its
sufficient statistic `sum_g Z_{s,m,g}` is a RAO-BLACKWELLIZED
expectation-free draw in the reference; here we sample it directly as
the Gamma-conjugate form needs only `sum_g Z`, drawn as a Poisson
thinning in expectation. We use the collapsed exact form:
E[Z_m | y] = y * u_m mu_gm / lam, and sample the Gamma with that mean
(a standard blocked approximation, exact as counts grow). Chains over
ALL bulk samples step in lockstep — one jitted sweep.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.mcmc import ess as ess_diag
from ..ops.mcmc import split_rhat

ABUNDANCE_FLOOR = 1e-12  # gibbs.rs:41


@dataclass
class DeconvConfig:
    n_sweeps: int = 300
    burn_in: int = 100
    a0: float = 1.0
    b0: float = 1.0
    nb_dispersion: float = 10.0  # r
    count_scale: float = 1.0  # tau
    seed: int = 0


@dataclass
class DeconvResult:
    fractions: np.ndarray  # [S, C] posterior-mean cell-type fractions
    fractions_sd: np.ndarray
    u_mean: np.ndarray  # [S, R]
    rhat: np.ndarray  # [S] worst split-Rhat across components
    ess: np.ndarray


def deconvolve(
    y_sg: np.ndarray,  # [S, D] bulk counts
    mu_gm: np.ndarray,  # [D, R] reference component rates
    readout_mc: np.ndarray | None = None,  # [R, C] component -> cell type
    config: DeconvConfig | None = None,
) -> DeconvResult:
    cfg = config or DeconvConfig()
    s, d = y_sg.shape
    r_comp = mu_gm.shape[1]
    a_read = (
        np.eye(r_comp, dtype=np.float32) if readout_mc is None else np.asarray(readout_mc, np.float32)
    )
    c = a_read.shape[1]

    y = jnp.asarray(y_sg, jnp.float32)
    mu = jnp.asarray(mu_gm, jnp.float32)
    tau = cfg.count_scale
    r_nb = cfg.nb_dispersion

    @jax.jit
    def sweep(key, u_sm, eps_sg):
        k1, k2, k3 = jax.random.split(key, 3)
        lam = jnp.maximum(u_sm @ mu.T, 1e-12)  # [S, D]
        # EXACT multinomial count split (gibbs.rs:148 binomial chain):
        # Z_{s,.,g} ~ Multinomial(y_sg, p), p_m = u_m mu_gm / lam; the
        # conjugate update needs only sum_g Z, but the split itself is
        # sampled exactly — component m draws Binomial(n_rem,
        # p_m / p_rem) per (s, g), scanned over components
        p_smg = u_sm[:, None, :] * mu[None, :, :] / lam[:, :, None]  # [S, D, R]

        def split_comp(carry, inp):
            n_rem, p_rem = carry
            p_m, km = inp
            frac = jnp.clip(p_m / jnp.maximum(p_rem, 1e-12), 0.0, 1.0)
            z_m = jax.random.binomial(km, n_rem, frac)
            return (n_rem - z_m, p_rem - p_m), z_m.sum(axis=1)  # [S]

        keys_m = jax.random.split(k1, r_comp - 1) if r_comp > 1 else k1[None]
        (n_last, _), z_head = jax.lax.scan(
            split_comp,
            (y, jnp.ones_like(y)),
            (jnp.moveaxis(p_smg, 2, 0)[: r_comp - 1], keys_m[: r_comp - 1]),
        )
        z_sm = jnp.concatenate(
            [z_head.T, n_last.sum(axis=1)[:, None]], axis=1
        )  # [S, R]
        # eps | rest ~ Gamma(r + tau y, r + tau lam) per gene
        eps_a = r_nb + tau * y
        eps_b = r_nb + tau * lam
        eps_sg = jax.random.gamma(k2, eps_a) / eps_b
        # u | rest ~ Gamma(a0 + tau sum_g Z, b0 + tau sum_g eps mu):
        # tau tempers the SUFFICIENT STATISTICS (power posterior,
        # gibbs.rs:207), so posterior variance scales as 1/tau
        u_b = cfg.b0 + tau * (eps_sg @ mu)
        u_a = cfg.a0 + tau * z_sm
        u_sm = jnp.maximum(jax.random.gamma(k3, u_a) / u_b, ABUNDANCE_FLOOR)
        return u_sm, eps_sg

    key = jax.random.key(cfg.seed)
    k_init, key = jax.random.split(key)
    u = jax.random.gamma(k_init, jnp.full((s, r_comp), cfg.a0)) / cfg.b0
    eps = jnp.ones((s, d))

    # whole chain in ONE dispatch (scan over sweeps; per-sweep python
    # dispatches cost ~seconds over a tunneled device)
    @jax.jit
    def run_chain(key, u, eps):
        def body(carry, k):
            u, eps = carry
            u, eps = sweep(k, u, eps)
            return (u, eps), u

        keys = jax.random.split(key, cfg.n_sweeps)
        _, all_u = jax.lax.scan(body, (u, eps), keys)
        return all_u

    key, k_c = jax.random.split(key)
    u_draws = np.asarray(run_chain(k_c, u, eps))[cfg.burn_in :]  # [T, S, R]
    a_j = np.asarray(a_read)
    frac_draws = (u_draws @ a_j) / np.maximum(
        u_draws.sum(-1, keepdims=True), 1e-30
    )  # [T, S, C]

    rhat = np.zeros(s)
    ess_v = np.zeros(s)
    for si in range(s):
        worst_r, worst_e = 1.0, np.inf
        for m in range(min(r_comp, 10)):
            x = u_draws[:, si, m]
            worst_r = max(worst_r, split_rhat(x))
            worst_e = min(worst_e, ess_diag(x))
        rhat[si] = worst_r
        ess_v[si] = worst_e

    return DeconvResult(
        fractions=frac_draws.mean(0),
        fractions_sd=frac_draws.std(0),
        u_mean=u_draws.mean(0),
        rhat=rhat,
        ess=ess_v,
    )
