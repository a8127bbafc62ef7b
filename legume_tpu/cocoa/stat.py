"""CoCoA sufficient statistics + per-topic Gamma optimization
(`cocoa/src/stat.rs` equivalent).

Model (stat.rs:135-181): per topic k,

    shared     mu(d,p)   = (y1 + y0) / (sum_i tau(d,i) n(i,p) + gamma(d,p) n(p))
    matched    gamma(d,p) = y0 / (mu(d,p) n(p))
    exposure   tau(d,i)  = y1(d,i) / (sum_p mu(d,p) n(i,p))

All updates are elementwise/matmul per topic, so the whole fit is one
jitted `fori_loop` vmapped over topics. Exposure contrast
(stat.rs:200-230): mean log tau difference between exposure groups,
averaged over topics.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gamma import GammaParam, digamma


@dataclass
class CocoaStat:
    """[K, D, P] / [K, D, I] sufficient-stat planes (stat.rs:9-19)."""

    y1_sum_kdp: np.ndarray  # topic x gene x pseudobulk
    y0_sum_kdp: np.ndarray
    size_kp: np.ndarray  # topic x pseudobulk
    y1_sum_kdi: np.ndarray  # topic x gene x individual
    size_kip: np.ndarray  # topic x individual x pseudobulk

    @classmethod
    def zeros(cls, n_topics, n_genes, n_indv, n_samples):
        return cls(
            y1_sum_kdp=np.zeros((n_topics, n_genes, n_samples), np.float32),
            y0_sum_kdp=np.zeros((n_topics, n_genes, n_samples), np.float32),
            size_kp=np.zeros((n_topics, n_samples), np.float32),
            y1_sum_kdi=np.zeros((n_topics, n_genes, n_indv), np.float32),
            size_kip=np.zeros((n_topics, n_indv, n_samples), np.float32),
        )

    def apply_gene_weights(self, w: np.ndarray):
        """Row-scale y1/y0/y1_di by NB-Fisher weights
        (collapse_cocoa_data.rs:75-84)."""
        w = np.asarray(w, np.float32)[None, :, None]
        # out-of-place: the planes may be read-only device views
        self.y1_sum_kdp = self.y1_sum_kdp * w
        self.y0_sum_kdp = self.y0_sum_kdp * w
        self.y1_sum_kdi = self.y1_sum_kdi * w


@dataclass
class CocoaGammaOut:
    shared: GammaParam  # [K, D, P]
    residual: GammaParam  # [K, D, P]
    exposure: GammaParam  # [K, D, I]


@partial(jax.jit, static_argnames=("n_opt_iter",))
def _optimize_topics(
    y1_kdp, y0_kdp, size_kp, y1_kdi, size_kip, *, n_opt_iter: int, a0=1.0, b0=1.0
):
    """vmapped coordinate descent over topics (stat.rs:115-194)."""

    def one_topic(y1_dp, y0_dp, size_p, y1_di, size_ip):
        y10_dp = y1_dp + y0_dp

        def body(_, carry):
            gamma_mean, tau_mean, _mu_b, _g_b, _t_b = carry
            # mu = (y1+y0) / (tau @ n_ip + gamma * n_p)
            mu_b = b0 + gamma_mean * size_p[None, :] + tau_mean @ size_ip
            mu_mean = (a0 + y10_dp) / mu_b
            # gamma = y0 / (mu * n_p)
            g_b = b0 + mu_mean * size_p[None, :]
            gamma_mean = (a0 + y0_dp) / g_b
            # tau = y1_di / (mu @ n_ip^T)
            t_b = b0 + mu_mean @ size_ip.T
            tau_mean = (a0 + y1_di) / t_b
            return (gamma_mean, tau_mean, mu_b, g_b, t_b)

        zero_dp = jnp.zeros_like(y1_dp)
        zero_di = jnp.zeros_like(y1_di)
        one_dp = jnp.ones_like(y1_dp)
        one_di = jnp.ones_like(y1_di)
        gamma_mean, tau_mean, mu_b, g_b, t_b = jax.lax.fori_loop(
            0, n_opt_iter, body, (zero_dp, zero_di, one_dp, one_dp, one_di)
        )
        return (
            (a0 + y10_dp, mu_b),
            (a0 + y0_dp, g_b),
            (a0 + y1_di, t_b),
        )

    return jax.vmap(one_topic)(y1_kdp, y0_kdp, size_kp, y1_kdi, size_kip)


def estimate_parameters(
    stat: CocoaStat, *, n_opt_iter: int = 100, a0: float = 1.0, b0: float = 1.0
) -> CocoaGammaOut:
    (mu_a, mu_b), (g_a, g_b), (t_a, t_b) = _optimize_topics(
        jnp.asarray(stat.y1_sum_kdp),
        jnp.asarray(stat.y0_sum_kdp),
        jnp.asarray(stat.size_kp),
        jnp.asarray(stat.y1_sum_kdi),
        jnp.asarray(stat.size_kip),
        n_opt_iter=n_opt_iter,
        a0=a0,
        b0=b0,
    )
    return CocoaGammaOut(
        shared=GammaParam(a=mu_a, b=mu_b, a0=a0, b0=b0),
        residual=GammaParam(a=g_a, b=g_b, a0=a0, b0=b0),
        exposure=GammaParam(a=t_a, b=t_b, a0=a0, b0=b0),
    )


def compute_exposure_contrast(
    out: CocoaGammaOut, exposure_assignment: np.ndarray
) -> np.ndarray:
    """Per-gene signed log contrast mean(log tau | x=1) - mean(log tau | x=0),
    averaged over topics (stat.rs:200-230)."""
    tau_log = np.asarray(digamma(out.exposure.a) - jnp.log(out.exposure.b))  # [K, D, I]
    x = np.asarray(exposure_assignment)
    m1 = tau_log[:, :, x == 1].mean(axis=2)
    m0 = tau_log[:, :, x == 0].mean(axis=2)
    return (m1 - m0).mean(axis=0)  # [D]


def z_to_pvalue(z: np.ndarray) -> np.ndarray:
    """Two-sided normal p-value (stat.rs:233-237)."""
    from scipy.special import erfc

    return erfc(np.abs(z) / np.sqrt(2.0))


def remove_exposure_effect_from_topic_proportions(
    cell_topic_nk: np.ndarray,
    cell_to_individual: np.ndarray,
    individual_exposure: np.ndarray,
    covariates: np.ndarray | None = None,  # [I, C] known individual covariates
) -> tuple[np.ndarray, np.ndarray]:
    """Residual collider adjustment (Hartwig 2023; stat.rs:361-412):
    scale each cell's topic proportions by exp(-(group mean - grand
    mean)) of per-individual mean log proportions. With `covariates`
    (run_diff.rs --covariate-file), the removed shift is the OLS-fitted
    part of the per-individual logits on [1, exposure, V] minus the
    intercept, so known confounders leave through the same gate.
    Returns (adjusted proportions, per-topic max |shift|)."""
    z = np.asarray(cell_topic_nk, np.float64)
    c2i = np.asarray(cell_to_individual)
    n_indv = len(individual_exposure)
    log_z = np.log(np.maximum(z, 1e-30))

    # per-individual mean log-proportions
    sums = np.zeros((n_indv, z.shape[1]))
    counts = np.zeros(n_indv)
    ok = c2i < n_indv
    np.add.at(sums, c2i[ok], log_z[ok])
    np.add.at(counts, c2i[ok], 1.0)
    indv_logits = sums / np.maximum(counts[:, None], 1.0)

    groups = np.asarray(individual_exposure)
    out = z.copy()
    if covariates is not None:
        v = np.asarray(covariates, np.float64)
        if v.ndim == 1:
            v = v[:, None]
        design = np.column_stack(
            [np.ones(n_indv), groups.astype(np.float64), v]
        )
        beta, *_ = np.linalg.lstsq(design, indv_logits, rcond=None)
        shift_i = design[:, 1:] @ beta[1:]  # [I, K] fitted minus intercept
        shift_i = shift_i - shift_i.mean(axis=0, keepdims=True)
        out[ok] *= np.exp(-shift_i)[c2i[ok]]
        return out.astype(np.float32), np.abs(shift_i).max(axis=0)

    n_groups = groups.max() + 1
    group_means = np.stack(
        [indv_logits[groups == g].mean(axis=0) for g in range(n_groups)]
    )
    grand_mean = indv_logits.mean(axis=0, keepdims=True)
    shift = group_means - grand_mean  # [G, K]
    scale = np.exp(-shift)

    out[ok] *= scale[groups[c2i[ok]]]
    return out.astype(np.float32), np.abs(shift).max(axis=0)
