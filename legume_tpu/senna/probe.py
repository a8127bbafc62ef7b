"""`senna probe` — read-only drift probe for a trained model
(`senna/src/probe.rs`).

Per-cell fit = predictive log-likelihood / count (depth-invariant)
under the FROZEN model; an in-distribution `--calibration` backend
sets the null, query cells below its lower `alpha` tail are flagged,
and a one-sided binomial test yields the batch covered/novel verdict
(the CAMLU reconstruction-null strategy, probe.rs:1-16).

`--counterfactual` (probe.rs:96-117) estimates first-order
benefit/forgetting WITHOUT training: split calibration and query cells
into fit/eval halves, build the pull direction
g = grad_dict(query_fit) - grad_dict(calib_fit) on the frozen
dictionary, and read the directional derivative of held-out fit along
g: `benefit` = fit gained on held-out query, `forgetting` = fit lost
on held-out calibration. Four gradients and four forwards — no
optimizer, so no step count or learning rate enters the answer; it
reports magnitudes and NO verdict on that axis (the reference removed
the quadrant rule as kappa-fragile)."""

from __future__ import annotations

import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


@dataclass
class ModelProbeResult:
    verdict: str  # covered | novel
    flag_rate: float
    binom_p: float
    threshold: float
    q_fit: np.ndarray  # [N_query]
    cal_fit: np.ndarray
    counterfactual: dict | None = None


def _dense_fit_scores(vec, encoder, variables, remap, log_dict, *, block_size=2048):
    """Per-cell multinomial fit llik/count under the frozen dictionary
    (probe.rs per_cell_fit): theta from the encoder at eval, scored on
    the training gene axis. Counts densify one `block_size` slab at a
    time — only [B, D_train] lives at once, never [N, D_train]."""
    from .predict import score_dense_backend

    z = score_dense_backend(
        vec, encoder, variables, remap, block_size=block_size
    )  # [N, K] log proportions
    n = vec.num_columns
    fit = np.zeros(n, np.float32)
    dict_t = np.exp(log_dict.T)  # [K, D_train]
    for lo in range(0, n, block_size):
        idx = np.arange(lo, min(lo + block_size, n))
        x = _dense_counts(vec, remap, idx)  # [B, D_train]
        log_recon = np.log(np.exp(z[idx]) @ dict_t + 1e-30)
        llik = (x * log_recon).sum(1)
        tot = x.sum(1)
        fit[idx] = np.where(tot > 0, llik / np.maximum(tot, 1.0), 0.0)
    return fit, z


def _dense_counts(vec, remap, idx=None) -> np.ndarray:
    """[len(idx), D_train] counts scattered onto the training gene axis."""
    import scipy.sparse as sp

    if idx is None:
        idx = np.arange(vec.num_columns)
    csc = vec.read_columns_csc(np.asarray(idx))
    row_map = np.where(remap.new_to_train >= 0, remap.new_to_train, remap.d_train)
    mapped = row_map[csc.tocoo().row]
    coo = csc.tocoo()
    keep = mapped < remap.d_train
    out = sp.coo_matrix(
        (coo.data[keep], (coo.col[keep], mapped[keep])),
        shape=(len(idx), remap.d_train),
    ).toarray()
    return np.asarray(out, np.float32)


def probe_model(
    model_prefix: str,
    query_files,
    calibration_file: str,
    *,
    alpha: float = 0.05,
    block_size: int = 2048,
    counterfactual: bool = False,
    cf_seed: int = 42,
) -> ModelProbeResult:
    from scipy.stats import binomtest

    from ..models.encoders import LogSoftmaxEncoder
    from .predict import _load_log_dictionary, build_gene_remap
    from .topic import load_data_vec, load_model

    meta, variables, train_genes = load_model(model_prefix)
    variables = jax.tree.map(jnp.asarray, variables)
    encoder = LogSoftmaxEncoder(
        n_topics=meta["n_topics"], layers=tuple(meta["encoder_layers"])
    )
    log_dict = _load_log_dictionary(model_prefix, train_genes)

    qvec = load_data_vec(list(query_files))
    cvec = load_data_vec([calibration_file])
    q_remap = build_gene_remap(train_genes, qvec.row_names())
    c_remap = build_gene_remap(train_genes, cvec.row_names())

    q_fit, q_z = _dense_fit_scores(
        qvec, encoder, variables, q_remap, log_dict, block_size=block_size
    )
    cal_fit, c_z = _dense_fit_scores(
        cvec, encoder, variables, c_remap, log_dict, block_size=block_size
    )

    # null lower tail -> flag -> one-sided binomial batch test
    thr = float(np.quantile(cal_fit, alpha))
    flagged = q_fit < thr
    rate = float(flagged.mean()) if len(q_fit) else 0.0
    test = binomtest(int(flagged.sum()), max(len(q_fit), 1), alpha, "greater")
    verdict = "novel" if test.pvalue < 0.01 else "covered"
    log.info(
        "probe: %d/%d query cells below the %.0f%% null tail (p=%.2e) -> %s",
        int(flagged.sum()), len(q_fit), 100 * alpha, test.pvalue, verdict,
    )

    cf = None
    if counterfactual:
        cf = _counterfactual(
            q_z, qvec, q_remap, c_z, cvec, c_remap, log_dict, seed=cf_seed
        )
    return ModelProbeResult(
        verdict=verdict,
        flag_rate=rate,
        binom_p=float(test.pvalue),
        threshold=thr,
        q_fit=q_fit,
        cal_fit=cal_fit,
        counterfactual=cf,
    )


def _counterfactual(
    q_z, qvec, q_remap, c_z, cvec, c_remap, log_dict,
    *, seed: int, max_cells_per_half: int = 4096,
) -> dict:
    """First-order benefit/forgetting (counterfactual.rs via
    probe.rs:96-117): fit halves build the pull direction
    g = grad(query) - grad(calib) on the dictionary logits; eval halves
    read the directional derivative of per-cell fit along g. Each half
    is subsampled to `max_cells_per_half` so only four bounded
    [<=cap, D_train] slabs densify, never the full backends."""
    rng = np.random.default_rng(seed)

    def halves(n):
        perm = rng.permutation(n)
        a, b = perm[: n // 2], perm[n // 2 :]
        return a[:max_cells_per_half], b[:max_cells_per_half]

    qf, qe = halves(len(q_z))
    cf_, ce = halves(len(c_z))
    q_x = {"fit": _dense_counts(qvec, q_remap, qf),
           "eval": _dense_counts(qvec, q_remap, qe)}
    c_x = {"fit": _dense_counts(cvec, c_remap, cf_),
           "eval": _dense_counts(cvec, c_remap, ce)}

    ld = jnp.asarray(log_dict)  # [D, K]

    def total_fit(log_dict_dk, z, x):
        log_recon = jnp.log(
            jnp.exp(jnp.asarray(z)) @ jnp.exp(log_dict_dk).T + 1e-30
        )
        tot = jnp.maximum(jnp.asarray(x).sum(1), 1.0)
        return ((jnp.asarray(x) * log_recon).sum(1) / tot).mean()

    g_q = jax.grad(total_fit)(ld, q_z[qf], q_x["fit"])
    g_c = jax.grad(total_fit)(ld, c_z[cf_], c_x["fit"])
    g = g_q - g_c
    pull = float(jnp.linalg.norm(g))
    g_unit = g / jnp.maximum(pull, 1e-30)

    def dir_stats(z, x):
        per_cell = jax.jacfwd(
            lambda t: _percell_fit_vec(ld + t * g_unit, z, x)
        )(0.0)
        per_cell = np.asarray(per_cell)
        se = float(per_cell.std() / np.sqrt(max(len(per_cell), 1)))
        return float(per_cell.mean()), se

    def _percell_fit_vec(log_dict_dk, z, x):
        log_recon = jnp.log(
            jnp.exp(jnp.asarray(z)) @ jnp.exp(log_dict_dk).T + 1e-30
        )
        tot = jnp.maximum(jnp.asarray(x).sum(1), 1.0)
        return (jnp.asarray(x) * log_recon).sum(1) / tot

    benefit, b_se = dir_stats(q_z[qe], q_x["eval"])
    forget_gain, f_se = dir_stats(c_z[ce], c_x["eval"])
    forgetting = -forget_gain  # fit LOST on the reference along g
    per_topic = np.asarray(jnp.linalg.norm(g, axis=0))
    log.info(
        "counterfactual: benefit=%+.4e (SE %.3e)  forgetting=%+.4e (SE %.3e)  ||g||=%.4e",
        benefit, b_se, forgetting, f_se, pull,
    )
    return {
        "benefit": benefit,
        "benefit_se": b_se,
        "forgetting": forgetting,
        "forgetting_se": f_se,
        "pull_norm": pull,
        "pull_norm_per_topic": per_topic.tolist(),
        "n_fit_query": int(len(qf)),
        "n_fit_calib": int(len(cf_)),
        "n_eval_query": int(len(qe)),
        "n_eval_calib": int(len(ce)),
    }
