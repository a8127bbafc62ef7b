"""MCMC engine: batched elliptical slice sampling + chain diagnostics
(mcmc-util equivalent; `mcmc-util/src/engine/elliptical_slice.rs`,
`diagnostics.rs`; device-batched variant parity with
`candle-util/src/mcmc.rs:20-186`).

TPU-native design: the reference runs one ESS bracket-shrinkage loop
per chain on rayon threads. Here a whole BATCH of independent chains
steps in lockstep inside one `lax.while_loop` — each chain owns its
ellipse angle/bracket, chains that have already accepted freeze while
the rest shrink (the conditional-independence structure the reference
exploits per-anchor, `graph-embedding-util/posterior/mod.rs:5-9`).
The likelihood evaluates as one batched call per shrink iteration —
MXU-sized work instead of per-chain scalar loops.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

MAX_BRACKET_ITERS = 64  # elliptical_slice.rs:16
BRACKET_MIN_WIDTH = 1e-6  # elliptical_slice.rs:21


def elliptical_slice_step_batched(
    key: jax.Array,
    current: jax.Array,  # [B, D] current states
    prior_sample: jax.Array,  # [B, D] nu ~ N(0, Sigma) draws
    lnpdf: Callable[[jax.Array], jax.Array],  # [B, D] -> [B]
    cur_lnpdf: jax.Array,  # [B]
) -> tuple[jax.Array, jax.Array]:
    """One ESS transition for B independent chains (Murray et al. 2010;
    elliptical_slice.rs:29-78). Chains accept independently; the loop
    runs until all accept or the bracket cap (falls back to current)."""
    k_u, k_phi, k_loop = jax.random.split(key, 3)
    b = current.shape[0]
    hh = jnp.log(jax.random.uniform(k_u, (b,))) + cur_lnpdf
    phi = jax.random.uniform(k_phi, (b,), minval=0.0, maxval=2.0 * jnp.pi)

    state = {
        "angle": phi,
        "phi_min": phi - 2.0 * jnp.pi,
        "phi_max": phi,
        "out": current,
        "out_lnpdf": cur_lnpdf,
        "accepted": jnp.zeros(b, bool),
        "key": k_loop,
        "iter": jnp.asarray(0),
    }

    def cond(s):
        return jnp.logical_and(~jnp.all(s["accepted"]), s["iter"] < MAX_BRACKET_ITERS)

    def body(s):
        ang = s["angle"][:, None]
        proposal = current * jnp.cos(ang) + prior_sample * jnp.sin(ang)
        new_lnpdf = lnpdf(proposal)
        accept_now = jnp.logical_and(~s["accepted"], new_lnpdf > hh)

        out = jnp.where(accept_now[:, None], proposal, s["out"])
        out_lnpdf = jnp.where(accept_now, new_lnpdf, s["out_lnpdf"])
        accepted = jnp.logical_or(s["accepted"], accept_now)

        # shrink brackets for still-running chains
        neg = s["angle"] < 0.0
        phi_min = jnp.where(~accepted & neg, s["angle"], s["phi_min"])
        phi_max = jnp.where(~accepted & ~neg, s["angle"], s["phi_max"])
        width_ok = (phi_max - phi_min) >= BRACKET_MIN_WIDTH
        # width collapse -> freeze at current (counts as accepted-fallback)
        accepted = jnp.logical_or(accepted, ~width_ok)

        key, k_next = jax.random.split(s["key"])
        u = jax.random.uniform(k_next, (b,))
        angle = phi_min + u * (phi_max - phi_min)
        return {
            "angle": angle,
            "phi_min": phi_min,
            "phi_max": phi_max,
            "out": out,
            "out_lnpdf": out_lnpdf,
            "accepted": accepted,
            "key": key,
            "iter": s["iter"] + 1,
        }

    final = jax.lax.while_loop(cond, body, state)
    return final["out"], final["out_lnpdf"]


def run_ess_chains(
    key: jax.Array,
    init: jax.Array,  # [B, D]
    prior_draw: Callable[[jax.Array, tuple], jax.Array],  # key, shape -> [B, D]
    lnpdf: Callable[[jax.Array], jax.Array],
    *,
    num_samples: int,
    burn_in: int = 0,
    thin: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Chain runner (engine/chain.rs + runner.rs equivalent): returns
    (samples [num_samples, B, D], lnpdfs [num_samples, B]) after
    burn-in/thinning, all inside one jitted scan."""
    total = burn_in + num_samples * thin

    def step(carry, k):
        cur, cur_ln = carry
        k1, k2 = jax.random.split(k)
        nu = prior_draw(k1, cur.shape)
        new, new_ln = elliptical_slice_step_batched(k2, cur, nu, lnpdf, cur_ln)
        return (new, new_ln), (new, new_ln)

    keys = jax.random.split(key, total)
    (_, _), (all_s, all_ln) = jax.lax.scan(step, (init, lnpdf(init)), keys)
    sel = burn_in + thin * jnp.arange(num_samples) + (thin - 1)
    return all_s[sel], all_ln[sel]


# ----------------------------------------------------------------------------
# diagnostics (engine/diagnostics.rs)
# ----------------------------------------------------------------------------


def ess(x: np.ndarray) -> float:
    """Effective sample size via initial positive sequence of
    autocorrelations (diagnostics.rs:36)."""
    x = np.asarray(x, np.float64)
    n = len(x)
    if n < 4:
        return float(n)
    x = x - x.mean()
    var = (x * x).mean()
    if var <= 0:
        return float(n)
    acf = np.correlate(x, x, mode="full")[n - 1 :] / (var * n)
    # Geyer initial monotone positive sequence on pair sums
    pair = acf[1:-1:2] + acf[2::2]
    s = 0.0
    prev = np.inf
    for p in pair:
        if p < 0:
            break
        p = min(p, prev)
        prev = p
        s += p
    return float(n / (1.0 + 2.0 * s))


def split_rhat(x: np.ndarray) -> float:
    """Split-R-hat of one chain (diagnostics.rs:93): split in half,
    between/within variance ratio."""
    x = np.asarray(x, np.float64)
    n = len(x) // 2
    if n < 2:
        return 1.0
    halves = np.stack([x[:n], x[n : 2 * n]])
    w = halves.var(axis=1, ddof=1).mean()
    b = n * halves.mean(axis=1).var(ddof=1)
    if w <= 0:
        return 1.0
    return float(np.sqrt((w * (n - 1) / n + b / n) / w))


def mcse_proportion(p: float, ess_val: float) -> float:
    """Monte-Carlo SE of a proportion estimate (diagnostics.rs:164)."""
    return float(np.sqrt(max(p * (1.0 - p), 0.0) / max(ess_val, 1.0)))
