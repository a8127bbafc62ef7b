"""Synthetic count generators (data-beans-sim equivalent).

The fixture generator every parity test rides on (SURVEY.md section 4.7
— the reference's `data-beans-sim` doubles as its test-fixture engine).

Generative model (`data-beans-sim/README.md`, "common scaffolding"):

    log beta(g,k)  = s_b * [ sqrt(pi_t) u(g,k) + sqrt(1-pi_t) v(g) ] - s_b^2/2
    log delta(g,b) =        sqrt(pi_b) z(g,b) + sqrt(1-pi_b) w(g)
    theta(k*,j)    = pi_t + (1-pi_t)/K ; theta(k,j) = (1-pi_t)/K otherwise
    Y(g,j) ~ Poisson( (depth/G) * delta(g,B(j)) * sum_k beta(g,k) theta(k,j) )

with u,v,z,w ~ N(0,1) iid, so Var(log beta) = s_b^2, E[beta] = 1, and
`depth` is the expected library size.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import scipy.sparse as sp


@dataclass
class TopicSim:
    counts: sp.csc_matrix  # [G, N]
    beta: np.ndarray  # [G, K] true dictionary
    theta: np.ndarray  # [N, K] true proportions
    ln_delta: np.ndarray  # [G, B] log batch effects
    batch: np.ndarray  # [N] batch membership
    row_names: list[str]
    col_names: list[str]


def simulate_topic(
    rows: int = 2000,
    cols: int = 1000,
    factors: int = 8,
    batches: int = 1,
    pve_topic: float = 0.7,
    pve_batch: float = 0.3,
    beta_scale: float = 1.0,
    depth: float = 1000.0,
    seed: int = 42,
) -> TopicSim:
    """Single-modality factored counts (`data-beans-sim topic`)."""
    rng = np.random.default_rng(seed)
    g, n, k, b = rows, cols, factors, batches

    u = rng.standard_normal((g, k))
    v = rng.standard_normal((g, 1))
    log_beta = (
        beta_scale * (np.sqrt(pve_topic) * u + np.sqrt(1.0 - pve_topic) * v)
        - beta_scale**2 / 2.0
    )
    beta = np.exp(log_beta)  # [G, K], E[beta] = 1

    if b > 1:
        z = rng.standard_normal((g, b))
        w = rng.standard_normal((g, 1))
        ln_delta = np.sqrt(pve_batch) * z + np.sqrt(1.0 - pve_batch) * w
        ln_delta -= ln_delta.mean(axis=1, keepdims=True) + 0.0
    else:
        ln_delta = np.zeros((g, 1))
    delta = np.exp(ln_delta)

    # one-hot membership softened toward uniform by pve_topic
    k_star = rng.integers(0, k, size=n)
    theta = np.full((n, k), (1.0 - pve_topic) / k)
    theta[np.arange(n), k_star] += pve_topic

    batch = rng.integers(0, b, size=n) if b > 1 else np.zeros(n, dtype=np.int64)

    rate = (depth / g) * delta[:, batch] * (beta @ theta.T)  # [G, N]
    y = rng.poisson(rate).astype(np.float32)
    counts = sp.csc_matrix(y)

    return TopicSim(
        counts=counts,
        beta=beta,
        theta=theta,
        ln_delta=ln_delta,
        batch=batch,
        row_names=[f"g{i}" for i in range(g)],
        col_names=[f"cell{j}" for j in range(n)],
    )


def write_topic_sim(sim: TopicSim, output: str):
    """Write the backend + ground-truth parquet sidecars the way the
    reference does (`data-beans-sim/README.md` outputs table)."""
    import pandas as pd

    from .sparse_io import create_sparse_from_csc

    path = output if output.endswith((".zarr", ".h5")) else output + ".zarr"
    create_sparse_from_csc(sim.counts, path, sim.row_names, sim.col_names)

    k = sim.beta.shape[1]
    pd.DataFrame(
        sim.beta, index=sim.row_names, columns=[f"k{i}" for i in range(k)]
    ).reset_index(names="row").to_parquet(output + ".dict.parquet")
    pd.DataFrame(
        sim.theta, index=sim.col_names, columns=[f"k{i}" for i in range(k)]
    ).reset_index(names="cell").to_parquet(output + ".prop.parquet")
    b = sim.ln_delta.shape[1]
    pd.DataFrame(
        sim.ln_delta, index=sim.row_names, columns=[f"b{i}" for i in range(b)]
    ).reset_index(names="row").to_parquet(output + ".ln_batch.parquet")
    np.savetxt(output + ".batch.gz", sim.batch, fmt="%d")
    return path
