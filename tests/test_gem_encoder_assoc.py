"""gem-encoder (u+delta->s generative sibling) + dyn-assoc contrasts."""

import numpy as np

from legume_tpu.embedding.gem import fit_gem_encoder
from legume_tpu.faba.assoc import dyn_assoc, dyn_assoc_pseudotime


def _velocity_sim(p=60, d=40, seed=0):
    """Unspliced leads spliced: genes 0..9 are 'rising' (u high, s low),
    genes 10..19 'falling' (u low, s high); cells mix the two programs."""
    rng = np.random.default_rng(seed)
    theta = rng.dirichlet([1.0, 1.0], size=p)  # [P, 2]
    prog_u = np.zeros((2, d))
    prog_s = np.zeros((2, d))
    prog_u[0, :10], prog_s[0, :10] = 5.0, 1.0  # rising in program 0
    prog_u[0, 10:20], prog_s[0, 10:20] = 1.0, 5.0  # falling
    prog_u[1, 20:30], prog_s[1, 20:30] = 5.0, 1.0
    prog_u[1, 30:40], prog_s[1, 30:40] = 1.0, 5.0
    u = rng.poisson(theta @ prog_u * 20 + 0.5)
    s = rng.poisson(theta @ prog_s * 20 + 0.5)
    return s.astype(np.float32), u.astype(np.float32)


def test_gem_encoder_learns_and_velocity_points():
    s, u = _velocity_sim()
    res = fit_gem_encoder(s, u, latent_dim=8, epochs=400, seed=0)
    # loss decreased
    assert res.losses[-1] < res.losses[0]
    # encoder produces finite latents with structure
    z = res.encode(u)
    assert z.shape == (60, 8) and np.isfinite(z).all()
    # velocity: rising genes (u>>s) and falling genes get distinct
    # delta directions; cells loaded on rising genes move differently
    v = res.cell_velocity(u)
    assert v.shape == (60, 8) and np.isfinite(v).all()
    assert np.linalg.norm(res.delta) > 0


def test_dyn_assoc_flags_branch_specific_site():
    rng = np.random.default_rng(1)
    n = 400
    branch = (np.arange(n) >= 200).astype(np.int64)
    exposure = np.full(n, 20.0)
    # site 0: rate 0.3 in branch 1, 0.05 in branch 0; sites 1-9 flat 0.05
    rates = np.full((10, n), 0.05)
    rates[0, branch == 1] = 0.3
    counts = rng.poisson(rates * exposure)
    out = dyn_assoc(counts, exposure, branch)
    assert out["branch"][0] == 1
    assert out["log_bf"][0] > 10.0
    assert out["pvalue"][0] < 1e-6
    assert np.median(out["log_bf"][1:]) < 2.0


def test_dyn_assoc_pseudotime_slope():
    rng = np.random.default_rng(2)
    n = 500
    t = rng.uniform(0, 1, n)
    exposure = np.full(n, 30.0)
    # site 0 rate rises with t; site 1 flat
    rates = np.stack([0.02 + 0.3 * t, np.full(n, 0.1)])
    counts = rng.poisson(rates * exposure)
    out = dyn_assoc_pseudotime(counts, exposure, t)
    assert out["slope"][0] > 0
    assert out["pvalue"][0] < 1e-4
    assert out["pvalue"][1] > 0.01


def test_gem_encoder_recovers_ode_steady_state_ratio():
    """Mechanism recovery (faba/tests/gem_encoder_mechanism.rs): data
    simulated FROM the RNA-velocity steady state s_g = (beta/gamma) u_g
    must yield delta embeddings whose cell-state projection tracks the
    per-gene log(beta/gamma) — the claim the u+delta->s design rests
    on, measured rather than asserted."""
    rng = np.random.default_rng(0)
    g, n = 80, 150
    log_ratio = rng.normal(0.0, 0.8, g)  # log(beta/gamma) per gene
    u_base = rng.gamma(3.0, 2.0, (n, g))
    u = rng.poisson(u_base).astype(np.float32)
    s = rng.poisson(u_base * np.exp(log_ratio)[None, :]).astype(np.float32)

    from legume_tpu.embedding.gem import fit_gem_encoder

    res = fit_gem_encoder(s, u, latent_dim=8, epochs=500, seed=1)
    # mean cell state h-bar projects delta: score_g = h_bar . delta_g
    h = res.encode(u)  # [N, H]
    proj = h.mean(0) @ res.delta.T  # [G]
    r = np.corrcoef(proj, log_ratio)[0, 1]
    assert r > 0.5, f"mechanism recovery r={r:.2f}"
