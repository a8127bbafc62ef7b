"""Indexed top-K masked topic model tests (masked_topic path;
SURVEY.md section 2.4 indexed subsystem)."""

import numpy as np
import pytest
import scipy.sparse as sp

from legume_tpu.data.sparse_io import MemoryBackend
from legume_tpu.models.indexed import (
    IndexedData,
    MaskedTopicModel,
    MaskedTrainConfig,
    build_topk_windows,
    encode_all,
    train_masked,
)


@pytest.fixture(scope="module")
def topic_backend():
    rng = np.random.default_rng(0)
    d, n, k = 100, 400, 3
    beta = rng.dirichlet(np.ones(d) * 0.1, size=k)
    topic = np.arange(n) % k
    lam = 200.0 * beta[topic]
    y = rng.poisson(lam).astype(np.float32)
    return MemoryBackend(sp.csc_matrix(y.T)), topic


def test_topk_windows(topic_backend):
    be, _ = topic_backend
    data = build_topk_windows(be, 16, block_size=128)
    assert data.ids.shape == (400, 16)
    dense = be.read_columns_dense(np.arange(400)).T
    # window values match the true top counts per cell
    for j in [0, 57, 399]:
        row = dense[j]
        valid = data.ids[j] < 100
        np.testing.assert_allclose(
            np.sort(data.vals[j][valid])[::-1],
            np.sort(row[np.argsort(-row)[: valid.sum()]])[::-1],
            rtol=1e-5,
        )
    assert np.isfinite(data.log_q).all()


def test_masked_training_and_latent(topic_backend):
    be, topic = topic_backend
    data = build_topk_windows(be, 16, block_size=128)
    model = MaskedTopicModel(n_genes=100, n_topics=3, embed_dim=16, hidden=32)
    variables, trace, _eval_loss = train_masked(
        model, data,
        MaskedTrainConfig(epochs=60, minibatch=100, learning_rate=3e-3, union_size=128),
    )
    assert trace[-1] < trace[0], trace[:3] + trace[-3:]
    log_theta = encode_all(model, variables, data)
    assert np.all(np.isfinite(log_theta))
    np.testing.assert_allclose(np.exp(log_theta).sum(-1), 1.0, rtol=1e-3)
    # latent centroids differ across true topics
    theta = np.exp(log_theta)
    cent = np.stack([theta[topic == t].mean(0) for t in range(3)])
    spread = np.linalg.norm(cent[:, None] - cent[None, :], axis=-1)
    assert spread[np.triu_indices(3, 1)].mean() > 0.05


def test_masked_schedule_likelihood_and_eval(tmp_path):
    """masked-topic extended surface (masked_topic.rs MaskScheduleArg /
    MaskedLikelihoodArg / eval_mask_fraction / feature_network):
    uniform schedule + multinomial likelihood train to a finite simplex
    latent; the held-out eval writes {out}.eval.json; the feature
    network restricts the windows to network genes."""
    import json

    import pandas as pd
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sparse_io import create_sparse_from_csc

    rng = np.random.default_rng(7)
    d, n = 50, 300
    base = rng.gamma(1.0, 1.0, (3, d))
    base[0, :15] *= 6
    base[1, 15:30] *= 6
    base[2, 30:] *= 6
    k_true = rng.integers(0, 3, n)
    counts = rng.poisson(base[k_true]).astype(np.float32).T
    path = str(tmp_path / "m.zarr")
    create_sparse_from_csc(
        sp.csc_matrix(counts), path,
        [f"g{i}" for i in range(d)], [f"c{j}" for j in range(n)],
    )
    # network covering only the first 40 genes (ring)
    net = tmp_path / "net.tsv"
    net.write_text("".join(f"g{i}\tg{(i + 1) % 40}\n" for i in range(40)))

    out = str(tmp_path / "mk")
    cli.main([
        "senna", "masked-topic", "--data-files", path, "--out", out,
        "-k", "3", "--window", "24", "--embed-dim", "16",
        "--epochs", "10", "--minibatch-size", "64",
        "--mask-schedule", "uniform", "--mask-rate-lo", "0.1",
        "--mask-rate-hi", "0.4", "--masked-likelihood", "multinomial",
        "--feature-embedding-l2", "1e-5", "--grad-clip", "1.0",
        "--eval-mask-fraction", "0.2", "--eval-seed", "3",
        "--feature-network", str(net),
    ])
    z = pd.read_parquet(out + ".latent.parquet").iloc[:, 1:].to_numpy()
    assert np.isfinite(z).all()
    np.testing.assert_allclose(np.exp(z).sum(1), 1.0, atol=1e-3)
    doc = json.loads((tmp_path / "mk.eval.json").read_text())
    assert np.isfinite(doc["masked_eval_loss"])
    # restriction held: no window may touch genes outside the network
    # (windows rebuilt here the same way the CLI did)
    from legume_tpu.data.sparse_io import open_sparse_matrix
    from legume_tpu.models.indexed import build_topk_windows

    w = np.zeros(d, np.float32)
    w[:40] = 1.0
    data = build_topk_windows(open_sparse_matrix(path), 24, gene_weights=w)
    real = data.ids[data.ids < d]
    assert real.max() < 40


def test_masked_grad_clip_never_launders_nan():
    """grad_clip_nonfinite.rs regression at the optax level: an Inf
    gradient through the guarded clip skips the step and leaves the
    parameters finite; the unguarded optax clip would write NaN."""
    import jax
    import jax.numpy as jnp
    import optax

    from legume_tpu.models.train import clip_by_global_norm_nonfinite_guard

    opt = optax.chain(
        clip_by_global_norm_nonfinite_guard(1.0),
        optax.adamw(0.01),
    )
    params = {"w": jnp.asarray([3.0, -1.0])}
    state = opt.init(params)

    def loss(p):
        return jnp.sum((p["w"] * 1e20) ** 2)  # overflows the norm

    grads = jax.grad(loss)(params)
    assert not bool(jnp.isfinite(jnp.linalg.norm(grads["w"])))
    updates, state = opt.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert bool(jnp.isfinite(new_params["w"]).all())
    # the guarded step is a no-op update direction (zeros through adam)
    assert float(jnp.abs(new_params["w"] - params["w"]).max()) < 0.02


def test_masked_batch_null_stream(tmp_path):
    """masked-topic --batch-files (MaskedTopicArgs batch_files +
    adj_method): the collapse-derived null plane feeds the encoder's
    second pool; training runs end-to-end and the latent stays a
    finite simplex under both adj methods."""
    import pandas as pd
    import scipy.sparse as sp

    from legume_tpu.cli import main as cli
    from legume_tpu.data.sim import simulate_topic, write_topic_sim

    sim = simulate_topic(rows=50, cols=300, factors=3, batches=2,
                         pve_batch=0.8, depth=1500, seed=45)
    path = write_topic_sim(sim, str(tmp_path / "m"))
    bf = tmp_path / "b.txt"
    bf.write_text("\n".join(f"b{int(b)}" for b in sim.batch) + "\n")
    for adj in ("batch", "residual"):
        out = str(tmp_path / f"mk_{adj}")
        cli.main([
            "senna", "masked-topic", "--data-files", path, "--out", out,
            "-k", "3", "--window", "24", "--embed-dim", "16",
            "--epochs", "8", "--minibatch-size", "64",
            "--batch-files", str(bf), "--adj-method", adj,
            "--sort-dim", "4", "--iter-opt", "5",
        ])
        z = pd.read_parquet(out + ".latent.parquet").iloc[:, 1:].to_numpy()
        assert np.isfinite(z).all()
        np.testing.assert_allclose(np.exp(z).sum(1), 1.0, atol=1e-3)


def test_feature_embedding_ridge_reduction():
    """embedding_ridge.rs pins: the ridge is lambda * mean_g ||rho_g||^2
    — independent of the ROW count, dependent on the row NORM (the
    mean-over-all-elements form diluted the gradient H-fold)."""
    import jax.numpy as jnp

    def ridge(rho, lam=1.0):
        return lam * jnp.mean(jnp.sum(rho**2, axis=1))

    h, c = 8, 0.5
    small = jnp.full((10, h), c)
    big = jnp.full((1000, h), c)
    # closed form lambda * H * c^2; row count drops out
    assert np.isclose(float(ridge(small)), h * c * c)
    assert np.isclose(float(ridge(small)), float(ridge(big)))
    # doubling H doubles the penalty (row-norm dependence)
    wide = jnp.full((10, 2 * h), c)
    assert np.isclose(float(ridge(wide)), 2 * float(ridge(small)))


def test_gene_modules_zero_leaves_params_unchanged(topic_backend):
    """M = 0 must register no var and leave the param tree byte-identical
    to a build without the branch (encoder/indexed.rs:713 contract)."""
    import jax

    be, _ = topic_backend
    data = build_topk_windows(be, 16, block_size=128)
    base = MaskedTopicModel(n_genes=100, n_topics=3, embed_dim=16, hidden=32)
    zero = MaskedTopicModel(
        n_genes=100, n_topics=3, embed_dim=16, hidden=32, n_gene_modules=0
    )
    import jax.numpy as jnp

    ids0 = jnp.asarray(data.ids[:8])
    vals0 = jnp.asarray(data.vals[:8])
    union0 = jnp.arange(64, dtype=jnp.int32)
    k = jax.random.key(0)
    args = (ids0, vals0, union0, jnp.zeros(64), jnp.ones(64, bool),
            jnp.zeros_like(vals0, bool))
    v_base = base.init({"params": k, "reparam": k}, *args, train=True, rngs_key=k)
    v_zero = zero.init({"params": k, "reparam": k}, *args, train=True, rngs_key=k)
    flat_b = jax.tree_util.tree_leaves_with_path(v_base["params"])
    flat_z = jax.tree_util.tree_leaves_with_path(v_zero["params"])
    assert [p for p, _ in flat_b] == [p for p, _ in flat_z]
    for (_, a), (_, b) in zip(flat_b, flat_z):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gene_modules_branch_trains_and_is_member_invariant(topic_backend):
    """With M > 0 the branch registers one [H, M] var, training still
    converges, and the module features are (near-)invariant to WHICH of
    two interchangeable genes a cell observed — the branch's purpose
    (encoder/indexed.rs module docstring)."""
    import jax
    import jax.numpy as jnp

    from legume_tpu.models.indexed import IndexedEmbeddingEncoder

    be, _ = topic_backend
    data = build_topk_windows(be, 16, block_size=128)
    model = MaskedTopicModel(
        n_genes=100, n_topics=3, embed_dim=16, hidden=32, n_gene_modules=4
    )
    variables, trace, _ = train_masked(
        model, data,
        MaskedTrainConfig(epochs=40, minibatch=100, learning_rate=3e-3,
                          union_size=128),
    )
    assert "module_centroids" in variables["params"]["encoder"]
    assert variables["params"]["encoder"]["module_centroids"].shape == (16, 4)
    assert trace[-1] < trace[0]
    log_theta = encode_all(model, variables, data)
    assert np.all(np.isfinite(log_theta))

    # member-dropout invariance: two genes with IDENTICAL embeddings are
    # interchangeable; a cell seeing only gene 0 vs only gene 1 (same
    # count) must produce the same module-branch features, hence the
    # same encoder output
    enc = IndexedEmbeddingEncoder(n_topics=3, hidden=32, n_gene_modules=4)
    rho = jax.random.normal(jax.random.key(1), (101, 16)) * 0.3
    rho = rho.at[1].set(rho[0])  # genes 0 and 1 interchangeable
    k = 6
    ids_a = jnp.full((1, k), 100, jnp.int32).at[0, 0].set(0)
    ids_b = jnp.full((1, k), 100, jnp.int32).at[0, 0].set(1)
    vals = jnp.zeros((1, k)).at[0, 0].set(7.0)
    v = enc.init(jax.random.key(2), rho, ids_a, vals, train=False)
    za, _ = enc.apply(v, rho, ids_a, vals, train=False)
    zb, _ = enc.apply(v, rho, ids_b, vals, train=False)
    np.testing.assert_allclose(np.asarray(za), np.asarray(zb), atol=1e-5)


def test_masked_trainer_mesh_parity(topic_backend):
    """VERDICT r4 #9: train_masked(mesh=) on the virtual 8-device mesh
    must reproduce the single-device run exactly — same seeds, same
    permutations, same placements-only difference."""
    from legume_tpu.parallel.mesh import make_mesh

    be, _ = topic_backend
    data = build_topk_windows(be, 16, block_size=128)
    model = MaskedTopicModel(n_genes=100, n_topics=3, embed_dim=16, hidden=32)
    base = dict(epochs=12, minibatch=100, learning_rate=3e-3, union_size=128)
    v0, t0, _ = train_masked(model, data, MaskedTrainConfig(**base))
    v1, t1, _ = train_masked(
        model, data, MaskedTrainConfig(**base, mesh=make_mesh(8))
    )
    np.testing.assert_allclose(t0, t1, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(v0["params"]["rho"]), np.asarray(v1["params"]["rho"]),
        rtol=2e-3, atol=2e-5,
    )
