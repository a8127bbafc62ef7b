"""End-to-end `senna topic` slice: sim -> zarr backend -> projection ->
collapse -> train -> artifacts. The minimum end-to-end milestone of
SURVEY.md section 7, with a weak topic-recovery check (reference test
pattern 3)."""

import json
from pathlib import Path

import numpy as np
import pytest

from legume_tpu.data.sim import simulate_topic, write_topic_sim
from legume_tpu.senna.topic import TopicArgs, fit_topic_model, load_model


@pytest.fixture(scope="module")
def sim_backend(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("sim")
    sim = simulate_topic(rows=120, cols=600, factors=3, batches=1, depth=2000, seed=5)
    path = write_topic_sim(sim, str(tmp / "sim"))
    return sim, path, tmp


def test_topic_end_to_end(sim_backend):
    sim, path, tmp = sim_backend
    out = str(tmp / "fit")
    args = TopicArgs(
        data_files=[path],
        out=out,
        n_latent_topics=3,
        encoder_layers=(32, 16),
        epochs=40,
        minibatch_size=64,
        learning_rate=0.01,
        decoder="multinomial",
        proj_dim=16,
        sort_dim=6,
        num_levels=2,
        iter_opt=10,
        block_size=256,
    )
    result = fit_topic_model(args)

    # artifacts exist
    for suffix in [
        ".latent.parquet",
        ".pb_latent.parquet",
        ".dictionary.parquet",
        ".log_likelihood.parquet",
        ".model.npz",
        ".model.json",
        ".senna.json",
    ]:
        assert Path(out + suffix).exists(), suffix

    # training improved the ELBO's llik term
    llik = result["scores"].llik
    assert np.mean(llik[-5:]) > np.mean(llik[:5])

    # latent: finite simplex per cell (output_finiteness + latent_contract
    # regressions, senna/tests/)
    z = result["latent"]
    assert z.shape == (600, 3)
    assert np.all(np.isfinite(z))
    np.testing.assert_allclose(np.exp(z).sum(-1), 1.0, rtol=1e-3)

    # weak recovery: cells dominated by the same true topic should get
    # more-similar latents than cells from different topics
    theta_hat = np.exp(z)
    true_k = sim.theta.argmax(1)
    centroid = np.stack([theta_hat[true_k == k].mean(0) for k in range(3)])
    # centroids should differ meaningfully across true topics
    spread = np.linalg.norm(centroid[:, None] - centroid[None, :], axis=-1)
    assert spread[np.triu_indices(3, 1)].mean() > 0.05

    # manifest sanity
    doc = json.loads(Path(out + ".senna.json").read_text())
    assert doc["command"] == "topic"
    assert "latent" in doc["outputs"]

    # model round-trip (model_metadata strict checks)
    meta, variables, genes = load_model(out)
    assert meta["n_topics"] == 3
    assert len(genes) == 120
    assert "encoder" in variables["params"]


def test_topic_warm_start(sim_backend):
    """--init-from resumes from a saved model with strict architecture
    checks (topic/warm_start.rs:18-40)."""
    sim, path, tmp = sim_backend
    out1 = str(tmp / "warm_base")
    args = TopicArgs(
        data_files=[path], out=out1, n_latent_topics=3,
        encoder_layers=(32, 16), epochs=5, minibatch_size=64,
        decoder="multinomial", proj_dim=16, sort_dim=6, num_levels=1,
        iter_opt=5, block_size=256,
    )
    fit_topic_model(args)

    # warm start resumes fine
    import dataclasses

    args2 = dataclasses.replace(args, out=str(tmp / "warm_next"), init_from=out1, epochs=3)
    res = fit_topic_model(args2)
    assert np.all(np.isfinite(res["scores"].llik))

    # architecture mismatch is rejected
    args3 = dataclasses.replace(args2, n_latent_topics=4, out=str(tmp / "warm_bad"))
    with pytest.raises(ValueError, match="mismatch"):
        fit_topic_model(args3)


def test_topic_from_manifest_inheritance(sim_backend):
    """--from prefills data_files from a prior run's manifest
    (run_manifest.rs:848)."""
    import dataclasses

    sim, path, tmp = sim_backend
    base = str(tmp / "mfrom_base")
    args = TopicArgs(
        data_files=[path], out=base, n_latent_topics=3,
        encoder_layers=(16,), epochs=2, minibatch_size=64,
        decoder="multinomial", proj_dim=8, sort_dim=4, num_levels=1,
        iter_opt=3, block_size=256,
    )
    fit_topic_model(args)
    args2 = dataclasses.replace(
        args, data_files=(), out=str(tmp / "mfrom_next"), from_run=base, epochs=2
    )
    res = fit_topic_model(args2)
    assert np.all(np.isfinite(res["scores"].llik))


def test_topic_with_feature_coarsening(sim_backend):
    """max_coarse_features trains coarsened decoders per level; the
    output dictionary expands back to full D (cmd.rs:344-373)."""
    sim, path, tmp = sim_backend
    out = str(tmp / "coarse_fit")
    args = TopicArgs(
        data_files=[path], out=out, n_latent_topics=3,
        encoder_layers=(32,), epochs=10, minibatch_size=64,
        decoder="multinomial", proj_dim=12, sort_dim=6, num_levels=2,
        iter_opt=5, block_size=256, max_coarse_features=40,
    )
    res = fit_topic_model(args)
    import pandas as pd

    dic = pd.read_parquet(out + ".dictionary.parquet")
    assert len(dic) == 120  # expanded to full D
    beta = np.exp(dic.iloc[:, 1:].to_numpy())
    np.testing.assert_allclose(beta.sum(0), 1.0, rtol=1e-3)
    assert np.all(np.isfinite(res["scores"].llik))


def test_topic_multibatch_removes_batch_effect(tmp_path):
    """Full `senna topic` on batch-confounded sims (VERDICT round-1
    weak item 4): the counterfactual-matched collapse must strip the
    per-gene batch effect from the adjusted pseudobulks, and the
    estimated log delta must track the simulated one."""
    sim = simulate_topic(
        rows=100, cols=900, factors=3, batches=2,
        pve_topic=0.7, pve_batch=0.9, depth=3000, seed=11,
    )
    path = write_topic_sim(sim, str(tmp_path / "mb"))
    batch_file = tmp_path / "batches.txt"
    batch_file.write_text("\n".join(f"b{int(b)}" for b in sim.batch) + "\n")

    out = str(tmp_path / "fit")
    args = TopicArgs(
        data_files=[path],
        batch_files=[str(batch_file)],
        out=out,
        n_latent_topics=3,
        encoder_layers=(32, 16),
        epochs=30,
        minibatch_size=64,
        decoder="multinomial",
        proj_dim=16,
        sort_dim=6,
        num_levels=2,
        iter_opt=20,
        knn_cells=8,
        block_size=256,
    )
    result = fit_topic_model(args)
    finest = result["levels"].collapsed[0]
    groups = result["levels"].groups_per_level[0]
    assert finest.mu_adjusted is not None and finest.delta is not None

    # (a) estimated per-gene log batch effect tracks the simulated one
    # (delta [D, B]; identify via the batch-0 vs batch-1 contrast, which
    # is invariant to per-gene shifts shared across batches)
    est = np.log(np.asarray(finest.delta.mean()))
    true_c = sim.ln_delta[:, 1] - sim.ln_delta[:, 0]
    est_c = est[:, 1] - est[:, 0]
    r = np.corrcoef(true_c, est_c)[0, 1]
    assert r > 0.5, f"delta contrast correlation too low: {r:.3f}"

    # (b) batch signal visible in observed pb means must shrink in the
    # adjusted plane: contrast pbs dominated by batch 0 vs batch 1
    obs = np.log1p(np.asarray(finest.mu_observed.mean()))  # [D, P]
    adj = np.log1p(np.asarray(finest.mu_adjusted.mean()))
    n_pb = obs.shape[1]
    pb_batch_frac = np.zeros(n_pb)
    for p in range(n_pb):
        cells = groups == p
        if cells.any():
            pb_batch_frac[p] = sim.batch[cells].mean()
    grp0, grp1 = pb_batch_frac < 0.5, pb_batch_frac >= 0.5
    assert grp0.any() and grp1.any()

    def batch_contrast(plane):
        return plane[:, grp1].mean(1) - plane[:, grp0].mean(1)

    c_obs = batch_contrast(obs)
    c_adj = batch_contrast(adj)
    # observed contrast aligns with the true batch effect...
    r_obs = np.corrcoef(true_c, c_obs)[0, 1]
    assert r_obs > 0.4, f"sim too weak to test: r_obs={r_obs:.3f}"
    # ...and the adjusted plane strips most of its MAGNITUDE. (Sign can
    # over-correct on batch-skewed tail pbs — the residual-division
    # design divides each pb by its own batch flavor — so the parity
    # claim is about energy removed, matching the reference's behavior.)
    ratio = np.linalg.norm(c_adj) / max(np.linalg.norm(c_obs), 1e-12)
    assert ratio < 0.5, f"batch contrast energy ratio {ratio:.3f}"
    r_adj = np.corrcoef(true_c, c_adj)[0, 1]
    assert r_adj < 0.5 * r_obs, f"r_obs={r_obs:.3f} r_adj={r_adj:.3f}"


def test_artifact_scale_guard():
    """ArtifactScale content detection + guard (run_manifest.rs:308-345)."""
    import pytest

    from legume_tpu.utils.manifest import ArtifactScale

    rng = np.random.default_rng(0)
    signed = rng.standard_normal((20, 4))
    probs = rng.dirichlet(np.ones(20), size=4).T  # columns sum to 1
    logp = np.log(probs + 1e-30)
    assert ArtifactScale.detect(signed) == ArtifactScale.SIGNED
    assert ArtifactScale.detect(probs) == ArtifactScale.PROBABILITY_SIMPLEX_COLUMNS
    assert ArtifactScale.detect(logp) == ArtifactScale.LOG_SIMPLEX_COLUMNS
    np.testing.assert_allclose(ArtifactScale.to_linear_simplex(logp), probs, atol=1e-9)
    with pytest.raises(ValueError):
        ArtifactScale.to_linear_simplex(signed)
    with pytest.raises(ValueError):
        ArtifactScale.ensure(signed, ArtifactScale.LOG_SIMPLEX_COLUMNS, "beta")


def test_topic_partition_reuse_via_from(sim_backend, tmp_path):
    """--from reuses the prior run's cell->pb partition
    (topic/common.rs:404-419): the inherited run reproduces the same
    groups without re-deriving (and without refinement sweeps)."""
    sim, path, _ = sim_backend
    first = str(tmp_path / "first")
    args = TopicArgs(
        data_files=[path], out=first, n_latent_topics=3,
        encoder_layers=(16,), epochs=5, minibatch_size=64,
        decoder="multinomial", proj_dim=12, sort_dim=6, num_levels=2,
        iter_opt=5, block_size=256,
    )
    res1 = fit_topic_model(args)
    assert Path(first + ".partition.npz").exists()
    man = json.loads(Path(first + ".senna.json").read_text())
    assert man["artifacts"]["latent"]["scale"] == "log_simplex_columns"
    assert man["outputs"]["partition"].endswith(".partition.npz")

    second = str(tmp_path / "second")
    args2 = TopicArgs(
        data_files=[path], out=second, n_latent_topics=3,
        encoder_layers=(16,), epochs=5, minibatch_size=64,
        decoder="multinomial", proj_dim=12, sort_dim=6, num_levels=2,
        iter_opt=5, block_size=256, from_run=first,
        refine=False,  # reuse means no re-refinement either way
    )
    res2 = fit_topic_model(args2)
    assert len(res1["levels"].groups_per_level) == len(res2["levels"].groups_per_level)
    for g1, g2 in zip(
        res1["levels"].groups_per_level, res2["levels"].groups_per_level
    ):
        np.testing.assert_array_equal(g1, g2)


def test_topic_multi_decoder_and_nuisance_artifacts(sim_backend, tmp_path):
    """--decoder a,b trains both families jointly on the same target
    (cmd.rs --decoder list + --decoder-weights) and writes per-family
    dictionaries plus the nb-mixture nuisance artifacts
    (cmd.rs:74-80 dispersion/alpha/rho parquets)."""
    sim, path, _ = sim_backend
    out = str(tmp_path / "md")
    args = TopicArgs(
        data_files=[path], out=out, n_latent_topics=3,
        encoder_layers=(16,), epochs=10, minibatch_size=64,
        decoder="nb-mixture,multinomial", decoder_weights=[1.0, 0.5],
        rho_prior_weight=10.0,
        proj_dim=12, sort_dim=5, num_levels=2, iter_opt=5, block_size=256,
    )
    result = fit_topic_model(args)
    # multi-family runs suffix nuisance artifacts by family so one
    # family's parquet never overwrites another's
    for suffix in [
        ".dictionary.parquet",
        ".nb-mixture.dictionary.parquet",
        ".multinomial.dictionary.parquet",
        ".nb-mixture.dispersion.parquet",
        ".nb-mixture.alpha.parquet",
        ".nb-mixture.rho.parquet",
    ]:
        assert Path(out + suffix).exists(), suffix
    import pandas as pd

    # ambient profile is a D-simplex; dispersion positive; rho has a/b
    alpha = pd.read_parquet(out + ".nb-mixture.alpha.parquet")["alpha"].to_numpy()
    np.testing.assert_allclose(alpha.sum(), 1.0, rtol=1e-4)
    phi = pd.read_parquet(
        out + ".nb-mixture.dispersion.parquet"
    )["dispersion"].to_numpy()
    assert (phi > 0).all() and len(phi) == 120
    rho = pd.read_parquet(out + ".nb-mixture.rho.parquet")
    assert set(rho["coef"]) == {"rho_a", "rho_b"}
    z = result["latent"]
    assert np.all(np.isfinite(z))
    np.testing.assert_allclose(np.exp(z).sum(-1), 1.0, rtol=1e-3)


def test_nb_mixture_rho_beta_prior_exact():
    """The weighted Beta log prior adds exactly
    w * ((a-1) log rho + (b-1) log(1-rho)) per sample
    (nb_mixture.rs:174-192)."""
    import jax
    import jax.numpy as jnp

    from legume_tpu.models.decoders import NbMixtureTopicDecoder

    x = jnp.asarray(np.random.default_rng(0).poisson(2.0, (4, 30)).astype(np.float32))
    log_z = jax.nn.log_softmax(jnp.zeros((4, 3)), axis=-1)
    d0 = NbMixtureTopicDecoder(n_features=30, n_topics=3)
    dw = NbMixtureTopicDecoder(
        n_features=30, n_topics=3,
        rho_prior_weight=5.0, rho_prior_alpha=2.0, rho_prior_beta=18.0,
    )
    params = d0.init(jax.random.key(0), log_z, x)["params"]
    _, ll0 = d0.apply({"params": params}, log_z, x)
    _, llw = dw.apply({"params": params}, log_z, x)
    lib = x.sum(-1, keepdims=True)
    rho = jax.nn.sigmoid(
        jnp.log(lib + 1e-8) * params["rho_a"] + params["rho_b"]
    )[:, 0]
    expected = 5.0 * ((2.0 - 1.0) * jnp.log(rho + 1e-6)
                      + (18.0 - 1.0) * jnp.log(1.0 - rho + 1e-6))
    np.testing.assert_allclose(np.asarray(llw - ll0), np.asarray(expected), rtol=1e-5)


def test_topic_adj_method_batch_and_amort_refine(tmp_path):
    """--adj-method batch evals with the per-batch delta null
    (topic/common.rs:55-85), writes {out}.delta.parquet, and
    --amort-refine-steps improves the frozen-dictionary multinomial
    llik of the final latent (refine_weighting.rs AmortRefineArgs)."""
    import pandas as pd

    from legume_tpu.senna.topic import evaluate_latent_by_encoder

    sim = simulate_topic(
        rows=80, cols=600, factors=3, batches=2,
        pve_topic=0.7, pve_batch=0.8, depth=2000, seed=7,
    )
    path = write_topic_sim(sim, str(tmp_path / "ab"))
    batch_file = tmp_path / "batches.txt"
    batch_file.write_text("\n".join(f"b{int(b)}" for b in sim.batch) + "\n")
    out = str(tmp_path / "fit")
    args = TopicArgs(
        data_files=[path], batch_files=[str(batch_file)], out=out,
        n_latent_topics=3, encoder_layers=(16,), epochs=15,
        minibatch_size=64, decoder="multinomial", adj_method="batch",
        proj_dim=12, sort_dim=5, num_levels=2, iter_opt=10,
        knn_cells=8, block_size=256,
    )
    result = fit_topic_model(args)
    delta = pd.read_parquet(out + ".delta.parquet")
    assert delta.shape == (80, 3)  # gene + two batch columns
    assert list(delta.columns[1:]) == ["b0", "b1"]

    # refinement: same trained model, latent with/without refine steps;
    # the frozen-dictionary multinomial llik must not get worse
    from legume_tpu.senna.topic import load_data_vec

    vec = load_data_vec([path], [str(batch_file)])
    finest = result["levels"].collapsed[0]
    groups = result["levels"].groups_per_level[0]
    log_beta = result["log_beta"]  # [D, K]

    import legume_tpu.senna.topic as topic_mod

    trainer_variables = result["variables"]
    # rebuild a minimal trainer facade via the result's variables: reuse
    # evaluate_latent_by_encoder with the SAME encoder the fit used
    class _T:
        pass

    x = sim.counts.toarray().T.astype(np.float32)  # [N, D]

    def multinom_llik(z_log):
        log_recon = np.log(np.exp(z_log) @ np.exp(log_beta.T) + 1e-30)
        return float((x * log_recon).sum() / x.sum())

    from legume_tpu.models.encoders import LogSoftmaxEncoder
    from legume_tpu.models.train import MixedTrainer, TrainConfig

    enc = LogSoftmaxEncoder(n_topics=3, layers=(16,))
    tr = MixedTrainer(enc, [], TrainConfig())
    z_plain = evaluate_latent_by_encoder(
        vec, tr, trainer_variables, finest, groups, block_size=256,
        adj_method="batch",
    )
    z_ref = evaluate_latent_by_encoder(
        vec, tr, trainer_variables, finest, groups, block_size=256,
        adj_method="batch",
        refine_log_dict=log_beta, refine_steps=5, refine_lr=0.05,
    )
    assert np.isfinite(z_ref).all()
    assert multinom_llik(z_ref) >= multinom_llik(z_plain) - 1e-6
    assert not np.allclose(z_ref, z_plain)


def test_latent_eval_mesh_parity(tmp_path):
    """evaluate_latent_by_encoder(mesh=): the shard_mapped stacked-block
    path on the virtual 8-device mesh must equal the single-device eval
    bit-for-bit (cells are disjoint across devices — no collectives)."""
    import pandas as pd  # noqa: F401

    from legume_tpu.data.sim import simulate_topic
    from legume_tpu.data.sparse_io import MemoryBackend
    from legume_tpu.data import SparseIoVec
    from legume_tpu.models.encoders import LogSoftmaxEncoder
    from legume_tpu.models.decoders import MultinomTopicDecoder
    from legume_tpu.models.train import LevelData, MixedTrainer, TrainConfig
    from legume_tpu.ops import collapse as clp
    from legume_tpu.ops import random_projection as rp
    from legume_tpu.parallel.mesh import make_mesh
    from legume_tpu.senna.topic import evaluate_latent_by_encoder

    import jax

    sim = simulate_topic(rows=60, cols=700, factors=3, batches=1, seed=3)
    be = MemoryBackend(sim.counts)
    _, proj = rp.project_columns(be, 8, block_size=256)
    bits = (proj[:4] > 0).astype(np.int64)
    codes = (bits * (1 << np.arange(4))[:, None]).sum(axis=0)
    groups, s = rp.compact_group_codes(codes)
    stat = clp.collect_basic_stats(be, groups, s, block_size=256)
    out = clp.optimize(stat, num_iter=10)
    mixed = np.asarray(out.mu_observed.sample(jax.random.key(0))).T.astype(
        np.float32
    )
    enc = LogSoftmaxEncoder(n_topics=3, layers=(16,))
    dec = MultinomTopicDecoder(n_features=60, n_topics=3)
    tr = MixedTrainer(enc, [dec], TrainConfig(epochs=5, minibatch_size=32))
    variables, _, _ = tr.train(
        [LevelData(input=mixed, input_null=None)], jax.random.key(1)
    )
    vec = SparseIoVec()
    vec.push(be)
    z0 = evaluate_latent_by_encoder(
        vec, tr, variables, out, groups, block_size=128
    )
    z1 = evaluate_latent_by_encoder(
        vec, tr, variables, out, groups, block_size=128, mesh=make_mesh(8)
    )
    np.testing.assert_allclose(z0, z1, rtol=1e-5, atol=1e-6)
