"""Dense multilevel VAE trainer (candle-util `vae/topic.rs` equivalent).

`train_mixed` parity (vae/topic.rs:70-172): shared encoder + one
decoder per pseudobulk level, AdamW, global-norm gradient clip with a
non-finite guard (skip the step, vae/mod.rs:108-131), per-epoch
device-side minibatch shuffle, ELBO = llik - KL, per-epoch llik/kl
traces, optional per-level loss hook (anchor prior CE).

TPU-native structure: one **jitted epoch** per level — permutation +
`lax.scan` over minibatches — so the whole epoch is a single dispatch
and the only host readback is the per-epoch (llik, kl, count) triple.
(The reference reads back three scalars per *minibatch*,
vae/topic.rs:136-138; here that sync disappears.)

Static-shape contract: each level's data is padded to
`num_minibatches * minibatch` rows with a 0/1 row-weight mask; padded
rows contribute nothing to loss or traces.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class TrainConfig:
    """vae/topic.rs:28-41 parity."""

    epochs: int = 100
    minibatch_size: int = 256
    learning_rate: float = 1e-3
    topic_smoothing: float = 0.01
    grad_clip: float = 10.0
    weight_decay: float = 0.01  # candle AdamW default
    seed: int = 0
    # epochs folded into ONE device dispatch (outer lax.scan). The
    # reference dispatches per minibatch (vae/topic.rs:120-143); over a
    # tunneled TPU even per-EPOCH dispatch costs ~85 ms round-trip, so
    # batching epochs amortizes launch latency to near zero.
    epochs_per_call: int = 10


@dataclass
class TrainScores:
    llik: list = field(default_factory=list)
    kl: list = field(default_factory=list)


@dataclass
class LevelData:
    """Per-level `(encoder input, optional batch null, decoder target)`
    (vae/topic.rs:44). Arrays are [P, D_enc] / [P, D_dec]."""

    input: np.ndarray
    input_null: Optional[np.ndarray]
    output: Optional[np.ndarray] = None

    @property
    def target(self) -> np.ndarray:
        return self.output if self.output is not None else self.input

    @property
    def n(self) -> int:
        return self.input.shape[0]


def clip_by_global_norm_nonfinite_guard(max_norm: float) -> optax.GradientTransformation:
    """Global L2 clip that SKIPS the step (zero update) when the global
    norm is non-finite — parity with `apply_global_l2_clip`
    (vae/mod.rs:108-161): a single Inf/NaN grad must not poison params.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        finite = jnp.isfinite(norm)
        scale = jnp.where(
            finite, jnp.minimum(1.0, max_norm / (norm + 1e-6)), 0.0
        )
        updates = jax.tree.map(
            lambda g: jnp.where(finite, g * scale, jnp.zeros_like(g)), updates
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(config: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        clip_by_global_norm_nonfinite_guard(config.grad_clip),
        optax.adamw(config.learning_rate, weight_decay=config.weight_decay),
    )


def _pad_level(level: LevelData, mb: int, row_multiple: int = 1):
    """Pad rows to a multiple of the minibatch size (and of
    `row_multiple`, for dp sharding placements); returns
    (input, null, target, row_weight) arrays of [P_pad, ...]."""
    p = level.n
    num_mb = max(1, -(-p // mb))
    while (num_mb * mb) % row_multiple:
        num_mb += 1
    p_pad = num_mb * mb
    pad = p_pad - p

    def pad_rows(a):
        if a is None:
            return None
        if pad == 0:
            return jnp.asarray(a)
        return jnp.concatenate([jnp.asarray(a), jnp.zeros((pad, a.shape[1]), a.dtype)], 0)

    w = jnp.concatenate([jnp.ones(p, jnp.float32), jnp.zeros(pad, jnp.float32)])
    x = pad_rows(level.input)
    # when the decoder target IS the encoder input (every topic/vae
    # level without an explicit output), y rides as None and the epoch
    # fn reuses the gathered input: a second [P, D] plane + a second
    # per-epoch permutation gather held ~8 GB at 500k x 2k and OOM'd
    # the 16 GB chip (r5; distinct jit parameters defeat XLA CSE even
    # when host-side they are the same array)
    y = None if level.output is None else pad_rows(level.target)
    return x, pad_rows(level.input_null), y, w, num_mb


class MixedTrainer:
    """Shared encoder + per-level decoders (train_mixed,
    vae/topic.rs:70-172)."""

    def __init__(
        self,
        encoder,
        decoders: Sequence[Any],
        config: TrainConfig,
        *,
        feature_weights: Sequence[Optional[np.ndarray]] | None = None,
        loss_hook: Optional[Callable[[jax.Array, int, dict], jax.Array]] = None,
        decoder_weights: Sequence[float] | None = None,
        mesh=None,  # jax.sharding.Mesh: dp-shard level rows, replicate params
    ):
        """`decoders[level]` may be a single decoder or a LIST of
        decoders scored on the same z with `decoder_weights`-weighted
        likelihood sums (train_mixed_multi_decoder, vae/topic.rs:180 —
        multi-modality: one cell observed under RNA + ATAC etc.)."""
        self.encoder = encoder
        self.decoders = list(decoders)
        self.decoder_weights = list(decoder_weights) if decoder_weights else None
        # per-decoder [start, end) column slices of the target when a
        # level's decoders each own a modality block of the concatenated
        # feature axis (joint-topic, senna topic/train_joint.rs)
        self.target_slices: Optional[Sequence[tuple[int, int]]] = None
        self.config = config
        self.feature_weights = (
            list(feature_weights) if feature_weights is not None else [None] * len(decoders)
        )
        self.loss_hook = loss_hook
        self.optimizer = make_optimizer(config)
        self.mesh = mesh
        self._epoch_fns: dict[int, Callable] = {}

    # -- init ------------------------------------------------------------

    def init(self, level_data: Sequence[LevelData], key: jax.Array):
        """Initialize encoder + all decoder params in one variables dict."""
        k_enc, *k_dec = jax.random.split(key, 1 + len(self.decoders))
        x0 = jnp.asarray(level_data[0].input[:2])
        null0 = (
            jnp.asarray(level_data[0].input_null[:2])
            if level_data[0].input_null is not None
            else None
        )
        enc_vars = self.encoder.init(
            {"params": k_enc, "reparam": k_enc}, x0, null0, train=True
        )
        params = {"encoder": enc_vars["params"]}
        batch_stats = {"encoder": enc_vars.get("batch_stats", {})}
        for i, (dec, lvl) in enumerate(zip(self.decoders, level_data)):
            y0 = jnp.asarray(lvl.target[:2])
            if isinstance(dec, (list, tuple)):
                params[f"decoder_{i}"] = [
                    d.init(
                        k_dec[i],
                        jnp.zeros((2, d.n_topics)),
                        y0[:, self.target_slices[di][0] : self.target_slices[di][1]]
                        if self.target_slices is not None
                        else y0,
                    )["params"]
                    for di, d in enumerate(dec)
                ]
            else:
                log_z = jnp.zeros((2, dec.n_topics))
                dvars = dec.init(k_dec[i], log_z, y0)
                params[f"decoder_{i}"] = dvars["params"]
        opt_state = self.optimizer.init(params)
        return params, batch_stats, opt_state

    # -- one jitted epoch for one level ----------------------------------

    def _epoch_fn(self, level: int):
        if level in self._epoch_fns:
            return self._epoch_fns[level]

        enc = self.encoder
        dec = self.decoders[level]
        fw = self.feature_weights[level]
        fw_j = None if fw is None else jnp.asarray(fw)[None, :]
        smoothing = self.config.topic_smoothing
        optimizer = self.optimizer
        loss_hook = self.loss_hook

        def minibatch_loss(params, batch_stats, key, xb, nb, yb, wb):
            enc_vars = {"params": params["encoder"], "batch_stats": batch_stats["encoder"]}
            (log_z, kl), mut = enc.apply(
                enc_vars,
                xb,
                nb,
                train=True,
                rngs={"reparam": key},
                mutable=["batch_stats"],
            )
            from .losses import smooth_topics

            log_z = smooth_topics(log_z, smoothing)
            if isinstance(dec, (list, tuple)):
                # weighted multi-decoder llik sum (vae/topic.rs:244-249),
                # each decoder optionally scoring its modality slice
                weights = self.decoder_weights or [1.0] * len(dec)
                llik = 0.0
                for di, (d, dw) in enumerate(zip(dec, weights)):
                    y_d = (
                        yb[:, self.target_slices[di][0] : self.target_slices[di][1]]
                        if self.target_slices is not None
                        else yb
                    )
                    _, ll = d.apply(
                        {"params": params[f"decoder_{level}"][di]}, log_z, y_d, fw_j
                    )
                    llik = llik + dw * ll
            else:
                _, llik = dec.apply(
                    {"params": params[f"decoder_{level}"]}, log_z, yb, fw_j
                )
            # mean over REAL rows only (vae/topic.rs:129)
            denom = jnp.maximum(jnp.sum(wb), 1.0)
            loss = jnp.sum((kl - llik) * wb) / denom
            if loss_hook is not None:
                loss = loss_hook(
                    loss, level, {"log_z": log_z, "w": wb, "params": params}
                )
            aux = (
                {"encoder": mut["batch_stats"]},
                jnp.sum(llik * wb),
                jnp.sum(kl * wb),
                jnp.sum(jnp.sum(yb, -1) * wb),
            )
            return loss, aux

        grad_fn = jax.value_and_grad(minibatch_loss, has_aux=True)

        @partial(jax.jit, static_argnames=("n_epochs",), donate_argnums=(0, 2))
        def epoch(params, batch_stats, opt_state, key, x, null, y, w, *, n_epochs=1):
            p_pad = x.shape[0]
            mb = self.config.minibatch_size
            num_mb = p_pad // mb

            def step(carry, batch):
                params, batch_stats, opt_state = carry
                nb = yb = None
                if null is None and y is None:
                    xb, wb, kb = batch
                elif null is None:
                    xb, yb, wb, kb = batch
                elif y is None:
                    xb, nb, wb, kb = batch
                else:
                    xb, nb, yb, wb, kb = batch
                if yb is None:
                    yb = xb  # shared input/target: one gather, one plane
                (loss, (new_bs, llik, kl, cnt)), grads = grad_fn(
                    params, batch_stats, kb, xb, nb, yb, wb
                )
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, new_bs, opt_state), (llik, kl, cnt)

            def one_epoch(carry, ek):
                params, batch_stats, opt_state = carry
                kperm, kscan = jax.random.split(ek)
                perm = jax.random.permutation(kperm, p_pad)
                xs = x[perm].reshape(num_mb, mb, -1)
                ws = w[perm].reshape(num_mb, mb)
                mb_keys = jax.random.split(kscan, num_mb)
                parts = [xs]
                if null is not None:
                    parts.append(null[perm].reshape(num_mb, mb, -1))
                if y is not None:
                    parts.append(y[perm].reshape(num_mb, mb, -1))
                batches = (*parts, ws, mb_keys)
                (params, batch_stats, opt_state), (lliks, kls, cnts) = jax.lax.scan(
                    step, (params, batch_stats, opt_state), batches
                )
                return (params, batch_stats, opt_state), (
                    lliks.sum(),
                    kls.sum(),
                    cnts.sum(),
                )

            ekeys = jax.random.split(key, n_epochs)
            (params, batch_stats, opt_state), (lliks, kls, cnts) = jax.lax.scan(
                one_epoch, (params, batch_stats, opt_state), ekeys
            )
            return params, batch_stats, opt_state, lliks, kls, cnts

        self._epoch_fns[level] = epoch
        return epoch

    # -- driver ----------------------------------------------------------

    def train(
        self,
        level_data: Sequence[LevelData],
        key: jax.Array | None = None,
        *,
        init_params: dict | None = None,
    ) -> tuple[dict, dict, TrainScores]:
        cfg = self.config
        if key is None:
            key = jax.random.key(cfg.seed)
        k_init, key = jax.random.split(key)
        params, batch_stats, opt_state = self.init(level_data, k_init)
        if init_params is not None:
            # warm start / prior init: DEEP overlay of matching entries
            # (a partial subtree — e.g. only the dictionary logits —
            # keeps its siblings), fresh optimizer state
            def deep_merge(base, over):
                if isinstance(base, dict) and isinstance(over, dict):
                    out = dict(base)
                    for k, v in over.items():
                        out[k] = deep_merge(base[k], v) if k in base else v
                    return out
                return over

            params = jax.tree.map(
                lambda w: jnp.asarray(w), deep_merge(params, init_params)
            )
            opt_state = self.optimizer.init(params)

        row_mult = 1
        if self.mesh is not None:
            from ..parallel.mesh import DATA_AXIS

            row_mult = self.mesh.shape[DATA_AXIS]
        padded = [
            _pad_level(lvl, cfg.minibatch_size, row_mult) for lvl in level_data
        ]
        if self.mesh is not None:
            # SURVEY north-star layout: rows (pseudobulks/cells) shard
            # over dp, params + optimizer state replicate; the padded
            # rows carry zero weight so the masked loss is unchanged,
            # and XLA inserts the grad psum from these placements
            from ..parallel.mesh import data_sharding, replicate

            def _place(t):
                x, null, y, w, num_mb = t
                ds = data_sharding(self.mesh, 2)
                return (
                    jax.device_put(x, ds),
                    None if null is None else jax.device_put(null, ds),
                    None if y is None else jax.device_put(y, ds),
                    jax.device_put(w, data_sharding(self.mesh, 1)),
                    num_mb,
                )

            padded = [_place(t) for t in padded]
            repl = replicate(self.mesh)
            params = jax.device_put(params, repl)
            batch_stats = jax.device_put(batch_stats, repl)
            opt_state = jax.device_put(opt_state, repl)
        scores = TrainScores()
        n_tot = sum(lvl.n for lvl in level_data)

        from ..utils.stop import stop_requested

        done = 0
        while done < cfg.epochs:
            if stop_requested():
                # graceful SIGINT: stop at a chunk boundary and let the
                # caller finalize partial outputs (vae/topic.rs:140-163)
                break
            chunk = min(cfg.epochs_per_call, cfg.epochs - done)
            # per-level per-epoch sums, accumulated across levels
            llik_e = np.zeros(chunk)
            kl_e = np.zeros(chunk)
            cnt_e = np.zeros(chunk)
            for level, (x, null, y, w, _num_mb) in enumerate(padded):
                key, k_ep = jax.random.split(key)
                epoch_fn = self._epoch_fn(level)
                params, batch_stats, opt_state, lliks, kls, cnts = epoch_fn(
                    params, batch_stats, opt_state, k_ep, x, null, y, w,
                    n_epochs=chunk,
                )
                llik_e += np.asarray(lliks)
                kl_e += np.asarray(kls)
                cnt_e += np.asarray(cnts)
            # per-count llik / per-sample kl traces (vae/topic.rs:146-148)
            scores.llik.extend((llik_e / np.maximum(cnt_e, 1.0)).tolist())
            scores.kl.extend((kl_e / max(n_tot, 1)).tolist())
            done += chunk

        return {"params": params, "batch_stats": batch_stats}, opt_state, scores

    # -- inference -------------------------------------------------------

    def encode(
        self, variables: dict, x: np.ndarray, null: np.ndarray | None = None
    ) -> np.ndarray:
        """Posterior-mode latent (eval path, no sampling)."""
        enc_vars = {
            "params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"],
        }
        log_z, _ = self.encoder.apply(
            enc_vars, jnp.asarray(x), None if null is None else jnp.asarray(null), train=False
        )
        return np.asarray(log_z)
