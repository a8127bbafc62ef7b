"""Independent ELBO oracle — a deliberately simple torch-CPU
re-implementation of the reference engine's EXACT dense topic-model
training math, used only to bound engine error for the BASELINE
"matching ELBO" criterion (never on the product path).

Semantics mirrored 1:1 from the reference (cited per step):

- encoder input transform `anscombe_residual`
  (`candle-util/src/value_transform.rs:68-102`: divisor floored at
  EPS_DIV=0.1, Anscombe 2*sqrt(x+3/8), per-cell row centering,
  per-feature soft clamp `s*tanh(r/s)` with s = 4*std);
- Linear+ReLU stack including the FINAL layer
  (`nn/layers.rs:177-203` stack_relu_linear), BatchNorm
  (eps 1e-4, momentum 0.1, affine — `nn/batch_norm.rs:29-37`),
  z_mean / z_lnvar heads clamped to ±8 (`encoder/softmax.rs:61-77`);
- reparameterization mean + exp(lnvar/2)*eps and Gaussian KL
  0.5*sum(var - 1 + mean^2 - lnvar) (`loss.rs:15-31`);
- topic smoothing log((1-a)*exp(log_z) + a/K) (`vae/mod.rs:26-33`);
- decoder log_recon = logsumexp_k(log_z_nk + log_softmax_d(W_kd + b_d))
  (`nn/linear.rs:243-261` SoftmaxLinear.forward_log), llik =
  sum_d w_d*x_d*log_recon (`decoder/topic.rs:96-101`);
- loss = mean(kl - llik) per minibatch, AdamW(lr, wd=0.01), global-L2
  clip scale min(1, c/(|g|+1e-6)) with a non-finite skip guard
  (`vae/topic.rs:107-145`, `vae/mod.rs:119-177`);
- traces: llik_tot/count_tot and kl_tot/n_tot per epoch
  (`vae/topic.rs:146-148`).

The oracle is an *engine* oracle: feed it the same per-level
(input, null, target) matrices the JAX trainer trains on and its
converged per-count llik defines the tolerance band the JAX engine
must land in. torch-CPU (baked in) rather than hand-rolled numpy
backprop: autodiff removes transcription risk in the gradient math,
and torch is independent of the JAX/XLA stack being validated.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

EPS_DIV = 0.1
EPS = 1e-6
TANH_K = 4.0


@dataclass
class OracleScores:
    llik: list = field(default_factory=list)
    kl: list = field(default_factory=list)


def _torch():
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    return torch


def anscombe_residual_t(y_nf, x0_nf=None, mu_f=None):
    """`value_transform.rs:68-102` on torch tensors."""
    torch = _torch()
    divisor = None
    if x0_nf is not None and mu_f is not None:
        divisor = x0_nf * mu_f
    elif x0_nf is not None:
        divisor = x0_nf
    elif mu_f is not None:
        divisor = mu_f.expand_as(y_nf)
    clean = y_nf if divisor is None else y_nf / divisor.clamp(min=EPS_DIV)
    a = 2.0 * torch.sqrt(clean + 0.375)
    r = a - a.mean(dim=1, keepdim=True)
    var_1f = (r - r.mean(dim=0, keepdim=True)).pow(2).mean(dim=0, keepdim=True)
    scale_1f = TANH_K * torch.sqrt(var_1f + EPS)
    return scale_1f * torch.tanh(r / scale_1f)


def build_oracle_model(n_features: int, n_topics: int, layers, n_dec_features, seed=0):
    """Encoder/decoder with the reference's module structure. Returns
    (torch.nn.ModuleDict, forward_fn(x, null, y, fw, train) ->
    (loss, llik_sum, kl_sum))."""
    torch = _torch()
    torch.manual_seed(seed)

    fc = []
    prev = n_features
    for dim in layers:  # every layer Linear+ReLU incl. final (layers.rs:185-201)
        fc += [torch.nn.Linear(prev, dim), torch.nn.ReLU()]
        prev = dim
    model = torch.nn.ModuleDict(
        {
            "fc": torch.nn.Sequential(*fc),
            "bn_z": torch.nn.BatchNorm1d(prev, eps=1e-4, momentum=0.1, affine=True),
            "z_mean": torch.nn.Linear(prev, n_topics),
            "z_lnvar": torch.nn.Linear(prev, n_topics),
        }
    )
    # decoder dictionary logits [K, D] + per-feature bias (log_softmax_linear)
    model.register_parameter(
        "dict_logits", torch.nn.Parameter(torch.zeros(n_topics, n_dec_features))
    )
    model.register_parameter(
        "dict_bias", torch.nn.Parameter(torch.zeros(1, n_dec_features))
    )
    return model


def oracle_train_mixed(
    level_data,
    *,
    n_topics: int,
    layers=(64, 32),
    epochs: int = 100,
    minibatch_size: int = 256,
    learning_rate: float = 1e-3,
    topic_smoothing: float = 0.01,
    grad_clip: float = 10.0,
    feature_weights=None,
    seed: int = 0,
) -> tuple[object, OracleScores]:
    """`train_mixed` (vae/topic.rs:70-172) with a SHARED encoder and one
    decoder per level. `level_data` is a list of (input, null, target)
    numpy triples ([P, D_enc], optional [P, D_enc], [P, D_dec])."""
    torch = _torch()
    torch.manual_seed(seed)
    gen = torch.Generator().manual_seed(seed)

    levels = []
    for x, null, y in level_data:
        y = x if y is None else y
        levels.append(
            (
                torch.as_tensor(np.asarray(x, np.float32)),
                None if null is None else torch.as_tensor(np.asarray(null, np.float32)),
                torch.as_tensor(np.asarray(y, np.float32)),
            )
        )
    n_features = levels[0][0].shape[1]

    model = build_oracle_model(
        n_features, n_topics, layers, levels[0][2].shape[1], seed=seed
    )
    # one decoder per level at its own feature resolution
    for li, (_, _, y) in enumerate(levels[1:], start=1):
        model.register_parameter(
            f"dict_logits_{li}", torch.nn.Parameter(torch.zeros(n_topics, y.shape[1]))
        )
        model.register_parameter(
            f"dict_bias_{li}", torch.nn.Parameter(torch.zeros(1, y.shape[1]))
        )
    fw_t = []
    for li in range(len(levels)):
        w = None if feature_weights is None else feature_weights[li]
        fw_t.append(None if w is None else torch.as_tensor(np.asarray(w, np.float32))[None, :])

    opt = torch.optim.AdamW(model.parameters(), lr=learning_rate, weight_decay=0.01)
    scores = OracleScores()
    n_tot = sum(x.shape[0] for x, _, _ in levels)

    def forward(level, xb, nb, yb):
        h = anscombe_residual_t(xb, nb, None)
        h = model["fc"](h)
        h = model["bn_z"](h)
        z_mean = model["z_mean"](h).clamp(-8.0, 8.0)
        z_lnvar = model["z_lnvar"](h).clamp(-8.0, 8.0)
        eps = torch.randn(z_mean.shape, generator=gen)
        z = z_mean + torch.exp(0.5 * z_lnvar) * eps
        log_z = torch.log_softmax(z, dim=1)
        kl = 0.5 * (torch.exp(z_lnvar) - 1.0 + z_mean.pow(2) - z_lnvar).sum(dim=1)
        if topic_smoothing > 0:
            k = log_z.shape[1]
            log_z = torch.log(
                (1.0 - topic_smoothing) * torch.exp(log_z) + topic_smoothing / k
            )
        suffix = "" if level == 0 else f"_{level}"
        logits = getattr(model, "dict_logits" + suffix) + getattr(
            model, "dict_bias" + suffix
        )
        log_beta = torch.log_softmax(logits, dim=1)  # [K, D]
        log_recon = torch.logsumexp(log_z[:, :, None] + log_beta[None], dim=1)
        wx = yb if fw_t[level] is None else yb * fw_t[level]
        llik = (wx * log_recon).sum(dim=1)
        return kl, llik

    for _epoch in range(epochs):
        llik_tot = kl_tot = count_tot = 0.0
        for level, (x, null, y) in enumerate(levels):
            p = x.shape[0]
            perm = torch.randperm(p, generator=gen)
            for lo in range(0, p, minibatch_size):
                idx = perm[lo : lo + minibatch_size]
                if len(idx) < 2:
                    continue  # BatchNorm(train) needs >=2 rows
                xb, yb = x[idx], y[idx]
                nb = None if null is None else null[idx]
                kl, llik = forward(level, xb, nb, yb)
                loss = (kl - llik).mean()
                opt.zero_grad()
                loss.backward()
                # global-L2 clip + non-finite skip (vae/mod.rs:119-149)
                sumsq = sum(
                    float(p_.grad.pow(2).sum())
                    for p_ in model.parameters()
                    if p_.grad is not None
                )
                if np.isfinite(sumsq):
                    scale = min(1.0, grad_clip / (np.sqrt(sumsq) + 1e-6))
                    if scale < 1.0:
                        for p_ in model.parameters():
                            if p_.grad is not None:
                                p_.grad.mul_(scale)
                    opt.step()
                llik_tot += float(llik.detach().sum())
                kl_tot += float(kl.detach().sum())
                count_tot += float(yb.sum())
        scores.llik.append(llik_tot / max(count_tot, 1.0))
        scores.kl.append(kl_tot / max(n_tot, 1))
    return model, scores
