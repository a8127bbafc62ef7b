"""Fused Pallas kernel for the expected-NCE phase-1 epoch step.

The phase-1 hot loop (`embedding/nce.py::_expected_nce_loss` under
`value_and_grad`) is HBM-bound: XLA materializes the [P, D] score
plane between the forward matmul, the elementwise log-sigmoids, and
the three backward matmuls, so each epoch moves ~5-6 plane-sized
buffers through HBM. This kernel computes the LOSS AND ALL FOUR
GRADIENTS in one pass over the count plane, using the identity

    c*logsig(s) + w*logsig(-s) = c*s - (c + w)*softplus(s)
    d/ds [ . ]                 = c - (c + w)*sigmoid(s)

with w = k_neg * m_p * q_g the rank-1 expected-negative weights
(never materialized). Per gene tile, everything after the score
matmul stays in VMEM:

    s       = e_axis @ e_feat_tile^T + b_feat + b_axis      (MXU)
    loss   += sum(c*s - a*softplus(s)),  a = c + w           (VPU)
    g_s     = c - a*sigmoid(s)                               (VPU)
    g_eax  += g_s @ e_feat_tile                              (MXU)
    g_efeat = g_s^T @ e_axis                                 (MXU)
    g_bax  += row-sums,  g_bfeat = col-sums                  (VPU)

HBM traffic per epoch = ONE read of the count plane (bf16 halves it)
plus the small [.,H] sides — the speed-of-light for this objective.
The loss sign/normalization (-1/total) and the ridge term are applied
outside the kernel.

Caller contract (the jax-side wrapper `nce_epoch_grads` handles all of
it): P pads to 8, D to TILE_D, H to 128; padded rows/columns carry
zero counts, zero mass and zero q, which contribute nothing to loss or
gradients through either term (a = 0 and c = 0 kill both).

Reference provenance: same objective as graph-embedding-util
`loss/feat.rs:434-572` in exact expectation (see nce.py docstring).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H_PAD = 128  # embedding lanes (MXU-aligned; H <= 128 asserted)


def _epoch_kernel(
    c_ref,  # [P_pad, TILE_D] counts (f32 or bf16)
    q_ref,  # [1, TILE_D] negative marginal tile (f32)
    ef_ref,  # [TILE_D, H_PAD] feature embedding tile (f32)
    bf_ref,  # [1, TILE_D] feature bias tile (f32)
    ea_ref,  # [P_pad, H_PAD] axis embedding (resident)
    ba_ref,  # [P_pad, 1] axis bias (resident)
    m_ref,  # [P_pad, 1] row masses (resident)
    kneg_ref,  # [1, 1] expected-negatives scalar
    loss_ref,  # out [1, TILE_D]: per-tile loss partial at row 0
    gef_ref,  # out [TILE_D, H_PAD] feature embedding grad tile
    gbf_ref,  # out [1, TILE_D] feature bias grad tile
    gea_ref,  # out [P_pad, H_PAD] axis embedding grad (pinned accumulator)
    gba_ref,  # out [P_pad, 1] axis bias grad (pinned accumulator)
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        gea_ref[:, :] = jnp.zeros_like(gea_ref)
        gba_ref[:, :] = jnp.zeros_like(gba_ref)

    ea = ea_ref[:, :]  # [P, Hp] f32
    ef = ef_ref[:, :]  # [Td, Hp] f32
    # scores: [P, Td] = ea @ ef^T + biases
    s = jax.lax.dot_general(
        ea, ef,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + bf_ref[0:1, :] + ba_ref[:, 0:1]

    c = c_ref[:, :].astype(jnp.float32)
    a = c + kneg_ref[0, 0] * (m_ref[:, 0:1] * q_ref[0:1, :])  # c + w
    # forward: sum(c*s - a*softplus(s)); backward: g_s = c - a*sigmoid(s)
    num = c * s - a * jax.nn.softplus(s)
    loss_ref[0:1, :] = jnp.sum(num, axis=0, keepdims=True)
    g_s = c - a * jax.nn.sigmoid(s)

    gea_ref[:, :] += jnp.dot(g_s, ef, preferred_element_type=jnp.float32)
    gba_ref[:, :] += jnp.sum(g_s, axis=1, keepdims=True)
    gef_ref[:, :] = jax.lax.dot_general(
        g_s, ea,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gbf_ref[0:1, :] = jnp.sum(g_s, axis=0, keepdims=True)


@partial(jax.jit, static_argnames=("tile_d", "interpret"))
def _epoch_call(
    c_pad,  # [P_pad, D_pad] counts (f32/bf16), padded
    q_pad,  # [1, D_pad]
    ef_pad,  # [D_pad, H_PAD]
    bf_pad,  # [1, D_pad]
    ea_pad,  # [P_pad, H_PAD]
    ba_pad,  # [P_pad, 1]
    m_pad,  # [P_pad, 1]
    kneg,  # [1, 1]
    *,
    tile_d: int,
    interpret: bool = False,
):
    p_pad, d_pad = c_pad.shape
    n_dt = d_pad // tile_d
    grid_spec = pl.GridSpec(
        grid=(n_dt,),
        in_specs=[
            pl.BlockSpec((p_pad, tile_d), lambda i: (0, i)),
            pl.BlockSpec((1, tile_d), lambda i: (0, i)),
            pl.BlockSpec((tile_d, H_PAD), lambda i: (i, 0)),
            pl.BlockSpec((1, tile_d), lambda i: (0, i)),
            pl.BlockSpec((p_pad, H_PAD), lambda i: (0, 0)),  # resident
            pl.BlockSpec((p_pad, 1), lambda i: (0, 0)),  # resident
            pl.BlockSpec((p_pad, 1), lambda i: (0, 0)),  # resident
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_d), lambda i: (0, i)),
            pl.BlockSpec((tile_d, H_PAD), lambda i: (i, 0)),
            pl.BlockSpec((1, tile_d), lambda i: (0, i)),
            pl.BlockSpec((p_pad, H_PAD), lambda i: (0, 0)),  # pinned acc
            pl.BlockSpec((p_pad, 1), lambda i: (0, 0)),  # pinned acc
        ],
    )
    return pl.pallas_call(
        _epoch_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((d_pad, H_PAD), jnp.float32),
            jax.ShapeDtypeStruct((1, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((p_pad, H_PAD), jnp.float32),
            jax.ShapeDtypeStruct((p_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(c_pad, q_pad, ef_pad, bf_pad, ea_pad, ba_pad, m_pad, kneg)


def pick_tile_d(p_pad: int, d_pad: int, bytes_per_count: int) -> int | None:
    """Largest tile_d in {512, 256, 128} dividing d_pad whose working
    set fits a conservative VMEM budget; None if even 128 doesn't fit
    (caller falls back to the XLA path). Streamed blocks (count tile,
    q/ef/bf tiles and their grad outputs) double-buffer; the [P, tile]
    score/grad intermediates and the resident axis side count once."""
    resident = p_pad * (2 * H_PAD + 3) * 4  # ea + gea + ba/m/gba
    for tile in (512, 256, 128):
        if d_pad % tile:
            continue
        streamed = p_pad * tile * bytes_per_count  # count tile
        streamed += 2 * tile * H_PAD * 4 + 4 * tile * 4  # ef/gef + q/bf/...
        scratch = p_pad * tile * 8  # scores + g_s, f32
        if resident + 2 * streamed + scratch <= 13 * 2**20:
            return tile
    return None


def nce_epoch_grads(
    e_feat,  # [D_pad, H] f32 (pre-padded on D; H raw)
    b_feat,  # [D_pad]
    e_axis,  # [P, H]
    b_axis,  # [P]
    c_pad,  # [P_pad, D_pad] counts, padded, f32/bf16 — STORED padded
    q_pad,  # [1, D_pad] f32
    m_pad,  # [P_pad, 1] f32
    *,
    k_neg: float,
    total: jax.Array,  # scalar f32, sum of real counts
    ridge: float = 0.0,
    d_real: int | None = None,  # unpadded D for the ridge denominator
    interpret: bool = False,
):
    """(loss, g_e_feat, g_b_feat, g_e_axis, g_b_axis) for ONE level —
    exactly `value_and_grad(_expected_nce_loss)` of nce.py (dense,
    unstratified q), computed in one fused pass. Params keep their
    true (unpadded) H/P; count/q/m come pre-padded so the epoch scan
    never re-pads."""
    p = e_axis.shape[0]
    h = e_feat.shape[1]
    assert h <= H_PAD, f"H={h} exceeds the kernel's {H_PAD}-lane budget"
    p_pad, d_pad = c_pad.shape

    ef = jnp.pad(e_feat.astype(jnp.float32), ((0, 0), (0, H_PAD - h)))
    ea = jnp.pad(
        e_axis.astype(jnp.float32), ((0, p_pad - p), (0, H_PAD - h))
    )
    bf = b_feat.astype(jnp.float32)[None, :]
    ba = jnp.pad(b_axis.astype(jnp.float32), (0, p_pad - p))[:, None]
    kneg = jnp.full((1, 1), k_neg, jnp.float32)

    tile_d = pick_tile_d(p_pad, d_pad, np.dtype(c_pad.dtype).itemsize)
    assert tile_d is not None, "shape exceeds VMEM budget; use XLA path"
    loss_rows, gef, gbf, gea, gba = _epoch_call(
        c_pad, q_pad, ef, bf, ea, ba, m_pad, kneg,
        tile_d=tile_d, interpret=interpret,
    )
    scale = -1.0 / total
    loss = scale * jnp.sum(loss_rows)
    g_e_feat = scale * gef[:, :h]
    g_b_feat = scale * gbf[0]
    g_e_axis = scale * gea[:p, :h]
    g_b_axis = scale * gba[:p, 0]
    if ridge > 0:
        # ridge * mean_over_rows(sum_h e^2): grad = 2*ridge*e / D_rows.
        # Denominator uses the UNPADDED row count for parity with the
        # XLA path (padded rows are zero, so the sum is unchanged).
        dr = d_real if d_real is not None else e_feat.shape[0]
        loss = loss + ridge * jnp.sum(e_feat**2) / dr
        g_e_feat = g_e_feat + (2.0 * ridge / dr) * e_feat
    return loss, g_e_feat, g_b_feat, g_e_axis, g_b_axis
