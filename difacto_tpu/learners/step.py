"""Worker-side batch math shared by all stores.

This is the TPU counterpart of the body of the reference's
``SGDLearner::Process`` hot loop (``src/sgd/sgd_learner.h`` — Localizer
compact -> Pull -> Loss::Predict/CalcGrad -> per-key gradient aggregation
-> Push). The store implementations orchestrate *where* pull/push happen
(single table vs. sharded with all_to_all); the math here is identical in
both, which is the seam difacto used to test distributed logic in-process
(StoreLocal vs StoreDist).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.losses import (
    ffm_loss_grad, fm_loss_grad, fm_predict, logit_grad_coeff,
)
from ..ops.localize import Localized
from ..ops.metrics import NUM_AUC_BINS, auc_hist_update


class StepMetrics(NamedTuple):
    """Additive per-step metrics (feeds utils.progress.Progress)."""

    examples: jnp.ndarray      # f32 [] number of real rows
    logloss_sum: jnp.ndarray   # f32 []
    correct_sum: jnp.ndarray   # f32 []
    label_sum: jnp.ndarray     # f32 [] sum of labels (clicks)
    pred_sum: jnp.ndarray      # f32 [] sum of sigmoid(py) (predicted clicks)
    auc_hist: jnp.ndarray      # f32 [2, NUM_AUC_BINS]
    dropped_ids: jnp.ndarray   # f32 [] routing-capacity overflow (sharded only)


def zero_metrics() -> StepMetrics:
    z = jnp.zeros((), jnp.float32)
    return StepMetrics(z, z, z, z, z, jnp.zeros((2, NUM_AUC_BINS), jnp.float32), z)


def worker_grads(
    rows_u: jnp.ndarray,   # f32 [U, 1+K] pulled unique rows (w | V)
    loc: Localized,
    vals: jnp.ndarray,     # f32 [B, L]
    labels: jnp.ndarray,   # f32 [B] in {0,1}
    mask: jnp.ndarray,     # f32 [B]
    loss: str = "fm",      # fm | ffm (fm with K=0 == logit)
    fields: jnp.ndarray | None = None,  # i32 [B, L] libffm fields (ffm)
    num_fields: int = 0,   # ffm field count F (0 = F = L, slot position)
    ffm_block: int = 0,    # ffm: L-blocked streaming loss (0 = dense)
) -> tuple[jnp.ndarray, jnp.ndarray, StepMetrics]:
    """Compute per-unique-id aggregated gradients and batch metrics.

    Returns (grads_u [U, 1+K], py [B], metrics). For ffm, K = F*k —
    F = num_fields with explicit libffm ``fields``, else F = L (slot
    position is the field).
    """
    B, L = vals.shape
    U, D = rows_u.shape
    K = D - 1
    rows = rows_u[loc.inv].reshape(B, L, D)
    W = rows[..., 0]
    if loss == "ffm":
        F = num_fields or L
        assert K % F == 0, "ffm rows must be [U, 1 + F*k]"
        V4 = rows[..., 1:].reshape(B, L, F, K // F)
        fwd, g = ffm_loss_grad(vals, W, V4, labels, mask, fields=fields,
                               block=ffm_block)
    else:
        V = rows[..., 1:]
        fwd, g = fm_loss_grad(vals, W, V, labels, mask)
    flat = jnp.concatenate(
        [g.dW.reshape(B * L, 1), g.dV.reshape(B * L, K)], axis=1
    )
    grads_u = jnp.zeros((U, D), flat.dtype).at[loc.inv].add(flat)
    return grads_u, fwd.py, _batch_metrics(fwd.py, g.loss, g.correct,
                                           labels, mask)


def _batch_metrics(py, loss, correct, labels, mask) -> StepMetrics:
    return StepMetrics(
        examples=jnp.sum(mask),
        logloss_sum=jnp.sum(loss),
        correct_sum=jnp.sum(correct),
        label_sum=jnp.sum(labels * mask),
        pred_sum=jnp.sum(jax.nn.sigmoid(py) * mask),
        auc_hist=auc_hist_update(
            jnp.zeros((2, NUM_AUC_BINS), jnp.float32), py, labels, mask
        ),
        dropped_ids=jnp.zeros((), jnp.float32),
    )


def worker_grads_sorted(
    rows_u: jnp.ndarray,   # f32 [U, 1+K] pulled unique rows (w | V)
    loc: Localized,
    vals: jnp.ndarray,     # f32 [B, L]
    labels: jnp.ndarray,   # f32 [B]
    mask: jnp.ndarray,     # f32 [B]
    ss_dev: tuple,         # (x_sorted [BLp], bidx [BLp], inv_sorted [BLp],
                           #  seg tiles, seg wins, seg first) on device
    *,
    loss: str = "fm",      # fm | ffm (fm with K=0 == logit)
    fields: jnp.ndarray | None = None,  # i32 [B, L] libffm fields (ffm)
    num_fields: int = 0,   # ffm field count F (0 = F = L, slot position)
    ffm_block: int = 0,    # ffm: L-blocked streaming loss (0 = dense)
    slot_s: jnp.ndarray | None = None,  # i32 [BLp] flat B*L slot per sorted
                           # slot (the sort permutation; ffm only)
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, StepMetrics]:
    """worker_grads with the gradient aggregation done scatter-free.

    The forward runs in [B, L] batch space exactly as ``worker_grads``
    (same margins, losses, metrics). The backward runs in HOST-SORTED
    slot order and per-key sums come from the ops/segsum.py tile-matmul
    kernel instead of the 655k-index XLA scatter-add (measured 10.9 ms
    of the 24 ms flagship step; scripts/hw_worker_breakdown.py).

    The FM V-gradient needs no per-slot V at all: within a segment every
    slot shares the key's row, so

        gV[u] = sum_s dw_s * (S_b(s) - x_s * V_u)
              = sum_s (dw_s * S_b(s))  -  V_u * sum_s (dw_s * x_s)

    — two segment sums plus a per-KEY combine against the pull output.
    That kills the [B*L]-sized V re-gather (measured +12 ms in the real
    step composition, scripts/hw_sorted_step_bd.py: a 655k gather from a
    just-computed tensor doesn't pipeline the way resident-input
    microbenchmarks suggest). d and S ride ONE combined [B, 1+K] row
    gather: two separate in-graph gathers from computed sources measured
    +4.7 and +2.8 ms where the fused single gather costs ~1.1 ms
    (scripts/hw_bwd_variants.py: 15.4 -> 9.7 ms for the whole
    pull+fwd+bwd chain).

    FFM rides the same segment-sum kernel but with a DIRECT per-slot
    payload: its dV4 has no per-key factoring (each slot's gradient
    depends on the slot's field-crossed partners), and ffm_loss_grad
    already materializes the per-slot [B, L, F, k] gradient in batch
    space — so the payload is one fused [B*L, 1+K] gather by the sort
    permutation ``slot_s`` (pads masked by the static arange(BLp) < B*L
    mask), replacing the [B*L] -> [U] XLA scatter-add with the segsum
    tile-matmul.

    Returns grads PLANAR [1+K, U] (the pair-apply payload layout),
    plus py and metrics. Summation order differs from the scatter path
    by float association only (~1e-6 relative; pinned by tests).
    """
    from ..ops.segsum import lanes_2d, segsum_sorted

    B, L = vals.shape
    U, D = rows_u.shape
    K = D - 1
    rows = rows_u[loc.inv].reshape(B, L, D)
    x_s, bidx, inv_s, s_tiles, s_wins, s_first = ss_dev
    if loss == "ffm":
        F = num_fields or L
        assert K % F == 0, "ffm rows must be [U, 1 + F*k]"
        V4 = rows[..., 1:].reshape(B, L, F, K // F)
        fwd, g = ffm_loss_grad(vals, rows[..., 0], V4, labels, mask,
                               fields=fields, block=ffm_block)
        flat = jnp.concatenate(
            [g.dW.reshape(B * L, 1), g.dV.reshape(B * L, K)], axis=1
        )
        blp = slot_s.shape[0]
        real = (jnp.arange(blp) < B * L)[:, None]  # static pad mask
        pay = jnp.where(real, flat[slot_s], 0.0)   # [BLp, 1+K]
        dp = pay.shape[1]
        pp = (dp + 7) // 8 * 8
        payT = jnp.pad(pay.T, ((0, pp - dp), (0, 0)))
        segs = segsum_sorted(
            payT, lanes_2d(inv_s), (s_tiles, s_wins, s_first),
            ub=U, interpret=interpret,
        )
        return segs[:D], fwd.py, _batch_metrics(fwd.py, g.loss, g.correct,
                                                labels, mask)
    fwd = fm_predict(vals, rows[..., 0], rows[..., 1:])
    d, loss, correct = logit_grad_coeff(fwd.py, labels, mask)
    if K > 0:
        dS = jnp.concatenate([d[:, None], fwd.S], axis=1)   # [B, 1+K]
        g = dS[bidx]                                        # [BLp, 1+K]
        dw_s = g[:, 0] * x_s
        # payload rows: dw | dw*x | dw*S  (2 + K lanes)
        pay = jnp.concatenate(
            [dw_s[:, None], (dw_s * x_s)[:, None],
             dw_s[:, None] * g[:, 1:]], axis=1)
    else:
        pay = (d[bidx] * x_s)[:, None]
    dp = pay.shape[1]
    pp = (dp + 7) // 8 * 8
    payT = jnp.pad(pay.T, ((0, pp - dp), (0, 0)))
    segs = segsum_sorted(
        payT, lanes_2d(inv_s), (s_tiles, s_wins, s_first),
        ub=U, interpret=interpret,
    )
    if K > 0:
        gV = segs[2 : 2 + K] - rows_u.T[1:] * segs[1][None, :]
        grads_p = jnp.concatenate([segs[:1], gV], axis=0)
    else:
        grads_p = segs[:1]
    return grads_p, fwd.py, _batch_metrics(fwd.py, loss, correct,
                                           labels, mask)
