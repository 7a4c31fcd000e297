"""Losses: logistic and factorization-machine, as pure batch-local math.

Counterpart of the reference's ``src/loss/fm_loss.h`` :: FMLoss and
``src/loss/logit_loss.h`` :: LogitLoss (plus ``include/difacto/loss.h``'s
Predict/CalcGrad interface). Differences forced by TPU-first design:

  * the reference streams CSR rows through CPU SpMV/SpMM
    (``src/common/spmv.h``/``spmm.h``); here every batch is a dense padded
    ``[B, L]`` block, so "SpMV" is an elementwise-multiply + row reduction
    and "SpMM" is a ``[B, L] x [B, L, K]`` contraction that XLA fuses and
    maps onto the VPU/MXU;
  * gradients are returned per nnz-slot in batch layout; the caller
    segment-sums them per unique id (the reference pushes per-key
    aggregated gradients to servers — same aggregation, different place);
  * gradient convention matches the reference exactly: labels y in
    {-1,+1}, per-example loss log(1+exp(-y*py)), gradients are SUMS over
    the batch (no 1/B averaging), so learning-rate knobs transfer.

The FM second-order term is the classic sum-of-squares minus
square-of-sums:  py = <w, x> + 1/2 * sum_k [ (sum_i x_i V_ik)^2
                                             - sum_i x_i^2 V_ik^2 ].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def stable_logloss(margin: jnp.ndarray) -> jnp.ndarray:
    """log(1 + exp(margin)), overflow-safe (margin = -y * py).

    Single home for this expression — the learners and kernels reuse it.
    """
    return jnp.log1p(jnp.exp(-jnp.abs(margin))) + jnp.maximum(margin, 0.0)


class FMForward(NamedTuple):
    py: jnp.ndarray      # f32 [B] raw margin
    S: jnp.ndarray       # f32 [B, K] sum_i x_i * V_ik (residual for grad)


def fm_predict(vals: jnp.ndarray, W: jnp.ndarray, V: jnp.ndarray) -> FMForward:
    """vals, W: f32 [B, L]; V: f32 [B, L, K] (K may be 0).

    Padding slots must arrive with vals == 0 — they then contribute
    nothing to any term (the reference's variable-length rows simply
    lack those entries).
    """
    linear = jnp.sum(vals * W, axis=-1)
    if V.shape[-1] == 0:
        return FMForward(linear, jnp.zeros(vals.shape[:1] + (0,), vals.dtype))
    xv = vals[..., None] * V                       # [B, L, K]
    S = jnp.sum(xv, axis=1)                        # [B, K]
    Q = jnp.sum(xv * xv, axis=1)                   # [B, K] == sum x^2 V^2
    py = linear + 0.5 * jnp.sum(S * S - Q, axis=-1)
    return FMForward(py, S)


class FMGrads(NamedTuple):
    dW: jnp.ndarray      # f32 [B, L]
    dV: jnp.ndarray      # f32 [B, L, K]
    loss: jnp.ndarray    # f32 [B] per-example logloss (0 on masked rows)
    correct: jnp.ndarray # f32 [B] 1 where sign-correct


def logit_grad_coeff(py: jnp.ndarray, labels01: jnp.ndarray, mask: jnp.ndarray):
    """d l/d py for l = log(1+exp(-y*py)), y = 2*labels01 - 1.

    Equals sigma(py) - labels01; stable form used for the loss value.
    Reference: LogitLoss::CalcGrad's tau = -y * sigma(-y*py).
    """
    y = 2.0 * labels01 - 1.0
    loss = stable_logloss(-y * py) * mask
    d = (jax.nn.sigmoid(py) - labels01) * mask
    correct = ((py > 0) == (labels01 > 0.5)).astype(py.dtype) * mask
    return d, loss, correct


def fm_loss_grad(
    vals: jnp.ndarray,
    W: jnp.ndarray,
    V: jnp.ndarray,
    labels01: jnp.ndarray,
    mask: jnp.ndarray,
) -> tuple[FMForward, FMGrads]:
    """Fused predict + gradient (reference: FMLoss::Predict then CalcGrad;
    fused here because XLA fuses the shared subexpressions anyway)."""
    fwd = fm_predict(vals, W, V)
    d, loss, correct = logit_grad_coeff(fwd.py, labels01, mask)
    dW = vals * d[:, None]
    if V.shape[-1] == 0:
        dV = jnp.zeros_like(V)
    else:
        # d py / d V_ik = x_i * (S_k - x_i V_ik)
        dV = d[:, None, None] * vals[:, :, None] * (fwd.S[:, None, :] - vals[:, :, None] * V)
    return fwd, FMGrads(dW, dV, loss, correct)


def ffm_loss_grad(
    vals: jnp.ndarray,     # f32 [B, L]
    W: jnp.ndarray,        # f32 [B, L]
    V4: jnp.ndarray,       # f32 [B, L, F, K]
    labels01: jnp.ndarray,
    mask: jnp.ndarray,
    fields: jnp.ndarray | None = None,  # i32 [B, L] per-slot field id < F
    block: int = 0,        # >0: L-blocked streaming (peak O(B*block*L*K))
) -> tuple[FMForward, FMGrads]:
    """Field-aware FM: py = <w,x> + sum_{i<j} x_i x_j <V_i[f_j], V_j[f_i]>.

    No reference counterpart file (difacto ships FM only; FFM is the
    BASELINE.json stretch config, matching the libffm model).

    Two field sources:
      * ``fields=None`` — slot position IS the field (F must equal L).
        Exact for fixed-schema CTR data (Criteo/Avazu style, one feature
        per field per row, written in field order);
      * ``fields`` given — explicit per-slot field ids, as parsed from
        ``field:idx:val`` libffm text (``data_format=libffm``). Supports
        any slot order and several features per field. Padding slots must
        carry vals == 0 (their field id is then irrelevant).

    Cost is O(B L^2 K) versus FM's O(B L K) — the classic FFM tradeoff.
    The dense path materializes ~[B, L, L, K] activations; ``block``
    streams the i axis in L-blocks via lax.scan so peak activation
    memory is O(B * block * L * K) — the counterpart of the reference's
    row-streamed CSR SpMM (any L at bounded memory). Summation order
    differs from dense by float association only.
    """
    if block and block < vals.shape[1]:
        return _ffm_loss_grad_blocked(
            vals, W, V4, labels01, mask, fields, block
        )
    B, L = vals.shape
    F, K = V4.shape[2], V4.shape[3]
    linear = jnp.sum(vals * W, axis=-1)
    if fields is None:
        assert F == L, "slot-position ffm needs F == L"
        # A[b, i, j] = V_i[f_j] with f_j = j: just V4 itself
        A = V4
    else:
        # A[b, i, j, k] = V4[b, i, fields[b, j], k] — feature i's factor
        # for feature j's field
        idx = jnp.clip(fields, 0, F - 1).astype(jnp.int32)
        A = jnp.take_along_axis(
            V4, jnp.broadcast_to(idx[:, None, :, None], (B, L, L, K)), axis=2
        )
    At = jnp.swapaxes(A, 1, 2)                         # At[b,i,j] = V_j[f_i]
    T = jnp.sum(A * At, axis=-1)                       # [B, L, L], symmetric
    M = vals[:, :, None] * vals[:, None, :]            # [B, L, L]
    offdiag = 1.0 - jnp.eye(L, dtype=vals.dtype)
    py = linear + 0.5 * jnp.sum(M * T * offdiag, axis=(1, 2))
    d, loss, correct = logit_grad_coeff(py, labels01, mask)
    dW = vals * d[:, None]
    # dL/dV4[b,i,f,k] = d * sum_{j != i, f_j == f} M[i,j] * A[b,j,i,k]
    G = (d[:, None, None] * M * offdiag)[..., None] * At  # [B, L(i), L(j), K]
    if fields is None:
        dV4 = G
    else:
        # scatter G's j axis into the field axis: segment-sum over (b, f_j)
        seg = (
            jnp.arange(B, dtype=jnp.int32)[:, None] * F
            + jnp.clip(fields, 0, F - 1).astype(jnp.int32)
        ).reshape(-1)                                  # [B*L(j)]
        Gj = jnp.swapaxes(G, 1, 2).reshape(B * L, L, K)  # leading axis = (b, j)
        dV4 = jax.ops.segment_sum(Gj, seg, num_segments=B * F)
        dV4 = jnp.swapaxes(dV4.reshape(B, F, L, K), 1, 2)  # [B, L(i), F, K]
    fwd = FMForward(py, jnp.zeros((B, 0), vals.dtype))
    return fwd, FMGrads(dW, dV4, loss, correct)


def _ffm_loss_grad_blocked(
    vals, W, V4, labels01, mask, fields, block: int
) -> tuple[FMForward, FMGrads]:
    """ffm_loss_grad with the i axis streamed in ``block``-slot chunks.

    Two lax.scan passes (the classic rematerialization split): pass 1
    accumulates py (d needs the FULL margin before any gradient), pass 2
    recomputes each block's cross terms and emits its dV4 slab. Peak
    activation memory is ~3 x [B, block, L, K] instead of the dense
    path's ~6 x [B, L, L, K]; compute doubles the cheap gather/multiply
    stages but the O(B L^2 K) contraction count is unchanged.
    """
    B, L = vals.shape
    F, K = V4.shape[2], V4.shape[3]
    nb = -(-L // block)
    Lp = nb * block
    pad = Lp - L
    vals_p = jnp.pad(vals, ((0, 0), (0, pad)))  # pad slots: x = 0
    if fields is None:
        assert F == L, "slot-position ffm needs F == L"
        # pad the FIELD axis too: slot position is the field, and the
        # last block's dynamic_slice over it must not clamp-and-shift
        V4_p = jnp.pad(V4, ((0, 0), (0, pad), (0, pad), (0, 0)))
        idx_j = None
        fi_p = None
    else:
        V4_p = jnp.pad(V4, ((0, 0), (0, pad), (0, 0), (0, 0)))
        idx_j = jnp.clip(fields, 0, F - 1).astype(jnp.int32)  # [B, L]
        fi_p = jnp.pad(idx_j, ((0, 0), (0, pad)))             # [B, Lp]
    jr = jnp.arange(L, dtype=jnp.int32)

    def cross(b):
        """Block b's M_I (x_i x_j, i != j masked) and At_I (V_j[f_i]):
        the two tensors both passes need. Shapes [B, block, L(, K)]."""
        i0 = b * block
        if fields is None:
            # At[b, ib, j, k] = V4[b, j, i0 + ib, k]
            Vi_t = jax.lax.dynamic_slice_in_dim(V4_p, i0, block, axis=2)
            At = jnp.swapaxes(Vi_t[:, :L], 1, 2)       # [B, block, L, K]
        else:
            fi = jax.lax.dynamic_slice_in_dim(fi_p, i0, block, axis=1)
            At = jnp.take_along_axis(
                V4,
                jnp.broadcast_to(fi[:, None, :, None], (B, L, block, K)),
                axis=2,
            )
            At = jnp.swapaxes(At, 1, 2)                # [B, block, L, K]
        xi = jax.lax.dynamic_slice_in_dim(vals_p, i0, block, axis=1)
        M = xi[:, :, None] * vals[:, None, :]          # [B, block, L]
        ii = i0 + jnp.arange(block, dtype=jnp.int32)
        M = M * (ii[:, None] != jr[None, :]).astype(vals.dtype)
        return M, At

    def fwd_step(py_acc, b):
        M, At = cross(b)
        # A[b, ib, j, k] = V_i[f_j]: gather block i's factors by f_j
        Vi = jax.lax.dynamic_slice_in_dim(V4_p, b * block, block, axis=1)
        if fields is None:
            A = Vi[..., :L, :]                         # F == L
        else:
            A = jnp.take_along_axis(
                Vi,
                jnp.broadcast_to(idx_j[:, None, :, None], (B, block, L, K)),
                axis=2,
            )
        T = jnp.sum(A * At, axis=-1)                   # [B, block, L]
        return py_acc + 0.5 * jnp.sum(M * T, axis=(1, 2)), None

    linear = jnp.sum(vals * W, axis=-1)
    py, _ = jax.lax.scan(
        fwd_step, linear, jnp.arange(nb, dtype=jnp.int32)
    )
    d, loss, correct = logit_grad_coeff(py, labels01, mask)
    dW = vals * d[:, None]
    if fields is not None:
        onehot = (idx_j[..., None] == jnp.arange(F)[None, None, :]).astype(
            vals.dtype
        )                                              # [B, L, F]

    def bwd_step(_, b):
        M, At = cross(b)
        G = (d[:, None, None] * M)[..., None] * At     # [B, block, L, K]
        if fields is None:
            return None, G                             # F == L: j axis IS f
        return None, jnp.einsum("bijk,bjf->bifk", G, onehot)

    _, slabs = jax.lax.scan(
        bwd_step, None, jnp.arange(nb, dtype=jnp.int32)
    )                                                  # [nb, B, block, F, K]
    dV4 = jnp.moveaxis(slabs, 0, 1).reshape(B, Lp, F, K)[:, :L]
    fwd = FMForward(py, jnp.zeros((B, 0), vals.dtype))
    return fwd, FMGrads(dW, dV4, loss, correct)
