"""Fused FM forward+backward over chunk-sorted slots (Pallas).

Replaces the XLA expansion-gather + per-row reductions + gradient
flattening of ``learners/step.py`` :: worker_grads for the sorted
pipeline. Together with ``ops/sweep_ms.py`` this removes every
per-element sparse op from the train step: the FM math
(reference: ``src/loss/fm_loss.h` + ``src/common/spmv.h``/``spmm.h``)
becomes tile DMAs + one-hot matmuls on the MXU.

Layout: slots arrive sorted by id within row-chunks of ``chunk_rows``
examples (data/prep.py :: SortedBatch), with per-slot pulled rows
``rows_p [1+K, NNZ]`` from the pull sweep. Per chunk the kernel makes
two passes over the chunk's slot tiles:

  pass 1 (aggregate): acc[1+2K, R] += contrib @ onehot(row) — per-example
      linear term, S_k = sum x V_k, and Q_k = sum x^2 V_k^2;
  margin: py = lin + 1/2 sum_k (S^2 - Q); d = (sigma(py) - y) * mask;
  pass 2 (scatter-back): d_slot = onehot @ d, S_slot = S @ onehot^T,
      dW = x d_slot, dV = d_slot x (S_slot - x V) — written per slot in
      the same sorted order, ready for the apply sweep.

Padding slots (sentinel ids) carry x = 0 and masked rows, contributing
exact zeros. Tile spill at chunk edges is overwritten by the next
chunk's forward-ordered writes (same discipline as the sweeps).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024   # DMA granularity; sel built per 512-lane half
HALF = 512


def _pad8(d: int) -> int:
    # planar arrays are (8, 128)-tiled in HBM: sublane-pad row counts
    return (d + 7) // 8 * 8


def _fm_chunk_kernel(
    svals_ref, srow_ref, sid_ref, rows_ref,   # HBM [NNZ(+pad)] / [1+K, ...]
    ginit_ref,                                # HBM zeros aliased to grads out
    labels_ref, mask_ref,                     # VMEM blocks [R]
    py_ref,                                   # out VMEM block [R]
    grads_ref,                                # out HBM [1+K, NNZ+TILE]
    xv_s, xr_s, xi_s, rows_s, acc_ref, g_s,
    sem_a, sem_b, sem_c, sem_d, sem_o,
    *,
    chunk_rows: int, qp: int, k: int, num_rows: int,
):
    c = pl.program_id(0)
    base_slot = c * qp
    base_row = c * chunk_rows
    ntiles = (qp + TILE - 1) // TILE

    def load_tile(t):
        lo = base_slot + t * TILE
        cps = [
            pltpu.make_async_copy(svals_ref.at[pl.ds(lo, TILE)], xv_s, sem_a),
            pltpu.make_async_copy(srow_ref.at[pl.ds(lo, TILE)], xr_s, sem_b),
            pltpu.make_async_copy(sid_ref.at[pl.ds(lo, TILE)], xi_s, sem_c),
            pltpu.make_async_copy(rows_ref.at[:, pl.ds(lo, TILE)], rows_s, sem_d),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    def half_ctx(t, h):
        """Masked values + one-hot row-selection [HALF, R] for half h of
        tile t (sel is built per 512-lane half to bound VMEM)."""
        sl = slice(h * HALF, (h + 1) * HALF)
        x = xv_s[sl]
        slot_ok = (
            jax.lax.broadcasted_iota(jnp.int32, (HALF, 1), 0)
            < (qp - t * TILE - h * HALF)
        )[:, 0]
        valid = slot_ok & (xi_s[sl] < num_rows)
        x = jnp.where(valid, x, 0.0)
        rows = jnp.where(valid[None, :], rows_s[: 1 + k, sl], 0.0)  # [1+K, HALF]
        lr = jnp.where(valid, xr_s[sl] - base_row, 0)
        r_iota = jax.lax.broadcasted_iota(jnp.int32, (HALF, chunk_rows), 1)
        sel = jnp.where(
            (lr[:, None] == r_iota) & valid[:, None], 1.0, 0.0
        ).astype(jnp.float32)
        return x, rows, sel, valid

    # pass 1: accumulate [lin | S | Q] per example
    acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_rows = acc_ref.shape[0]  # pad8(1+2k): sub-8-sublane matmul
    #                              operands hit Mosaic slow paths

    def p1(t, _):
        load_tile(t)
        for h in range(TILE // HALF):
            x, rows, sel, _ = half_ctx(t, h)
            w = rows[0]
            parts = [(x * w)[None, :]]
            if k > 0:
                v = rows[1:]
                parts += [x[None, :] * v, (x * x)[None, :] * v * v]
            if acc_rows > 1 + 2 * k:
                parts.append(jnp.zeros((acc_rows - 1 - 2 * k, HALF), jnp.float32))
            contrib = jnp.concatenate(parts, axis=0)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                contrib, sel, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return 0

    jax.lax.fori_loop(0, ntiles, p1, 0)

    acc = acc_ref[:]
    lin = acc[0]
    if k > 0:
        s_acc = acc[1 : 1 + k]
        q_acc = acc[1 + k : 1 + 2 * k]
        py = lin + 0.5 * jnp.sum(s_acc * s_acc - q_acc, axis=0)
    else:
        s_acc = acc[1:1, :]
        py = lin
    py_ref[:] = py
    y = labels_ref[:]
    d = (jax.nn.sigmoid(py) - y) * mask_ref[:]
    # one padded [8m, R] operand carries d and S together: avoids both an
    # N=1 matvec and (for k % 8 != 0) a sub-8-sublane matmul operand
    ds_rows = _pad8(1 + k)
    ds_acc = jnp.concatenate(
        [d[None, :], s_acc]
        + ([jnp.zeros((ds_rows - 1 - k, chunk_rows), jnp.float32)]
           if ds_rows > 1 + k else []),
        axis=0,
    )

    # pass 2: per-slot gradients in sorted order
    def p2(t, _):
        load_tile(t)
        for h in range(TILE // HALF):
            sl = slice(h * HALF, (h + 1) * HALF)
            x, rows, sel, _ = half_ctx(t, h)
            ds_slot = jax.lax.dot_general(
                ds_acc, sel,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )                                                  # [8m, HALF]
            d_slot = ds_slot[0]
            gw = x * d_slot
            if k > 0:
                v = rows[1:]
                s_slot = ds_slot[1 : 1 + k]
                gv = d_slot[None, :] * x[None, :] * (s_slot - x[None, :] * v)
                out = jnp.concatenate([gw[None, :], gv], axis=0)
            else:
                out = gw[None, :]
            if g_s.shape[0] > out.shape[0]:
                out = jnp.concatenate(
                    [out, jnp.zeros((g_s.shape[0] - out.shape[0], HALF), jnp.float32)],
                    axis=0,
                )
            g_s[:, sl] = out
        lo = base_slot + t * TILE
        cp = pltpu.make_async_copy(g_s, grads_ref.at[:, pl.ds(lo, TILE)], sem_o)
        cp.start()
        cp.wait()
        return 0

    jax.lax.fori_loop(0, ntiles, p2, 0)


def fm_chunk(
    svals: jnp.ndarray,    # f32 [NNZ]
    srow: jnp.ndarray,     # i32 [NNZ] global rows
    sid: jnp.ndarray,      # i32 [NNZ]
    rows_p: jnp.ndarray,   # f32 [1+K, NNZ] pulled per-slot rows (planar)
    labels: jnp.ndarray,   # f32 [B]
    mask: jnp.ndarray,     # f32 [B]
    chunk_rows: int,
    num_rows: int,
    *,
    interpret: bool = False,
):
    """Returns (py [B], grads_p [1+K, NNZ])."""
    b = labels.shape[0]
    nnz = sid.shape[0]
    k = rows_p.shape[0] - 1
    if not interpret:
        # Mosaic 1-D BlockSpec blocks must match the XLA tile (1024)
        assert chunk_rows % 1024 == 0, (
            f"chunk_rows {chunk_rows} must be a multiple of 1024 on TPU"
        )
    assert b % chunk_rows == 0
    nchunks = b // chunk_rows
    assert nnz % nchunks == 0, "slots must be evenly chunked (incl. stream pad)"
    qp = nnz // nchunks

    pad = TILE
    dp = _pad8(1 + k)
    svals_p = jnp.pad(svals, (0, pad))
    srow_p = jnp.pad(srow, (0, pad))
    sid_p = jnp.pad(sid, (0, pad), constant_values=num_rows)
    rows_pp = jnp.pad(rows_p, ((0, dp - (1 + k)), (0, pad)))

    kern = functools.partial(
        _fm_chunk_kernel, chunk_rows=chunk_rows, qp=qp, k=k, num_rows=num_rows
    )
    any_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    bspec = pl.BlockSpec((chunk_rows,), lambda i: (i,))
    ginit = jnp.zeros((dp, nnz + pad), jnp.float32)
    py, grads = pl.pallas_call(
        kern,
        grid=(nchunks,),
        in_specs=[any_spec, any_spec, any_spec, any_spec, any_spec, bspec, bspec],
        out_specs=(bspec, any_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b,), jnp.float32),
            jax.ShapeDtypeStruct((dp, nnz + pad), jnp.float32),
        ),
        input_output_aliases={4: 1},  # ginit -> grads
        scratch_shapes=[
            pltpu.VMEM((TILE,), jnp.float32),
            pltpu.VMEM((TILE,), jnp.int32),
            pltpu.VMEM((TILE,), jnp.int32),
            pltpu.VMEM((dp, TILE), jnp.float32),
            pltpu.VMEM((_pad8(1 + 2 * k), chunk_rows), jnp.float32),
            pltpu.VMEM((dp, TILE), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(svals_p, srow_p, sid_p, rows_pp, ginit, labels, mask)
    return py, grads[: 1 + k, :nnz]
