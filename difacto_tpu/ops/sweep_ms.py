"""Multi-stream block-sweep kernels for the fully-sorted pipeline.

Generalization of ``ops/sweep.py`` that consumes the chunk-sorted slot
streams of ``data/prep.py`` :: SortedBatch — per-batch ``jnp.unique``
disappears entirely:

  * ids are sorted within each row-chunk stream, NOT globally, so each
    table block owns one contiguous slice per stream (host-computed
    ``offsets[s, b]``);
  * ids are NOT unique: the pull sweep writes one row per slot (a fused
    gather + batch expansion), and the apply sweep's one-hot matmul
    accumulation aggregates duplicate slots into per-row sums before the
    single FTRL/AdaGrad application — identical semantics to aggregating
    per-key first (the reference server also applies one aggregated
    update per key per push);
  * empty (block, stream) slices are skipped, so cost scales with the
    table sweep plus touched slices only.

Cost note: the one-hot select work scales with CAP * table_rows *
num_streams (independent of block size), so CAP here is 64 (vs 128 in
the unique-id kernels) — typical slice occupancy is far below capacity
and the dynamic chunk loop covers hot-id runs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FMParam
from ..updaters.updater import FMState

CAP_MS = 64


def _sel(uid_chunk, base, block_rows, lanes_left, cap):
    lid = uid_chunk - base
    pos_ok = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0) < lanes_left
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, block_rows), 1)
    return jnp.where((lid[:, None] == rows) & pos_ok, 1.0, 0.0).astype(jnp.float32)


# ---------------------------------------------------------------------------
# pull: rows_p[1+K, NNZ] = per-slot gather (fused expansion)
# ---------------------------------------------------------------------------


def _pull_ms_kernel(
    off_ref, sid_ref, *refs,
    block_rows: int, v_threshold: float, k: int, n_streams: int,
):
    if k > 0:
        w_ref, cnt_ref, v_ref, out_ref, uid_s, out_s, in_sem, out_sem = refs
    else:
        w_ref, cnt_ref, out_ref, uid_s, out_s, in_sem, out_sem = refs
    i = pl.program_id(0)
    base = i * block_rows
    if k > 0:
        act = (cnt_ref[:] >= v_threshold).astype(jnp.float32)
        m = jnp.concatenate([w_ref[:][None, :], v_ref[:] * act[None, :]], axis=0)
    else:
        m = w_ref[:][None, :]

    for s in range(n_streams):
        start = off_ref[s, i]
        count = off_ref[s, i + 1] - start

        @pl.when(count > 0)
        def _():
            def chunk(c, _):
                lo = start + c * CAP_MS
                cp = pltpu.make_async_copy(
                    sid_ref.at[pl.ds(lo, CAP_MS)], uid_s, in_sem
                )
                cp.start()
                cp.wait()
                sel = _sel(uid_s[:], base, block_rows, count - c * CAP_MS, CAP_MS)
                out_s[:] = jax.lax.dot_general(
                    m, sel,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                cp_o = pltpu.make_async_copy(
                    out_s, out_ref.at[:, pl.ds(lo, CAP_MS)], out_sem
                )
                cp_o.start()
                cp_o.wait()
                return 0

            jax.lax.fori_loop(0, (count + CAP_MS - 1) // CAP_MS, chunk, 0)


def sweep_pull_ms(
    state: FMState,
    sid: jnp.ndarray,        # i32 [NNZ] chunk-sorted ids (sentinel = N)
    offsets: jnp.ndarray,    # i32 [S, nb+1]
    param: FMParam,
    *,
    block_rows: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-slot rows [1+K, NNZ] (planar; padding-slot lanes undefined —
    mask with sid < num_rows downstream)."""
    n, k = state.num_rows, state.k
    assert n % block_rows == 0
    nnz = sid.shape[0]
    s_streams = offsets.shape[0]
    sid_p = jnp.concatenate([sid, jnp.full((CAP_MS,), n, sid.dtype)]).astype(jnp.int32)

    kern = functools.partial(
        _pull_ms_kernel,
        block_rows=block_rows,
        v_threshold=float(param.V_threshold),
        k=k,
        n_streams=s_streams,
    )
    bspec1 = pl.BlockSpec((block_rows,), lambda i, off: (i,))
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY), bspec1, bspec1]
    args = [sid_p, state.w, state.cnt]
    if k > 0:
        in_specs.append(pl.BlockSpec((k, block_rows), lambda i, off: (0, i)))
        args.append(state.V)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block_rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((CAP_MS,), jnp.int32),
            pltpu.VMEM((1 + k, CAP_MS), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1 + k, nnz + CAP_MS), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(offsets.astype(jnp.int32), *args)
    return out[:, :nnz]


# ---------------------------------------------------------------------------
# apply: accumulate per-slot payload streams, then fused optimizer math
# ---------------------------------------------------------------------------


def _apply_ms_kernel(
    off_ref, sid_ref, pay_ref, *refs,
    block_rows: int, k: int, p: FMParam, n_streams: int,
):
    if k > 0:
        (w_ref, z_ref, n_ref, cnt_ref, v_ref, nv_ref,
         w_o, z_o, n_o, cnt_o, v_o, nv_o,
         uid_s, pay_s, in_sem, pay_sem, acc_ref) = refs
    else:
        (w_ref, z_ref, n_ref, cnt_ref,
         w_o, z_o, n_o, cnt_o,
         uid_s, pay_s, in_sem, pay_sem, acc_ref) = refs
    i = pl.program_id(0)
    base = i * block_rows

    acc_ref[:] = jnp.zeros_like(acc_ref)
    for s in range(n_streams):
        start = off_ref[s, i]
        count = off_ref[s, i + 1] - start

        @pl.when(count > 0)
        def _():
            def chunk(c, _):
                lo = start + c * CAP_MS
                cp1 = pltpu.make_async_copy(
                    sid_ref.at[pl.ds(lo, CAP_MS)], uid_s, in_sem
                )
                cp2 = pltpu.make_async_copy(
                    pay_ref.at[:, pl.ds(lo, CAP_MS)], pay_s, pay_sem
                )
                cp1.start()
                cp2.start()
                cp1.wait()
                cp2.wait()
                sel = _sel(uid_s[:], base, block_rows, count - c * CAP_MS, CAP_MS)
                acc_ref[:] = acc_ref[:] + jnp.dot(
                    pay_s[:], sel, preferred_element_type=jnp.float32
                )
                return 0

            jax.lax.fori_loop(0, (count + CAP_MS - 1) // CAP_MS, chunk, 0)

    acc = acc_ref[:]
    g = acc[0]
    add_cnt = acc[1 + k]
    touch = acc[2 + k] > 0.0
    w, z, n, cnt = w_ref[:], z_ref[:], n_ref[:], cnt_ref[:]

    upd_w = touch
    if p.tail_feature_filter > 0:
        upd_w = upd_w & (cnt >= p.tail_feature_filter)

    if p.w_updater == "ftrl":
        n_new = n + g * g
        sigma = (jnp.sqrt(n_new) - jnp.sqrt(n)) / p.lr_eta
        z_new = z + g - sigma * w
        w_new = jnp.where(
            jnp.abs(z_new) <= p.l1,
            0.0,
            -(z_new - jnp.sign(z_new) * p.l1)
            / ((p.lr_beta + jnp.sqrt(n_new)) / p.lr_eta + p.l2),
        )
    elif p.w_updater == "adagrad":
        g_r = g + p.l2 * w
        z_new = z
        n_new = n + g_r * g_r
        w_new = w - p.lr_eta * g_r / (jnp.sqrt(n_new) + p.lr_beta)
    else:  # sgd
        z_new = z
        n_new = n
        w_new = w - p.lr_eta * (g + p.l2 * w)

    w_o[:] = jnp.where(upd_w, w_new, w)
    z_o[:] = jnp.where(upd_w, z_new, z)
    n_o[:] = jnp.where(upd_w, n_new, n)
    cnt_o[:] = cnt + add_cnt

    if k > 0:
        gv = acc[1 : 1 + k]
        active = touch & (cnt >= p.V_threshold)
        if p.tail_feature_filter > 0:
            active = active & (cnt >= p.tail_feature_filter)
        v, nv = v_ref[:], nv_ref[:]
        if p.V_updater == "adagrad":
            gv_r = gv + p.V_l2 * v
            nv_new = nv + gv_r * gv_r
            v_new = v - p.V_lr_eta * gv_r / (jnp.sqrt(nv_new) + p.V_lr_beta)
        else:  # sgd
            nv_new = nv
            v_new = v - p.V_lr_eta * (gv + p.V_l2 * v)
        mv = active[None, :]
        v_o[:] = jnp.where(mv, v_new, v)
        nv_o[:] = jnp.where(mv, nv_new, nv)


def sweep_apply_ms(
    state: FMState,
    sid: jnp.ndarray,        # i32 [NNZ] chunk-sorted (sentinel = N)
    payload: jnp.ndarray,    # f32 [3+K, NNZ]: gw | gV | add_cnt | touch
    offsets: jnp.ndarray,    # i32 [S, nb+1]
    param: FMParam,
    *,
    block_rows: int = 1024,
    interpret: bool = False,
) -> FMState:
    n, k = state.num_rows, state.k
    assert n % block_rows == 0
    nnz = sid.shape[0]
    s_streams = offsets.shape[0]
    sid_p = jnp.concatenate([sid, jnp.full((CAP_MS,), n, sid.dtype)]).astype(jnp.int32)
    payload = jnp.pad(payload, ((0, 0), (0, CAP_MS)))

    kern = functools.partial(
        _apply_ms_kernel, block_rows=block_rows, k=k, p=param, n_streams=s_streams
    )
    bspec1 = pl.BlockSpec((block_rows,), lambda i, off: (i,))
    bspeck = pl.BlockSpec((k, block_rows), lambda i, off: (0, i))
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    in_specs = [any_spec, any_spec, bspec1, bspec1, bspec1, bspec1]
    args = [sid_p, payload, state.w, state.z, state.n, state.cnt]
    out_specs = [bspec1, bspec1, bspec1, bspec1]
    shapes = [jax.ShapeDtypeStruct((n,), jnp.float32)] * 4
    aliases = {3: 0, 4: 1, 5: 2, 6: 3}  # includes the scalar-prefetch arg
    if k > 0:
        in_specs += [bspeck, bspeck]
        args += [state.V, state.nV]
        out_specs += [bspeck, bspeck]
        shapes += [jax.ShapeDtypeStruct((k, n), jnp.float32)] * 2
        aliases.update({7: 4, 8: 5})
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block_rows,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[
            pltpu.VMEM((CAP_MS,), jnp.int32),
            pltpu.VMEM((3 + k, CAP_MS), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((3 + k, block_rows), jnp.float32),
        ],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(shapes),
        input_output_aliases=aliases,
        interpret=interpret,
    )(offsets.astype(jnp.int32), *args)
    if k > 0:
        w, z, nn, cnt, v, nv = outs
    else:
        w, z, nn, cnt = outs
        v, nv = state.V, state.nV
    return FMState(w=w, z=z, n=nn, V=v, nV=nv, cnt=cnt)
