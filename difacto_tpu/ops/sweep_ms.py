"""Multi-stream block-sweep kernels (alignment-correct window design).

The whole-table sweep kernels behind ``kernel=pallas`` (ops/sweep.py
wraps these with a single sorted-unique stream) — also the home of
``fused_table_update``, the in-kernel FTRL/AdaGrad/SGD block update the
pair kernels (ops/pair_sweep.py) reuse. The multi-stream generality
originally served the chunk-sorted slot pipeline, removed in round 3
after measuring 5x slower than the deduped pair path (BENCH.md). See
sweep.py's module docstring for the design rationale; this module is the
real-TPU implementation:

Mosaic constrains dynamic HBM slices to the array's tile granularity
(1024 elements for 1-D i32/f32 at scale; full 8-sublane groups and
128-lane multiples for 2-D), so the kernels never DMA exact slices.
Instead each (table-block, stream) slice is covered by G=1024-aligned
windows:

  * ids/payload windows are DMA'd whole; lanes outside [start, end) are
    neutralized (payload zeroed for apply; non-owned lanes blended from
    the old value for pull's read-modify-write output);
  * the one-hot select matrix is built from ids alone — ids from
    neighboring blocks in the window can never match this block's rows,
    and neighboring *streams'* same-block ids are excluded by the
    position bound;
  * grid iterations are sequential and every window DMA is waited, so
    pull's RMW blending across window-sharing iterations is ordered.

Duplicate ids are aggregated by the select-matmul accumulation before
the single fused FTRL/AdaGrad application — identical semantics to
per-key aggregation (the reference server also applies one aggregated
update per key per push).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FMParam
from ..updaters.updater import FMState

G = 1024  # window granularity == 1-D HBM tile size (i32/f32 at scale)


def _pad8(d: int) -> int:
    # 2-D HBM arrays are (8, 128)-tiled: dynamic slices must span full
    # sublane groups, so planar row counts are padded to multiples of 8
    return (d + 7) // 8 * 8


def _sel_from_ids(uid_win, base, block_rows):
    """One-hot sel[G, R] from ids alone (out-of-block ids match nothing)."""
    lid = uid_win - base
    rows = jax.lax.broadcasted_iota(jnp.int32, (G, block_rows), 1)
    return jnp.where(lid[:, None] == rows, 1.0, 0.0).astype(jnp.float32)


def _inbound(wstart, start, end):
    """Mask [G]: global window lane position within [start, end)."""
    pos = wstart + jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0)[:, 0]
    return (pos >= start) & (pos < end)


# ---------------------------------------------------------------------------
# pull: rows_p[1+K, NNZ] = per-slot gather (fused expansion), RMW-blended
# ---------------------------------------------------------------------------


def _pull_ms_kernel(
    off_ref, sid_ref, *refs,
    block_rows: int, v_threshold: float, k: int, n_streams: int,
):
    # out_ref is aliased to a zero-initialized HBM input (a bare ANY/HBM
    # output would be allocated on the kernel's VMEM stack and OOM at
    # production sizes); _init_ref is that input's ref, unused directly.
    if k > 0:
        (_init_ref, w_ref, cnt_ref, v_ref, out_ref,
         uid_s, out_s, old_s, in_sem, out_sem) = refs
    else:
        (_init_ref, w_ref, cnt_ref, out_ref,
         uid_s, out_s, old_s, in_sem, out_sem) = refs
    i = pl.program_id(0)
    base = i * block_rows
    # sublane-pad the gather matrix to the output row count: Mosaic takes
    # slow paths for sub-8-sublane matmul operands
    dp = out_s.shape[0]
    parts = [w_ref[:][None, :]]
    if k > 0:
        act = (cnt_ref[:] >= v_threshold).astype(jnp.float32)
        parts.append(v_ref[:] * act[None, :])
    if dp > 1 + k:
        parts.append(jnp.zeros((dp - 1 - k, block_rows), jnp.float32))
    m = jnp.concatenate(parts, axis=0)

    for s in range(n_streams):
        start = off_ref[s, i]
        end = off_ref[s, i + 1]

        @pl.when(end > start)
        def _():
            astart = (start // G) * G

            def win(w_i, _):
                lo = astart + w_i * G
                cp = pltpu.make_async_copy(sid_ref.at[pl.ds(lo, G)], uid_s, in_sem)
                cp.start()
                cp.wait()
                cp_old = pltpu.make_async_copy(
                    out_ref.at[:, pl.ds(lo, G)], old_s, out_sem
                )
                cp_old.start()
                cp_old.wait()
                sel = _sel_from_ids(uid_s[:], base, block_rows)
                new = jax.lax.dot_general(
                    m, sel,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                lid = uid_s[:] - base
                owned = (
                    _inbound(lo, start, end) & (lid >= 0) & (lid < block_rows)
                )
                out_s[:] = jnp.where(owned[None, :], new, old_s[:])
                cp_o = pltpu.make_async_copy(
                    out_s, out_ref.at[:, pl.ds(lo, G)], out_sem
                )
                cp_o.start()
                cp_o.wait()
                return 0

            nwin = (end - astart + G - 1) // G
            jax.lax.fori_loop(0, nwin, win, 0)


def sweep_pull_ms(
    state: FMState,
    sid: jnp.ndarray,        # i32 [NNZ] per-stream-sorted ids (sentinel = N)
    offsets: jnp.ndarray,    # i32 [S, nb+1]
    param: FMParam,
    *,
    block_rows: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-slot rows [1+K, NNZ] (planar; lanes not covered by any slice —
    sentinel/pad slots — are undefined: mask with sid < num_rows)."""
    n, k = state.num_rows, state.k
    assert n % block_rows == 0
    nnz = sid.shape[0]
    s_streams = offsets.shape[0]
    pad = G + (-nnz) % G
    dp = _pad8(1 + k)
    sid_p = jnp.concatenate([sid, jnp.full((pad,), n, sid.dtype)]).astype(jnp.int32)

    kern = functools.partial(
        _pull_ms_kernel,
        block_rows=block_rows,
        v_threshold=float(param.V_threshold),
        k=k,
        n_streams=s_streams,
    )
    bspec1 = pl.BlockSpec((block_rows,), lambda i, off: (i,))
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    out_init = jnp.zeros((dp, nnz + pad), jnp.float32)
    in_specs = [hbm, hbm, bspec1, bspec1]
    args = [sid_p, out_init, state.w, state.cnt]
    if k > 0:
        in_specs.append(pl.BlockSpec((k, block_rows), lambda i, off: (0, i)))
        args.append(state.V)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block_rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((G,), jnp.int32),
            pltpu.VMEM((dp, G), jnp.float32),
            pltpu.VMEM((dp, G), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dp, nnz + pad), jnp.float32),
        input_output_aliases={2: 0},  # off=0, sid=1, out_init=2
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(offsets.astype(jnp.int32), *args)
    return out[: 1 + k, :nnz]


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
        end = off_ref[s, i + 1]

        @pl.when(end > start)
        def _():
            astart = (start // G) * G

            def win(w_i, _):
                lo = astart + w_i * G
                cp1 = pltpu.make_async_copy(sid_ref.at[pl.ds(lo, G)], uid_s, in_sem)
                cp2 = pltpu.make_async_copy(
                    pay_ref.at[:, pl.ds(lo, G)], pay_s, pay_sem
                )
                cp1.start()
                cp2.start()
                cp1.wait()
                cp2.wait()
                sel = _sel_from_ids(uid_s[:], base, block_rows)
                inb = _inbound(lo, start, end).astype(jnp.float32)
                acc_ref[:] = acc_ref[:] + jnp.dot(
                    pay_s[:] * inb[None, :], sel,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
                return 0

            nwin = (end - astart + G - 1) // G
            jax.lax.fori_loop(0, nwin, win, 0)

    acc = acc_ref[:]
    v = v_ref[:] if k > 0 else None
    nv = nv_ref[:] if k > 0 else None
    w_n, z_n, n_n, cnt_n, v_n, nv_n = fused_table_update(
        acc, w_ref[:], z_ref[:], n_ref[:], cnt_ref[:], v, nv, p, k
    )
    w_o[:], z_o[:], n_o[:], cnt_o[:] = w_n, z_n, n_n, cnt_n
    if k > 0:
        v_o[:] = v_n
        nv_o[:] = nv_n


def fused_table_update(acc, w, z, n, cnt, v, nv, p: FMParam, k: int):
    """The server-side optimizer applied to one table block (shared by the
    multi-stream and pair sweeps; semantics pinned against FMUpdater by
    tests). ``acc [3+K(+pad), R]`` carries per-row aggregated payload rows
    gw | gV | add_cnt | touch. Returns the POST-masking values (rows not
    touched / not trainable keep their inputs), so callers can write them
    back verbatim."""
    g = acc[0]
    add_cnt = acc[1 + k]
    touch = acc[2 + k] > 0.0

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

    w_o = jnp.where(upd_w, w_new, w)
    z_o = jnp.where(upd_w, z_new, z)
    n_o = jnp.where(upd_w, n_new, n)
    cnt_o = cnt + add_cnt

    v_o = nv_o = None
    if k > 0:
        gv = acc[1 : 1 + k]
        active = touch & (cnt >= p.V_threshold)
        if p.tail_feature_filter > 0:
            active = active & (cnt >= p.tail_feature_filter)
        if p.V_updater == "adagrad":
            gv_r = gv + p.V_l2 * v
            nv_new = nv + gv_r * gv_r
            v_new = v - p.V_lr_eta * gv_r / (jnp.sqrt(nv_new) + p.V_lr_beta)
        else:  # sgd
            nv_new = nv
            v_new = v - p.V_lr_eta * (gv + p.V_l2 * v)
        mv = active[None, :]
        v_o = jnp.where(mv, v_new, v)
        nv_o = jnp.where(mv, nv_new, nv)
    return w_o, z_o, n_o, cnt_o, v_o, nv_o


def sweep_apply_ms(
    state: FMState,
    sid: jnp.ndarray,        # i32 [NNZ] per-stream-sorted (sentinel = N)
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
    pad = G + (-nnz) % G
    pp = _pad8(3 + k)
    sid_p = jnp.concatenate([sid, jnp.full((pad,), n, sid.dtype)]).astype(jnp.int32)
    payload = jnp.pad(payload, ((0, pp - (3 + k)), (0, pad)))

    kern = functools.partial(
        _apply_ms_kernel, block_rows=block_rows, k=k, p=param, n_streams=s_streams
    )
    bspec1 = pl.BlockSpec((block_rows,), lambda i, off: (i,))
    bspeck = pl.BlockSpec((k, block_rows), lambda i, off: (0, i))
    any_spec = pl.BlockSpec(memory_space=pltpu.HBM)
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
            pltpu.VMEM((G,), jnp.int32),
            pltpu.VMEM((pp, G), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((pp, block_rows), jnp.float32),
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
