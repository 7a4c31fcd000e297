"""Block-sweep Pallas kernels: table pull (gather) and fused optimizer apply.

These replace the XLA gather/scatter path of the parameter table — the
TPU answer to the reference's server-side hash-map access
(``src/sgd/sgd_updater.h`` :: SGDUpdater::Get/Update). XLA's gather and
scatter on TPU are per-element ops (~2-8 ns/element measured on v5e),
which made the optimizer apply the dominant step cost. The sweep design
streams the dense table through VMEM block by block and turns all sparse
addressing into small one-hot matmuls on the MXU:

  * the batch's unique ids are SORTED (jnp.unique guarantees it), so the
    ids owned by table block ``b`` form a contiguous slice of the id
    list; per-block slice offsets are one ``searchsorted`` outside the
    kernel;
  * per block, the kernel DMAs that slice (fixed-capacity chunks, a
    dynamic ``fori_loop`` handles overflow), builds a one-hot selection
    matrix sel[cap, R] = (id - block_base == row), and uses
    ``payload @ sel`` / ``M @ selᵀ`` matmuls to scatter-accumulate or
    gather rows — no data-dependent memory addressing at all;
  * the optimizer math (FTRL z/n + l1 soft-threshold, AdaGrad, SGD,
    count update, frequency-gated V activation) runs elementwise over
    the whole block with touch masks, exactly mirroring
    ``FMUpdater.update`` (tests assert equivalence).

Cost model: one full sweep reads+writes the state arrays once
(sequential HBM streams at full bandwidth) regardless of batch sparsity
— profitable whenever the batch touches more than ~1% of rows, which is
always true for CTR batches against practically-sized hashed tables.

Layout contract: scalar state (w, z, n, cnt) is [N] with R-element
blocks; V/nV are planar [K, N] with (K, R) blocks; R is a multiple of
128 (lane tiling), cap = 128. K = 0 (sparse LR) drops the V refs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FMParam
from ..updaters.updater import FMState

CAP = 128  # update-slice chunk size (lane-aligned)


def _block_offsets(uids: jnp.ndarray, num_rows: int, block_rows: int) -> jnp.ndarray:
    """Start offset of each table block's slice in the sorted id list."""
    nb = num_rows // block_rows
    boundaries = jnp.arange(nb + 1, dtype=uids.dtype) * block_rows
    return jnp.searchsorted(uids, boundaries, side="left").astype(jnp.int32)


def _sel_matrix(uid_chunk, block_base, block_rows, lanes_left):
    """One-hot sel[CAP, R]: sel[c, r] = (uid_chunk[c] == block_base + r),
    masked to the first lanes_left valid lanes."""
    lid = uid_chunk - block_base
    pos_ok = jax.lax.broadcasted_iota(jnp.int32, (CAP, 1), 0) < lanes_left
    rows = jax.lax.broadcasted_iota(jnp.int32, (CAP, block_rows), 1)
    return jnp.where((lid[:, None] == rows) & pos_ok, 1.0, 0.0).astype(jnp.float32)


def _pad_ids(uids, valid, n):
    return jnp.concatenate(
        [jnp.where(valid, uids, n), jnp.full((CAP,), n, uids.dtype)]
    ).astype(jnp.int32)


# ---------------------------------------------------------------------------
# pull sweep: rows[1+K, U] = gather of (w | activation-gated V) rows
# ---------------------------------------------------------------------------


def _pull_kernel(off_ref, uids_ref, *refs, block_rows: int, v_threshold: float, k: int):
    if k > 0:
        w_ref, cnt_ref, v_ref, out_ref, uid_s, out_s, in_sem, out_sem = refs
    else:
        w_ref, cnt_ref, out_ref, uid_s, out_s, in_sem, out_sem = refs
    i = pl.program_id(0)
    start = off_ref[i]
    count = off_ref[i + 1] - start
    base = i * block_rows

    if k > 0:
        act = (cnt_ref[:] >= v_threshold).astype(jnp.float32)
        m = jnp.concatenate([w_ref[:][None, :], v_ref[:] * act[None, :]], axis=0)
    else:
        m = w_ref[:][None, :]

    def chunk(c, _):
        s = start + c * CAP
        cp = pltpu.make_async_copy(uids_ref.at[pl.ds(s, CAP)], uid_s, in_sem)
        cp.start()
        cp.wait()
        sel = _sel_matrix(uid_s[:], base, block_rows, count - c * CAP)
        out_s[:] = jax.lax.dot_general(
            m, sel,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cp_out = pltpu.make_async_copy(out_s, out_ref.at[:, pl.ds(s, CAP)], out_sem)
        cp_out.start()
        cp_out.wait()
        return 0

    nchunks = (count + CAP - 1) // CAP
    jax.lax.fori_loop(0, nchunks, chunk, 0)


def sweep_pull(
    state: FMState,
    uids: jnp.ndarray,
    valid: jnp.ndarray,
    param: FMParam,
    *,
    block_rows: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather rows [U, 1+K] for sorted unique ids (sentinel-padded).

    Matches ``FMUpdater.pull``: V gated by cnt >= V_threshold, invalid
    lanes zero.
    """
    n, k = state.num_rows, state.k
    assert n % block_rows == 0
    u = uids.shape[0]
    upad = u + CAP
    uids_p = _pad_ids(uids, valid, n)
    off = _block_offsets(uids_p[:u], n, block_rows)

    kern = functools.partial(
        _pull_kernel,
        block_rows=block_rows,
        v_threshold=float(param.V_threshold),
        k=k,
    )
    bspec1 = pl.BlockSpec((block_rows,), lambda i, off: (i,))
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY), bspec1, bspec1]
    args = [uids_p, state.w, state.cnt]
    if k > 0:
        in_specs.append(pl.BlockSpec((k, block_rows), lambda i, off: (0, i)))
        args.append(state.V)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // block_rows,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((CAP,), jnp.int32),
            pltpu.VMEM((1 + k, CAP), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1 + k, upad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(off, *args)
    rows = out[:, :u].T
    return rows * valid[:, None].astype(jnp.float32)


# ---------------------------------------------------------------------------
# apply sweep: fused FTRL/AdaGrad/SGD + counts, in place over the table
# ---------------------------------------------------------------------------


def _apply_kernel(off_ref, uids_ref, pay_ref, *refs, block_rows: int, k: int, p: FMParam):
    if k > 0:
        (w_ref, z_ref, n_ref, cnt_ref, v_ref, nv_ref,
         w_o, z_o, n_o, cnt_o, v_o, nv_o,
         uid_s, pay_s, in_sem, pay_sem) = refs
    else:
        (w_ref, z_ref, n_ref, cnt_ref,
         w_o, z_o, n_o, cnt_o,
         uid_s, pay_s, in_sem, pay_sem) = refs
    i = pl.program_id(0)
    start = off_ref[i]
    count = off_ref[i + 1] - start
    base = i * block_rows

    def chunk(c, acc):
        s = start + c * CAP
        cp1 = pltpu.make_async_copy(uids_ref.at[pl.ds(s, CAP)], uid_s, in_sem)
        cp2 = pltpu.make_async_copy(pay_ref.at[:, pl.ds(s, CAP)], pay_s, pay_sem)
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        sel = _sel_matrix(uid_s[:], base, block_rows, count - c * CAP)
        return acc + jnp.dot(pay_s[:], sel, preferred_element_type=jnp.float32)

    nchunks = (count + CAP - 1) // CAP
    acc = jax.lax.fori_loop(
        0, nchunks, chunk, jnp.zeros((3 + k, block_rows), jnp.float32)
    )

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


def sweep_apply(
    state: FMState,
    uids: jnp.ndarray,
    grads: jnp.ndarray,     # [U, 1+K] per-key aggregated
    add_cnt: jnp.ndarray,   # [U]
    valid: jnp.ndarray,     # [U]
    param: FMParam,
    *,
    block_rows: int = 1024,
    interpret: bool = False,
) -> FMState:
    """Fused optimizer apply; matches ``FMUpdater.update``."""
    n, k = state.num_rows, state.k
    assert n % block_rows == 0
    u = uids.shape[0]
    vf = valid.astype(jnp.float32)
    uids_p = _pad_ids(uids, valid, n)
    payload = jnp.concatenate(
        [
            (grads[:, 0] * vf)[None, :],
            grads[:, 1:].T * vf[None, :],
            (add_cnt * vf)[None, :],
            vf[None, :],
        ],
        axis=0,
    )
    payload = jnp.pad(payload, ((0, 0), (0, CAP)))
    off = _block_offsets(uids_p[:u], n, block_rows)

    kern = functools.partial(_apply_kernel, block_rows=block_rows, k=k, p=param)
    bspec1 = pl.BlockSpec((block_rows,), lambda i, off: (i,))
    bspeck = pl.BlockSpec((k, block_rows), lambda i, off: (0, i))
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    in_specs = [any_spec, any_spec, bspec1, bspec1, bspec1, bspec1]
    args = [uids_p, payload, state.w, state.z, state.n, state.cnt]
    out_specs = [bspec1, bspec1, bspec1, bspec1]
    shapes = [jax.ShapeDtypeStruct((n,), jnp.float32)] * 4
    # input indices INCLUDE the scalar-prefetch arg: off=0, uids=1,
    # payload=2, w=3, z=4, n=5, cnt=6 (, V=7, nV=8) -> outputs 0.. in order
    aliases = {3: 0, 4: 1, 5: 2, 6: 3}
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
            pltpu.VMEM((CAP,), jnp.int32),
            pltpu.VMEM((3 + k, CAP), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(shapes),
        input_output_aliases=aliases,
        interpret=interpret,
    )(off, *args)
    if k > 0:
        w, z, nn, cnt, v, nv = outs
    else:
        w, z, nn, cnt = outs
        v, nv = state.V, state.nV
    return FMState(w=w, z=z, n=nn, V=v, nV=nv, cnt=cnt)
