"""Pair-grid table kernels: touch only the blocks the batch touches.

The multi-stream sweeps (ops/sweep_ms.py) iterate over EVERY table block
and pay a one-hot "select tax" of ``blocks x streams x 1024 x R``
elements per step — irreducible in table size, which is exactly the
regime (2^22..2^26 rows) where the XLA per-element gather/scatter is
slowest (BENCH.md). These kernels invert the loop: the host (the
Localizer seam, reference ``src/data/localizer.h`` — our
``data/prep.py``) already produces the batch's SORTED unique ids, so it
also knows which table blocks the batch touches and which 128-lane
window of unique lanes covers each block. The kernel grid is the list of

    (touched table block, 128-lane unique window)

pairs, scalar-prefetched so every Mosaic BlockSpec index map reads its
block/window index from the metadata — all HBM<->VMEM movement is
compiler-pipelined BlockSpecs; there are no manual DMAs or semaphores.

Why 128-lane windows: 2-D arrays admit 128-lane dynamic addressing (only
1-D arrays force the 1024-element granularity that made the old sweeps'
windows big), so unique ids ship as a [8, U] replicated 2-D array and
payload/output as planar [rows, U]. Per pair the select matrix is
[R, 128] instead of [R, 1024]: with U unique ids the total select work is
~max(U/128, touched_blocks) x R x 128 elements — proportional to the
BATCH, not the table.

Replaces the same reference seams as the other sweeps: per-key Get/
Update of ``src/sgd/sgd_updater.h`` with KVMatch-style range addressing
(``src/common/kv_match.h``) dissolved into the pair metadata.

Correctness invariants:
  * every valid unique id belongs to exactly one (block, window) pair,
    so the fused optimizer update applies exactly once per key;
  * windows may straddle a block boundary — the pair of the next block
    re-reads the same window; ids of other blocks never match the
    select compare, so nothing double-counts;
  * pairs are sorted by (block, window): consecutive pairs that share a
    block (or a window) keep their VMEM block resident across grid
    steps, which both avoids refetches and makes the read-modify-write
    ordering trivial (the TPU grid is sequential);
  * pad pairs repeat the LAST real block with an all-sentinel window —
    they re-write that block unchanged;
  * sentinel lanes (id == num_rows) match no row; the pull output for
    them is zero.
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FMParam
from ..updaters.updater import FMState
from .sweep_ms import fused_table_update

log = logging.getLogger(__name__)

W = 128  # unique-window lane granularity (2-D dynamic-slice tile)

# pair-count bucket ladder (few distinct jit/Mosaic specializations).
# Extends past 65536 (the 2^26 bench sits exactly AT 65536 — one batch
# past it must land on a rung, not mint an exact-size specialization)
PAIR_BUCKETS = (256, 512, 1024, 2048, 3072, 4096, 4608, 5120, 6144,
                8192, 12288, 16384, 24576, 32768, 49152, 65536,
                98304, 147456, 221184, 331776, 497664)


def _pad8(d: int) -> int:
    return (d + 7) // 8 * 8


def _bucket(n: int, buckets=PAIR_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    # beyond the ladder: continue the ~1.5x geometric rungs (128-aligned)
    # instead of an exact size — an exact size re-specializes on EVERY
    # distinct pair count (5-15 min/shape on a remote Mosaic service) —
    # and log it, since landing here means the ladder should grow
    v = buckets[-1]
    while v < n:
        v = (v * 3 // 2 + 127) // 128 * 128
    log.info(
        "pair count %d exceeds the bucket ladder (max %d): extending "
        "geometrically to %d", n, buckets[-1], v,
    )
    return v


@dataclass
class PairMeta:
    """Host-built pair schedule for one batch's sorted unique ids."""

    blocks: np.ndarray  # i32 [P] table block index per pair
    wins: np.ndarray    # i32 [P] unique-window index (lane/128) per pair
    first: np.ndarray   # i32 [P] 1 = first pair of a consecutive block run
    wfirst: np.ndarray  # i32 [P] 1 = first pair of a consecutive window run
    block_rows: int


def _pairs_raw(
    uids: np.ndarray, num_rows: int, block_rows: int, seg_len: int
) -> tuple[np.ndarray, np.ndarray, int]:
    """(blocks, wins, n_segments_with_pairs) before ordering/padding —
    shared by the window-order (pull) and block-order (apply) schedules
    so multi-owner builders compute the touched-pair discovery once."""
    ub = uids.shape[0]
    nb = num_rows // block_rows
    bounds = np.arange(nb + 1, dtype=np.int64) * block_rows
    blocks_l: list[np.ndarray] = []
    wins_l: list[np.ndarray] = []
    for off in range(0, ub, seg_len):
        seg = uids[off : off + seg_len]
        n_valid = int(np.searchsorted(seg, num_rows, side="left"))
        if n_valid == 0:
            continue
        lo = off + np.searchsorted(seg[:n_valid], bounds, side="left")
        touched = np.nonzero(lo[1:] > lo[:-1])[0]  # blocks with >=1 id here
        w0 = lo[touched] // W
        w1 = (lo[touched + 1] - 1) // W
        counts = (w1 - w0 + 1).astype(np.int64)
        blk = np.repeat(touched.astype(np.int32), counts)
        # wins = w0[b] + intra-run offset
        offs = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        blocks_l.append(blk)
        wins_l.append((np.repeat(w0, counts) + offs).astype(np.int32))
    if not blocks_l:
        return np.zeros(0, np.int32), np.zeros(0, np.int32), 0
    return np.concatenate(blocks_l), np.concatenate(wins_l), len(blocks_l)


def _pairs_finish(
    blocks: np.ndarray,
    wins: np.ndarray,
    nseg: int,
    sent_win: int,
    block_rows: int,
    buckets,
    order: str,
) -> PairMeta:
    """Order + pad one raw pair list into a PairMeta (see build_pair_meta)."""
    if blocks.shape[0] == 0:
        p = _bucket(1, buckets)
        return PairMeta(
            blocks=np.zeros(p, np.int32),
            wins=np.full(p, sent_win, np.int32),
            first=(np.arange(p) == 0).astype(np.int32),
            wfirst=(np.arange(p) == 0).astype(np.int32),
            block_rows=block_rows,
        )
    if nseg > 1 or order == "window":
        key = (blocks, wins) if order == "window" else (wins, blocks)
        o = np.lexsort(key)
        blocks, wins = blocks[o], wins[o]
    p_real = blocks.shape[0]
    p = _bucket(p_real, buckets)
    blocks = np.concatenate(
        [blocks, np.full(p - p_real, blocks[-1], np.int32)]
    )
    wins = np.concatenate([wins, np.full(p - p_real, sent_win, np.int32)])
    first = np.ones(p, np.int32)
    first[1:] = blocks[1:] != blocks[:-1]
    wfirst = np.ones(p, np.int32)
    wfirst[1:] = wins[1:] != wins[:-1]
    return PairMeta(
        blocks=blocks, wins=wins, first=first, wfirst=wfirst,
        block_rows=block_rows,
    )


def build_pair_meta(
    uids: np.ndarray,
    num_rows: int,
    block_rows: int,
    buckets=PAIR_BUCKETS,
    seg_len: int | None = None,
    order: str = "block",
) -> PairMeta:
    """Pair schedule from a sorted id stream (sentinel ``num_rows`` pads).

    Vectorized host pass (runs in the prep/prefetch thread, like the
    reference's Localizer): touched blocks via searchsorted over block
    boundaries, per-block aligned window ranges, padded to a bucket with
    (last real block, sentinel window) no-op pairs.

    ``seg_len``: the stream is sorted only WITHIN consecutive segments of
    this many lanes (the ShardedStore's per-source all_to_all buckets;
    default: one whole-array segment). Ids may repeat — per-slot streams
    are valid input; the apply kernel aggregates across a block's pairs
    before updating.

    ``order``: 'block' sorts pairs (block, window) — same-block runs
    consecutive, required by the apply kernel's accumulate-until-last;
    'window' sorts (window, block) — same-window runs consecutive,
    required by the pull kernel's first-visit blend when segments make
    the global window sequence non-monotonic. For a single sorted
    segment both hold under 'block' order.
    """
    uids = np.asarray(uids)
    ub = uids.shape[0]
    sent_win = ub // W  # the appended all-sentinel window
    if seg_len is None:
        seg_len = ub
    assert ub % seg_len == 0 and seg_len % W == 0
    blocks, wins, nseg = _pairs_raw(uids, num_rows, block_rows, seg_len)
    return _pairs_finish(
        blocks, wins, nseg, sent_win, block_rows, buckets, order
    )


@dataclass
class DualPairMeta:
    """Two-windows-per-grid-step apply schedule: each block run's pairs
    are grouped two at a time (odd runs padded with the all-sentinel
    window), so the grid shrinks toward ceil(P/2) while per-step select
    work doubles. Measured at the flagship (scripts/hw_apply2.py,
    BENCH.md round 5b): 7.89 ms vs the single-window 7.04 — a 12%
    REGRESSION, so the production path keeps one window per step (the
    ~1.3 us/step is work-bound, not machinery). Kept as the recorded
    experiment; a dense many-windows-per-block regime could differ."""

    blocks: np.ndarray  # i32 [P2] table block per grid step
    wins_a: np.ndarray  # i32 [P2] first unique window
    wins_b: np.ndarray  # i32 [P2] second window (sentinel when padded)
    first: np.ndarray   # i32 [P2] 1 = first step of a block run
    block_rows: int


def build_dual_apply_meta(
    uids: np.ndarray,
    num_rows: int,
    block_rows: int,
    buckets=PAIR_BUCKETS,
) -> DualPairMeta:
    """Dual-window apply schedule from ONE sorted unique stream (the
    LocalStore prepped path). Derived from the same raw touched-pair
    discovery as build_pair_meta(order='block'); a single sorted segment
    is block-monotonic, so each block's windows are consecutive and
    pairing them two-at-a-time preserves the accumulate-until-flush
    contract."""
    uids = np.asarray(uids)
    ub = uids.shape[0]
    sent_win = ub // W
    blocks, wins, _ = _pairs_raw(uids, num_rows, block_rows, ub)
    if blocks.shape[0] == 0:
        p = _bucket(1, buckets)
        return DualPairMeta(
            blocks=np.zeros(p, np.int32),
            wins_a=np.full(p, sent_win, np.int32),
            wins_b=np.full(p, sent_win, np.int32),
            first=(np.arange(p) == 0).astype(np.int32),
            block_rows=block_rows,
        )
    # group each block run's windows two per step (vectorized: global
    # pair index within its run -> step = run_start_steps + within//2)
    first = np.ones(len(blocks), bool)
    first[1:] = blocks[1:] != blocks[:-1]
    run_id = np.cumsum(first) - 1
    run_start = np.flatnonzero(first)
    within = np.arange(len(blocks)) - run_start[run_id]
    run_len = np.diff(np.append(run_start, len(blocks)))
    steps_per_run = (run_len + 1) // 2
    run_step0 = np.cumsum(steps_per_run) - steps_per_run
    step = run_step0[run_id] + within // 2
    n_steps = int(steps_per_run.sum())
    b2 = np.empty(n_steps, np.int32)
    wa = np.full(n_steps, sent_win, np.int32)
    wb = np.full(n_steps, sent_win, np.int32)
    even = within % 2 == 0
    b2[step] = blocks
    wa[step[even]] = wins[even]
    wb[step[~even]] = wins[~even]
    p = _bucket(n_steps, buckets)
    b2 = np.concatenate([b2, np.full(p - n_steps, b2[-1], np.int32)])
    wa = np.concatenate([wa, np.full(p - n_steps, sent_win, np.int32)])
    wb = np.concatenate([wb, np.full(p - n_steps, sent_win, np.int32)])
    f2 = np.ones(p, np.int32)
    f2[1:] = b2[1:] != b2[:-1]
    return DualPairMeta(
        blocks=b2, wins_a=wa, wins_b=wb, first=f2, block_rows=block_rows
    )


def _uids2d(uids: jnp.ndarray, num_rows: int) -> jnp.ndarray:
    """[U] sorted ids -> [8, U+W] replicated, all-sentinel extra window."""
    up = jnp.concatenate(
        [uids.astype(jnp.int32), jnp.full((W,), num_rows, jnp.int32)]
    )
    return jnp.broadcast_to(up[None, :], (8, up.shape[0]))


def _selT(uidw_ref, base: jnp.ndarray, block_rows: int) -> jnp.ndarray:
    """[R, W] one-hot: row r matches window lane j iff uid[j] == base+r."""
    lid = uidw_ref[0, :] - base  # [W]
    rows = jax.lax.broadcasted_iota(jnp.int32, (block_rows, W), 0)
    return (rows == lid[None, :]).astype(jnp.float32)


# ---------------------------------------------------------------------------
# pull: rows_u [dp, U] = per-unique-id rows (w | activated V), planar
# ---------------------------------------------------------------------------


def _pull_pairs_kernel(
    blocks_ref, wins_ref, wfirst_ref, uidw_ref, *refs,
    block_rows: int, k: int, v_threshold: float,
):
    if k > 0:
        w_ref, cnt_ref, v_ref, out_ref = refs
    else:
        w_ref, cnt_ref, out_ref = refs
    i = pl.program_id(0)
    base = blocks_ref[i] * block_rows
    selT = _selT(uidw_ref, base, block_rows)  # [R, W]
    dp = out_ref.shape[0]
    parts = [w_ref[:][None, :]]
    if k > 0:
        act = (cnt_ref[:] >= v_threshold).astype(jnp.float32)
        parts.append(v_ref[:] * act[None, :])
    if dp > 1 + k:
        parts.append(jnp.zeros((dp - 1 - k, block_rows), jnp.float32))
    m = jnp.concatenate(parts, axis=0)  # [dp, R]
    new = jax.lax.dot_general(
        m, selT,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [dp, W]
    lid = uidw_ref[0, :] - base
    owned = ((lid >= 0) & (lid < block_rows))[None, :]
    # first visit of this window: unowned lanes start at 0 (out VMEM is
    # undefined); a straddling block's pair later fills its own lanes
    prev = jnp.where(wfirst_ref[i] == 1, 0.0, out_ref[:])
    out_ref[:] = jnp.where(owned, new, prev)


def pull_pairs(
    state: FMState,
    uids: jnp.ndarray,      # i32 [U] sorted unique ids (sentinel = N pad)
    meta_dev: tuple,        # (blocks, wins, first, wfirst) on device
    param: FMParam,
    *,
    block_rows: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Planar unique rows [1+K, U]; sentinel lanes zero."""
    n, k = state.num_rows, state.k
    assert n % block_rows == 0
    u = uids.shape[0]
    assert u % W == 0
    blocks, wins, first, wfirst = meta_dev
    dp = _pad8(1 + k)
    uw = _uids2d(uids, n)

    kern = functools.partial(
        _pull_pairs_kernel,
        block_rows=block_rows, k=k, v_threshold=float(param.V_threshold),
    )
    in_specs = [
        pl.BlockSpec((8, W), lambda i, b, w, wf: (0, w[i])),       # uids
        pl.BlockSpec((block_rows,), lambda i, b, w, wf: (b[i],)),  # w
        pl.BlockSpec((block_rows,), lambda i, b, w, wf: (b[i],)),  # cnt
    ]
    args = [uw, state.w, state.cnt]
    if k > 0:
        in_specs.append(
            pl.BlockSpec((k, block_rows), lambda i, b, w, wf: (0, b[i]))
        )
        args.append(state.V)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(blocks.shape[0],),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((dp, W), lambda i, b, w, wf: (0, w[i])),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dp, u + W), jnp.float32),
        interpret=interpret,
    )(blocks, wins, wfirst, *args)
    return out[: 1 + k, :u]


# ---------------------------------------------------------------------------
# apply: per-key aggregated payload -> fused FTRL/AdaGrad on touched blocks
# ---------------------------------------------------------------------------


def _apply_pairs_kernel(
    blocks_ref, wins_ref, first_ref, uidw_ref, payw_ref, *refs,
    block_rows: int, k: int, p: FMParam, n_pairs: int,
):
    if k > 0:
        (w_ref, z_ref, n_ref, cnt_ref, v_ref, nv_ref,
         w_o, z_o, n_o, cnt_o, v_o, nv_o, acc_ref) = refs
    else:
        (w_ref, z_ref, n_ref, cnt_ref,
         w_o, z_o, n_o, cnt_o, acc_ref) = refs
    i = pl.program_id(0)
    base = blocks_ref[i] * block_rows
    selT = _selT(uidw_ref, base, block_rows)  # [R, W]
    contrib = jax.lax.dot_general(
        payw_ref[:], selT,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [pp, R] this pair's per-row payload
    # accumulate across the block's consecutive pairs (a key's slots may
    # span several windows for per-slot streams; the optimizer must see
    # the per-key TOTAL before applying once)
    fst = first_ref[i] == 1
    acc_ref[:] = jnp.where(fst, contrib, acc_ref[:] + contrib)
    # last pair of this block run: the next pair maps a different block
    # (the TPU grid is sequential, so the out block flushes only then)
    nxt = blocks_ref[jnp.minimum(i + 1, n_pairs - 1)]
    is_last = (i == n_pairs - 1) | (nxt != blocks_ref[i])
    acc = acc_ref[:]
    v = v_ref[:] if k > 0 else None
    nv = nv_ref[:] if k > 0 else None
    w_n, z_n, n_n, cnt_n, v_n, nv_n = fused_table_update(
        acc, w_ref[:], z_ref[:], n_ref[:], cnt_ref[:], v, nv, p, k
    )
    touched = acc[2 + k] > 0.0

    def wr(o_ref, in_vals, new_vals, bmask):
        # intermediate pairs write the inputs back (identity — the block
        # only flushes to HBM when the run ends); the last pair commits
        o_ref[:] = jnp.where(is_last & bmask, new_vals, in_vals)

    wr(w_o, w_ref[:], w_n, touched)
    wr(z_o, z_ref[:], z_n, touched)
    wr(n_o, n_ref[:], n_n, touched)
    wr(cnt_o, cnt_ref[:], cnt_n, touched)
    if k > 0:
        wr(v_o, v_ref[:], v_n, touched[None, :])
        wr(nv_o, nv_ref[:], nv_n, touched[None, :])


def apply_pairs(
    state: FMState,
    uids: jnp.ndarray,      # i32 [U] sorted unique ids (sentinel = N pad)
    payload: jnp.ndarray,   # f32 [3+K, U] planar: gw | gV | add_cnt | touch
    meta_dev: tuple,        # (blocks, wins, first, wfirst) on device
    param: FMParam,
    *,
    block_rows: int,
    interpret: bool = False,
) -> FMState:
    n, k = state.num_rows, state.k
    assert n % block_rows == 0
    u = uids.shape[0]
    assert u % W == 0
    blocks, wins, first, wfirst = meta_dev
    pp = _pad8(3 + k)
    uw = _uids2d(uids, n)
    pay = jnp.pad(payload, ((0, pp - (3 + k)), (0, W)))

    kern = functools.partial(
        _apply_pairs_kernel, block_rows=block_rows, k=k, p=param,
        n_pairs=blocks.shape[0],
    )
    bspec1 = pl.BlockSpec((block_rows,), lambda i, b, w, f: (b[i],))
    bspeck = pl.BlockSpec((k, block_rows), lambda i, b, w, f: (0, b[i]))
    in_specs = [
        pl.BlockSpec((8, W), lambda i, b, w, f: (0, w[i])),   # uids
        pl.BlockSpec((pp, W), lambda i, b, w, f: (0, w[i])),  # payload
        bspec1, bspec1, bspec1, bspec1,
    ]
    args = [uw, pay, state.w, state.z, state.n, state.cnt]
    out_specs = [bspec1, bspec1, bspec1, bspec1]
    shapes = [jax.ShapeDtypeStruct((n,), jnp.float32)] * 4
    # alias arg index -> output index (scalar-prefetch args count: 3)
    aliases = {5: 0, 6: 1, 7: 2, 8: 3}
    if k > 0:
        in_specs += [bspeck, bspeck]
        args += [state.V, state.nV]
        out_specs += [bspeck, bspeck]
        shapes += [jax.ShapeDtypeStruct((k, n), jnp.float32)] * 2
        aliases.update({9: 4, 10: 5})
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(blocks.shape[0],),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((pp, block_rows), jnp.float32)],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(shapes),
        input_output_aliases=aliases,
        interpret=interpret,
    )(blocks, wins, first, *args)
    if k > 0:
        w, z, nn, cnt, v, nv = outs
    else:
        w, z, nn, cnt = outs
        v, nv = state.V, state.nV
    return FMState(w=w, z=z, n=nn, V=v, nV=nv, cnt=cnt)


def _apply_pairs2_kernel(
    blocks_ref, winsa_ref, winsb_ref, first_ref,
    uidwa_ref, uidwb_ref, paya_ref, payb_ref, *refs,
    block_rows: int, k: int, p: FMParam, n_steps: int,
):
    """apply_pairs with TWO unique windows per grid step (see
    DualPairMeta): two selects + two matmuls feed one accumulate, the
    flush/update logic is unchanged. Sentinel (pad) windows match no
    row — their contribution is exactly zero."""
    if k > 0:
        (w_ref, z_ref, n_ref, cnt_ref, v_ref, nv_ref,
         w_o, z_o, n_o, cnt_o, v_o, nv_o, acc_ref) = refs
    else:
        (w_ref, z_ref, n_ref, cnt_ref,
         w_o, z_o, n_o, cnt_o, acc_ref) = refs
    i = pl.program_id(0)
    base = blocks_ref[i] * block_rows
    dn = (((1,), (1,)), ((), ()))
    contrib = jax.lax.dot_general(
        paya_ref[:], _selT(uidwa_ref, base, block_rows),
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) + jax.lax.dot_general(
        payb_ref[:], _selT(uidwb_ref, base, block_rows),
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [pp, R]
    fst = first_ref[i] == 1
    acc_ref[:] = jnp.where(fst, contrib, acc_ref[:] + contrib)
    nxt = blocks_ref[jnp.minimum(i + 1, n_steps - 1)]
    is_last = (i == n_steps - 1) | (nxt != blocks_ref[i])
    acc = acc_ref[:]
    v = v_ref[:] if k > 0 else None
    nv = nv_ref[:] if k > 0 else None
    w_n, z_n, n_n, cnt_n, v_n, nv_n = fused_table_update(
        acc, w_ref[:], z_ref[:], n_ref[:], cnt_ref[:], v, nv, p, k
    )
    touched = acc[2 + k] > 0.0

    def wr(o_ref, in_vals, new_vals, bmask):
        o_ref[:] = jnp.where(is_last & bmask, new_vals, in_vals)

    wr(w_o, w_ref[:], w_n, touched)
    wr(z_o, z_ref[:], z_n, touched)
    wr(n_o, n_ref[:], n_n, touched)
    wr(cnt_o, cnt_ref[:], cnt_n, touched)
    if k > 0:
        wr(v_o, v_ref[:], v_n, touched[None, :])
        wr(nv_o, nv_ref[:], nv_n, touched[None, :])


def apply_pairs2(
    state: FMState,
    uids: jnp.ndarray,      # i32 [U] sorted unique ids (sentinel = N pad)
    payload: jnp.ndarray,   # f32 [3+K, U] planar: gw | gV | add_cnt | touch
    meta_dev: tuple,        # (blocks, wins_a, wins_b, first) on device
    param: FMParam,
    *,
    block_rows: int,
    interpret: bool = False,
) -> FMState:
    """apply_pairs with the DualPairMeta two-windows-per-step grid."""
    n, k = state.num_rows, state.k
    assert n % block_rows == 0
    u = uids.shape[0]
    assert u % W == 0
    blocks, wins_a, wins_b, first = meta_dev
    pp = _pad8(3 + k)
    uw = _uids2d(uids, n)
    pay = jnp.pad(payload, ((0, pp - (3 + k)), (0, W)))

    kern = functools.partial(
        _apply_pairs2_kernel, block_rows=block_rows, k=k, p=param,
        n_steps=blocks.shape[0],
    )
    bspec1 = pl.BlockSpec((block_rows,), lambda i, b, wa, wb, f: (b[i],))
    bspeck = pl.BlockSpec((k, block_rows), lambda i, b, wa, wb, f: (0, b[i]))
    in_specs = [
        pl.BlockSpec((8, W), lambda i, b, wa, wb, f: (0, wa[i])),   # uids A
        pl.BlockSpec((8, W), lambda i, b, wa, wb, f: (0, wb[i])),   # uids B
        pl.BlockSpec((pp, W), lambda i, b, wa, wb, f: (0, wa[i])),  # pay A
        pl.BlockSpec((pp, W), lambda i, b, wa, wb, f: (0, wb[i])),  # pay B
        bspec1, bspec1, bspec1, bspec1,
    ]
    args = [uw, uw, pay, pay, state.w, state.z, state.n, state.cnt]
    out_specs = [bspec1, bspec1, bspec1, bspec1]
    shapes = [jax.ShapeDtypeStruct((n,), jnp.float32)] * 4
    # alias arg index -> output index (scalar-prefetch args count: 4)
    aliases = {8: 0, 9: 1, 10: 2, 11: 3}
    if k > 0:
        in_specs += [bspeck, bspeck]
        args += [state.V, state.nV]
        out_specs += [bspeck, bspeck]
        shapes += [jax.ShapeDtypeStruct((k, n), jnp.float32)] * 2
        aliases.update({12: 4, 13: 5})
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(blocks.shape[0],),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=[pltpu.VMEM((pp, block_rows), jnp.float32)],
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(shapes),
        input_output_aliases=aliases,
        interpret=interpret,
    )(blocks, wins_a, wins_b, first, *args)
    if k > 0:
        w, z, nn, cnt, v, nv = outs
    else:
        w, z, nn, cnt = outs
        v, nv = state.V, state.nV
    return FMState(w=w, z=z, n=nn, V=v, nV=nv, cnt=cnt)
