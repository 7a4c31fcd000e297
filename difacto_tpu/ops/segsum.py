"""Sorted-slot segment-sum kernel: per-key gradient aggregation with NO
scatter.

The reference aggregates per-key gradients on worker CPUs before pushing
(``src/sgd/sgd_learner.h`` hot loop -> per-key sums via the Localizer's
compacted indices). The XLA translation — ``zeros.at[inv].add(flat)`` —
is a 655k-index scatter-add that MEASURES 10.9 ms on the flagship batch
(scripts/hw_worker_breakdown.py), the single largest term of the 24 ms
train step; a cumsum-prefix-diff alternative measured 13.6 ms (TPU cumsum
over [655k, 17] is log-pass bound). Both REJECTED on measurement.

This kernel exploits what the host already knows (the prep radix sort
orders slots by key for free): given the per-slot payload in SORTED slot
order, per-key sums are segment sums over a MONOTONE lane stream, and a
monotone stream admits a dense tile decomposition:

    * cut the sorted slot stream into fixed tiles of ``tile_slots``;
    * within a tile, lanes are non-decreasing, so a tile touches a
      CONTIGUOUS lane range of width < tile_slots;
    * the (tile, aligned out-window) incidence list is tiny (~tiles +
      windows pairs) and host-built, like ops/pair_sweep.py schedules;
    * per incidence, the tile's contribution to the window is ONE
      one-hot matmul [tile_slots, win_lanes] x [pp, tile_slots] on the
      MXU — a scatter becomes a dense contraction.

Grid size ~ (BL/tile_slots + U/win_lanes) is table-size-INDEPENDENT, so
the kernel serves any table regime (the pair kernels' crossover at 2^23
rows/shard does not apply — this one never touches the table).

Correctness invariants:
  * pairs are window-major and tiles are monotone in the stream, so a
    window's incident tiles are consecutive grid steps: first pair of a
    window run overwrites (VMEM undefined on first visit), later pairs
    accumulate, the run's end flushes to HBM (sequential TPU grid);
  * windows no tile touches get an explicit (tile 0, window) pad pair:
    the one-hot compare yields an all-zero matrix -> exact zeros out;
  * stream pad slots carry payload 0 (and repeat the last real lane to
    keep the stream monotone), so they add nothing — same contract as
    the scatter path's masked junk lane.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pair_sweep import PAIR_BUCKETS, _bucket

TILE_SLOTS = 1024   # sorted slots per grid tile
WIN_LANES = 512     # aligned out-window width (unique lanes)


@dataclass
class SegMeta:
    """Host-built (tile, window) incidence schedule for one sorted
    stream. ``n_win`` counts REAL windows; the kernel's out array has one
    extra sentinel window for grid padding."""

    tiles: np.ndarray   # i32 [P]
    wins: np.ndarray    # i32 [P]
    first: np.ndarray   # i32 [P] 1 = first pair of a window run
    n_win: int
    tile_slots: int
    win_lanes: int


def pad_sorted_stream(inv_sorted: np.ndarray, tile_slots: int = TILE_SLOTS):
    """Pad a monotone lane stream to a tile multiple by repeating the
    last lane (pad slots must carry zero payload)."""
    bl = inv_sorted.shape[0]
    blp = (bl + tile_slots - 1) // tile_slots * tile_slots
    if blp == bl:
        return inv_sorted.astype(np.int32, copy=False)
    last = inv_sorted[-1] if bl else 0
    return np.concatenate(
        [inv_sorted.astype(np.int32, copy=False),
         np.full(blp - bl, last, np.int32)]
    )


def build_seg_meta(
    inv_sorted: np.ndarray,   # i32 [BLp] monotone lanes, tile-padded
    ub: int,                  # unique-lane count (output width)
    tile_slots: int = TILE_SLOTS,
    win_lanes: int = WIN_LANES,
    buckets=PAIR_BUCKETS,
) -> SegMeta:
    blp = inv_sorted.shape[0]
    assert blp % tile_slots == 0 and blp > 0
    n_win = (ub + win_lanes - 1) // win_lanes
    starts = inv_sorted[::tile_slots].astype(np.int64)
    ends = inv_sorted[tile_slots - 1 :: tile_slots].astype(np.int64)
    w0 = starts // win_lanes
    w1 = ends // win_lanes
    counts = (w1 - w0 + 1).astype(np.int64)
    tiles = np.repeat(
        np.arange(len(counts), dtype=np.int32), counts
    )
    offs = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts
    )
    wins = (np.repeat(w0, counts) + offs).astype(np.int32)
    # uncovered real windows -> (tile 0, w) zero-writing pad pairs
    covered = np.zeros(n_win + 1, bool)
    covered[np.minimum(wins, n_win)] = True
    missing = np.nonzero(~covered[:n_win])[0].astype(np.int32)
    if missing.size:
        tiles = np.concatenate([tiles, np.zeros(missing.size, np.int32)])
        wins = np.concatenate([wins, missing])
    # window-major order (tiles of one window stay stream-ordered)
    o = np.lexsort((tiles, wins))
    tiles, wins = tiles[o], wins[o]
    # pad the grid to the DETERMINISTIC worst case — a monotone stream
    # of T tiles over W windows has at most T + W - 1 incidences (every
    # pair after the first opens a new tile or a new window), and the
    # uncovered-window pads keep the total at exactly T + W - 1 + pads
    # <= T + W. A shape derived only from (BLp, ub) means every batch of
    # a config lands on ONE jit/Mosaic specialization and multi-process
    # runs agree on it with no collective.
    p_real = tiles.shape[0]
    p = _bucket(blp // tile_slots + n_win + 1, buckets)
    assert p_real <= p, (p_real, p)
    tiles = np.concatenate([tiles, np.zeros(p - p_real, np.int32)])
    wins = np.concatenate([wins, np.full(p - p_real, n_win, np.int32)])
    first = np.ones(p, np.int32)
    first[1:] = wins[1:] != wins[:-1]
    return SegMeta(
        tiles=tiles, wins=wins, first=first, n_win=n_win,
        tile_slots=tile_slots, win_lanes=win_lanes,
    )


def _segsum_kernel(tiles_ref, wins_ref, first_ref, lane_ref, pay_ref,
                   out_ref, *, win_lanes: int):
    i = pl.program_id(0)
    base = wins_ref[i] * win_lanes
    lid = lane_ref[0, :] - base                       # [Ts]
    ts = lid.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, (ts, win_lanes), 1)
    m = (cols == lid[:, None]).astype(jnp.float32)    # [Ts, Wout]
    contrib = jax.lax.dot_general(
        pay_ref[:], m,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                 # [pp, Wout]
    out_ref[:] = jnp.where(first_ref[i] == 1, contrib, out_ref[:] + contrib)


def segsum_sorted(
    payT: jnp.ndarray,        # f32 [pp, BLp] planar payload, SORTED slots
    lanes2d: jnp.ndarray,     # i32 [8, BLp] replicated monotone lanes
    meta_dev: tuple,          # (tiles, wins, first) on device
    *,
    ub: int,
    tile_slots: int = TILE_SLOTS,
    win_lanes: int = WIN_LANES,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-lane segment sums [pp, ub] of a sorted planar slot payload."""
    pp, blp = payT.shape
    assert pp % 8 == 0 and blp % tile_slots == 0
    tiles, wins, first = meta_dev
    n_win = (ub + win_lanes - 1) // win_lanes
    kern = functools.partial(_segsum_kernel, win_lanes=win_lanes)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tiles.shape[0],),
        in_specs=[
            pl.BlockSpec((8, tile_slots), lambda i, t, w, f: (0, t[i])),
            pl.BlockSpec((pp, tile_slots), lambda i, t, w, f: (0, t[i])),
        ],
        out_specs=pl.BlockSpec((pp, win_lanes), lambda i, t, w, f: (0, w[i])),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pp, (n_win + 1) * win_lanes),
                                       jnp.float32),
        interpret=interpret,
    )(tiles, wins, first, lanes2d, payT)
    return out[:, :ub]


def lanes_2d(inv_sorted: jnp.ndarray) -> jnp.ndarray:
    """[BLp] monotone lanes -> [8, BLp] replicated (2-D dynamic slicing,
    same layout trick as pair_sweep._uids2d)."""
    return jnp.broadcast_to(
        inv_sorted.astype(jnp.int32)[None, :], (8, inv_sorted.shape[0])
    )
