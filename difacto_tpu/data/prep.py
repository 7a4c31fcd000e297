"""Host-side batch localization (dedup) for the prefetch pipeline.

The reference runs its Localizer (``src/data/localizer.h``) on worker
CPU threads, overlapped with training via the minibatch pipeline. Our
device-side ``ops/localize.py`` (jnp.unique) costs ~25 ms/step on a
16k x 40 batch AND must size its output for the worst case (B*L unique
ids). Doing the dedup here — in the loader's prefetch thread, overlapped
with device steps — removes that device cost and lets the unique-lane
count shrink to the batch's ACTUAL unique count, rounded up to a bucket
size so jit re-specializes only a handful of times. Every downstream
sparse cost (expansion gather, gradient segment-sum, sweep-kernel
payload) scales with that bucket.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass

import numpy as np

from .batch_iter import Batch

# per-thread id->lane scratch tables (see _localize_ids): a fresh
# np.empty per batch costs ~45 ms in page faults at 2^22 rows; a reused
# buffer costs ~4 ms. Thread-local because prep fans out to a worker
# pool (utils/prefetch.py::MappedPrefetchIter).
_TLS = threading.local()


# direct id->lane LUTs are capped: beyond 2^24 rows a per-thread table
# would cost 4 B x rows x prep_workers of address space (4 GB/thread at
# the allowed num_bits=30) with epoch-long unique coverage touching ever
# more pages — above the cap the inverse falls back to a searchsorted
# over the batch's own sorted uniques (memory O(batch), ~2x slower)
_LUT_MAX_ROWS = 1 << 24


def _lut_for(num_rows: int) -> np.ndarray:
    d = getattr(_TLS, "luts", None)
    if d is None:
        d = _TLS.luts = {}
    lut = d.get(num_rows)
    if lut is None:
        lut = d[num_rows] = np.empty(num_rows + 1, np.int32)
    return lut


def validate_fields(fields: np.ndarray | None, num_fields: int) -> None:
    """Host-side libffm field-range check (the loss clips field ids into
    range, so an out-of-range id — num_fields set too small, or a
    malformed file — would otherwise train a silently wrong model). Runs
    here, where fields are still host numpy: the prepped fast paths
    device-place batches before the store ever sees them."""
    if num_fields <= 0:
        return
    if fields is None:
        raise ValueError(
            "num_fields > 0 but this batch carries no field ids "
            "(use data_format=libffm)"
        )
    if isinstance(fields, np.ndarray) and fields.size:
        fmax = int(fields.max())
        if fmax >= num_fields:
            raise ValueError(
                f"libffm field id {fmax} out of range: num_fields="
                f"{num_fields} (fields must be in [0, num_fields))"
            )

# unique-lane bucket ladder: actual unique count is padded up to one of
# these (few distinct sizes => few jit specializations)
DEFAULT_BUCKETS = (1 << 14, 1 << 15, 1 << 16, 1 << 17, 17 << 13, 3 << 16,
                   1 << 18, 3 << 17, 1 << 19, 3 << 18, 1 << 20)


@dataclass
class PreppedBatch:
    """A Batch plus its host-computed localization."""

    vals: np.ndarray     # f32 [B, L]
    labels: np.ndarray   # f32 [B]
    mask: np.ndarray     # f32 [B]
    uids: np.ndarray     # i32 [Ub] sorted unique hashed ids; sentinel N pad
    ucounts: np.ndarray  # f32 [Ub]
    inv: np.ndarray      # i32 [B*L] row-major slot -> unique lane
    valid: np.ndarray    # bool [Ub]
    pair_meta: object = None  # ops.pair_sweep.PairMeta when kernel=pairs
    sorted_slots: object = None  # SortedSlots when segsum=sorted
    fields: np.ndarray | None = None  # i32 [B, L] libffm fields (loss=ffm)
    fields_checked: bool = False  # range-validated at prep time (host)
    # hot/cold frequency split (data/remap.py + HotColdFMState): when
    # set, ``uids`` is the concatenation of a hot-prefix bucket (ids <
    # hot_rows, pad sentinel hot_rows) and a cold bucket (pad sentinel
    # num_rows) — these are views uids[:Ch] / uids[Ch:], carried as
    # separate arrays so the jitted step specializes on the split point
    # through their SHAPES.
    uids_hot: np.ndarray | None = None   # i32 [Ch]
    uids_cold: np.ndarray | None = None  # i32 [Cc] GLOBAL remapped ids

    @property
    def num_examples(self) -> int:
        return int(self.mask.sum())


def bucket_for(n: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    # pathological: exact size (recompile); 128-aligned because the pair
    # kernels address unique lanes in 128-wide windows
    return (n + 127) // 128 * 128


def _localize_ids(ids: np.ndarray, num_rows: int):
    """Dedup one shard's padded ids (PAD_ID=-1 -> sentinel num_rows,
    which sorts last). Returns (uids, inv, counts, has_sentinel, n_real).

    Implementation note (measured, flagship 655k-slot batch): numpy's
    int32 ``np.sort`` is a radix sort (~2 ms) while ``np.unique``'s
    argsort-based inverse costs ~85 ms — so the inverse is rebuilt from
    a direct id->lane lookup table instead (9.6 ms total, 9x faster).
    The table is ``np.empty`` (no zeroing; only touched pages
    materialize), so even 2^26-row spaces stay cheap."""
    flat = ids.reshape(-1)
    if flat.dtype != np.int32:
        flat = flat.astype(np.int32)
    if len(flat) == 0:
        return (np.zeros(0, np.int64), np.zeros(0, np.int64),
                np.zeros(0, np.int64), False, 0)
    if num_rows > _LUT_MAX_ROWS and len(flat) >= 4096:
        from . import _native

        if _native.localize_available():
            # native index-tracking radix (csrc/localizer.cpp): O(batch)
            # memory at ANY table size. Engine choice is measured
            # (BENCH.md): below the LUT cap the numpy sort+LUT inverse
            # wins on power-law batches (10.0 vs 13.7 ms flagship);
            # above it the native radix beats the searchsorted fallback
            # 12x (15.4 vs 182.8 ms at 2^26 uniform). Parity pinned by
            # tests/test_native_parser.py.
            uids, inv, counts = _native.localize(flat, num_rows)
            has_sentinel = bool(len(uids)) and uids[-1] == num_rows
            n_real = len(uids) - int(has_sentinel)
            return uids, inv, counts, has_sentinel, n_real
    keys = np.where(flat < 0, np.int32(num_rows), flat)
    sk = np.sort(keys)  # radix for int32
    first = np.empty(len(sk), bool)
    first[0] = True
    np.not_equal(sk[1:], sk[:-1], out=first[1:])
    idx = np.flatnonzero(first)
    uids = sk[idx]
    counts = np.diff(np.append(idx, len(sk)))
    if num_rows <= _LUT_MAX_ROWS:
        lut = _lut_for(num_rows)
        lut[uids] = np.arange(len(uids), dtype=np.int32)
        inv = lut[keys]
    else:
        inv = np.searchsorted(uids, keys).astype(np.int32)
    has_sentinel = bool(len(uids)) and uids[-1] == num_rows
    n_real = len(uids) - int(has_sentinel)
    return uids, inv, counts, has_sentinel, n_real


def _pack_localized(uids, inv, counts, has_sentinel, n_real, num_rows, ub):
    """Pad/truncate one shard's unique set to exactly ``ub`` lanes.

    When the real unique count does not fit (fixed bucket smaller than
    the batch's uniques), the overflowing ids are DROPPED and counted:
    lane ub-1 is reserved as an invalid junk lane and every slot of a
    dropped id (and of input padding) points there. Returns
    (uids, counts, inv, valid, n_dropped)."""
    n_keep = min(n_real, ub)
    if (has_sentinel or n_keep < n_real) and n_keep == ub:
        n_keep = ub - 1  # reserve a junk lane for sentinel/dropped slots
    dropped = n_real - n_keep
    u_out = np.full(ub, num_rows, np.int32)
    c_out = np.zeros(ub, np.float32)
    u_out[:n_keep] = uids[:n_keep]
    c_out[:n_keep] = counts[:n_keep]
    valid = np.zeros(ub, bool)
    valid[:n_keep] = True
    inv = inv.astype(np.int32)
    if has_sentinel or dropped:
        inv = np.where(inv >= n_keep, ub - 1, inv)
    return u_out, c_out, inv, valid, dropped


# cold-bucket granularity for the hot/cold split: the big-table scatter
# pays ~155 ns per COLD lane including pads (hw_scatter_cliff.py), so the
# cold bucket rounds finely; the slop from the coarse total-U ladder
# (which the segsum kernel's Mosaic specialization is keyed on) lands in
# the HOT bucket at ~22 ns/lane instead
_COLD_GRAN = 2048


def _pack_localized_split(
    uids, inv, counts, n_real, num_rows, hot_rows, buckets, min_ub,
):
    """Split-pack one batch's sorted uniques into [hot-prefix | cold]
    buckets (see PreppedBatch.uids_hot). Returns
    (uids, counts, inv, valid, ch). A sentinel entry (position n_real)
    needs no special case: its shifted position lands on the first cold
    pad, which is an invalid junk lane by construction (cc > n_cold)."""
    n_hot = int(np.searchsorted(uids[:n_real], hot_rows, side="left"))
    n_cold = n_real - n_hot
    # the junk lane (sentinel/padding slots) always lives in the cold pad
    cc = max(-(-(n_cold + 1) // _COLD_GRAN) * _COLD_GRAN, _COLD_GRAN)
    floor = (min_ub + 127) // 128 * 128 if min_ub else 0
    ub = max(bucket_for(n_hot + cc, buckets), floor)
    ch = ub - cc
    u_out = np.full(ub, num_rows, np.int32)
    u_out[:n_hot] = uids[:n_hot]
    u_out[n_hot:ch] = hot_rows  # hot pad sentinel: OOB for the hot table
    u_out[ch : ch + n_cold] = uids[n_hot:n_real]
    c_out = np.zeros(ub, np.float32)
    c_out[:n_hot] = counts[:n_hot]
    c_out[ch : ch + n_cold] = counts[n_hot:n_real]
    valid = np.zeros(ub, bool)
    valid[:n_hot] = True
    valid[ch : ch + n_cold] = True
    inv = inv.astype(np.int32)
    # hot positions unchanged; cold shifted past the hot pads; the
    # sentinel entry (old position n_real) lands on the first cold pad —
    # an invalid junk lane by construction (cc > n_cold)
    inv = np.where(inv < n_hot, inv, inv - n_hot + ch)
    return u_out, c_out, inv, valid, ch


def prep_batch(
    batch: Batch, num_rows: int, buckets=DEFAULT_BUCKETS,
    min_ub: int | None = None, num_fields: int = 0,
    remap: np.ndarray | None = None, hot_rows: int = 0,
) -> PreppedBatch:
    """np.unique localization of one padded batch (reference:
    Localizer::Compact — sort, dedup, rewrite indices, count).

    ``min_ub`` floors the unique bucket (config ``unique_size``): pinning
    the bucket keeps every batch on ONE jit/Mosaic specialization — on
    environments where kernel compiles are minutes, per-batch bucket
    churn otherwise stalls the epoch. A rare larger batch still gets the
    next bucket up (correctness first; one extra specialization).

    ``num_fields`` > 0 validates explicit libffm field ids host-side
    (the last point where they are still numpy on the prepped path).

    ``remap``/``hot_rows``: frequency-ordered row relabeling + hot/cold
    bucket split (data/remap.py, HotColdFMState). The remap gather runs
    BEFORE dedup, so the whole downstream pipeline (sorted uniques,
    inverse, segment-sum schedules) operates in remapped space
    unchanged."""
    validate_fields(batch.fields, num_fields)
    ids = batch.ids
    if remap is not None:
        from .remap import apply_remap

        assert hot_rows > 0, "remap without hot_rows has no effect"
        ids = apply_remap(ids, remap)
    uids, inv, counts, has_sentinel, n_real = _localize_ids(ids, num_rows)
    if remap is not None:
        u_out, c_out, inv, valid, ch = _pack_localized_split(
            uids, inv, counts, n_real, num_rows, hot_rows, buckets, min_ub,
        )
        return PreppedBatch(
            vals=batch.vals,
            labels=batch.labels,
            mask=batch.mask,
            uids=u_out,
            ucounts=c_out,
            inv=inv.reshape(-1),
            valid=valid,
            fields=batch.fields,
            fields_checked=num_fields > 0,
            uids_hot=u_out[:ch].copy(),
            uids_cold=u_out[ch:].copy(),
        )
    # the bucket must leave a junk lane for sentinel slots when present;
    # the floor rounds up to the pair kernels' 128-lane window granule
    need = max(n_real + int(has_sentinel), 1)
    floor = (min_ub + 127) // 128 * 128 if min_ub else 0
    ub = max(bucket_for(need, buckets), floor)
    u_out, c_out, inv, valid, dropped = _pack_localized(
        uids, inv, counts, has_sentinel, n_real, num_rows, ub
    )
    assert dropped == 0  # bucket_for always fits (falls back to exact size)
    return PreppedBatch(
        vals=batch.vals,
        labels=batch.labels,
        mask=batch.mask,
        uids=u_out,
        ucounts=c_out,
        inv=inv.reshape(-1),
        valid=valid,
        fields=batch.fields,
        fields_checked=num_fields > 0,
    )


@dataclass
class SortedSlots:
    """Host-built sorted-slot arrays for the no-scatter gradient
    aggregation (ops/segsum.py): the batch's nnz slots reordered by
    unique lane, so per-key gradient sums become segment sums over a
    monotone stream. All arrays are padded to a tile multiple; pad slots
    carry x == 0 and repeat the last real lane (they add nothing).

    The permutation is a stable argsort of ``inv`` — host work the
    reference also did on worker CPUs (its Localizer sorts the batch's
    keys anyway); it runs in the prep/prefetch workers, overlapped with
    device steps.

    COMPACT form (``compact=True``): x_sorted/bidx/inv_sorted are None
    and only ``slot_sorted`` (+ the seg schedule) ships — they are pure
    derivations of (vals, inv, slot_sorted), so the store regenerates
    them on device from RESIDENT cached arrays (~2 device gathers/step).
    Cuts the device-cached batch footprint ~7.7 MB -> ~2.6 MB of sorted
    arrays per flagship batch — what lets a 2^26 table coexist with a
    6M-row device-resident batch cache on one 16 GB chip."""

    x_sorted: np.ndarray | None    # f32 [BLp] vals in sorted-slot order
    bidx: np.ndarray | None        # i32 [BLp] example index per sorted slot
    inv_sorted: np.ndarray | None  # i32 [BLp] monotone unique lanes
    # flat ops.segsum schedule arrays (flat so utils/place.py's one-level
    # nested-dataclass placement device-puts them with the batch)
    seg_tiles: np.ndarray   # i32 [P]
    seg_wins: np.ndarray    # i32 [P]
    seg_first: np.ndarray   # i32 [P]
    # flat [B*L] slot index per sorted slot (the sort permutation itself;
    # pads carry 0 and are masked by the static arange(BLp) < B*L mask on
    # device). Built only for loss=ffm — its per-slot dV4 has no per-key
    # factoring, so the sorted backward gathers the batch-space per-slot
    # gradient rows instead (learners/step.py::worker_grads_sorted).
    slot_sorted: np.ndarray | None = None


def build_sorted_slots(
    inv: np.ndarray, vals: np.ndarray, ub: int, with_slots: bool = False,
    compact: bool = False,
) -> SortedSlots:
    """SortedSlots for one prepped batch (``inv`` [B*L], ``vals`` [B, L]).

    ``compact``: ship only the permutation + schedule (see SortedSlots —
    the store derives the sorted arrays on device). Pad slots of the
    device-derived stream carry lane inv[slot_sorted[pad]] = inv[0]
    instead of the monotone repeat-last — harmless: the segsum schedule
    is built HERE from the true monotone stream, pad payloads are zero,
    and a zero added to any scheduled window (or matched by no window)
    changes nothing."""
    from ..ops.segsum import build_seg_meta, pad_sorted_stream

    L = vals.shape[1]
    perm = np.argsort(inv, kind="stable")
    inv_s = pad_sorted_stream(inv[perm].astype(np.int32, copy=False))
    blp, bl = inv_s.shape[0], perm.shape[0]
    m = build_seg_meta(inv_s, ub)
    slot_s = None
    if with_slots or compact:
        slot_s = np.zeros(blp, np.int32)
        slot_s[:bl] = perm.astype(np.int32)
    if compact:
        return SortedSlots(
            x_sorted=None, bidx=None, inv_sorted=None,
            seg_tiles=m.tiles, seg_wins=m.wins, seg_first=m.first,
            slot_sorted=slot_s,
        )
    x = np.zeros(blp, np.float32)
    x[:bl] = vals.reshape(-1)[perm]
    bidx = np.zeros(blp, np.int32)
    bidx[:bl] = (perm // L).astype(np.int32)
    return SortedSlots(
        x_sorted=x, bidx=bidx, inv_sorted=inv_s,
        seg_tiles=m.tiles, seg_wins=m.wins, seg_first=m.first,
        slot_sorted=slot_s,
    )


@dataclass
class ShardPreppedBatch:
    """Host-localized batch for the ShardedStore: per-shard unique sets.

    The reference's production path IS the distributed one (StoreDist over
    ps-lite, ``src/store/store_dist.h``), with the Localizer running on
    worker CPUs — this is the equivalent: the batch's rows are split into
    ``num_shards`` contiguous row groups (one per device along the
    ``shard`` mesh axis), each group is deduplicated on the host, and the
    per-shard unique sets are stacked flat so a shard_map with
    P('shard') in_specs hands every device exactly its own localization.
    All shards share one bucket size ``ub`` (max over shards, padded up
    the bucket ladder) so one jit specialization serves the whole batch.
    """

    vals: np.ndarray     # f32 [B, L]     (global batch layout, row-split)
    labels: np.ndarray   # f32 [B]
    mask: np.ndarray     # f32 [B]
    uids: np.ndarray     # i32 [S*ub]     per-shard sorted uniques, stacked
    ucounts: np.ndarray  # f32 [S*ub]
    inv: np.ndarray      # i32 [B*L]      slot -> unique lane (shard-local)
    valid: np.ndarray    # bool [S*ub]
    dropped: np.ndarray  # f32 [S]        unique ids dropped by a fixed bucket
    ub: int
    num_shards: int
    fields: np.ndarray | None = None  # i32 [B, L] libffm fields (loss=ffm)
    pair_metas: object = None  # ShardPairMetas when kernel=pairs
    sorted_slots: object = None  # SortedSlots (stacked [S, ...]) when
                                 # segsum=sorted
    fields_checked: bool = False  # range-validated at prep time (host)

    @property
    def num_examples(self) -> int:
        return int(self.mask.sum())


@dataclass
class ShardPairMetas:
    """Per-OWNER pair schedules for the ShardedStore's owner-side pair
    kernels (ops/pair_sweep.py), built on the host from the per-shard
    unique sets of a ShardPreppedBatch.

    The host mirrors the device routing exactly (ShardedStore._routing:
    ``owner = min(uid // rows_per_shard, S-1)``, per-owner buckets of
    ``capacity`` slots, overflow truncated) to reconstruct, for every
    owner device, the LOCAL-id stream it receives after the all_to_all:
    S segments of ``capacity`` lanes, each segment sorted ascending with
    trailing ``rows_per_shard`` sentinels. Pull metas are window-major
    (the pull kernel's first-visit blend needs same-window pairs
    consecutive across segments), apply metas block-major (the apply
    kernel accumulates a block's pairs before its single fused optimizer
    commit). All owners pad to one common pair count so the arrays stack
    [S, P] and shard over the mesh with P('shard') specs.
    """

    pull_blocks: np.ndarray   # i32 [S, Pp]
    pull_wins: np.ndarray     # i32 [S, Pp]
    pull_wfirst: np.ndarray   # i32 [S, Pp]
    apply_blocks: np.ndarray  # i32 [S, Pa]
    apply_wins: np.ndarray    # i32 [S, Pa]
    apply_first: np.ndarray   # i32 [S, Pa]
    capacity: int
    block_rows: int


def shard_bucket_fills(
    pb: ShardPreppedBatch, num_rows: int, num_shards_global: int | None = None
) -> np.ndarray:
    """i64 [n_local, S] routing matrix: fills[src, owner] = how many of
    source ``src``'s valid unique ids the device routing sends to
    ``owner``. Lets the store pick the all_to_all capacity from the
    batch's ACTUAL maximum bucket fill (zero drops, minimal stream)
    instead of a worst-case capacity_factor guess.

    ``num_shards_global``: total owner count (multi-process — the batch
    preps only this process's local source shards, but ids route to
    owners across ALL processes); defaults to the batch's own shard
    count (single-process)."""
    n_local, ub = pb.num_shards, pb.ub
    S = num_shards_global or n_local
    rows_per_shard = num_rows // S
    uids = pb.uids.reshape(n_local, ub).astype(np.int64)
    bounds = np.arange(S + 1, dtype=np.int64) * rows_per_shard
    fills = np.empty((n_local, S), np.int64)
    for s in range(n_local):
        n_valid = int(np.searchsorted(uids[s], num_rows, side="left"))
        lo = np.searchsorted(uids[s][:n_valid], bounds, side="left")
        fills[s] = lo[1:] - lo[:-1]
    return fills


def _send_buckets(
    pb: ShardPreppedBatch, num_rows: int, S_global: int, C: int
) -> np.ndarray:
    """i32 [n_local, S_global, C] per-(local source, global owner) send
    buckets of GLOBAL hashed ids (sentinel ``num_rows`` padding) — the
    host mirror of ShardedStore._gather_routing: each sorted per-source
    unique set splits into contiguous owner runs, truncated at C (the
    device counts those drops)."""
    n_local, ub = pb.num_shards, pb.ub
    rows_per_shard = num_rows // S_global
    uids = pb.uids.reshape(n_local, ub).astype(np.int64)
    bounds = np.arange(S_global + 1, dtype=np.int64) * rows_per_shard
    out = np.full((n_local, S_global, C), num_rows, np.int32)
    for s in range(n_local):
        u = uids[s]
        n_valid = int(np.searchsorted(u, num_rows, side="left"))
        lo = np.searchsorted(u[:n_valid], bounds, side="left")
        for o in range(S_global):
            cnt = min(int(lo[o + 1] - lo[o]), C)
            out[s, o, :cnt] = u[lo[o] : lo[o] + cnt]
    return out


def _owner_raws(
    send: np.ndarray,       # i32 [S, S, C] global send matrix [src, owner]
    num_rows: int,
    block_rows: int,
    keep: range,
) -> list:
    """Raw touched-pair discovery for owners in ``keep`` only — a process
    builds its LOCAL owners' schedules, O(n_local * S * C) host work per
    step instead of O(S^2 * C) (the padded pair count is agreed
    separately, via a tiny allgather of per-process maxima)."""
    from ..ops.pair_sweep import _pairs_raw

    S, C = send.shape[0], send.shape[2]
    rows_per_shard = num_rows // S
    raws = []
    for o in keep:
        # owner o's post-all_to_all local-id stream: source s's bucket in
        # segment s; sentinel global ids become the local sentinel
        g = send[:, o, :].reshape(S * C).astype(np.int64)
        stream = np.where(g >= num_rows, rows_per_shard, g - o * rows_per_shard)
        raws.append(_pairs_raw(stream, rows_per_shard, block_rows, C))
    return raws


def _finish_metas(
    raws: list,
    S: int,
    capacity: int,
    block_rows: int,
    num_rows: int,
    pair_bucket: int,
) -> ShardPairMetas:
    """Order + pad each kept owner's raw pair list to ``pair_bucket``
    pairs (identical on every process so the stacked [n_local, P] arrays
    agree globally — required by make_array_from_process_local_data).
    Pull (window-major) and apply (block-major) are two orderings of the
    SAME raw list, so one P serves both."""
    from ..ops.pair_sweep import W, _pairs_finish

    C = capacity
    rows_per_shard = num_rows // S
    sent_win = (S * C) // W
    P = pair_bucket
    pb_l, pw_l, pwf_l, ab_l, aw_l, af_l = [], [], [], [], [], []
    for blocks, wins, nseg in raws:
        m = _pairs_finish(
            blocks, wins, nseg, sent_win, block_rows, (P,), "window"
        )
        pb_l.append(m.blocks); pw_l.append(m.wins); pwf_l.append(m.wfirst)
        m = _pairs_finish(
            blocks, wins, nseg, sent_win, block_rows, (P,), "block"
        )
        ab_l.append(m.blocks); aw_l.append(m.wins); af_l.append(m.first)
    return ShardPairMetas(
        pull_blocks=np.stack(pb_l), pull_wins=np.stack(pw_l),
        pull_wfirst=np.stack(pwf_l),
        apply_blocks=np.stack(ab_l), apply_wins=np.stack(aw_l),
        apply_first=np.stack(af_l),
        capacity=C, block_rows=block_rows,
    )


def _metas_from_send(
    send: np.ndarray,       # i32 [S, S, C] global send matrix [src, owner]
    num_rows: int,
    capacity: int,
    block_rows: int,
    keep: range,
) -> ShardPairMetas:
    """Pair schedules from the GLOBAL send matrix, single-process form:
    raws for all kept owners, pair bucket from their own maximum."""
    from ..ops.pair_sweep import _bucket

    raws = _owner_raws(send, num_rows, block_rows, keep)
    P = _bucket(max(max(r[0].shape[0] for r in raws), 1))
    return _finish_metas(
        raws, send.shape[0], capacity, block_rows, num_rows, P
    )


def build_shard_pair_metas(
    pb: ShardPreppedBatch,
    num_rows: int,
    capacity: int,
    block_rows: int,
) -> ShardPairMetas:
    """Owner-side pair schedules for one ShardPreppedBatch (see
    ShardPairMetas), single-process: the batch's prep covers ALL shards.
    ``capacity`` must be the store's per-(src,dst) all_to_all slot count
    for this batch's bucket (ShardedStore.pairs_capacity), a multiple of
    128."""
    from ..ops.pair_sweep import W, build_pair_meta

    S, C = pb.num_shards, capacity
    assert C % W == 0, "pair kernels need 128-lane-aligned capacity"
    if S == 1:
        # degenerate mesh: the store skips routing and runs the pair
        # kernels straight on the unique bucket (ShardedStore._pull_pairs
        # S==1 branch) — one schedule serves pull and apply (a single
        # sorted segment is both window- and block-monotonic)
        m = build_pair_meta(pb.uids, num_rows, block_rows)
        return ShardPairMetas(
            pull_blocks=m.blocks[None], pull_wins=m.wins[None],
            pull_wfirst=m.wfirst[None],
            apply_blocks=m.blocks[None], apply_wins=m.wins[None],
            apply_first=m.first[None],
            capacity=C, block_rows=block_rows,
        )
    send = _send_buckets(pb, num_rows, S, C)
    return _metas_from_send(send, num_rows, C, block_rows, range(S))


def build_shard_pair_metas_mp(
    pb: ShardPreppedBatch,
    num_rows: int,
    S_global: int,
    capacity: int,
    block_rows: int,
) -> ShardPairMetas:
    """Multi-process pair schedules: every process preps only its LOCAL
    rows, but owner-side schedules need every source's buckets — so the
    bucketed GLOBAL ids are ``process_allgather``-ed (~S*C*4 B per local
    shard per step), each process reconstructs the global send matrix and
    builds schedules for its LOCAL owner devices, padded to globally
    agreed pair counts (computed over all owners — every process holds
    the same send matrix).

    MUST be called on the main thread in lockstep step order (it is a
    collective); the ShardedStore calls it from train/eval_step_prepped,
    never from prefetch workers. ``capacity`` must be deterministic
    across processes (agreed from the same config — or from a prior
    lockstep allgather of batch fills, ShardedStore._mp_pairs_capacity).

    Per-process host cost is O(n_local * S * C): raw touched-pair
    discovery runs only for this process's LOCAL owner devices; the
    padded pair count the stacked arrays share globally is agreed by a
    second, tiny allgather of each process's local maximum raw count
    (server work must not grow with the square of the cluster — SURVEY
    §2.2 ps-lite KV app).

    Counterpart of the reference's dist path being its production path
    (SURVEY §2.2 ps-lite KV app: servers see every worker's key ranges
    by construction; under SPMD the host-built schedules need these
    allgathers)."""
    import jax
    from jax.experimental import multihost_utils

    from ..ops.pair_sweep import W, _bucket

    C = capacity
    assert C % W == 0, "pair kernels need 128-lane-aligned capacity"
    n_local = pb.num_shards
    send_local = _send_buckets(pb, num_rows, S_global, C)
    gathered = np.asarray(multihost_utils.process_allgather(send_local))
    send = gathered.reshape(S_global, S_global, C)
    pid = jax.process_index()
    keep = range(pid * n_local, (pid + 1) * n_local)
    raws = _owner_raws(send, num_rows, block_rows, keep)
    local_max = max((r[0].shape[0] for r in raws), default=0)
    gmax = int(
        np.asarray(
            multihost_utils.process_allgather(np.array(local_max, np.int64))
        ).max()
    )
    P = _bucket(max(gmax, 1))
    return _finish_metas(raws, S_global, C, block_rows, num_rows, P)


def prep_batch_sharded(
    batch: Batch,
    num_rows: int,
    num_shards: int,
    buckets=DEFAULT_BUCKETS,
    fixed_ub: int | None = None,
    num_fields: int = 0,
) -> ShardPreppedBatch:
    """Per-shard host localization (see ShardPreppedBatch).

    ``fixed_ub`` pins the bucket size — REQUIRED in multi-process runs,
    where every process preps its local rows independently but all
    processes must trace identical shapes (dropped ids are counted in
    ``dropped`` and surface as metrics.dropped_ids)."""
    validate_fields(batch.fields, num_fields)
    b, l = batch.ids.shape
    assert b % num_shards == 0, "num_shards must divide the batch rows"
    bs = b // num_shards
    per = [
        _localize_ids(batch.ids[s * bs : (s + 1) * bs], num_rows)
        for s in range(num_shards)
    ]
    if fixed_ub is None:
        need = max(max(n_real + int(has_s), 1) for *_, has_s, n_real in per)
        ub = bucket_for(need, buckets)
    else:
        ub = fixed_ub
    u_st = np.empty((num_shards, ub), np.int32)
    c_st = np.empty((num_shards, ub), np.float32)
    inv_st = np.empty((num_shards, bs * l), np.int32)
    v_st = np.empty((num_shards, ub), bool)
    d_st = np.empty(num_shards, np.float32)
    for s, (uids, inv, counts, has_s, n_real) in enumerate(per):
        u_st[s], c_st[s], inv_st[s], v_st[s], d_st[s] = _pack_localized(
            uids, inv, counts, has_s, n_real, num_rows, ub
        )
    return ShardPreppedBatch(
        vals=batch.vals,
        labels=batch.labels,
        mask=batch.mask,
        uids=u_st.reshape(-1),
        ucounts=c_st.reshape(-1),
        inv=inv_st.reshape(-1),
        valid=v_st.reshape(-1),
        dropped=d_st,
        ub=ub,
        num_shards=num_shards,
        fields=batch.fields,
        fields_checked=num_fields > 0,
    )


def build_sorted_slots_sharded(
    pb: ShardPreppedBatch, with_slots: bool = False
) -> SortedSlots:
    """Per-shard SortedSlots for a ShardPreppedBatch, stacked [S, ...] so
    a shard_map with P('shard') in_specs hands each device its own
    sorted-slot arrays. Purely local host work (the worker-side gradient
    aggregation happens BEFORE routing), so multi-process runs build this
    in the prep workers with no collective; shapes are deterministic from
    (per-shard batch rows, ub), so every process traces identically."""
    S = pb.num_shards
    B, L = pb.vals.shape
    bs = B // S
    parts = [
        build_sorted_slots(
            pb.inv.reshape(S, bs * L)[s], pb.vals[s * bs : (s + 1) * bs],
            pb.ub, with_slots=with_slots,
        )
        for s in range(S)
    ]
    return SortedSlots(
        x_sorted=np.stack([p.x_sorted for p in parts]),
        bidx=np.stack([p.bidx for p in parts]),
        inv_sorted=np.stack([p.inv_sorted for p in parts]),
        seg_tiles=np.stack([p.seg_tiles for p in parts]),
        seg_wins=np.stack([p.seg_wins for p in parts]),
        seg_first=np.stack([p.seg_first for p in parts]),
        slot_sorted=(
            np.stack([p.slot_sorted for p in parts]) if with_slots else None
        ),
    )
