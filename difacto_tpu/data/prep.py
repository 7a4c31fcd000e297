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

from dataclasses import dataclass

import numpy as np

from .batch_iter import Batch

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

    @property
    def num_examples(self) -> int:
        return int(self.mask.sum())


def bucket_for(n: int, buckets=DEFAULT_BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    return n  # pathological: exact size (recompile)


@dataclass
class SortedBatch:
    """Chunk-sorted slot layout for the fully-fused Pallas pipeline.

    The batch's B*L slots are grouped into row-chunks of ``chunk_rows``
    examples; within each chunk, slots are sorted by hashed id (padding
    slots carry the sentinel ``num_rows`` and sort last). This gives:

      * per-chunk sorted id streams -> the sweep kernels gather/apply
        with contiguous per-table-block slices and NO per-batch unique
        (their one-hot matmuls aggregate duplicates in-kernel);
      * rows local to a chunk -> the fused FM kernel's one-hot
        row-aggregation windows over ``chunk_rows`` examples.

    ``offsets[s, b]`` is the absolute position in the flat sorted arrays
    of the first slot of stream s owned by table block b (given the
    store's block_rows), i.e. the reference's KVMatch/key-range seam
    computed on the host.
    """

    svals: np.ndarray    # f32 [NNZ] values in chunk-sorted order
    srow: np.ndarray     # i32 [NNZ] global example row of each slot
    sid: np.ndarray      # i32 [NNZ] hashed id (num_rows sentinel for pads)
    offsets: np.ndarray  # i32 [num_chunks, nb+1]
    labels: np.ndarray   # f32 [B]
    mask: np.ndarray     # f32 [B]
    chunk_rows: int

    @property
    def num_examples(self) -> int:
        return int(self.mask.sum())


def prep_batch_sorted(
    batch: Batch,
    num_rows: int,
    block_rows: int,
    chunk_rows: int = 2048,
    stream_pad: int | None = None,
) -> SortedBatch:
    """``stream_pad`` sentinel slots terminate each stream so that every
    stream's slot count is a multiple of 1024 — the Mosaic dynamic-slice
    granularity the fused kernels' tile DMAs require (defaults to the
    smallest such pad)."""
    b, l = batch.ids.shape
    chunk_rows = min(chunk_rows, b)
    assert b % chunk_rows == 0, "batch_size must be a multiple of chunk_rows"
    nchunks = b // chunk_rows
    ids = np.where(batch.ids < 0, num_rows, batch.ids).astype(np.int64)
    nb = num_rows // block_rows
    boundaries = np.arange(nb + 1, dtype=np.int64) * block_rows
    q = chunk_rows * l
    if stream_pad is None:
        stream_pad = (-q) % 1024 or 1024
    qp = q + stream_pad
    svals = np.zeros(nchunks * qp, np.float32)
    srow = np.empty(nchunks * qp, np.int32)
    sid = np.full(nchunks * qp, num_rows, np.int32)
    offsets = np.empty((nchunks, nb + 1), np.int32)
    rows_global = np.repeat(np.arange(b, dtype=np.int32), l)
    flat_ids = ids.reshape(-1)
    flat_vals = batch.vals.reshape(-1)
    for c in range(nchunks):
        lo = c * q
        sl = slice(lo, lo + q)
        order = np.argsort(flat_ids[sl], kind="stable")
        cid = flat_ids[sl][order]
        po = c * qp
        sid[po : po + q] = cid.astype(np.int32)
        svals[po : po + q] = flat_vals[sl][order]
        srow[po : po + q] = rows_global[sl][order]
        srow[po + q : po + qp] = c * chunk_rows  # pad slots: any row in chunk
        offsets[c] = po + np.searchsorted(cid, boundaries, side="left")
    return SortedBatch(
        svals=svals, srow=srow, sid=sid, offsets=offsets,
        labels=batch.labels, mask=batch.mask, chunk_rows=chunk_rows,
    )


def prep_batch(batch: Batch, num_rows: int, buckets=DEFAULT_BUCKETS) -> PreppedBatch:
    """np.unique localization of one padded batch (reference:
    Localizer::Compact — sort, dedup, rewrite indices, count)."""
    flat = batch.ids.reshape(-1).astype(np.int64)
    keys = np.where(flat < 0, num_rows, flat)
    uids, inv, counts = np.unique(keys, return_inverse=True, return_counts=True)
    has_sentinel = bool(len(uids)) and uids[-1] == num_rows
    n_real = len(uids) - int(has_sentinel)
    ub = bucket_for(max(n_real, 1), buckets)
    u_out = np.full(ub, num_rows, np.int32)
    c_out = np.zeros(ub, np.float32)
    u_out[:n_real] = uids[:n_real]
    c_out[:n_real] = counts[:n_real]
    valid = np.zeros(ub, bool)
    valid[:n_real] = True
    # sentinel slots in inv point past the real lanes; clamp them to the
    # first padding lane (ub-1 exists because ub >= max(n_real,1); when
    # n_real == ub there are no sentinel slots unless has_sentinel, in
    # which case ub > n_real is guaranteed by bucket_for only if sizes
    # differ — so re-bucket if full)
    if has_sentinel and n_real == ub:
        return prep_batch(batch, num_rows, tuple(b for b in buckets if b > ub) + (n_real + 1,))
    inv = inv.astype(np.int32)
    if has_sentinel:
        inv = np.where(inv == n_real, ub - 1 if n_real < ub else n_real, inv)
    return PreppedBatch(
        vals=batch.vals,
        labels=batch.labels,
        mask=batch.mask,
        uids=u_out,
        ucounts=c_out,
        inv=inv.reshape(-1),
        valid=valid,
    )
