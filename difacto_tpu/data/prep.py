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
DEFAULT_BUCKETS = (1 << 14, 1 << 15, 1 << 16, 17 << 13, 1 << 17, 3 << 16, 1 << 18,
                   3 << 17, 1 << 19, 3 << 18, 1 << 20)


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
