"""Frequency-ordered row remap: put the Zipf head in a small hot table.

Measured motivation (scripts/hw_scatter_cliff.py, v5e, K=16): the XLA
TPU scatter-add costs ~156 ns/index into a 2^19+-row [36, N] table but
only ~22 ns/index once the target is ~2^18 rows or smaller (a VMEM-sized
working set); index LOCALITY in a big table does nothing — only a
physically smaller target helps. Power-law CTR batches concentrate ~2/3
of their UNIQUE ids (and ~96% of slots) in the hottest ~2^18 rows, so
relabeling rows by frequency and splitting the table
(updaters.updater.HotColdFMState) makes the expensive big-table
scatter/gather see only the cold minority.

The remap is pure per-run LAYOUT: a bijection over hash-table rows,
applied host-side during prep (before dedup, so everything downstream —
sorted uniques, inverse, segment-sum schedules — just works in remapped
space). Checkpoints stay in canonical hash-row space (the permutation is
applied on save/load), so the mapping never leaves the process and may
differ freely between runs.

Counterpart: the reference's ``unordered_map`` server tables get this
for free (hot entries live in cache); a dense TPU table needs the
explicit split. SURVEY §2.1 SGD updater — the server-side update is THE
hot loop at 10^9-feature scale.
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger(__name__)

# hot-table byte budget: [pad8(4+2K), H] f32 must stay in the measured
# fast-scatter regime (2^18 rows at K=16 = 42 MB fast; 2^19 = 84 MB slow)
_HOT_BYTES_CAP = 48 << 20


def auto_hot_rows(num_rows: int, v_dim: int) -> int:
    """Largest power-of-two hot-head size inside the fast-scatter budget
    (and at most num_rows / 4 — a 'hot head' of most of the table would
    just be the big table again)."""
    d_pad = (4 + 2 * v_dim + 7) // 8 * 8
    h = 1
    while (h * 2) * d_pad * 4 <= _HOT_BYTES_CAP and h * 2 <= num_rows // 4:
        h *= 2
    return h


def build_remap(cnt: np.ndarray, hot_rows: int) -> np.ndarray:
    """Bijective row relabeling from observed row frequencies.

    ``lut[r]`` is row r's new label: the ``hot_rows`` most frequent rows
    get [0, hot_rows) and everything else [hot_rows, N). Order WITHIN
    each side is irrelevant (labels are arbitrary), so an O(N)
    argpartition suffices — no full argsort of the 2^26-row count array.
    """
    n = cnt.shape[0]
    assert 0 < hot_rows < n
    order = np.argpartition(cnt, n - hot_rows)  # last hot_rows = hottest
    lut = np.empty(n, np.int32)
    lut[order[n - hot_rows:]] = np.arange(hot_rows, dtype=np.int32)
    lut[order[: n - hot_rows]] = np.arange(
        hot_rows, n, dtype=np.int32
    )
    return lut


def invert_remap(lut: np.ndarray) -> np.ndarray:
    """inv[new_label] = original row (for checkpoint canonicalization)."""
    inv = np.empty_like(lut)
    inv[lut] = np.arange(lut.shape[0], dtype=lut.dtype)
    return inv


def apply_remap(ids: np.ndarray, lut: np.ndarray) -> np.ndarray:
    """Relabel a padded [B, L] id matrix (PAD_ID -1 passes through)."""
    out = lut[np.maximum(ids, 0)]
    return np.where(ids < 0, ids, out)


def count_sample(batch_iter, num_rows: int, max_batches: int) -> np.ndarray:
    """Row-frequency counts from the first ``max_batches`` batches of an
    iterator of Batch objects (hashed ids, -1 pads). A small prefix
    suffices: measured on north-star Zipf data, counts from 8 flagship
    batches already put 65% of a HELD-OUT batch's uniques in the 2^18
    head (BENCH.md round 5)."""
    chunks = []
    n = 0
    for b in batch_iter:
        flat = b.ids.reshape(-1)
        chunks.append(flat[flat >= 0])
        n += 1
        if n >= max_batches:
            break
    log.info("hot-remap count sample: %d batches", n)
    if not chunks:
        return np.zeros(num_rows, np.int32)
    # one bincount over the whole sample (per-batch bincounts would
    # allocate an [N]-sized temp per batch — ~0.8 GB of churn at 2^26)
    return np.bincount(
        np.concatenate(chunks), minlength=num_rows
    ).astype(np.int32)
