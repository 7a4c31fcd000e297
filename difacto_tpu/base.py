"""Core typedefs and constants.

TPU-native counterpart of the reference's ``include/difacto/base.h``
(:: ``feaid_t``/``real_t``/``KWArgs``): feature ids remain raw 64-bit
integers at the data layer and are hashed into a bounded power-of-two id
space before reaching the device (the reference sends raw 64-bit keys to
ps-lite servers; we trade that for a static-shape dense table, which is
what XLA needs).
"""

from __future__ import annotations

import numpy as np

# Feature ids as they appear in libsvm data: raw 64-bit (reference: feaid_t).
feaid_t = np.uint64

# Weight / value element type (reference: real_t = float).
real_t = np.float32

# kwargs lists parsed from config files (reference: KWArgs).
KWArgs = list[tuple[str, str]]

# Default number of host threads for data work (reference: DEFAULT_NTHREADS).
DEFAULT_NTHREADS = 2


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Mix raw 64-bit feature ids into uniformly distributed 64-bit hashes.

    The reference shards raw keys by uniform ranges of the uint64 space
    (ps-lite ``GetServerKeyRanges``); real-world ids are *not* uniform, so
    users pre-hash. We make hashing a first-class, deterministic step:
    splitmix64 finalizer, then the caller takes ``hash & (table_size - 1)``.
    """
    x = np.asarray(x, dtype=np.uint64).copy()
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def hash_ids(ids: np.ndarray, num_bits: int) -> np.ndarray:
    """Hash raw feature ids into ``[0, 2**num_bits)`` (int32/int64).

    This is the table-sharding function: with a row-sharded table over S
    shards, the owner of a hashed id ``h`` is ``h // (table_size // S)``
    (contiguous ranges, so sorted unique ids bucket into contiguous runs).
    """
    assert 1 <= num_bits <= 30, "table indices + sentinel must fit int32"
    h = splitmix64(ids) & np.uint64((1 << num_bits) - 1)
    return h.astype(np.int32)
