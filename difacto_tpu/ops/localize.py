"""Per-batch feature-id deduplication on device.

Counterpart of the reference's ``src/data/localizer.h`` :: Localizer
(Compact: sort + dedup the minibatch's feature ids, rewrite CSR indices to
positions in the unique list, emit per-id frequencies). The reference does
this with a multithreaded CPU sort; here it is a single jit-friendly
``jnp.unique`` (sort-based under XLA) with static output size.

Conventions:
  * input ids are i32 with PAD_ID = -1 padding slots;
  * pads are mapped to a sentinel (num_rows) that sorts after all real
    ids, so unique fill slots and pads coalesce at the tail;
  * output uids are clamped to valid table indices with a validity mask
    (no dedicated padding row in the table — all padded lanes are
    neutralized by masks downstream).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Localized(NamedTuple):
    uids: jnp.ndarray     # i32 [U] unique table indices, sorted ascending;
                          #         invalid lanes hold the sentinel num_rows
                          #         (sorted to the tail — consumers clamp)
    inv: jnp.ndarray      # i32 [B*L] position of each nnz slot in uids
    counts: jnp.ndarray   # f32 [U] multiplicity of each unique id (0 for invalid)
    valid: jnp.ndarray    # bool [U] real id (not unique-padding / input-padding)


def localize(ids: jnp.ndarray, num_rows: int, unique_size: int) -> Localized:
    """ids: i32 [B, L] (PAD_ID = -1). unique_size must be >= the true
    number of distinct ids in the batch (B*L is always safe); overflow
    silently drops ids, so sizing is a correctness knob, not just perf."""
    flat = ids.reshape(-1)
    sentinel = jnp.int32(num_rows)
    keys = jnp.where(flat < 0, sentinel, flat)
    uids, inv = jnp.unique(
        keys, size=unique_size, fill_value=num_rows, return_inverse=True
    )
    valid = uids < num_rows
    counts = (
        jnp.zeros(unique_size, jnp.float32)
        .at[inv]
        .add((flat >= 0).astype(jnp.float32))
    )
    counts = counts * valid
    return Localized(uids.astype(jnp.int32), inv.astype(jnp.int32), counts, valid)
