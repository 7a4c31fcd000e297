"""Per-batch feature-id deduplication on device.

Counterpart of the reference's ``src/data/localizer.h`` :: Localizer
(Compact: sort + dedup the minibatch's feature ids, rewrite CSR indices to
positions in the unique list, emit per-id frequencies). The reference does
this with a multithreaded CPU sort; here it is one jit-friendly sort +
segment scatter with a static output size.

Conventions:
  * input ids are i32 with PAD_ID = -1 padding slots;
  * pads are mapped to a sentinel (num_rows) that sorts after all real
    ids, so unique fill slots and pads coalesce at the tail;
  * output uids are clamped to valid table indices with a validity mask
    (no dedicated padding row in the table — all padded lanes are
    neutralized by masks downstream);
  * when the batch holds MORE distinct real ids than ``unique_size``,
    the excess distinct ids are dropped from the unique set and their
    slots alias the last lane — training is wrong for that lane, which
    is why the drop is COUNTED (``Localized.overflow``) and surfaced in
    StepMetrics.dropped_ids rather than silent.
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
    overflow: jnp.ndarray | None = None  # f32 [] distinct real ids dropped
                          #         because unique_size was too small
                          #         (None on host-prepped batches, whose
                          #         drops are counted at prep time)


def localize(ids: jnp.ndarray, num_rows: int, unique_size: int) -> Localized:
    """ids: i32 [B, L] (PAD_ID = -1). unique_size should be >= the true
    number of distinct ids in the batch (B*L is always safe); overflow
    drops ids — counted in ``.overflow``, so undersizing is visible."""
    flat = ids.reshape(-1)
    sentinel = jnp.int32(num_rows)
    keys = jnp.where(flat < 0, sentinel, flat)
    order = jnp.argsort(keys)
    sk = keys[order]
    first = jnp.concatenate([jnp.ones((1,), bool), sk[1:] != sk[:-1]])
    lane = jnp.cumsum(first) - 1  # 0-based unique lane of each sorted slot
    real = sk < sentinel
    U = unique_size
    overflow = jnp.sum(
        (first & real & (lane >= U)).astype(jnp.float32)
    )
    # duplicate writes to a lane all carry the same value -> deterministic
    uids = jnp.full(U, sentinel, keys.dtype).at[lane].set(sk, mode="drop")
    counts = (
        jnp.zeros(U, jnp.float32).at[lane].add(real.astype(jnp.float32), mode="drop")
    )
    lane_c = jnp.minimum(lane, U - 1).astype(jnp.int32)
    inv = jnp.zeros_like(flat).at[order].set(lane_c)
    valid = uids < num_rows
    return Localized(uids.astype(jnp.int32), inv, counts, valid, overflow)
