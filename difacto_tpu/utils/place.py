"""Async device placement of host batch dataclasses.

The prepped train step consumes ~6.5 MB of batch arrays per flagship
step. ``jax.device_put`` is asynchronous — calling it in the prefetch
pipeline (or one step ahead in the consume loop) overlaps the host→
device transfer with device compute, which matters whenever the host
link is slow relative to the step (measured on this environment's
tunneled TPU: a 136 ms host-fed step drops to 40 ms device-resident —
BENCH.md round 2). The reference's workers keep minibatches in process
RAM next to the compute; this is the TPU analog of that locality.
"""

from __future__ import annotations

import dataclasses

import numpy as np


def place_batch(b):
    """Return a copy of a batch dataclass (Batch / PreppedBatch /
    SortedBatch) with every NumPy array field device_put (async).
    Non-array fields (pair metas, ints) pass through; already-placed
    batches pass through unchanged."""
    import jax

    nd = {
        f.name: getattr(b, f.name)
        for f in dataclasses.fields(b)
        if isinstance(getattr(b, f.name), np.ndarray)
    }
    if not nd:
        return b
    placed = jax.device_put(tuple(nd.values()))
    return dataclasses.replace(b, **dict(zip(nd.keys(), placed)))
