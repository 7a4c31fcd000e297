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
    """Return a copy of a batch dataclass (Batch / PreppedBatch) with
    every NumPy array field device_put (async),
    including arrays inside one level of nested dataclass fields
    (pair metas). Non-array fields pass through; already-placed batches
    pass through unchanged."""
    import jax

    keys: list[tuple[str, str | None]] = []
    arrs: list[np.ndarray] = []
    for f in dataclasses.fields(b):
        v = getattr(b, f.name)
        if isinstance(v, np.ndarray):
            keys.append((f.name, None))
            arrs.append(v)
        elif dataclasses.is_dataclass(v) and not isinstance(v, type):
            for g in dataclasses.fields(v):
                w = getattr(v, g.name)
                if isinstance(w, np.ndarray):
                    keys.append((f.name, g.name))
                    arrs.append(w)
    if not arrs:
        return b
    placed = jax.device_put(tuple(arrs))
    top: dict[str, object] = {}
    nested: dict[str, dict[str, object]] = {}
    for (name, sub), a in zip(keys, placed):
        if sub is None:
            top[name] = a
        else:
            nested.setdefault(name, {})[sub] = a
    for name, sub_updates in nested.items():
        top[name] = dataclasses.replace(getattr(b, name), **sub_updates)
    return dataclasses.replace(b, **top)
