"""Model checkpoint save/load.

Counterpart of the reference's ``Updater::Save/Load(dmlc::Stream)``
(``src/sgd/sgd_updater.h`` dumps (feaid, cnt, w, z, sqrt_g, V[]) records,
driven by ``model_out``/``model_in``). Here the model is dense static
tables, so a checkpoint is an .npz of the state arrays plus a JSON
metadata sidecar (epoch/step cursor for resume — the reference restarts
whole epochs; we can resume mid-stream). Sharded states are gathered to
host on save and re-placed according to the store's sharding on load.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np

from ..updaters.updater import FMState

FORMAT_VERSION = 1


def save(path_prefix: str, state: FMState, meta: dict | None = None) -> str:
    host = jax.device_get(state)
    os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
    npz = path_prefix + ".npz"
    np.savez(
        npz,
        w=np.asarray(host.w),
        z=np.asarray(host.z),
        n=np.asarray(host.n),
        V=np.asarray(host.V),
        nV=np.asarray(host.nV),
        cnt=np.asarray(host.cnt),
    )
    full_meta = {"format_version": FORMAT_VERSION, **(meta or {})}
    with open(path_prefix + ".meta.json", "w") as f:
        json.dump(full_meta, f, indent=1)
    return npz


def load(path_prefix: str) -> tuple[FMState, dict]:
    with np.load(path_prefix + ".npz") as zf:
        state = FMState(
            w=zf["w"], z=zf["z"], n=zf["n"], V=zf["V"], nV=zf["nV"], cnt=zf["cnt"]
        )
    meta_path = path_prefix + ".meta.json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta
