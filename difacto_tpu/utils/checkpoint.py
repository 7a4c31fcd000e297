"""Model checkpoint save/load.

Counterpart of the reference's ``Updater::Save/Load(dmlc::Stream)``
(``src/sgd/sgd_updater.h`` dumps (feaid, cnt, w, z, sqrt_g, V[]) records,
driven by ``model_out``/``model_in``). Here the model is dense static
tables, so a checkpoint is .npz state arrays plus a JSON metadata sidecar
(epoch/step cursor for resume — the reference restarts whole epochs; we
can resume mid-stream).

Two layouts, chosen automatically by process count:

* single process: one ``prefix.npz`` with full arrays (all shards are
  addressable, so a plain gather works even for an 8-device mesh);
* multi process: each process writes ``prefix.proc{p}.npz`` holding ONLY
  its addressable shards (keys encode each shard's global index range),
  exactly like the reference's per-server save — no host ever
  materializes the full table. Process 0 writes the meta sidecar. Load
  re-places shards onto the same topology (each process needs only the
  ranges its devices own; a shared filesystem also allows topology-
  agnostic reads of all proc files).
"""

from __future__ import annotations

import contextlib
import glob as _glob
import json
import os

import jax
import numpy as np

from ..data.io import is_remote, open_uri
from ..updaters.updater import (
    FMState, HotColdFMState, PackedFMState, StackedFMState, unpack_state,
    unstack_state,
)

FORMAT_VERSION = 1
_LEAVES = ("w", "z", "n", "V", "nV", "cnt")


# model_out/model_in accept remote URIs (gs://, s3://, ...) like data
# URIs — the reference wrote models through the same dmlc::Stream layer
# it read data with (data/io.py is our counterpart)


def _write_npz(path: str, payload: dict) -> None:
    if is_remote(path):
        with open_uri(path, "wb") as f:
            np.savez(f, **payload)
    else:
        np.savez(path, **payload)


@contextlib.contextmanager
def _open_npz(path: str):
    if is_remote(path):
        with open_uri(path, "rb") as f, np.load(f) as zf:
            yield zf
    else:
        with np.load(path) as zf:
            yield zf


def _write_text(path: str, text: str) -> None:
    with open_uri(path, "wb" if is_remote(path) else "w") as f:
        f.write(text.encode() if is_remote(path) else text)


def _index_key(name: str, index, shape) -> str:
    """'V@0:16,1024:2048' — the shard's global slice per dim."""
    parts = [
        f"{sl.start or 0}:{sl.stop if sl.stop is not None else dim}"
        for sl, dim in zip(index, shape)
    ]
    return name + "@" + ",".join(parts)


_FETCH_ELEMS = 32 << 20  # ~128 MB of f32 per device->host transfer


def _fetch_chunks(dev, max_elems: int) -> np.ndarray:
    """One single-device array -> host, sliced along the last axis so no
    individual transfer exceeds ``max_elems`` elements."""
    n = dev.shape[-1] if dev.ndim else 1
    per = 1
    for d in dev.shape[:-1]:
        per *= d
    step = max(max_elems // max(per, 1), 1)
    if dev.ndim == 0 or n <= step:
        return np.asarray(dev)
    out = np.empty(dev.shape, dev.dtype)
    for lo in range(0, n, step):
        hi = min(lo + step, n)
        out[..., lo:hi] = np.asarray(dev[..., lo:hi])
    return out


def _fetch_np(arr, max_elems: int = 0) -> np.ndarray:
    """Device -> host in bounded chunks.

    One monolithic multi-GB fetch can stall this environment's tunneled
    device transport (observed: a 9.7 GB ``device_get`` of the 2^26
    state made zero progress for 30+ minutes), and chunking also bounds
    peak transfer-buffer memory. Sharded arrays are fetched per
    addressable shard (cross-shard eager slicing is not resolvable),
    chunked along the row axis within each shard."""
    max_elems = max_elems or _FETCH_ELEMS
    shards = getattr(arr, "addressable_shards", None)
    if shards is None:
        return np.asarray(arr)
    out = np.empty(arr.shape, arr.dtype)
    seen = set()  # replicated arrays: every shard covers the same range
    for s in shards:
        key = tuple((sl.start, sl.stop) for sl in s.index)
        if key in seen:
            continue
        seen.add(key)
        out[s.index] = _fetch_chunks(s.data, max_elems)
    return out


def _fetch_planar_host(state, remap_lut: np.ndarray | None) -> dict:
    """Host planar leaf dict from any state layout, fetched ONE [N]
    plane at a time: a jit(unstack) of a big stacked table would
    materialize a full planar device copy NEXT TO the table (2^26:
    10.7 + 9.7 GB > the 16 GB chip). HotColdFMState planes are
    reassembled and un-permuted into canonical hash-row space
    (``remap_lut`` = the run's data/remap.py lut) so checkpoints stay
    layout/run-agnostic."""
    if isinstance(state, FMState):
        return {k: _fetch_np(getattr(state, k)) for k in _LEAVES}
    k = state.k
    n = state.num_rows

    def plane(i: int) -> np.ndarray:
        if isinstance(state, HotColdFMState):
            full = np.concatenate(
                [_fetch_np(state.hot[i]), _fetch_np(state.cold[i])]
            )
            # canonical row h lives at remapped label lut[h]
            return full[remap_lut]
        return _fetch_np(state.tbl[i])

    if isinstance(state, HotColdFMState) and remap_lut is None:
        raise ValueError(
            "saving a hot/cold split state needs the run's remap lut "
            "(pass remap_lut=store.hot_lut)"
        )
    out = {"w": plane(0), "z": plane(1), "n": plane(2), "cnt": plane(3)}
    if k > 0:
        out["V"] = np.stack([plane(4 + j) for j in range(k)])
        out["nV"] = np.stack([plane(4 + k + j) for j in range(k)])
    else:
        out["V"] = np.zeros((0, n), np.float32)
        out["nV"] = np.zeros((0, n), np.float32)
    return out


def save(
    path_prefix: str, state, meta: dict | None = None,
    remap_lut: np.ndarray | None = None,
) -> str:
    if isinstance(state, PackedFMState):
        # checkpoints always use the FMState interchange layout, so a
        # model trained packed loads into any store/layout (and the
        # inspection tools keep working)
        state = jax.jit(unpack_state)(state)
    if not is_remote(path_prefix):
        os.makedirs(os.path.dirname(path_prefix) or ".", exist_ok=True)
    full_meta = {"format_version": FORMAT_VERSION, **(meta or {})}
    if jax.process_count() == 1:
        host = _fetch_planar_host(state, remap_lut)
        # global leaf shapes: lets topology-agnostic loads detect MISSING
        # ranges (shape inference from whatever files exist would
        # silently truncate when a top-range proc file is lost)
        full_meta["shapes"] = {k: list(v.shape) for k, v in host.items()}
        npz = path_prefix + ".npz"
        _write_npz(npz, host)
        _write_text(path_prefix + ".meta.json", json.dumps(full_meta, indent=1))
        return npz
    if isinstance(state, StackedFMState):
        # multi-process tables are per-shard-sized; the planar interchange
        # copy fits next to them (single-process big tables use the
        # per-plane path above)
        state = jax.jit(unstack_state)(state)
    full_meta["shapes"] = {
        k: list(getattr(state, k).shape) for k in _LEAVES
    }
    # multi-process: save addressable shards only (per-server semantics)
    pid = jax.process_index()
    payload: dict[str, np.ndarray] = {}
    for name in _LEAVES:
        arr = getattr(state, name)
        for s in arr.addressable_shards:
            payload[_index_key(name, s.index, arr.shape)] = _fetch_np(s.data)
    npz = f"{path_prefix}.proc{pid}.npz"
    _write_npz(npz, payload)
    if pid == 0:
        full_meta["sharded"] = True
        full_meta["process_count"] = jax.process_count()
        _write_text(path_prefix + ".meta.json", json.dumps(full_meta, indent=1))
    return npz


def _read_meta(path_prefix: str) -> dict:
    meta_path = path_prefix + ".meta.json"
    if is_remote(meta_path):
        try:
            with open_uri(meta_path, "rb") as f:
                return json.loads(f.read().decode())
        except FileNotFoundError:
            return {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return {}


def load(path_prefix: str) -> tuple[FMState, dict]:
    """Single-host layout load (full arrays on host). For sharded
    checkpoints use :func:`load_for_store`."""
    with _open_npz(path_prefix + ".npz") as zf:
        state = FMState(**{k: zf[k] for k in _LEAVES})
    return state, _read_meta(path_prefix)


def _parse_index_key(key: str) -> tuple[str, tuple[slice, ...]]:
    """Inverse of :func:`_index_key`."""
    name, idx = key.split("@")
    sls = tuple(
        slice(int(a), int(b))
        for a, b in (part.split(":") for part in idx.split(","))
    )
    return name, sls


def _extract_range(
    pieces: list[tuple[tuple[slice, ...], np.ndarray]],
    index: tuple[slice, ...],
    dtype,
    what: str,
    bound: tuple[int, ...] | None = None,
) -> np.ndarray:
    """Assemble one target index range from (possibly differently-sliced)
    saved pieces — the topology-agnostic re-slicing. Coverage is checked
    by element count; when pieces overlap (a replicated leaf saved by
    several processes writes identical full-range pieces), the count is
    re-derived from an explicit coverage mask so an overlap can never
    stand in for a gap. ``bound`` (the SAVED global shape) marks cells
    beyond it as legitimately zero — a padded-table store (non-power-of-
    two shard count) restoring a smaller save zero-fills its padding."""
    tgt_shape = tuple(sl.stop - sl.start for sl in index)
    out = np.zeros(tgt_shape, dtype)
    if bound is None:
        want = int(np.prod(tgt_shape))
    else:
        want = int(np.prod([
            max(0, min(sl.stop, b) - min(sl.start, b))
            for sl, b in zip(index, bound)
        ]))
    filled = 0
    hits: list[tuple[slice, ...]] = []
    for src, arr in pieces:
        inter = tuple(
            slice(max(a.start, b.start), min(a.stop, b.stop))
            for a, b in zip(index, src)
        )
        if any(s.start >= s.stop for s in inter):
            continue
        dst_sl = tuple(
            slice(s.start - t.start, s.stop - t.start)
            for s, t in zip(inter, index)
        )
        src_sl = tuple(
            slice(s.start - c.start, s.stop - c.start)
            for s, c in zip(inter, src)
        )
        out[dst_sl] = arr[src_sl]
        hits.append(dst_sl)
        filled += int(np.prod([s.stop - s.start for s in inter]))
    if filled > want:  # overlapping pieces: count the union exactly
        mask = np.zeros(tgt_shape, bool)
        for dst_sl in hits:
            mask[dst_sl] = True
        filled = int(mask.sum())
    if filled < want:
        raise ValueError(
            f"checkpoint shard files do not cover {what}"
            f"{[(s.start, s.stop) for s in index]}: {filled}/{want} elements "
            "found (a topology-changed restore needs all proc files on a "
            "shared filesystem)"
        )
    return out


def _sharded_pieces(path_prefix: str, meta: dict) -> dict[str, list]:
    """Collect (slice, array) pieces per leaf from this save's proc files
    (restricted to meta['process_count'] so stale higher-rank files from
    an earlier save to the same prefix are ignored)."""
    if is_remote(path_prefix):
        from ..data.io import expand_uri

        files = expand_uri(path_prefix + ".proc*.npz")
    else:
        files = sorted(_glob.glob(path_prefix + ".proc*.npz"))
    npc = meta.get("process_count")
    if npc:
        def _proc_of(fp: str) -> int:
            try:
                return int(fp.rsplit(".proc", 1)[1].split(".")[0])
            except (IndexError, ValueError):
                return -1

        files = [f for f in files if 0 <= _proc_of(f) < npc]
    if not files:
        raise FileNotFoundError(f"no shard files match {path_prefix}.proc*.npz")
    available: dict[str, list] = {name: [] for name in _LEAVES}
    for fp in files:
        with _open_npz(fp) as zf:
            for k in zf.files:
                name, sls = _parse_index_key(k)
                available[name].append((sls, zf[k]))
    return available


def load_full(path_prefix: str) -> tuple[FMState, dict]:
    """Host FMState from either layout (single-file or sharded) — for
    inspection tools that have no store to infer shapes from; sharded
    shapes are taken from the saved ranges themselves."""
    meta = _read_meta(path_prefix)
    if not meta.get("sharded"):
        return load(path_prefix)
    available = _sharded_pieces(path_prefix, meta)
    saved_shapes = meta.get("shapes", {})
    full = {}
    for name in _LEAVES:
        pieces = available[name]
        if not pieces:
            raise ValueError(f"checkpoint {path_prefix} lacks leaf {name}")
        if name in saved_shapes:
            # trust the save-time global shape: a missing top-range proc
            # file then fails the coverage check instead of silently
            # truncating the model
            shape = tuple(saved_shapes[name])
        else:  # older checkpoints without recorded shapes: best effort
            ndim = len(pieces[0][0])
            shape = tuple(
                max(sls[d].stop for sls, _ in pieces) for d in range(ndim)
            )
        index = tuple(slice(0, dim) for dim in shape)
        full[name] = _extract_range(
            pieces, index, pieces[0][1].dtype, name + "@"
        )
    return FMState(**full), meta


def load_for_store(path_prefix: str, store) -> tuple[FMState, dict]:
    """Load a checkpoint and place it according to ``store``'s sharding.

    Handles both layouts: the single-file .npz (placed via
    ``store.place_state``) and the per-process sharded layout. Sharded
    loads are TOPOLOGY-AGNOSTIC (reference: ``Updater::Save/Load`` per-key
    dumps load into any server count): saved shards are contiguous index
    ranges, so each target device's range is re-sliced from whichever
    saved pieces overlap it — a checkpoint from P processes x D devices
    restores onto any other mesh, or onto a single-device LocalStore,
    provided this process can read the proc files covering its ranges
    (same-topology restarts find all of theirs in their own file)."""
    meta = _read_meta(path_prefix)
    if not meta.get("sharded"):
        host_state, meta = load(path_prefix)
        return store.place_state(host_state), meta

    available = _sharded_pieces(path_prefix, meta)

    if not hasattr(store, "fmstate_placement"):
        # single-device store (LocalStore): reassemble the full arrays at
        # the STORE's expected shapes (inferring them from whatever proc
        # files are present would silently truncate the model when the
        # top-range files are missing)
        shapes = jax.eval_shape(
            lambda: store.updater.init_state(store.num_rows, 0)
        )
        full = {}
        for name in _LEAVES:
            pieces = available[name]
            shape = getattr(shapes, name).shape
            if not pieces and int(np.prod(shape)):
                raise ValueError(f"checkpoint {path_prefix} lacks leaf {name}")
            index = tuple(slice(0, dim) for dim in shape)
            dtype = pieces[0][1].dtype if pieces else np.float32
            full[name] = _extract_range(pieces, index, dtype, name + "@")
        return store.place_state(FMState(**full)), meta

    saved_shapes = meta.get("shapes", {})
    shapes, shardings = store.fmstate_placement()
    placed = {}
    for name in _LEAVES:
        shape = getattr(shapes, name).shape
        sharding = getattr(shardings, name)
        dtype = available[name][0][1].dtype if available[name] else np.float32
        # target rows beyond the SAVE's recorded shape are table padding
        # (a padded non-power-of-two-shard store restoring a smaller
        # save): legitimately zero, not missing coverage. ONLY the row
        # axis may be zero-filled, and only down to the target's hash
        # space — a save with a smaller V_dim or a smaller hash space is
        # a real mismatch, not padding, and must fail loudly.
        bound = None
        if name in saved_shapes:
            saved = tuple(saved_shapes[name])
            row_ax = len(shape) - 1 if name in ("V", "nV") else 0
            for d, (sv, tg) in enumerate(zip(saved, shape)):
                if d != row_ax and sv != tg:
                    raise ValueError(
                        f"checkpoint leaf {name} dim {d} is {sv} but this "
                        f"store expects {tg} (V_dim mismatch?)"
                    )
            if saved[row_ax] < store.hash_rows:
                raise ValueError(
                    f"checkpoint leaf {name} has {saved[row_ax]} rows but "
                    f"this store's hash space is {store.hash_rows} "
                    "(num_bits mismatch?)"
                )
            bound = saved
        dev_idx = sharding.addressable_devices_indices_map(shape)
        singles = []
        for dev, index in dev_idx.items():
            norm = tuple(
                slice(sl.start or 0, sl.stop if sl.stop is not None else dim)
                for sl, dim in zip(index, shape)
            )
            singles.append(
                jax.device_put(
                    _extract_range(
                        available[name], norm, dtype, name + "@", bound
                    ),
                    dev,
                )
            )
        placed[name] = jax.make_array_from_single_device_arrays(
            shape, sharding, singles
        )
    return store.place_state(FMState(**placed)), meta
