"""Parameter stores: the ps-lite seam, TPU-native.

Counterpart of the reference's ``include/difacto/store.h`` :: Store and
its two implementations (``src/store/store_local.h`` :: StoreLocal,
``src/store/store_dist.h`` :: StoreDist over ps-lite KVWorker/KVServer).
The reference's async keyed Push/Pull with timestamps/Wait disappears
under synchronous jit semantics; what remains is the same seam:

  * :class:`LocalStore` — one table on one device; pull = gather,
    push = masked scatter-add update (reference: StoreLocal calling the
    Updater directly in-process);
  * :class:`ShardedStore` — the table row-sharded over a 1D device mesh;
    pull = capacity-bucketed all_to_all of deduplicated ids followed by
    owner-side gather and a reverse all_to_all of rows; push = the same
    routing carrying per-key aggregated gradients, owner-side dedup and
    shard-local update (reference: StoreDist push/pull over ZMQ with
    server key-range sharding; ps-lite GetServerKeyRanges becomes
    ``owner = hashed_id // rows_per_shard`` — contiguous ranges, so the
    sorted unique ids of a batch bucket into contiguous runs).

Both stores expose identical jitted step functions, which is how the
reference tests distributed logic in one process (seam substitution,
SURVEY.md §4) — tests assert LocalStore ≡ ShardedStore bit-for-bit.

The comm pattern of ShardedStore is deliberately the MoE/DLRM dispatch
pattern (per-destination capacity slots + all_to_all over ICI): each
device sends at most C ids to each peer; overflow beyond capacity is
dropped and *counted* (``metrics.dropped_ids``) — with uniform hashing
and capacity_factor x slack this is vanishingly rare, and never silent.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..learners.step import StepMetrics, worker_grads, worker_grads_sorted
from ..ops.localize import Localized, localize
from ..updaters.updater import (
    FMState, FMUpdater, HotColdFMState, PackedFMState, StackedFMState,
    pack_state, stack_state, unpack_state, unstack_state,
)

log = logging.getLogger("difacto_tpu")


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _require_fields(fields, num_fields: int):
    """Validate explicit libffm fields host-side: present, and in
    [0, num_fields) — the loss clips field ids into range, so an
    out-of-range id (num_fields set too small, or a malformed file)
    would otherwise train a silently wrong model. One implementation,
    shared with the prep-time check (data/prep.py)."""
    from ..data.prep import validate_fields

    validate_fields(fields, num_fields)
    return fields


def _prepped_fields(pb, num_fields: int):
    """Fields of a prepped batch, skipping the O(B*L) range re-check when
    prep already validated them host-side (the one skip rule, shared by
    both stores)."""
    f = getattr(pb, "fields", None)
    if getattr(pb, "fields_checked", False) and f is not None:
        return f
    return _require_fields(f, num_fields)


def _cap_ladder(c: int) -> int:
    """Round a capacity up a ~1.5x geometric ladder of 128-multiples so
    per-batch capacities land on few distinct values (each distinct value
    is one jit/Mosaic specialization)."""
    v = 128
    while v < c:
        v = _round_up(int(v * 3 / 2), 128)
    return v


def _resolve_layout(cfg: Config, needs_planar: bool) -> str:
    """packed = one [N, 4+2K] row table (ONE gather + ONE scatter per
    step, measured much faster under XLA; its 128-lane physical row pad
    caps it ~2^24); stacked = one [4+2K, N] table (ONE gather + ONE
    scatter with only an 8-sublane pad — XLA TPU scatters cost
    per-INDEX, so one index loop replaces six: 2^26 update 42 -> 20 ms,
    scripts/hw_scatter_probe.py); planar = split arrays with V [K, N]
    (the Pallas sweep/pair kernels' layout). auto: stacked for the XLA
    path at every size (measured vs packed: 494k vs 426k ex/s at 2^22,
    505k vs 431k at 2^24, and packed OOMs past 2^24 — BENCH.md r5);
    packed stays as an explicit opt-in."""
    lay = cfg.shard.layout
    if lay == "auto":
        return "planar" if needs_planar else "stacked"
    if lay not in ("packed", "planar", "stacked"):
        raise ValueError(f"layout must be auto|packed|planar|stacked, "
                         f"got {lay!r}")
    if lay in ("packed", "stacked") and needs_planar:
        raise ValueError(f"layout={lay} is incompatible with kernel="
                         f"{cfg.shard.kernel!r} (the Pallas table kernels "
                         "need the planar [K, N] layout)")
    return lay


def _kernel_kind(cfg: Config) -> str:
    """xla | pallas (whole-table sweeps) | pairs (touched-block sweeps).

    Measured on v5e (see bench.py/BENCH.md): the PAIR kernels
    (ops/pair_sweep.py) only touch the (block, window) pairs the batch
    hits — 23.1 ms/step vs the fused XLA step's 39.4 at the flagship
    2^22 table — so auto resolves to pairs on the TPU backend for
    tables up to 2^23 rows. Beyond that the batch's uniques outnumber
    the 1024-row blocks, pair count (grid steps) grows with the table,
    and the XLA gather/scatter wins (2^24: 39.4 vs 56.9 ms; 2^26: 66.5
    vs 125.6 — BENCH.md scaling table), so auto keeps xla there. Also
    kept on xla: non-TPU backends (Mosaic kernels) and
    host_localize=false (the schedule is host-built). Multi-process runs
    get pairs too (round 3): owner-side schedules are built from a
    process_allgather of the bucketed global ids
    (data/prep.py::build_shard_pair_metas_mp). On a sharded mesh the
    threshold applies to the PER-SHARD table."""
    kind = cfg.shard.kernel
    if kind == "auto" and cfg.shard.hot_rows != 0:
        # the hot/cold split is a big-table XLA-path design (the Pallas
        # pair/sweep kernels address one table); hot_rows pins it
        return "xla"
    if kind == "auto":
        if cfg.shard.store == "local":
            n_shards = 1
        else:
            n_shards = cfg.shard.num_shards or max(len(jax.devices()), 1)
        rows_per_shard = (1 << cfg.data.num_bits) // max(n_shards, 1)
        if (
            jax.default_backend() == "tpu"
            and cfg.data.host_localize
            and rows_per_shard <= 1 << 23
        ):
            return "pairs"
        return "xla"
    if kind not in ("xla", "pallas", "pairs"):
        raise ValueError(f"unknown kernel {kind!r}")
    return kind


def _check_backend(kind: str, interpret: bool) -> None:
    if kind in ("pallas", "pairs") and not interpret \
            and jax.default_backend() != "tpu":
        raise ValueError(
            f"kernel={kind} needs the TPU backend (Mosaic kernels); on CPU "
            "use kernel=xla, or construct the store with interpret=True "
            "for kernel testing"
        )


def _use_pallas(cfg: Config) -> bool:
    return _kernel_kind(cfg) == "pallas"


class LocalStore:
    """Single-device store (reference: StoreLocal + local Tracker)."""

    def __init__(self, updater: FMUpdater, cfg: Config, interpret: bool = False):
        if jax.process_count() > 1:
            # each process would silently train its own model on its own
            # input part (store=auto picks ShardedStore for multi-device)
            raise ValueError(
                "store=local cannot span processes; use store=sharded "
                "(or store=auto) for multi-process runs"
            )
        self.updater = updater
        self.cfg = cfg
        interpret = interpret or cfg.shard.interpret
        self.num_rows = 1 << cfg.data.num_bits
        nnz = cfg.data.batch_size * cfg.data.max_nnz_per_row
        self.unique_size = cfg.shard.unique_size or nnz
        kind = _kernel_kind(cfg)
        _check_backend(kind, interpret)
        self.pallas = kind == "pallas" or (interpret and kind != "pairs")
        self.pairs = kind == "pairs"
        self.interpret = interpret
        self.layout = _resolve_layout(cfg, self.pallas or self.pairs)
        # hot/cold frequency split (HotColdFMState + data/remap.py):
        # hot_rows > 0 keeps the hottest rows in a small table whose
        # per-index scatter/gather is ~7x cheaper (measured cliff,
        # scripts/hw_scatter_cliff.py); -1 auto-sizes to the budget
        self.hot_rows = cfg.shard.hot_rows
        if self.hot_rows:
            if self.pallas or self.pairs:
                raise ValueError(
                    "hot_rows needs kernel=xla (the Pallas table kernels "
                    "address a single planar table)"
                )
            if self.layout != "stacked":
                raise ValueError("hot_rows needs layout=stacked (or auto)")
            if self.hot_rows == -1:
                from ..data.remap import auto_hot_rows

                self.hot_rows = auto_hot_rows(
                    self.num_rows, self.updater.param.V_dim
                )
            if not 0 < self.hot_rows < self.num_rows:
                raise ValueError(
                    f"hot_rows {self.hot_rows} out of range for a "
                    f"{self.num_rows}-row table"
                )
        elif (
            not (self.pallas or self.pairs)
            and self.num_rows >= (1 << 24)
            and jax.default_backend() == "tpu"
        ):
            log.info(
                "big-table hint: hot_rows=-1 (frequency-split table) "
                "measured ~1.8x training throughput at this scale "
                "(BENCH.md round 5)"
            )
        self.hot_lut = None  # set via set_remap() before prepped steps
        self.block_rows = min(cfg.shard.block_rows, self.num_rows)
        self.loss = cfg.learner.loss
        # libffm explicit fields: batches carry an i32 [B, L] field array
        self.num_fields = cfg.model.num_fields
        self.ffm_block = cfg.model.ffm_block_size
        self.expects_fields = cfg.expects_fields()
        # sorted-slot segment-sum gradient aggregation (ops/segsum.py):
        # default wherever the batch is host-prepped and the loss is
        # fm/logit — the XLA scatter-add it replaces measured 10.9 ms of
        # the 24 ms flagship step (BENCH.md r4), and the win is table-
        # size independent, so the kernel=xla big-table path (auto past
        # 2^23 rows/shard) rides it too. The segment-sum kernel is
        # Mosaic: on non-TPU backends segsum=auto stays on the scatter
        # path (interpret-mode grids are minutes per step at real
        # shapes), while an explicit segsum=sorted runs it interpreted
        # (kernel testing).
        on_tpu = jax.default_backend() == "tpu"
        self._segsum_interpret = interpret or not on_tpu
        self.sorted_grads = (
            cfg.shard.segsum == "sorted"
            or (
                cfg.shard.segsum == "auto"
                and (self.pairs or (not self.pallas and on_tpu))
            )
        )
        self.train_step = jax.jit(self._step, donate_argnums=0)
        self.eval_step = jax.jit(self._eval)
        self._jit_prepped_step = jax.jit(self._prepped_step, donate_argnums=0)
        self._jit_prepped_eval = jax.jit(self._prepped_eval)
        self._jit_pairs_step = jax.jit(self._pairs_step, donate_argnums=0)
        self._jit_pairs_eval = jax.jit(self._pairs_eval)
        self._jit_pairs_step_sorted = jax.jit(
            self._pairs_step_sorted, donate_argnums=0
        )
        self._jit_prepped_step_sorted = jax.jit(
            self._prepped_step_sorted, donate_argnums=0
        )

    def init_state(self, seed: int = 0):
        if self.hot_rows:
            return self.updater.init_state_hotcold(
                self.num_rows, self.hot_rows, seed
            )
        if self.layout == "packed":
            return self.updater.init_state_packed(self.num_rows, seed)
        if self.layout == "stacked":
            return self.updater.init_state_stacked(self.num_rows, seed)
        return self.updater.init_state(self.num_rows, seed)

    def set_remap(self, lut: np.ndarray) -> None:
        """Install the frequency remap (data/remap.py::build_remap).
        Prep must apply the SAME lut to every batch (the learner threads
        it into prep_batch); the store needs it only to canonicalize
        checkpoint state (place_state / utils.checkpoint.save)."""
        assert self.hot_rows, "set_remap without hot_rows"
        assert lut.shape == (self.num_rows,)
        self.hot_lut = lut

    def place_state(self, host_state: FMState):
        n_in = host_state.w.shape[0]
        if n_in > self.num_rows:
            # a single-file checkpoint from a PADDED sharded run carries
            # rows_per_shard*S >= 2^num_bits rows; rows past the hash
            # space are table padding (never hashed into) and must be
            # zero — truncate them. Anything nonzero there means the
            # checkpoint came from a larger hash space (num_bits
            # mismatch), which would silently alias ids if loaded.
            w = np.asarray(host_state.w)
            if np.any(w[self.num_rows:] != 0):
                raise ValueError(
                    f"checkpoint has {n_in} rows with nonzero weights past "
                    f"this store's {self.num_rows}-row hash space — was it "
                    f"saved with a larger num_bits?"
                )
            host_state = FMState(
                w=w[: self.num_rows],
                z=np.asarray(host_state.z)[: self.num_rows],
                n=np.asarray(host_state.n)[: self.num_rows],
                V=np.asarray(host_state.V)[:, : self.num_rows],
                nV=np.asarray(host_state.nV)[:, : self.num_rows],
                cnt=np.asarray(host_state.cnt)[: self.num_rows],
            )
        elif n_in < self.num_rows:
            raise ValueError(
                f"checkpoint has {n_in} rows but this store's hash space "
                f"is {self.num_rows} (num_bits mismatch — retrain or load "
                f"with the original num_bits)"
            )
        if self.hot_rows:
            # hot/cold split placement: each canonical plane is permuted
            # into remapped space on the HOST (the lut never exists on
            # device) and written plane-at-a-time into the two tables —
            # same low-peak discipline as the stacked branch below
            if self.hot_lut is None:
                raise ValueError(
                    "hot_rows store cannot place a checkpoint before "
                    "set_remap() — the learner installs the frequency "
                    "remap first"
                )
            k = self.updater.param.V_dim
            H = self.hot_rows
            mk = jax.jit(
                lambda n: jnp.zeros((4 + 2 * k, n), jnp.float32),
                static_argnums=0,
            )
            hot, cold = mk(H), mk(self.num_rows - H)
            set_at = jax.jit(
                lambda t, r, i: jax.lax.dynamic_update_slice(
                    t, jnp.atleast_2d(r), (i, 0)
                ),
                donate_argnums=0,
            )
            planes = [("w", 0), ("z", 1), ("n", 2), ("cnt", 3)]
            if k > 0:
                planes += [("V", 4), ("nV", 4 + k)]
            buf = np.empty(self.num_rows, np.float32)
            for name, i in planes:
                src = np.asarray(getattr(host_state, name))
                for j in range(src.shape[0] if src.ndim == 2 else 1):
                    plane = src[j] if src.ndim == 2 else src
                    buf[self.hot_lut] = plane  # canonical -> remapped
                    hot = set_at(hot, jax.device_put(buf[:H]), jnp.int32(i + j))
                    cold = set_at(
                        cold, jax.device_put(buf[H:]), jnp.int32(i + j)
                    )
            return HotColdFMState(hot=hot, cold=cold)
        if self.layout == "stacked":
            # plane-at-a-time placement: device_put of the whole planar
            # state next to the stacked table would transiently hold
            # ~2.1x the table (OOMs a 2^26 checkpoint load on one chip)
            k = self.updater.param.V_dim
            tbl = jax.jit(
                lambda: jnp.zeros((4 + 2 * k, self.num_rows), jnp.float32)
            )()
            set_at = jax.jit(
                lambda t, r, i: jax.lax.dynamic_update_slice(
                    t, jnp.atleast_2d(r), (i, 0)
                ),
                donate_argnums=0,
            )
            planes = [("w", 0), ("z", 1), ("n", 2), ("cnt", 3)]
            if k > 0:
                planes += [("V", 4), ("nV", 4 + k)]
            for name, i in planes:
                tbl = set_at(
                    tbl, jax.device_put(np.asarray(getattr(host_state, name))),
                    jnp.int32(i),
                )
            return StackedFMState(tbl=tbl)
        placed = jax.device_put(host_state)
        if self.layout == "packed":
            return jax.jit(pack_state)(placed)
        return placed

    def shard_batch(self, ids, vals, labels, mask, fields=None):
        if self.expects_fields:
            return ids, vals, labels, mask, _require_fields(
                fields, self.num_fields
            )
        return ids, vals, labels, mask

    def count_step(self, state, ids):
        return self._count(state, ids)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def _count(self, state, ids):
        """Feature-frequency pass (reference: Store::kFeaCount push used
        for tail filtering before training)."""
        loc = localize(ids, self.num_rows, self.unique_size)
        idx = jnp.where(loc.valid, loc.uids, 0)
        return self.updater.add_counts(state, idx, loc.counts * loc.valid)

    def _use_sweep_pull(self, u: int) -> bool:
        # the pull sweep's non-blocked output is staged in VMEM by Mosaic;
        # fall back to the (fast, jitted) XLA gather when it wouldn't fit
        dp = (1 + self.updater.param.V_dim + 7) // 8 * 8
        return self.pallas and dp * (u + 2048) * 4 <= (8 << 20)

    def _pull_compute(self, state, ids, vals, labels, mask, fields=None):
        if isinstance(state, HotColdFMState):
            raise ValueError(
                "hot_rows needs host-prepped batches (host_localize=1): "
                "the hot/cold bucket split and the frequency remap are "
                "host-side prep work"
            )
        loc = localize(ids, self.num_rows, self.unique_size)
        raw = None
        if self._use_sweep_pull(loc.uids.shape[0]):
            from ..ops.sweep import sweep_pull

            rows_u = sweep_pull(
                state, loc.uids, loc.valid, self.updater.param,
                block_rows=self.block_rows, interpret=self.interpret,
            )
        elif isinstance(state, StackedFMState):
            raw = self.updater.pull_raw(state, loc.uids, loc.valid,
                                        sorted_unique=True)
            rows_u = self.updater.rows_view(raw, loc.valid)
        else:
            rows_u = self.updater.pull(state, loc.uids, loc.valid,
                                       sorted_unique=True)
        grads_u, py, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss=self.loss,
            fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
        )
        # distinct ids dropped by an undersized unique_size (counted, not
        # silent — see ops/localize.py)
        metrics = metrics._replace(dropped_ids=metrics.dropped_ids + loc.overflow)
        return loc, grads_u, py, metrics, raw

    def _step(self, state, ids, vals, labels, mask, fields=None):
        loc, grads_u, _, metrics, raw = self._pull_compute(
            state, ids, vals, labels, mask, fields
        )
        if self.pallas:
            from ..ops.sweep import sweep_apply

            state = sweep_apply(
                state, loc.uids, grads_u, loc.counts, loc.valid,
                self.updater.param,
                block_rows=self.block_rows, interpret=self.interpret,
            )
        else:
            state = self.updater.update(
                state, loc.uids, grads_u, loc.counts, loc.valid,
                sorted_unique=True, rows=raw,
            )
        return state, metrics

    def _eval(self, state, ids, vals, labels, mask, fields=None):
        _, _, py, metrics, _ = self._pull_compute(
            state, ids, vals, labels, mask, fields
        )
        return metrics, py

    # -- host-localized path (data/prep.py): the Localizer ran on worker
    # CPUs in the reference too; skipping the on-device unique both saves
    # its cost and shrinks U to the batch's actual unique count ----------

    def _prepped_pull_compute(self, state, vals, labels, mask, uids, ucounts,
                              inv, valid, fields=None,
                              uids_h=None, uids_c=None):
        loc = Localized(uids=uids, inv=inv, counts=ucounts, valid=valid)
        raw = None
        if uids_h is not None:
            # hot/cold split: the big-table gather sees only the cold
            # minority (see HotColdFMState)
            raw = self.updater.pull_raw_split(state, uids_h, uids_c)
            rows_u = self.updater.rows_view(raw, loc.valid)
        elif self._use_sweep_pull(uids.shape[0]):
            from ..ops.sweep import sweep_pull

            rows_u = sweep_pull(
                state, loc.uids, loc.valid, self.updater.param,
                block_rows=self.block_rows, interpret=self.interpret,
            )
        elif isinstance(state, StackedFMState):
            raw = self.updater.pull_raw(state, loc.uids, loc.valid,
                                        sorted_unique=True)
            rows_u = self.updater.rows_view(raw, loc.valid)
        else:
            rows_u = self.updater.pull(state, loc.uids, loc.valid,
                                       sorted_unique=True)
        grads_u, py, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss=self.loss,
            fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
        )
        return loc, grads_u, py, metrics, raw

    def _prepped_step(self, state, vals, labels, mask, uids, ucounts, inv,
                      valid, fields=None, uids_h=None, uids_c=None):
        loc, grads_u, _, metrics, raw = self._prepped_pull_compute(
            state, vals, labels, mask, uids, ucounts, inv, valid, fields,
            uids_h, uids_c,
        )
        if uids_h is not None:
            state = self.updater.update_split(
                state, uids_h, uids_c, grads_u, loc.counts, loc.valid,
                rows=raw,
            )
        elif self.pallas:
            from ..ops.sweep import sweep_apply

            state = sweep_apply(
                state, loc.uids, grads_u, loc.counts, loc.valid,
                self.updater.param,
                block_rows=self.block_rows, interpret=self.interpret,
            )
        else:
            state = self.updater.update(
                state, loc.uids, grads_u, loc.counts, loc.valid,
                sorted_unique=True, rows=raw,
            )
        return state, metrics

    def _prepped_eval(self, state, vals, labels, mask, uids, ucounts, inv,
                      valid, fields=None, uids_h=None, uids_c=None):
        _, _, py, metrics, _ = self._prepped_pull_compute(
            state, vals, labels, mask, uids, ucounts, inv, valid, fields,
            uids_h, uids_c,
        )
        return metrics, py

    def _prepped_step_sorted(self, state, vals, labels, mask, uids, ucounts,
                             inv, valid, x_s, bidx, inv_s,
                             s_tiles, s_wins, s_first, fields=None,
                             slot_s=None, uids_h=None, uids_c=None):
        """Host-prepped train step with the scatter-free sorted backward
        (ops/segsum.py) feeding the XLA (or whole-table-sweep) table
        update — the same aggregation the pairs path rides, which is
        table-size independent and replaces the step's largest XLA term
        (the [B*L] -> [U] scatter-add; BENCH.md r4). ffm rides it too,
        with the direct per-slot payload gather (``slot_s``).

        COMPACT batches (x_s is None): the sorted arrays are derived
        here from the resident cached (vals, inv, slot_s) — two [BLp]
        gathers from resident inputs (~1 ms each; the r4 composition
        pathology applies to JUST-COMPUTED sources, not cached ones).
        Device-derived pad lanes are inv[0] instead of the monotone
        repeat-last — safe, see data/prep.py::build_sorted_slots."""
        if x_s is None:
            B, L = vals.shape
            blp = slot_s.shape[0]
            real = jnp.arange(blp) < B * L
            x_s = jnp.where(real, vals.reshape(-1)[slot_s], 0.0)
            bidx = slot_s // L
            inv_s = inv[slot_s]
        loc = Localized(uids=uids, inv=inv, counts=ucounts, valid=valid)
        raw = None
        if uids_h is not None:
            # hot/cold split: the big-table gather sees only the cold
            # minority; ONE split gather serves pull and update
            raw = self.updater.pull_raw_split(state, uids_h, uids_c)
            rows_u = self.updater.rows_view(raw, valid)
        elif self._use_sweep_pull(uids.shape[0]):
            from ..ops.sweep import sweep_pull

            rows_u = sweep_pull(
                state, uids, valid, self.updater.param,
                block_rows=self.block_rows, interpret=self.interpret,
            )
        elif isinstance(state, StackedFMState):
            # ONE [D, U] table gather serves both the worker pull and the
            # update (the second full-row gather costs ~7 ms at 2^26)
            raw = self.updater.pull_raw(state, uids, valid,
                                        sorted_unique=True)
            rows_u = self.updater.rows_view(raw, valid)
        else:
            rows_u = self.updater.pull(state, uids, valid,
                                       sorted_unique=True)
        grads_p, _, metrics = worker_grads_sorted(
            rows_u, loc, vals, labels, mask,
            (x_s, bidx, inv_s, s_tiles, s_wins, s_first),
            loss=self.loss, fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
            slot_s=slot_s,
            interpret=self._segsum_interpret,
        )
        # zero the never-visited (sentinel) lanes: their segment-sum
        # output is undefined VMEM and the updater's multiplicative
        # masks would turn an Inf there into a committed NaN
        grads_u = jnp.where(valid[:, None], grads_p.T, 0.0)
        if uids_h is not None:
            state = self.updater.update_split(
                state, uids_h, uids_c, grads_u, ucounts, valid, rows=raw
            )
        elif self.pallas:
            from ..ops.sweep import sweep_apply

            state = sweep_apply(
                state, uids, grads_u, ucounts, valid, self.updater.param,
                block_rows=self.block_rows, interpret=self.interpret,
            )
        else:
            state = self.updater.update(state, uids, grads_u, ucounts, valid,
                                        sorted_unique=True, rows=raw)
        return state, metrics

    def _batch_fields(self, pb):
        """The per-slot field array a step should see (None unless the
        config declares explicit libffm fields)."""
        if not self.expects_fields:
            return None
        return _prepped_fields(pb, self.num_fields)

    def _sorted_slots(self, pb):
        """Host sorted-slot arrays (built in the prep workers when the
        learner attached them; rebuilt here otherwise — compact when the
        config asks, see DataParam.cache_compact)."""
        ss = getattr(pb, "sorted_slots", None)
        want_slots = self.loss == "ffm"
        if ss is None or (want_slots and ss.slot_sorted is None):
            from ..data.prep import build_sorted_slots

            ss = build_sorted_slots(
                np.asarray(pb.inv), np.asarray(pb.vals), pb.uids.shape[0],
                with_slots=want_slots,
                compact=self.cfg.data.cache_compact,
            )
            pb.sorted_slots = ss  # cached/replayed batches reuse it
        return ss

    def train_step_prepped(self, state, pb):
        fields = self._batch_fields(pb)
        if self.pairs and self.sorted_grads:
            m = self._pair_meta(pb)
            ss = self._sorted_slots(pb)
            return self._jit_pairs_step_sorted(
                state, pb.vals, pb.labels, pb.mask, pb.uids, pb.ucounts,
                pb.inv, pb.valid, m.blocks, m.wins, m.first, m.wfirst,
                ss.x_sorted, ss.bidx, ss.inv_sorted,
                ss.seg_tiles, ss.seg_wins, ss.seg_first,
                fields=fields, slot_s=ss.slot_sorted,
            )
        if self.pairs:
            m = self._pair_meta(pb)
            return self._jit_pairs_step(
                state, pb.vals, pb.labels, pb.mask, pb.uids, pb.ucounts,
                pb.inv, pb.valid, m.blocks, m.wins, m.first, m.wfirst,
                fields=fields,
            )
        if self.hot_rows and pb.uids_hot is None:
            raise ValueError(
                "hot_rows store got an unsplit PreppedBatch — prep must "
                "run with (remap, hot_rows) (the learner threads them)"
            )
        hkw = (
            dict(uids_h=pb.uids_hot, uids_c=pb.uids_cold)
            if self.hot_rows else {}
        )
        if self.sorted_grads:
            ss = self._sorted_slots(pb)
            return self._jit_prepped_step_sorted(
                state, pb.vals, pb.labels, pb.mask, pb.uids, pb.ucounts,
                pb.inv, pb.valid,
                ss.x_sorted, ss.bidx, ss.inv_sorted,
                ss.seg_tiles, ss.seg_wins, ss.seg_first,
                fields=fields, slot_s=ss.slot_sorted, **hkw,
            )
        return self._jit_prepped_step(
            state, pb.vals, pb.labels, pb.mask, pb.uids, pb.ucounts,
            pb.inv, pb.valid, fields=fields, **hkw,
        )

    def eval_step_prepped(self, state, pb):
        fields = self._batch_fields(pb)
        if self.pairs:
            m = self._pair_meta(pb)
            return self._jit_pairs_eval(
                state, pb.vals, pb.labels, pb.mask, pb.uids, pb.ucounts,
                pb.inv, pb.valid, m.blocks, m.wins, m.first, m.wfirst,
                fields=fields,
            )
        if self.hot_rows and pb.uids_hot is None:
            raise ValueError(
                "hot_rows store got an unsplit PreppedBatch — prep must "
                "run with (remap, hot_rows) (the learner threads them)"
            )
        hkw = (
            dict(uids_h=pb.uids_hot, uids_c=pb.uids_cold)
            if self.hot_rows else {}
        )
        return self._jit_prepped_eval(
            state, pb.vals, pb.labels, pb.mask, pb.uids, pb.ucounts,
            pb.inv, pb.valid, fields=fields, **hkw,
        )

    # -- pair-kernel path (ops/pair_sweep.py): Mosaic sweeps over only the
    # (table block, unique window) pairs the batch actually touches; rides
    # the same host-localized PreppedBatch as the prepped path ------------

    def _pair_meta(self, pb):
        """The host-built pair schedule (computed in the prep/prefetch
        thread when the learner attached it; rebuilt here otherwise)."""
        m = getattr(pb, "pair_meta", None)
        if m is None or m.block_rows != self.block_rows:
            from ..ops.pair_sweep import build_pair_meta

            m = build_pair_meta(
                np.asarray(pb.uids), self.num_rows, self.block_rows
            )
        return m

    def _pairs_pull_compute(
        self, state, vals, labels, mask, uids, ucounts, inv, valid,
        blocks, wins, first, wfirst, fields=None,
    ):
        from ..ops.pair_sweep import pull_pairs

        loc = Localized(uids=uids, inv=inv, counts=ucounts, valid=valid)
        rows_p = pull_pairs(
            state, uids, (blocks, wins, first, wfirst), self.updater.param,
            block_rows=self.block_rows, interpret=self.interpret,
        )
        # unique windows past the batch's real unique count are never
        # visited by any pair — their output lanes are undefined; the
        # valid mask zeroes them (pad slots index the junk lane ub-1)
        rows_u = jnp.where(valid[:, None], rows_p.T, 0.0)
        grads_u, py, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss=self.loss,
            fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
        )
        return loc, grads_u, py, metrics

    def _pairs_step(
        self, state, vals, labels, mask, uids, ucounts, inv, valid,
        blocks, wins, first, wfirst, fields=None,
    ):
        from ..ops.pair_sweep import apply_pairs

        loc, grads_u, _, metrics = self._pairs_pull_compute(
            state, vals, labels, mask, uids, ucounts, inv, valid,
            blocks, wins, first, wfirst, fields,
        )
        vf = valid.astype(jnp.float32)
        payload = jnp.concatenate(
            [
                jnp.where(valid[None, :], grads_u.T, 0.0),  # gw | gV planar
                (loc.counts * vf)[None, :],                 # add_cnt
                vf[None, :],                                # touch
            ],
            axis=0,
        )
        state = apply_pairs(
            state, uids, payload, (blocks, wins, first, wfirst),
            self.updater.param,
            block_rows=self.block_rows, interpret=self.interpret,
        )
        return state, metrics

    def _pairs_step_sorted(
        self, state, vals, labels, mask, uids, ucounts, inv, valid,
        blocks, wins, first, wfirst, x_s, bidx, inv_s,
        s_tiles, s_wins, s_first, fields=None, slot_s=None,
    ):
        """kernel=pairs train step with scatter-free grad aggregation:
        pull pairs -> [B, L] forward -> SORTED-slot backward ->
        ops/segsum.py tile-matmul per-key sums (planar, already the
        apply payload layout) -> apply pairs. ffm rides it too, with the
        direct per-slot payload gather (``slot_s``). Compact batches
        (x_s None) derive the sorted arrays on device — see
        _prepped_step_sorted."""
        from ..ops.pair_sweep import apply_pairs, pull_pairs

        if x_s is None:
            B, L = vals.shape
            blp = slot_s.shape[0]
            real = jnp.arange(blp) < B * L
            x_s = jnp.where(real, vals.reshape(-1)[slot_s], 0.0)
            bidx = slot_s // L
            inv_s = inv[slot_s]
        loc = Localized(uids=uids, inv=inv, counts=ucounts, valid=valid)
        rows_p = pull_pairs(
            state, uids, (blocks, wins, first, wfirst), self.updater.param,
            block_rows=self.block_rows, interpret=self.interpret,
        )
        rows_u = jnp.where(valid[:, None], rows_p.T, 0.0)
        grads_p, _, metrics = worker_grads_sorted(
            rows_u, loc, vals, labels, mask,
            (x_s, bidx, inv_s, s_tiles, s_wins, s_first),
            loss=self.loss, fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
            slot_s=slot_s,
            interpret=self.interpret,
        )
        vf = valid.astype(jnp.float32)
        payload = jnp.concatenate(
            [
                jnp.where(valid[None, :], grads_p, 0.0),  # gw | gV planar
                (loc.counts * vf)[None, :],               # add_cnt
                vf[None, :],                              # touch
            ],
            axis=0,
        )
        state = apply_pairs(
            state, uids, payload, (blocks, wins, first, wfirst),
            self.updater.param,
            block_rows=self.block_rows, interpret=self.interpret,
        )
        return state, metrics

    def _pairs_eval(
        self, state, vals, labels, mask, uids, ucounts, inv, valid,
        blocks, wins, first, wfirst, fields=None,
    ):
        _, _, py, metrics = self._pairs_pull_compute(
            state, vals, labels, mask, uids, ucounts, inv, valid,
            blocks, wins, first, wfirst, fields,
        )
        return metrics, py

    def stats(self, state):
        return jax.jit(self.updater.stats)(state)


class ShardedStore:
    """Row-sharded store over a 1D mesh (reference: StoreDist + ps-lite).

    One mesh axis ``'shard'`` carries both data parallelism (the batch is
    split over it) and model parallelism (the table is split over it) —
    every chip is simultaneously worker and server, as in DLRM-style
    sparse training. SURVEY.md §2.3: this is difacto's async DP +
    key-range model parallelism, made synchronous; the spiritual EP
    analog (sharded sparse table + all_to_all).
    """

    def __init__(
        self,
        updater: FMUpdater,
        cfg: Config,
        mesh: Mesh | None = None,
        interpret: bool = False,
    ):
        self.updater = updater
        self.cfg = cfg
        interpret = interpret or cfg.shard.interpret
        if mesh is None:
            n = cfg.shard.num_shards or len(jax.devices())
            mesh = jax.make_mesh((n,), ("shard",))
        self.mesh = mesh
        self.S = mesh.shape["shard"]
        # hashed ids live in [0, 2^num_bits); the TABLE is padded up so
        # any shard count divides it with block-aligned per-shard rows
        # (the reference's key ranges worked for any server count; a
        # non-power-of-two mesh — e.g. 3 hosts x 2 chips — must too).
        # Padded rows are never hashed into: they only hold init values.
        hash_rows = 1 << cfg.data.num_bits
        if cfg.shard.hot_rows:
            raise ValueError(
                "hot_rows is a LocalStore big-table feature (store=local): "
                "a sharded mesh already divides rows/shard below the pair-"
                "kernel crossover where the split would not pay"
            )
        self.hot_rows = 0
        kind = _kernel_kind(cfg)
        _check_backend(kind, interpret)
        self.pairs = kind == "pairs"
        self.pallas = _use_pallas(cfg) or (interpret and not self.pairs)
        self.interpret = interpret
        self.layout = _resolve_layout(cfg, self.pallas or self.pairs)
        per = (hash_rows + self.S - 1) // self.S
        br = min(cfg.shard.block_rows, per)
        self.hash_rows = hash_rows
        self.rows_per_shard = _round_up(per, br)
        self.num_rows = self.rows_per_shard * self.S
        self.block_rows = min(cfg.shard.block_rows, self.rows_per_shard)
        assert cfg.data.batch_size % self.S == 0, (
            f"num_shards {self.S} must divide batch_size {cfg.data.batch_size}"
        )
        local_nnz = (cfg.data.batch_size // self.S) * cfg.data.max_nnz_per_row
        self.unique_size = cfg.shard.unique_size or local_nnz
        self.loss = cfg.learner.loss
        # sorted-slot segment-sum grad aggregation (ops/segsum.py): the
        # worker-side per-key sums happen BEFORE routing, so this is
        # purely local — multi-process safe with no collective. Default
        # for fm/logit on the pairs path and on the kernel=xla path on
        # real TPU (same rationale as LocalStore.sorted_grads).
        on_tpu = jax.default_backend() == "tpu"
        self._segsum_interpret = interpret or not on_tpu
        self.sorted_grads = (
            cfg.shard.segsum == "sorted"
            or (
                cfg.shard.segsum == "auto"
                and (self.pairs or (not self.pallas and on_tpu))
            )
        )
        # libffm explicit fields: when the config declares them, every
        # step signature (and shard_map spec list) grows a trailing
        # i32 [B, L] field array sharded like vals
        self.num_fields = cfg.model.num_fields
        self.ffm_block = cfg.model.ffm_block_size
        self.expects_fields = cfg.expects_fields()
        # per-(src,dst) all_to_all slot capacity for the worst-case path
        # (the prepped path re-derives it from the actual unique bucket)
        self.capacity = self._capacity_for(self.unique_size)

        # planar (FMState) specs are always kept: checkpoints and
        # place_state speak FMState regardless of the active layout
        self._fmstate_spec = FMState(
            w=P("shard"), z=P("shard"), n=P("shard"),
            V=P(None, "shard"), nV=P(None, "shard"), cnt=P("shard"),
        )
        if self.layout == "packed":
            state_spec = PackedFMState(tbl=P("shard", None))
        elif self.layout == "stacked":
            state_spec = StackedFMState(tbl=P(None, "shard"))
        else:
            state_spec = self._fmstate_spec
        batch_specs = (P("shard", None), P("shard", None), P("shard"), P("shard"))
        if self.expects_fields:
            batch_specs += (P("shard", None),)  # fields [B, L]
        metrics_spec = StepMetrics(P(), P(), P(), P(), P(), P(), P())
        self._state_spec = state_spec

        train = jax.shard_map(
            self._step,
            mesh=self.mesh,
            check_vma=False,  # pallas_call outputs carry no vma metadata
            in_specs=(state_spec,) + batch_specs,
            out_specs=(state_spec, metrics_spec),
        )
        self.train_step = jax.jit(train, donate_argnums=0)
        evalf = jax.shard_map(
            self._eval,
            mesh=self.mesh,
            check_vma=False,  # pallas_call outputs carry no vma metadata
            in_specs=(state_spec,) + batch_specs,
            out_specs=(metrics_spec, P("shard")),
        )
        self.eval_step = jax.jit(evalf)
        countf = jax.shard_map(
            self._count,
            mesh=self.mesh,
            check_vma=False,  # pallas_call outputs carry no vma metadata
            in_specs=(state_spec, P("shard", None)),
            out_specs=state_spec,
        )
        self.count_step = jax.jit(countf, donate_argnums=0)

        # host-localized (prepped) fast path: per-shard unique sets come
        # stacked from data/prep.py::prep_batch_sharded; no on-device
        # unique, and the all_to_all capacity shrinks to the actual
        # unique bucket instead of the worst-case B*L/S
        prepped_specs = (
            P("shard", None),  # vals [B, L]
            P("shard"),        # labels [B]
            P("shard"),        # mask [B]
            P("shard"),        # uids [S*ub]
            P("shard"),        # ucounts [S*ub]
            P("shard"),        # inv [B*L]
            P("shard"),        # valid [S*ub]
            P("shard"),        # dropped [S]
        )
        if self.expects_fields:
            prepped_specs += (P("shard", None),)  # fields [B, L]
        self._prepped_specs = prepped_specs
        ptrain = jax.shard_map(
            self._prepped_step,
            mesh=self.mesh,
            check_vma=False,  # pallas_call outputs carry no vma metadata
            in_specs=(state_spec,) + prepped_specs,
            out_specs=(state_spec, metrics_spec),
        )
        self._jit_prepped_step = jax.jit(ptrain, donate_argnums=0)
        peval = jax.shard_map(
            self._prepped_eval,
            mesh=self.mesh,
            check_vma=False,  # pallas_call outputs carry no vma metadata
            in_specs=(state_spec,) + prepped_specs,
            out_specs=(metrics_spec, P("shard")),
        )
        self._jit_prepped_eval = jax.jit(peval)
        # ffm's sorted backward needs one extra stacked array: the sort
        # permutation (slot_sorted) for the direct per-slot payload gather
        self._n_sorted_args = 7 if self.loss == "ffm" else 6
        if self.sorted_grads and not self.pairs:
            # kernel=xla big-table path with the scatter-free sorted
            # backward: same prepped args (incl. fields when the config
            # declares them) + the stacked sorted-slot arrays
            strain = jax.shard_map(
                self._prepped_step_sorted,
                mesh=self.mesh,
                check_vma=False,
                in_specs=(state_spec,) + prepped_specs
                + (P("shard", None),) * self._n_sorted_args,
                out_specs=(state_spec, metrics_spec),
            )
            self._jit_prepped_step_sorted = jax.jit(strain, donate_argnums=0)

        # owner-side pair kernels (kernel=pairs): jitted steps are built
        # lazily per all_to_all capacity — the host picks the capacity
        # from each batch's actual bucket fills (pairs_capacity)
        self._metrics_spec = metrics_spec
        self._pairs_jit_cache: dict[int, tuple] = {}
        # per-epoch capacity pin: the coarse ~1.5x _cap_ladder rungs
        # overshoot the owner streams ~35% on average (BENCH.md r4 queue
        # #4 — dead lanes ride every all_to_all and owner sweep). The
        # learner calls pin_capacity() at each epoch boundary; from then
        # on batches whose exact W-aligned need fits the seen maximum all
        # land on ONE tight capacity (one Mosaic specialization, no
        # mid-epoch mints) instead of a ladder rung up to 1.5x too wide.
        self._cap_seen = 0        # max exact W-aligned need seen so far
        self._cap_pin: int | None = None

    def _capacity_for(self, unique_lanes: int) -> int:
        """Per-(src,dst) all_to_all slot capacity for a given per-device
        unique-lane count (ps-lite analog: the per-server request size).
        The pair kernels address the owner's receive stream in 128-lane
        windows, so their capacity rounds up to that granularity (a
        superset of slots — never drops more than the XLA path)."""
        perfect = (unique_lanes + self.S - 1) // self.S
        c = _round_up(
            max(int(perfect * self.cfg.shard.capacity_factor), 8), 8
        )
        if self.pairs:
            from ..ops.pair_sweep import W

            c = _round_up(c, W)
        return c

    def pairs_capacity(self, pb) -> int:
        """The all_to_all capacity the pairs path uses for one prepped
        batch: the batch's ACTUAL maximum (src, owner) bucket fill —
        zero drops, minimal owner stream — rounded up a coarse ladder so
        few distinct jit/Mosaic specializations exist. (The XLA path
        instead sizes worst-case from capacity_factor; the host can do
        better because it built the buckets.)

        An explicit config ``unique_size`` FLOORS the capacity (mirroring
        the local path's pinned bucket): every typical batch then lands
        on one capacity and mid-epoch batches can never mint a fresh
        Mosaic specialization (5-15 min on a remote compile service —
        BENCH.md); a pathologically skewed batch still gets the next
        ladder rung up (correctness first, logged in _pairs_jits)."""
        from ..data.prep import shard_bucket_fills
        from ..ops.pair_sweep import W

        fills = shard_bucket_fills(pb, self.num_rows)
        c = _round_up(max(int(fills.max()), 1), W)
        return self._cap_resolve(c)

    def _cap_resolve(self, c: int) -> int:
        """Exact W-aligned need -> served capacity: the epoch pin when it
        fits (tight, no new compiles), else the unique_size floor / the
        coarse ladder (correctness first; a fresh specialization is
        logged in _pairs_jits)."""
        self._cap_seen = max(self._cap_seen, c)
        if self._cap_pin is not None and c <= self._cap_pin:
            return self._cap_pin
        if self.cfg.shard.unique_size:
            c = max(c, self.capacity)  # pinned floor, W-aligned for pairs
        return _cap_ladder(c)

    def pin_capacity(self) -> int:
        """Pin the all_to_all capacity to the maximum exact need seen so
        far (epoch boundary; deterministic across processes because
        _cap_seen is fed by the same global maxima everywhere — the
        per-step allgather in _mp_pairs_capacity). Returns the pin."""
        if self._cap_seen:
            self._cap_pin = max(self._cap_pin or 0, self._cap_seen)
        return self._cap_pin or 0

    def _mp_pairs_capacity(self, pb) -> int:
        """Multi-process batch-actual all_to_all capacity: each process
        knows only its LOCAL sources' bucket fills, so the global maximum
        is agreed with one tiny lockstep allgather (i64 scalar) — the
        multi-process twin of :meth:`pairs_capacity`. Deterministic
        (every process computes the same ladder rung from the same
        global max); the pinned config capacity previously used here
        overshot the owner streams ~35% on average (BENCH.md queue #4).
        MUST run on the main thread in lockstep step order."""
        from jax.experimental import multihost_utils

        from ..data.prep import shard_bucket_fills
        from ..ops.pair_sweep import W

        fills = shard_bucket_fills(pb, self.num_rows, self.S)
        local_max = int(fills.max())
        gmax = int(
            np.asarray(
                multihost_utils.process_allgather(
                    np.array(local_max, np.int64)
                )
            ).max()
        )
        c = _round_up(max(gmax, 1), W)
        return self._cap_resolve(c)

    # -- placement ----------------------------------------------------------

    def init_state(self, seed: int = 0):
        shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), self._state_spec
        )
        @functools.partial(jax.jit, out_shardings=shardings)
        def _init():
            # init over the HASH space so the model is a function of
            # num_bits + seed alone, not the mesh: a 6-shard table must
            # initialize (hence train) identically to an 8-shard or
            # single-device one. Padded rows (non-power-of-two shard
            # counts) are never hashed into; they carry zeros.
            s = self.updater.init_state(self.hash_rows, seed)
            pad = self.num_rows - self.hash_rows
            if pad:
                s = FMState(
                    w=jnp.pad(s.w, (0, pad)),
                    z=jnp.pad(s.z, (0, pad)),
                    n=jnp.pad(s.n, (0, pad)),
                    V=jnp.pad(s.V, ((0, 0), (0, pad))),
                    nV=jnp.pad(s.nV, ((0, 0), (0, pad))),
                    cnt=jnp.pad(s.cnt, (0, pad)),
                )
            if self.layout == "packed":
                return pack_state(s)
            if self.layout == "stacked":
                return stack_state(s)
            return s

        return _init()

    def _place(self, arrays, specs):
        if jax.process_count() > 1:
            # each process contributes its LOCAL rows (from its disjoint
            # input part) to a global batch of nproc x local rows —
            # device_put alone would misinterpret local data as global
            return tuple(
                jax.make_array_from_process_local_data(
                    NamedSharding(self.mesh, s), np.asarray(a)
                )
                for a, s in zip(arrays, specs)
            )
        return tuple(
            jax.device_put(np.asarray(a), NamedSharding(self.mesh, s))
            for a, s in zip(arrays, specs)
        )

    def shard_batch(self, ids, vals, labels, mask, fields=None):
        specs = (P("shard", None), P("shard", None), P("shard"), P("shard"))
        arrays = (ids, vals, labels, mask)
        if self.expects_fields:
            specs += (P("shard", None),)
            arrays += (_require_fields(fields, self.num_fields),)
        return self._place(arrays, specs)

    def _cached_place(self, pb, key, builder):
        """Reuse placed device arrays for a batch that will be stepped
        again (cache_on_device — bench loops and cached-epoch replays):
        re-sending ~8 MB of batch arrays per step costs ~100-1000 ms
        over a slow host link while the step itself takes ~25 ms."""
        if not self.cfg.data.cache_on_device:
            return builder()
        cache = getattr(pb, "_dev_cache", None)
        if cache is None:
            cache = {}
            pb._dev_cache = cache
        k = (id(self), key)
        if k not in cache:
            cache[k] = builder()
        return cache[k]

    def shard_prepped(self, pb):
        """Place a ShardPreppedBatch (data/prep.py) onto the mesh. In
        multi-process runs each process passes the prep of its LOCAL rows
        (stacked over its local devices) — prep must use a fixed bucket
        so all processes trace identical shapes."""
        arrays = (pb.vals, pb.labels, pb.mask, pb.uids, pb.ucounts, pb.inv,
                  pb.valid, pb.dropped)
        if self.expects_fields:
            arrays += (_prepped_fields(pb, self.num_fields),)
        return self._cached_place(
            pb, "base", lambda: self._place(arrays, self._prepped_specs)
        )

    def _pairs_jits(self, C: int):
        """(train, eval) jitted shard_maps for one capacity. The prepped
        args gain six stacked [S, P] schedule arrays (pull block/window/
        window-first, apply block/window/block-first — data/prep.py ::
        build_shard_pair_metas), inserted between the base eight prepped
        arrays and the optional fields array."""
        e = self._pairs_jit_cache.get(C)
        if e is None:
            if self._pairs_jit_cache:
                # a new capacity mid-run means a fresh jit (and on TPU a
                # fresh Mosaic compile — minutes on a remote service);
                # pin `unique_size` to floor the capacity if this repeats
                log.info(
                    "sharded pairs: new all_to_all capacity %d "
                    "(existing: %s) — compiling a new specialization",
                    C, sorted(self._pairs_jit_cache),
                )
            pair_specs = (
                self._prepped_specs[:8]
                + (P("shard", None),) * 6
                + self._prepped_specs[8:]
            )
            step_fn = (
                self._prepped_pairs_step_sorted
                if self.sorted_grads
                else self._prepped_pairs_step
            )
            step_specs = pair_specs + (
                (P("shard", None),) * self._n_sorted_args
                if self.sorted_grads else ()
            )
            step = jax.shard_map(
                functools.partial(step_fn, capacity=C),
                mesh=self.mesh,
                check_vma=False,
                in_specs=(self._state_spec,) + step_specs,
                out_specs=(self._state_spec, self._metrics_spec),
            )
            evalf = jax.shard_map(
                functools.partial(self._prepped_pairs_eval, capacity=C),
                mesh=self.mesh,
                check_vma=False,
                in_specs=(self._state_spec,) + pair_specs,
                out_specs=(self._metrics_spec, P("shard")),
            )
            e = (jax.jit(step, donate_argnums=0), jax.jit(evalf))
            self._pairs_jit_cache[C] = e
        return e

    def _pairs_prepped_args(self, pb):
        """(capacity, prepped args + placed pair-schedule arrays).

        Multi-process: each process preps only its local rows, so the
        owner-side schedules come from build_shard_pair_metas_mp — a
        process_allgather of the bucketed global ids, executed HERE (the
        main thread, inside the lockstepped step sequence: collective
        order must be identical on every process) at the batch-actual
        capacity agreed by _mp_pairs_capacity's allgather. Single-process
        keeps the cheaper local build with the batch-fill-sized capacity,
        overlapped in the prep workers when the learner attached it."""
        m = getattr(pb, "pair_metas", None)
        if m is None or m.block_rows != self.block_rows:
            if jax.process_count() > 1:
                from ..data.prep import build_shard_pair_metas_mp

                m = build_shard_pair_metas_mp(
                    pb, self.num_rows, self.S, self._mp_pairs_capacity(pb),
                    self.block_rows,
                )
            else:
                C = self.pairs_capacity(pb)
                from ..data.prep import build_shard_pair_metas

                m = build_shard_pair_metas(
                    pb, self.num_rows, C, self.block_rows
                )
            pb.pair_metas = m  # cached batches reuse the schedule
        placed = self._cached_place(
            pb, "metas",
            lambda: self._place(
                (m.pull_blocks, m.pull_wins, m.pull_wfirst,
                 m.apply_blocks, m.apply_wins, m.apply_first),
                (P("shard", None),) * 6,
            ),
        )
        base = self.shard_prepped(pb)
        return m.capacity, base[:8] + placed + base[8:]

    def _sorted_args(self, pb):
        """Placed per-shard sorted-slot arrays (ops/segsum.py) — built in
        the prep workers when the learner attached them (purely local:
        no collective even multi-process), rebuilt here otherwise."""
        ss = getattr(pb, "sorted_slots", None)
        want_slots = self.loss == "ffm"
        if ss is None or (want_slots and ss.slot_sorted is None):
            from ..data.prep import build_sorted_slots_sharded

            ss = build_sorted_slots_sharded(pb, with_slots=want_slots)
            pb.sorted_slots = ss
        arrays = (ss.x_sorted, ss.bidx, ss.inv_sorted,
                  ss.seg_tiles, ss.seg_wins, ss.seg_first)
        if want_slots:
            arrays += (ss.slot_sorted,)
        return self._cached_place(
            pb, "sorted",
            lambda: self._place(arrays, (P("shard", None),) * len(arrays)),
        )

    def train_step_prepped(self, state, pb):
        if self.pairs:
            C, args = self._pairs_prepped_args(pb)
            if self.sorted_grads:
                args = args + self._sorted_args(pb)
            return self._pairs_jits(C)[0](state, *args)
        if self.sorted_grads:
            return self._jit_prepped_step_sorted(
                state, *(self.shard_prepped(pb) + self._sorted_args(pb))
            )
        return self._jit_prepped_step(state, *self.shard_prepped(pb))

    def eval_step_prepped(self, state, pb):
        if self.pairs:
            C, args = self._pairs_prepped_args(pb)
            return self._pairs_jits(C)[1](state, *args)
        return self._jit_prepped_eval(state, *self.shard_prepped(pb))

    # -- per-device program (runs inside shard_map) -------------------------

    def _routing(self, loc: Localized, C: int | None = None):
        """Bucket the sorted local unique ids into per-owner capacity slots."""
        S = self.S
        if C is None:
            C = self._capacity_for(loc.uids.shape[0])
        U = loc.uids.shape[0]
        owner = jnp.minimum(loc.uids // self.rows_per_shard, S - 1)
        # uids sorted ascending => owner non-decreasing => buckets contiguous
        start = jnp.searchsorted(owner, jnp.arange(S, dtype=owner.dtype))
        slot = jnp.arange(U, dtype=jnp.int32) - start[owner].astype(jnp.int32)
        ok = loc.valid & (slot < C)
        pos = jnp.where(ok, owner.astype(jnp.int32) * C + slot, S * C)
        dropped = jnp.sum((loc.valid & ~ok).astype(jnp.float32))
        return pos, ok, dropped

    def _pull(self, state, loc):
        S, C = self.S, self._capacity_for(loc.uids.shape[0])
        D = 1 + self.updater.param.V_dim
        pos, ok, dropped = self._routing(loc)
        send_ids = (
            jnp.full(S * C + 1, -1, jnp.int32)
            .at[pos]
            .set(jnp.where(ok, loc.uids, -1))[: S * C]
        )
        recv_ids = jax.lax.all_to_all(
            send_ids.reshape(S, C), "shard", split_axis=0, concat_axis=0, tiled=True
        ).reshape(S * C)
        my_lo = jax.lax.axis_index("shard") * self.rows_per_shard
        lidx = recv_ids - my_lo
        rvalid = recv_ids >= 0
        rows_local = self.updater.pull(state, lidx, rvalid)  # [S*C, D]
        # (no sorted_unique promise: the receive stream is only
        # segment-sorted per source and keys repeat across sources)
        rows_back = jax.lax.all_to_all(
            rows_local.reshape(S, C * D), "shard", split_axis=0, concat_axis=0,
            tiled=True,
        ).reshape(S * C, D)
        rows_u = jnp.where(
            ok[:, None], rows_back[jnp.minimum(pos, S * C - 1)], 0.0
        )
        ctx = (pos, ok, lidx, rvalid)
        return rows_u, ctx, dropped

    def _push(self, state, loc, grads_u, ctx):
        S, C = self.S, self._capacity_for(loc.uids.shape[0])
        D = grads_u.shape[1]
        pos, ok, lidx, rvalid = ctx
        payload = jnp.concatenate([grads_u, loc.counts[:, None]], axis=1)  # [U, D+1]
        send = (
            jnp.zeros((S * C + 1, D + 1), payload.dtype)
            .at[pos]
            .set(jnp.where(ok[:, None], payload, 0.0))[: S * C]
        )
        recv = jax.lax.all_to_all(
            send.reshape(S, C * (D + 1)), "shard", split_axis=0, concat_axis=0,
            tiled=True,
        ).reshape(S * C, D + 1)
        # owner-side dedup across requesters (reference: the server applies
        # per-key aggregated gradients once per key)
        rl = jnp.where(rvalid, lidx, self.rows_per_shard)
        ouids, oinv = jnp.unique(
            rl, size=S * C, fill_value=self.rows_per_shard, return_inverse=True
        )
        ovalid = ouids < self.rows_per_shard
        agg = (
            jnp.zeros((S * C, D + 1), recv.dtype)
            .at[oinv]
            .add(recv * rvalid[:, None].astype(recv.dtype))
        )
        # ouids from jnp.unique are sorted+unique — exactly the contract of
        # the Pallas apply sweep, which runs per shard on the local table
        if self.pallas:
            from ..ops.sweep import sweep_apply

            return sweep_apply(
                state, ouids.astype(jnp.int32), agg[:, :D], agg[:, D], ovalid,
                self.updater.param,
                block_rows=self.block_rows, interpret=self.interpret,
            )
        return self.updater.update(
            state, ouids.astype(jnp.int32), agg[:, :D], agg[:, D], ovalid,
            sorted_unique=True,  # jnp.unique: sorted, unique, OOB sentinel
        )

    def _psum_metrics(self, metrics: StepMetrics, dropped) -> StepMetrics:
        m = metrics._replace(dropped_ids=metrics.dropped_ids + dropped)
        return jax.tree.map(lambda x: jax.lax.psum(x, "shard"), m)

    def _step(self, state, ids, vals, labels, mask, fields=None):
        loc = localize(ids, self.num_rows, self.unique_size)
        rows_u, ctx, dropped = self._pull(state, loc)
        grads_u, _, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss=self.loss,
            fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
        )
        state = self._push(state, loc, grads_u, ctx)
        return state, self._psum_metrics(metrics, dropped + loc.overflow)

    def _eval(self, state, ids, vals, labels, mask, fields=None):
        loc = localize(ids, self.num_rows, self.unique_size)
        rows_u, _, dropped = self._pull(state, loc)
        _, py, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss=self.loss,
            fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
        )
        return self._psum_metrics(metrics, dropped + loc.overflow), py

    # -- host-localized (prepped) path: the Localizer ran on worker CPUs
    # in the reference too (src/data/localizer.h); each device receives
    # its own pre-deduplicated unique set and skips the on-device unique

    def _prepped_step(self, state, vals, labels, mask, uids, ucounts, inv,
                      valid, dropped_prep, fields=None):
        loc = Localized(uids=uids, inv=inv, counts=ucounts, valid=valid)
        rows_u, ctx, dropped = self._pull(state, loc)
        grads_u, _, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss=self.loss,
            fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
        )
        state = self._push(state, loc, grads_u, ctx)
        return state, self._psum_metrics(metrics, dropped + dropped_prep[0])

    def _prepped_eval(self, state, vals, labels, mask, uids, ucounts, inv,
                      valid, dropped_prep, fields=None):
        loc = Localized(uids=uids, inv=inv, counts=ucounts, valid=valid)
        rows_u, _, dropped = self._pull(state, loc)
        _, py, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss=self.loss,
            fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
        )
        return self._psum_metrics(metrics, dropped + dropped_prep[0]), py

    def _prepped_step_sorted(self, state, vals, labels, mask, uids, ucounts,
                             inv, valid, dropped_prep, *rest):
        """kernel=xla prepped step with scatter-free worker grads: the
        per-key aggregation runs in the source device's sorted-slot
        space (ops/segsum.py) BEFORE routing — pull/all_to_all/push are
        untouched (_push's ok-mask zeroes the junk sentinel lanes).
        ``rest`` = optional fields [B, L] (when the config declares
        explicit libffm fields) + the six stacked sorted-slot arrays +
        slot_sorted for ffm (see _n_sorted_args)."""
        fields = None
        if self.expects_fields:
            fields, *rest = rest
        x_s, bidx, inv_s, st_, sw_, sf_, *ms = rest
        slot_s = ms[0][0] if ms else None
        loc = Localized(uids=uids, inv=inv, counts=ucounts, valid=valid)
        rows_u, ctx, dropped = self._pull(state, loc)
        grads_p, _, metrics = worker_grads_sorted(
            rows_u, loc, vals, labels, mask,
            (x_s[0], bidx[0], inv_s[0], st_[0], sw_[0], sf_[0]),
            loss=self.loss, fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
            slot_s=slot_s,
            interpret=self._segsum_interpret,
        )
        state = self._push(state, loc, grads_p.T, ctx)
        return state, self._psum_metrics(metrics, dropped + dropped_prep[0])

    # -- owner-side pair kernels (ops/pair_sweep.py): the receive stream
    # after the id all_to_all is segment-sorted (each source's bucket is a
    # sorted slice of its sorted uniques), which is exactly the pair
    # kernels' input contract — so the owner-side gather AND the owner-side
    # dedup + scatter-add + optimizer (previously an on-device jnp.unique
    # over S*C lanes, the sharded path's dominant cost) become Mosaic
    # sweeps over only the (block, window) pairs the batch touches. The
    # schedules ride in from the host (data/prep.py::build_shard_pair_metas)
    # because the host already knows every shard's unique bucket.

    def _gather_routing(self, loc: Localized, C: int):
        """Gather-form routing for the pairs path: instead of scattering
        each unique lane to its bucket slot (XLA scatter ~8 ns/elem), the
        send buffer is a GATHER over the sorted unique lanes — slot
        (o, j) reads lane start[o] + j (~2-3 ns/elem). Identical result;
        the gather form also yields the ids-per-bucket counts."""
        S = self.S
        U = loc.uids.shape[0]
        bnds = jnp.asarray(
            np.arange(S + 1, dtype=np.int64) * self.rows_per_shard,
            dtype=loc.uids.dtype,
        )
        st = jnp.searchsorted(loc.uids, bnds).astype(jnp.int32)
        # st[S] = first sentinel lane (sentinel == num_rows == S * rps),
        # so st[o+1]-st[o] counts only VALID lanes of bucket o
        cnt = st[1:] - st[:-1]
        t = jnp.arange(S * C, dtype=jnp.int32)
        o = t // C
        j = t - o * C
        src = st[:-1][o] + j
        take = j < cnt[o]
        # unique lane -> bucket slot (for mapping pulled rows back)
        lane = jnp.arange(U, dtype=jnp.int32)
        owner = jnp.minimum(loc.uids // self.rows_per_shard, S - 1).astype(
            jnp.int32
        )
        slot = lane - st[:-1][owner]
        ok = loc.valid & (slot < C)
        pos = jnp.where(ok, owner * C + slot, S * C - 1)
        dropped = jnp.sum((loc.valid & ~ok).astype(jnp.float32))
        return src, take, pos, ok, dropped

    def _pull_pairs(self, state, loc, meta, C: int):
        from ..ops.pair_sweep import pull_pairs

        S = self.S
        U = loc.uids.shape[0]
        D = 1 + self.updater.param.V_dim
        if S == 1:
            # degenerate mesh: routing is the identity (the unique bucket
            # IS the owner stream) — run the LocalStore pair path and
            # skip the bucketing, send building, and all_to_all entirely
            rows_p = pull_pairs(
                state, loc.uids, (meta[0], meta[1], None, meta[2]),
                self.updater.param,
                block_rows=self.block_rows, interpret=self.interpret,
            )
            rows_u = jnp.where(loc.valid[:, None], rows_p.T, 0.0)
            return rows_u, (None,) * 4, jnp.float32(0.0)
        src, take, pos, ok, dropped = self._gather_routing(loc, C)
        send_ids = jnp.where(
            take, loc.uids[jnp.minimum(src, U - 1)], -1
        ).astype(jnp.int32)
        recv_ids = jax.lax.all_to_all(
            send_ids.reshape(S, C), "shard", split_axis=0, concat_axis=0, tiled=True
        ).reshape(S * C)
        my_lo = jax.lax.axis_index("shard") * self.rows_per_shard
        rvalid = recv_ids >= 0
        # local ids, segment-sorted; empty slots carry the local sentinel
        rl = jnp.where(rvalid, recv_ids - my_lo, self.rows_per_shard).astype(
            jnp.int32
        )
        rows_p = pull_pairs(
            state, rl, (meta[0], meta[1], None, meta[2]), self.updater.param,
            block_rows=self.block_rows, interpret=self.interpret,
        )  # [D, S*C] planar; windows no pair visits are undefined -> mask
        rows_local = jnp.where(rvalid[:, None], rows_p.T, 0.0)
        rows_back = jax.lax.all_to_all(
            rows_local.reshape(S, C * D), "shard", split_axis=0, concat_axis=0,
            tiled=True,
        ).reshape(S * C, D)
        rows_u = jnp.where(ok[:, None], rows_back[pos], 0.0)
        ctx = (src, take, rl, rvalid)
        return rows_u, ctx, dropped

    def _push_pairs(self, state, loc, grads_u, ctx, C: int):
        from ..ops.pair_sweep import apply_pairs

        S = self.S
        U = loc.uids.shape[0]
        D = grads_u.shape[1]
        src, take, rl, rvalid, ab_, aw_, af_ = ctx
        if S == 1:
            vf = loc.valid.astype(jnp.float32)
            pay = jnp.concatenate(
                [
                    jnp.where(loc.valid[None, :], grads_u.T, 0.0),
                    (loc.counts * vf)[None, :],
                    vf[None, :],
                ],
                axis=0,
            )
            return apply_pairs(
                state, loc.uids, pay, (ab_, aw_, af_, None),
                self.updater.param,
                block_rows=self.block_rows, interpret=self.interpret,
            )
        payload = jnp.concatenate([grads_u, loc.counts[:, None]], axis=1)
        send = jnp.where(
            take[:, None], payload[jnp.minimum(src, U - 1)], 0.0
        )
        recv = jax.lax.all_to_all(
            send.reshape(S, C * (D + 1)), "shard", split_axis=0, concat_axis=0,
            tiled=True,
        ).reshape(S * C, D + 1)
        rf = rvalid.astype(jnp.float32)
        # planar gw | gV | add_cnt | touch; a key requested by several
        # sources spans several segments — the apply kernel aggregates all
        # of a block's pairs before its one fused optimizer commit, so the
        # key still updates exactly once with its total gradient
        pay = jnp.concatenate(
            [
                recv[:, :D].T * rf[None, :],
                (recv[:, D] * rf)[None, :],
                rf[None, :],
            ],
            axis=0,
        )
        return apply_pairs(
            state, rl, pay, (ab_, aw_, af_, None), self.updater.param,
            block_rows=self.block_rows, interpret=self.interpret,
        )

    def _prepped_pairs_step(self, state, vals, labels, mask, uids, ucounts,
                            inv, valid, dropped_prep, pb_, pw_, pwf_,
                            ab_, aw_, af_, fields=None, *, capacity):
        loc = Localized(uids=uids, inv=inv, counts=ucounts, valid=valid)
        rows_u, ctx, dropped = self._pull_pairs(
            state, loc, (pb_[0], pw_[0], pwf_[0]), capacity
        )
        grads_u, _, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss=self.loss,
            fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
        )
        state = self._push_pairs(
            state, loc, grads_u, ctx + (ab_[0], aw_[0], af_[0]), capacity
        )
        return state, self._psum_metrics(metrics, dropped + dropped_prep[0])

    def _prepped_pairs_step_sorted(self, state, vals, labels, mask, uids,
                                   ucounts, inv, valid, dropped_prep,
                                   pb_, pw_, pwf_, ab_, aw_, af_,
                                   *rest, capacity):
        """kernel=pairs prepped step with scatter-free worker grads: the
        per-key aggregation runs in the source device's sorted-slot space
        (ops/segsum.py) BEFORE routing — locality identical to the
        scatter path, so pull/all_to_all/apply are untouched. ``rest`` =
        optional fields [B, L] + six stacked sorted-slot arrays +
        slot_sorted for ffm (see _n_sorted_args)."""
        fields = None
        if self.expects_fields:
            fields, *rest = rest
        x_s, bidx, inv_s, st_, sw_, sf_, *ms = rest
        slot_s = ms[0][0] if ms else None
        loc = Localized(uids=uids, inv=inv, counts=ucounts, valid=valid)
        rows_u, ctx, dropped = self._pull_pairs(
            state, loc, (pb_[0], pw_[0], pwf_[0]), capacity
        )
        grads_p, _, metrics = worker_grads_sorted(
            rows_u, loc, vals, labels, mask,
            (x_s[0], bidx[0], inv_s[0], st_[0], sw_[0], sf_[0]),
            loss=self.loss, fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
            slot_s=slot_s,
            interpret=self.interpret,
        )
        state = self._push_pairs(
            state, loc, grads_p.T, ctx + (ab_[0], aw_[0], af_[0]), capacity
        )
        return state, self._psum_metrics(metrics, dropped + dropped_prep[0])

    def _prepped_pairs_eval(self, state, vals, labels, mask, uids, ucounts,
                            inv, valid, dropped_prep, pb_, pw_, pwf_,
                            ab_, aw_, af_, fields=None, *, capacity):
        loc = Localized(uids=uids, inv=inv, counts=ucounts, valid=valid)
        rows_u, _, dropped = self._pull_pairs(
            state, loc, (pb_[0], pw_[0], pwf_[0]), capacity
        )
        _, py, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss=self.loss,
            fields=fields, num_fields=self.num_fields, ffm_block=self.ffm_block,
        )
        return self._psum_metrics(metrics, dropped + dropped_prep[0]), py

    def _count(self, state, ids):
        """Sharded feature-frequency pass: route per-unique counts to the
        owning shard via all_to_all, owner scatter-adds into cnt."""
        loc = localize(ids, self.num_rows, self.unique_size)
        S, C = self.S, self._capacity_for(loc.uids.shape[0])
        pos, ok, _ = self._routing(loc)
        send_ids = (
            jnp.full(S * C + 1, -1, jnp.int32)
            .at[pos]
            .set(jnp.where(ok, loc.uids, -1))[: S * C]
        )
        send_cnt = (
            jnp.zeros(S * C + 1, jnp.float32)
            .at[pos]
            .set(jnp.where(ok, loc.counts, 0.0))[: S * C]
        )
        recv_ids = jax.lax.all_to_all(
            send_ids.reshape(S, C), "shard", split_axis=0, concat_axis=0, tiled=True
        ).reshape(S * C)
        recv_cnt = jax.lax.all_to_all(
            send_cnt.reshape(S, C), "shard", split_axis=0, concat_axis=0, tiled=True
        ).reshape(S * C)
        my_lo = jax.lax.axis_index("shard") * self.rows_per_shard
        rvalid = recv_ids >= 0
        lidx = jnp.where(rvalid, recv_ids - my_lo, 0)
        return self.updater.add_counts(state, lidx, recv_cnt * rvalid)

    def fmstate_placement(self):
        """(ShapeDtypeStruct tree, NamedSharding tree) of the FMState
        (planar) form — the checkpoint interchange layout."""
        shapes = jax.eval_shape(
            lambda: self.updater.init_state(self.num_rows, 0)
        )
        shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), self._fmstate_spec
        )
        return shapes, shardings

    def place_state(self, host_state: FMState):
        n_in = host_state.w.shape[0]
        if n_in < self.hash_rows or n_in > self.num_rows:
            # only the padding region [hash_rows, num_rows) may legally
            # be absent from a checkpoint; fewer rows than the hash space
            # means a num_bits mismatch (or a wrong/stale model file) and
            # zero-filling it would silently train from a mostly-empty
            # table
            raise ValueError(
                f"checkpoint has {n_in} rows; this store's hash space is "
                f"{self.hash_rows} (padded table {self.num_rows}) — "
                f"num_bits mismatch?"
            )
        if n_in < self.num_rows:
            # a checkpoint from an unpadded (or less-padded) table loads
            # into this store's padded layout: padding rows are zeros
            # (they are never hashed into)
            pad = self.num_rows - n_in
            host_state = FMState(
                w=np.pad(np.asarray(host_state.w), (0, pad)),
                z=np.pad(np.asarray(host_state.z), (0, pad)),
                n=np.pad(np.asarray(host_state.n), (0, pad)),
                V=np.pad(np.asarray(host_state.V), ((0, 0), (0, pad))),
                nV=np.pad(np.asarray(host_state.nV), ((0, 0), (0, pad))),
                cnt=np.pad(np.asarray(host_state.cnt), (0, pad)),
            )
        shardings = jax.tree.map(
            lambda s: NamedSharding(self.mesh, s), self._fmstate_spec
        )
        placed = jax.device_put(host_state, shardings)
        if self.layout in ("packed", "stacked"):
            out_sh = jax.tree.map(
                lambda s: NamedSharding(self.mesh, s), self._state_spec
            )
            fn = pack_state if self.layout == "packed" else stack_state
            return jax.jit(fn, out_shardings=out_sh)(placed)
        return placed

    def stats(self, state):
        return jax.jit(self.updater.stats)(state)


def make_store(
    updater: FMUpdater, cfg: Config, mesh: Mesh | None = None, interpret: bool = False
):
    """Store::Create (reference: picks StoreLocal vs StoreDist from env)."""
    kind = cfg.shard.store
    if kind == "auto":
        n = cfg.shard.num_shards or len(jax.devices())
        kind = "sharded" if n > 1 else "local"
    if kind == "local":
        return LocalStore(updater, cfg, interpret=interpret)
    if kind == "sharded":
        return ShardedStore(updater, cfg, mesh, interpret=interpret)
    raise ValueError(f"unknown store {kind!r}")
