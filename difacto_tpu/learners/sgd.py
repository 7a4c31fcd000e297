"""Synchronous minibatch SGD learner.

Counterpart of the reference's ``src/sgd/sgd_learner.h`` :: SGDLearner.
Structural redesign (SURVEY.md §2.3, BASELINE.json north star): the
reference's scheduler/worker/server process group with asynchronous
bounded-delay minibatches becomes a single SPMD program — the scheduler's
job queue is program order, the bounded-staleness pipeline is host-side
prefetch overlapping device steps (staleness 0), and the per-batch
Pull -> Predict/CalcGrad -> Push worker loop is one jitted train step.

Per-epoch flow mirrors RunScheduler/RunEpoch: optional feature-count pass
(tail_feature_filter), train pass over data_in, validation pass over
data_val (pull + predict only, no push), epoch-end callbacks, model save.
"""

from __future__ import annotations

import logging
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.batch_iter import Batch, BatchIter
from ..ops.metrics import exact_auc
from ..parallel.store import make_store
from ..updaters.updater import FMUpdater
from ..utils import checkpoint
from ..utils.prefetch import ThreadedIter
from ..utils.progress import Progress, Reporter

log = logging.getLogger("difacto_tpu")

@jax.jit
def _merge_metrics(a, b):
    return jax.tree.map(jnp.add, a, b)


class _Reservoir:
    """Uniform reservoir sample of (label, score) pairs (Vitter's
    Algorithm R, vectorized per batch: item ``i`` (0-based global index)
    is accepted with probability cap/(i+1) into a uniform slot — each
    item's decision is independent of the others', so a whole batch's
    draws vectorize). Until the cap is reached it is an exact copy."""

    def __init__(self, cap: int, seed: int):
        self.cap = cap
        self.n_seen = 0
        self.truncated = False
        self._rng = np.random.default_rng((seed + 1) * 0x9E3779B9)
        self._y = np.empty(cap, np.float32)
        self._p = np.empty(cap, np.float32)

    def add(self, y: np.ndarray, p: np.ndarray) -> None:
        k = len(y)
        fill = min(max(self.cap - self.n_seen, 0), k)
        if fill:
            self._y[self.n_seen : self.n_seen + fill] = y[:fill]
            self._p[self.n_seen : self.n_seen + fill] = p[:fill]
        if fill < k:
            self.truncated = True
            idx = self.n_seen + fill + np.arange(k - fill, dtype=np.int64)
            accept = self._rng.random(k - fill) < self.cap / (idx + 1)
            slots = self._rng.integers(0, self.cap, size=k - fill)
            sel = np.flatnonzero(accept)
            self._y[slots[sel]] = y[fill:][sel]
            self._p[slots[sel]] = p[fill:][sel]
        self.n_seen += k

    def sample(self) -> tuple[np.ndarray, np.ndarray]:
        n = min(self.n_seen, self.cap)
        return self._y[:n], self._p[:n]


class SGDLearner:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        # ffm stores F*k factors per feature in the same planar table
        self.updater = FMUpdater(cfg.effective_model_param())
        self.store = make_store(self.updater, cfg)
        # host localization (data/prep.py) serves BOTH stores: LocalStore
        # gets one global unique set, ShardedStore one per device shard
        self._host_localize = bool(cfg.data.host_localize)
        self.reporter = Reporter(cfg.learner.report_interval)
        self.epoch_callbacks: list[Callable[[int, Progress], None]] = []
        # reference DataStore: cache processed batches across epochs
        self._batch_cache: dict[str, list] = {}
        self._epoch = 0
        self._resume_step = 0  # batches already consumed in self._epoch
        # hot/cold frequency remap (data/remap.py + HotColdFMState): a
        # host count pass over the first hot_count_batches builds the
        # per-run row relabeling BEFORE any state exists (checkpoints
        # stay canonical; the lut never needs to match a previous run's)
        self._hot_remap = None
        if getattr(self.store, "hot_rows", 0):
            if not self._host_localize:
                raise ValueError(
                    "hot_rows needs host_localize=1 (the remap and the "
                    "hot/cold bucket split are host-side prep work)"
                )
            from ..data.remap import build_remap, count_sample

            cnt = count_sample(
                self._iter(cfg.data.data_in, shuffle=False, localize=False),
                self.store.num_rows,
                cfg.shard.hot_count_batches,
            )
            self._hot_remap = build_remap(cnt, self.store.hot_rows)
            self.store.set_remap(self._hot_remap)
            log.info(
                "hot remap built: head %d of %d rows (%.1f%% of sampled "
                "slots)", self.store.hot_rows, self.store.num_rows,
                100.0 * cnt[np.argpartition(
                    cnt, -self.store.hot_rows)[-self.store.hot_rows:]].sum()
                / max(cnt.sum(), 1),
            )
        if cfg.learner.model_in:
            self.state, meta = checkpoint.load_for_store(
                cfg.learner.model_in, self.store
            )
            self._epoch = int(meta.get("epoch", 0))
            self._resume_step = int(meta.get("step", 0))
            log.info(
                "loaded model from %s (epoch %d, step %d)",
                cfg.learner.model_in, self._epoch, self._resume_step,
            )
        else:
            self.state = self.store.init_state(cfg.data.seed)

    # -- data ---------------------------------------------------------------

    def _iter(
        self, uri: str, shuffle: bool, localize: bool | None = None, epoch: int = 0
    ):
        d = self.cfg.data
        # cache key covers everything that changes batch content/order;
        # the raw count-pass stream (localize=False) is never cached (it
        # runs once and would pin a second copy of the dataset in RAM)
        cache_key = (
            f"{uri}|{localize}|{shuffle}"
            if d.cache_batches and localize is not False
            else None
        )
        if cache_key is not None and cache_key in self._batch_cache:
            placed, items = self._batch_cache[cache_key]
            if placed:
                return iter(items)  # already device-resident
            return self._place_iter(iter(items))
        if cache_key is not None:
            # the cache fixes one batch order for every epoch (the
            # reference's DataStore reuses the same compacted batches too)
            epoch = 0
        # multi-host: each process reads a disjoint byte-range part of
        # every file (the dmlc InputSplit contract)
        import jax as _jax

        pid, nproc = _jax.process_index(), _jax.process_count()
        # total parts = hosts x num_parts_per_file; this host owns a
        # contiguous range of them (reference: every (file, part) pair is
        # a job; parts are record-aligned byte ranges)
        nppf = max(d.num_parts_per_file, 1)
        # batch_size is the GLOBAL batch: with multiple processes each
        # loader produces its 1/nproc slice of every step's batch
        assert d.batch_size % nproc == 0, "process count must divide batch_size"
        it = BatchIter(
            uri,
            batch_size=d.batch_size // nproc,
            max_nnz=d.max_nnz_per_row,
            num_bits=d.num_bits,
            data_format=d.data_format,
            part_index=range(pid * nppf, (pid + 1) * nppf),
            num_parts=nproc * nppf,
            shuffle=shuffle and d.shuffle,
            # epoch-dependent seed: each epoch must shuffle differently AND
            # a resumed run must reproduce the interrupted epoch's order
            seed=d.seed + epoch,
            batch_workers=d.batch_workers,
        )
        src = iter(it)
        # the STORE's table rows (>= 2^num_bits: the sharded table pads
        # up so any shard count divides it; hashing stays in 2^num_bits)
        num_rows = self.store.num_rows
        # libffm field ids are range-checked during prep, while still
        # host numpy (the prepped paths device-place batches before the
        # store's own validation would see them)
        nf = self.cfg.model.num_fields if self.cfg.expects_fields() else 0
        # ffm's sorted backward additionally needs the sort permutation
        # (SortedSlots.slot_sorted) for its per-slot payload gather
        want_slots = self.cfg.learner.loss == "ffm"
        fn = None
        if localize is False:
            pass
        elif self._host_localize if localize is None else localize:
            from ..parallel.store import ShardedStore

            if isinstance(self.store, ShardedStore):
                from ..data.prep import prep_batch_sharded

                # prep covers this process's rows over its LOCAL devices;
                # multi-process runs pin the bucket so all processes trace
                # identical shapes (overflow is counted, never silent)
                n_local = jax.local_device_count()
                fixed = self.store.unique_size if nproc > 1 else None
                if getattr(self.store, "pairs", False):
                    # kernel=pairs: build the per-owner pair schedules in
                    # the prep workers too, overlapped with device steps
                    # (single-process only: multi-process schedules need a
                    # process_allgather — a collective, so the STORE
                    # builds them on the main thread in lockstep step
                    # order, never here). The sorted-slot arrays for the
                    # scatter-free grad aggregation are purely local (the
                    # per-key sums happen before routing) — built here at
                    # ANY process count.
                    from ..data.prep import (
                        build_shard_pair_metas, build_sorted_slots_sharded,
                    )

                    store = self.store
                    want_sorted = getattr(store, "sorted_grads", False)

                    def fn(b):
                        pb = prep_batch_sharded(
                            b, num_rows, n_local, fixed_ub=fixed,
                            num_fields=nf,
                        )
                        if nproc == 1:
                            pb.pair_metas = build_shard_pair_metas(
                                pb, num_rows, store.pairs_capacity(pb),
                                store.block_rows,
                            )
                        if want_sorted:
                            pb.sorted_slots = build_sorted_slots_sharded(
                                pb, with_slots=want_slots
                            )
                        return pb
                else:
                    fn = lambda b: prep_batch_sharded(
                        b, num_rows, n_local, fixed_ub=fixed, num_fields=nf
                    )
            else:
                from ..data.prep import prep_batch

                # explicit unique_size floors the bucket: one jit/Mosaic
                # specialization for the whole run instead of per-batch
                # bucket churn (kernel compiles cost minutes on the
                # remote compile service — BENCH.md)
                min_ub = self.cfg.shard.unique_size or None
                # hot/cold frequency split: prep relabels rows and packs
                # split unique buckets (data/remap.py, HotColdFMState)
                hot = getattr(self.store, "hot_rows", 0)
                remap = self._hot_remap
                if getattr(self.store, "pairs", False):
                    # kernel=pairs: build the (block, window) pair schedule
                    # — and the sorted-slot arrays for the scatter-free
                    # grad aggregation — in the prep workers too,
                    # overlapped with device steps
                    from ..data.prep import build_sorted_slots
                    from ..ops.pair_sweep import build_pair_meta

                    br = self.store.block_rows
                    want_sorted = getattr(self.store, "sorted_grads", False)

                    def fn(b):
                        pb = prep_batch(
                            b, num_rows, min_ub=min_ub, num_fields=nf
                        )
                        pb.pair_meta = build_pair_meta(pb.uids, num_rows, br)
                        if want_sorted:
                            pb.sorted_slots = build_sorted_slots(
                                pb.inv, pb.vals, pb.uids.shape[0],
                                with_slots=want_slots,
                            )
                        return pb
                elif getattr(self.store, "sorted_grads", False):
                    # kernel=xla + sorted segment-sum aggregation: build
                    # the sorted-slot arrays in the prep workers too
                    from ..data.prep import build_sorted_slots

                    compact = self.cfg.data.cache_compact

                    def fn(b):
                        pb = prep_batch(
                            b, num_rows, min_ub=min_ub, num_fields=nf,
                            remap=remap, hot_rows=hot,
                        )
                        pb.sorted_slots = build_sorted_slots(
                            pb.inv, pb.vals, pb.uids.shape[0],
                            with_slots=want_slots, compact=compact,
                        )
                        return pb
                else:
                    fn = lambda b: prep_batch(
                        b, num_rows, min_ub=min_ub, num_fields=nf,
                        remap=remap, hot_rows=hot,
                    )
        # prep_workers=0 -> auto: leave cores for the parse thread, the
        # batchify pool and the main thread — oversubscribing a small
        # host HALVES ingest (measured, BENCH.md round 3)
        pw = d.prep_workers or min(4, max(1, (os.cpu_count() or 4) - 2))
        if fn is not None and pw > 1:
            from ..utils.prefetch import MappedPrefetchIter

            # parse runs in its own thread; prep fans out to a pool
            out = MappedPrefetchIter(
                ThreadedIter(src, depth=4), fn, workers=pw
            )
        else:
            out = ThreadedIter(map(fn, src) if fn is not None else src, depth=4)
        if nproc > 1:
            # SPMD lockstep: every step is a global collective, so all
            # processes must execute the same number of steps per pass.
            # Input parts can yield unequal batch counts (byte-range
            # splits are approximate) — exhausted processes pad with
            # empty (fully masked) batches until everyone is done.
            def make_empty():
                b = Batch(
                    np.full(
                        (d.batch_size // nproc, d.max_nnz_per_row), -1, np.int32
                    ),
                    np.zeros((d.batch_size // nproc, d.max_nnz_per_row), np.float32),
                    np.zeros(d.batch_size // nproc, np.float32),
                    np.zeros(d.batch_size // nproc, np.float32),
                    fields=(
                        np.zeros(
                            (d.batch_size // nproc, d.max_nnz_per_row), np.int32
                        )
                        if d.data_format == "libffm" else None
                    ),
                )
                return fn(b) if fn is not None else b

            out = self._lockstep(out, make_empty)
        if cache_key is not None:
            # fill the cache lazily so epoch 0 still streams (prep
            # overlapped with device steps); complete at exhaustion.
            # cache_on_device caches the PLACED batches, so later epochs
            # re-read from HBM instead of re-paying the host->device
            # link (which caps this environment's tunneled chip at ~100k
            # ex/s end-to-end); the dataset's batches must fit in HBM
            place_first = d.cache_on_device and self._placing()
            stream = self._place_iter(out) if place_first else out

            def caching():
                acc = []
                for item in stream:
                    acc.append(item)
                    yield item
                self._batch_cache[cache_key] = (place_first, acc)

            return caching() if place_first else self._place_iter(caching())
        return self._place_iter(out)

    def _placing(self) -> bool:
        """Whether _place_iter actively places (single-device stores
        only; ShardedStore places per step with mesh shardings)."""
        from ..parallel.store import LocalStore

        return isinstance(self.store, LocalStore)

    def _place_iter(self, it):
        """Move batches to the device one step ahead of consumption.
        ``jax.device_put`` is async and the wrapping prefetch thread
        runs ahead, so the host->device transfer of batch t+1 overlaps
        device compute of batch t (the reference's worker keeps
        minibatches in process RAM next to the compute; measured here: a
        slow host link turns a 40 ms device-resident step into a 136 ms
        host-fed one — BENCH.md round 2)."""
        if not self._placing():
            return it
        from ..utils.place import place_batch

        return ThreadedIter(map(place_batch, it), depth=2)

    @staticmethod
    def _lockstep(it, make_empty):
        """Yield items in lockstep across processes: each iteration, every
        process reports whether it still has data (host allgather); the
        pass ends only when ALL are exhausted, and early-exhausted
        processes yield empty batches so the global collectives line up.
        (The reference tolerated stragglers via async per-part jobs; a
        synchronous SPMD program needs equal step counts instead.)"""
        from jax.experimental import multihost_utils

        it = iter(it)
        while True:
            try:
                item = next(it)
                have = 1
            except StopIteration:
                item = None
                have = 0
            flags = np.asarray(
                multihost_utils.process_allgather(np.array(have, np.int32))
            )
            if int(flags.sum()) == 0:
                return
            yield item if item is not None else make_empty()

    # -- passes (reference: SGDLearner::RunEpoch / IterateData) -------------

    def count_pass(self) -> None:
        """Feature-frequency pass before training (reference: the
        kFeaCount push pass enabling tail_feature_filter)."""
        n = 0
        for batch in self._iter(self.cfg.data.data_in, shuffle=False, localize=False):
            ids = batch.ids
            if self._hot_remap is not None:
                # the split state is addressed in remapped row space; the
                # raw count stream must be relabeled the same way prep is
                from ..data.remap import apply_remap

                ids = apply_remap(ids, self._hot_remap)
            args = self.store.shard_batch(
                ids, batch.vals, batch.labels, batch.mask, batch.fields
            )
            self.state = self.store.count_step(self.state, args[0])
            n += 1
        log.info("count pass done (%d batches)", n)

    def train_epoch(self, epoch: int) -> Progress:
        from ..utils.tracing import profile_region

        cfg = self.cfg
        prog = Progress()
        self.reporter.reset()
        acc = None
        step = 0
        skip = self._resume_step if epoch == self._epoch else 0
        if skip:
            log.info("resuming epoch %d at step %d", epoch, skip)
        with profile_region(f"train_epoch_{epoch}"):
            for batch in self._iter(cfg.data.data_in, shuffle=True, epoch=epoch):
                if step < skip:
                    step += 1
                    continue
                if self._host_localize:
                    self.state, metrics = self.store.train_step_prepped(
                        self.state, batch
                    )
                else:
                    args = self.store.shard_batch(
                        batch.ids, batch.vals, batch.labels, batch.mask,
                        batch.fields,
                    )
                    self.state, metrics = self.store.train_step(self.state, *args)
                acc = metrics if acc is None else _merge_metrics(acc, metrics)
                step += 1
                if self.reporter.interval > 0 and step % self.reporter.interval == 0:
                    self._fold(prog, acc)
                    acc = None
                    self.reporter.maybe_report(step, prog, prefix=f"epoch {epoch} ")
                si = cfg.learner.save_interval_steps
                if cfg.learner.model_out and si > 0 and step % si == 0:
                    checkpoint.save(
                        cfg.learner.model_out, self.state,
                        {"epoch": epoch, "step": step},
                        remap_lut=getattr(self.store, "hot_lut", None),
                    )
        if acc is not None:
            self._fold(prog, acc)
        if hasattr(self.store, "pin_capacity"):
            # epoch boundary: pin the pairs all_to_all capacity to the
            # exact W-aligned maximum this epoch needed — later batches
            # land on ONE tight capacity instead of a ~1.5x ladder rung
            # (store._cap_resolve; BENCH.md r4 queue #4). Deterministic
            # across processes (fed by the lockstep per-step allgather),
            # and called at the same point of every process's epoch.
            self.store.pin_capacity()
        st = self.store.stats(self.state)
        prog.nnz_w = float(st["nnz_w"])
        prog.nnz_V = float(st["nnz_V"])
        return prog

    @staticmethod
    def _local_scores(py) -> np.ndarray:
        """This process's rows of a (possibly cross-process sharded) score
        vector, in local batch-row order."""
        if jax.process_count() == 1:
            return np.asarray(py)
        shards = sorted(
            py.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards])

    @staticmethod
    def _allgather_pairs(y: np.ndarray, p: np.ndarray):
        """Gather (label, score) pairs from every process (per-process
        lengths may differ: pad to the max, mark pads with label NaN —
        real labels are finite 0/1 or -1/+1 file values, so a sign test
        would drop genuine negatives; NaN can never be a label)."""
        if jax.process_count() == 1:
            return y, p
        from jax.experimental import multihost_utils

        counts = np.asarray(
            multihost_utils.process_allgather(np.array(len(y), np.int64))
        )
        m = int(counts.max())
        ypad = np.full(m, np.nan, np.float32)
        ppad = np.zeros(m, np.float32)
        ypad[: len(y)] = y
        ppad[: len(p)] = p
        yg = np.asarray(multihost_utils.process_allgather(ypad)).reshape(-1)
        pg = np.asarray(multihost_utils.process_allgather(ppad)).reshape(-1)
        keep = ~np.isnan(yg)
        return yg[keep], pg[keep]

    def eval_pass(self, uri: str) -> Progress:
        prog = Progress()
        acc = None
        # (label, score) pairs are host-collected for the exact AUC up to
        # a cap; past it a uniform RESERVOIR sample of cap pairs replaces
        # the collection (a prefix of a time-/file-ordered eval stream
        # would be a biased sample). The streaming binned AUC (additive,
        # psum-replicated) always covers the full pass.
        cap = self.cfg.learner.exact_auc_cap
        res = None
        if cap > 0:
            local_cap = max(cap // jax.process_count(), 1)
            res = _Reservoir(local_cap, self.cfg.data.seed)
        for batch in self._iter(uri, shuffle=False):
            if self._host_localize:
                metrics, py = self.store.eval_step_prepped(self.state, batch)
            else:
                args = self.store.shard_batch(
                    batch.ids, batch.vals, batch.labels, batch.mask,
                    batch.fields,
                )
                metrics, py = self.store.eval_step(self.state, *args)
            acc = metrics if acc is None else _merge_metrics(acc, metrics)
            if res is not None:
                keep = np.asarray(batch.mask) > 0
                res.add(
                    np.asarray(batch.labels)[keep],
                    self._local_scores(py)[keep],
                )
        if acc is not None:
            self._fold(prog, acc)
        if res is not None and (jax.process_count() > 1 or res.n_seen):
            y, p = self._allgather_pairs(*res.sample())
            if len(y):
                prog.exact_auc = exact_auc(y, p)
                prog.exact_auc_truncated = res.truncated
                prog.exact_auc_n = len(y)
                prog.exact_auc_of = int(prog.num_examples)
                if res.truncated:
                    log.info(
                        "exact AUC computed on a uniform reservoir sample "
                        "of %d of %d examples (cap %d, config knob "
                        "exact_auc_cap); the streaming binned `auc` column "
                        "covers the full pass exactly (error bound %.2e)",
                        len(y), prog.exact_auc_of, cap,
                        prog.auc_error_bound,
                    )
        return prog

    @staticmethod
    def _fold(prog: Progress, acc) -> None:
        m = jax.device_get(acc)
        prog.merge(
            Progress(
                num_examples=float(m.examples),
                logloss_sum=float(m.logloss_sum),
                correct_sum=float(m.correct_sum),
                label_sum=float(m.label_sum),
                pred_sum=float(m.pred_sum),
                auc_hist=np.asarray(m.auc_hist, dtype=np.float64),
            )
        )
        if float(m.dropped_ids):
            log.warning("routing capacity overflow: %d ids dropped", int(m.dropped_ids))

    # -- driver (reference: SGDLearner::RunScheduler) -----------------------

    def run(self) -> Progress:
        cfg = self.cfg
        if cfg.model.tail_feature_filter > 0 and not cfg.learner.model_in:
            self.count_pass()
        last = Progress()
        for epoch in range(self._epoch, cfg.learner.max_num_epochs):
            tr = self.train_epoch(epoch)
            log.info("epoch %d train: %s", epoch, tr.row())
            if cfg.data.data_val:
                va = self.eval_pass(cfg.data.data_val)
                auc = getattr(va, "exact_auc", None) or va.auc
                sampled = (
                    " (over %d of %d sampled)" % (va.exact_auc_n, va.exact_auc_of)
                    if va.exact_auc_truncated else ""
                )
                log.info(
                    "epoch %d valid: %s exact_auc %.6f%s",
                    epoch, va.row(), auc, sampled,
                )
                last = va
            else:
                last = tr
            for cb in self.epoch_callbacks:
                cb(epoch, last)
            if cfg.learner.model_out and (
                (epoch + 1) % cfg.learner.save_interval_epochs == 0
                or epoch + 1 == cfg.learner.max_num_epochs
            ):
                path = checkpoint.save(
                    cfg.learner.model_out, self.state,
                    {"epoch": epoch + 1, "step": 0},
                    remap_lut=getattr(self.store, "hot_lut", None),
                )
                log.info("saved model to %s", path)
        return last

    def predict(self, uri: str) -> tuple[np.ndarray, np.ndarray]:
        """Batch prediction: returns (scores, labels) for all rows
        (reference: the validation/pred flow with model_in + no training)."""
        pys, ys = [], []
        for batch in self._iter(uri, shuffle=False):
            if self._host_localize:
                _, py = self.store.eval_step_prepped(self.state, batch)
            else:
                args = self.store.shard_batch(
                    batch.ids, batch.vals, batch.labels, batch.mask,
                    batch.fields,
                )
                _, py = self.store.eval_step(self.state, *args)
            keep = np.asarray(batch.mask) > 0
            pys.append(self._local_scores(py)[keep])
            ys.append(np.asarray(batch.labels)[keep])
        if not pys:  # a process whose input part held no rows
            return np.zeros(0, np.float32), np.zeros(0, np.float32)
        return np.concatenate(pys), np.concatenate(ys)
