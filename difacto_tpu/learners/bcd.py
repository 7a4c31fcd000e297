"""Block coordinate descent learner for the sparse linear model.

Counterpart of the reference's ``src/bcd/bcd_learner.h`` :: BCDLearner +
``bcd_updater.h`` (closed-form proximal coordinate update) +
``src/loss/logit_loss_delta.h`` (cached-prediction delta loss) +
``src/data/tile_store.h``/``tile_builder.h`` (column-block data layout).

Redesign for one SPMD program (SURVEY.md §3.4):

  * PrepareData: the dataset is streamed twice into a DISK tile cache
    (``data/tile_store.py`` — per-feature-block COO tiles, split by row
    shard), so datasets larger than RAM train; tiles are prefetched from
    disk one block ahead of the device;
  * per epoch, blocks are visited in random order; the block step runs
    under ``shard_map`` over a 1D device mesh with examples row-sharded
    (the reference's "parallel over workers within a block"): each
    device scatter-adds its rows' block gradient
    g_j = sum_i x_ij * d_i and curvature h_j = sum_i x_ij^2 * p_i(1-p_i)
    from its cached margins py, psums g/h, and every device applies the
    identical closed-form l1/l2 proximal Newton coordinate update
    u = w_j h_j - g_j;  w_j' = sign(u) max(|u|-l1, 0) / (h_j + l2)
    then folds X_block_shard @ (w' - w) into its py shard — the
    logit_loss_delta trick, making an epoch O(nnz) in any block count;
  * sequential blocks are the reference's implicit barrier;
  * per-epoch validation (data_val) scores the current w streaming and
    reports logloss + exact AUC, like the reference's validation jobs.

Multi-host (round 3, reference: BCDLearner::PrepareData ran on every
worker over its own data part): each process streams its OWN input
parts (the dmlc InputSplit contract, same as the SGD learner) into a
host-local tile store covering its LOCAL devices' row shards; the
global block step is one shard_map over all devices, with tile arrays
placed per-process (make_array_from_process_local_data) and w
replicated. Three scalars are allgathered once after the build so all
processes trace identical shapes (global tile_nnz, rows_per_shard,
example count); block visit order is seed-deterministic, so every
process executes the same collective sequence. Validation and the
train exact-AUC gather (label, score) pairs across processes.

The linear model (V_dim must be 0) matches the reference: BCD exists
for exact-sparsity linear CTR models, FM training uses SGD.
"""

from __future__ import annotations

import logging
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..data.batch_iter import BatchIter
from ..data.tile_store import TileStore, build_tiles
from ..ops.metrics import exact_auc
from ..utils import checkpoint
from ..utils.progress import Progress

log = logging.getLogger("difacto_tpu")


class BCDLearner:
    def __init__(self, cfg: Config, num_blocks: int | None = None):
        assert cfg.model.V_dim == 0, "BCD trains the linear model (V_dim=0)"
        self.cfg = cfg
        self.num_rows = 1 << cfg.data.num_bits
        self.num_blocks = min(
            num_blocks or cfg.learner.bcd_num_blocks, self.num_rows
        )
        self.nproc = jax.process_count()
        n_dev = cfg.shard.num_shards or len(jax.devices())
        self.mesh = jax.make_mesh((n_dev,), ("shard",))
        self.S = n_dev
        assert self.S % self.nproc == 0
        self.n_local = self.S // self.nproc
        self.epoch_callbacks = []
        self._prepare_data()
        self._build_steps()

    # -- PrepareData (reference: kPrepareData + TileBuilder) ----------------

    def _batch_iter(self, uri: str):
        cfg = self.cfg
        # each process reads its own disjoint byte-range parts of every
        # file (dmlc InputSplit; same convention as the SGD learner)
        nppf = max(cfg.data.num_parts_per_file, 1)
        pid = jax.process_index()
        return BatchIter(
            uri,
            batch_size=cfg.data.batch_size,
            max_nnz=cfg.data.max_nnz_per_row,
            num_bits=cfg.data.num_bits,
            data_format=cfg.data.data_format,
            part_index=range(pid * nppf, (pid + 1) * nppf),
            num_parts=self.nproc * nppf,
        )

    def _prepare_data(self) -> None:
        cfg = self.cfg
        tile_dir = cfg.learner.bcd_tile_dir
        if not tile_dir:
            self._tmp = tempfile.TemporaryDirectory(prefix="difacto_tiles_")
            tile_dir = self._tmp.name
        elif self.nproc > 1:
            tile_dir = os.path.join(tile_dir, f"proc{jax.process_index()}")
        # each process builds tiles for its LOCAL devices' row shards
        # from its own input parts (reference: every worker's
        # PrepareData tiles its own data part)
        self.tiles: TileStore = build_tiles(
            lambda: self._batch_iter(cfg.data.data_in),
            tile_dir,
            num_rows=self.num_rows,
            num_blocks=self.num_blocks,
            num_shards=self.n_local,
        )
        self.rows_per_block = self.tiles.rows_per_block
        self.labels = self.tiles.labels
        if self.nproc == 1:
            self.n = self.tiles.n
            self.tile_nnz = self.tiles.tile_nnz
            self.shard_rows = self.tiles.rows_per_shard
        else:
            # agree on global shapes: every process must trace/place
            # identically shaped arrays (one small allgather, build-time)
            from jax.experimental import multihost_utils

            locals_ = np.asarray(multihost_utils.process_allgather(np.array(
                [self.tiles.n, self.tiles.tile_nnz, self.tiles.rows_per_shard],
                np.int64,
            )))
            self.n = int(locals_[:, 0].sum())
            self.tile_nnz = int(locals_[:, 1].max())
            self.shard_rows = int(locals_[:, 2].max())

    # -- block step (reference: kIterateData + BCDUpdater) ------------------

    def _build_steps(self) -> None:
        p = self.cfg.model
        R = self.rows_per_block
        mesh = self.mesh

        def block_step(py, yy, mr, w_blk, tr, tc, tv):
            tr, tc, tv = tr[0], tc[0], tv[0]
            # d = dl/dpy, h = d2l/dpy2 for l = log(1+exp(-y py));
            # pad slots have value 0 and pad rows are never referenced
            sig = jax.nn.sigmoid(py)
            d = (sig - (yy > 0)) * mr
            h = sig * (1.0 - sig) * mr
            g = jax.lax.psum(
                jnp.zeros(R, jnp.float32).at[tc].add(tv * d[tr]), "shard"
            )
            hh = jax.lax.psum(
                jnp.zeros(R, jnp.float32).at[tc].add(tv * tv * h[tr]), "shard"
            )
            u = w_blk * hh - g
            w_new = jnp.sign(u) * jnp.maximum(jnp.abs(u) - p.l1, 0.0) / (hh + p.l2)
            w_new = jnp.where(hh > 0, w_new, w_blk)  # untouched coords keep w
            dw = w_new - w_blk
            py = py + jnp.zeros_like(py).at[tr].add(tv * dw[tc])
            return py, w_new

        self._block_step = jax.jit(
            jax.shard_map(
                block_step,
                mesh=mesh,
                in_specs=(
                    P("shard"), P("shard"), P("shard"), P(),
                    P("shard", None), P("shard", None), P("shard", None),
                ),
                out_specs=(P("shard"), P()),
            ),
            donate_argnums=(0,),
        )

        def metrics(py, yy, mr):
            from ..models.losses import stable_logloss

            loss = stable_logloss(-yy * py) * mr
            correct = ((py > 0) == (yy > 0)).astype(jnp.float32) * mr
            return jnp.sum(loss), jnp.sum(correct)

        self._metrics = jax.jit(metrics)

        def score(w, ids, vals):
            idx = jnp.where(ids >= 0, ids, 0)
            return jnp.sum(vals * w[idx] * (ids >= 0), axis=1)

        self._score = jax.jit(score)

    def _place(self, x, spec):
        sh = NamedSharding(self.mesh, spec)
        if self.nproc > 1:
            # each process contributes its local shards (P('shard')) or
            # its identical full copy (P() replicated)
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    def _local_shards(self, arr) -> np.ndarray:
        """This process's rows of a P('shard') global array, in local
        shard order (= this process's tile store's shard-major order)."""
        if self.nproc == 1:
            return np.asarray(arr)
        shards = sorted(
            arr.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        return np.concatenate([np.asarray(s.data) for s in shards])

    # -- validation (reference: the data_val jobs — pull+predict, no push) --

    def eval_pass(self, w, uri: str) -> Progress:
        from .sgd import SGDLearner

        # score with a process-LOCAL committed copy of w so per-process
        # batches never mix with global arrays under jit. w is replicated
        # (P()), so every process already holds a full copy on its first
        # local device — reuse that shard directly instead of round-
        # tripping the whole table through the host (a device_get of a
        # 2^26 table is 268 MB over this environment's tunneled link).
        w_local = w.addressable_shards[0].data
        pys, ys = [], []
        for batch in self._batch_iter(uri):
            py = np.asarray(self._score(w_local, batch.ids, batch.vals))
            keep = batch.mask > 0
            pys.append(py[keep])
            ys.append(batch.labels[keep])
        y = np.concatenate(ys) if ys else np.zeros(0, np.float32)
        py = np.concatenate(pys) if pys else np.zeros(0, np.float32)
        y, py = SGDLearner._allgather_pairs(y, py)
        yy = np.where(y > 0, 1.0, -1.0).astype(np.float32)
        loss = np.logaddexp(0.0, -yy * py)
        from ..ops.metrics import NUM_AUC_BINS

        prob = 1.0 / (1.0 + np.exp(-np.clip(py, -30.0, 30.0)))
        bins = np.clip((prob * NUM_AUC_BINS).astype(np.int64), 0, NUM_AUC_BINS - 1)
        hist = np.zeros((2, NUM_AUC_BINS), np.float64)
        np.add.at(hist, ((y > 0).astype(np.int64), bins), 1.0)
        prog = Progress(
            num_examples=float(len(y)),
            logloss_sum=float(loss.sum()),
            correct_sum=float(((py > 0) == (y > 0)).sum()),
            label_sum=float(y.sum()),
            pred_sum=float(prob.sum()),
            auc_hist=hist,
        )
        prog.exact_auc = exact_auc(y, py)
        return prog

    # -- driver (reference: BCDLearner::RunScheduler) -----------------------

    def _tile_stream(self, order):
        """Prefetch tiles from the disk cache one block ahead (reference:
        TileStore::Prefetch overlapping fetch with compute)."""
        from ..utils.prefetch import ThreadedIter

        return ThreadedIter(
            (
                (int(b),) + self.tiles.fetch(int(b), tile_nnz=self.tile_nnz)
                for b in order
            ),
            depth=2,
        )

    def run(self) -> Progress:
        from .sgd import SGDLearner

        cfg = self.cfg
        # seed-deterministic block order: every process visits blocks in
        # the same sequence, so the collective order matches (multi-host)
        rng = np.random.default_rng(cfg.data.seed)
        w = self._place(np.zeros(self.num_rows, np.float32), P())
        n_loc = self.n_local * self.shard_rows
        py = self._place(np.zeros(n_loc, np.float32), P("shard"))
        yy = self._place(
            self.tiles.to_shard_order(
                np.where(self.labels > 0, 1.0, -1.0).astype(np.float32),
                fill=-1.0, rows_per_shard=self.shard_rows,
            ),
            P("shard"),
        )
        mr = self._place(
            self.tiles.to_shard_order(
                np.ones(self.tiles.n, np.float32),
                rows_per_shard=self.shard_rows,
            ),
            P("shard"),
        )
        tile_spec = P("shard", None)
        last = Progress()
        for epoch in range(cfg.learner.max_num_epochs):
            for b, tr, tc, tv in self._tile_stream(rng.permutation(self.num_blocks)):
                lo = b * self.rows_per_block
                w_blk = jax.lax.dynamic_slice(w, (lo,), (self.rows_per_block,))
                py, w_new = self._block_step(
                    py, yy, mr, w_blk,
                    self._place(tr, tile_spec),
                    self._place(tc, tile_spec),
                    self._place(tv, tile_spec),
                )
                w = jax.lax.dynamic_update_slice(w, w_new, (lo,))
            loss_sum, correct = self._metrics(py, yy, mr)
            prog = Progress(
                num_examples=float(self.n),
                logloss_sum=float(loss_sum),
                correct_sum=float(correct),
            )
            prog.nnz_w = float(jnp.sum(w != 0))
            y_tr, py_tr = SGDLearner._allgather_pairs(
                self.labels,
                self.tiles.from_shard_order(
                    self._local_shards(py), rows_per_shard=self.shard_rows
                ),
            )
            prog.exact_auc = exact_auc(y_tr, py_tr)
            log.info(
                "bcd epoch %d train: logloss %.6f auc %.6f acc %.4f |w|>0 %d",
                epoch, prog.logloss, prog.exact_auc, prog.accuracy, int(prog.nnz_w),
            )
            if cfg.data.data_val:
                va = self.eval_pass(w, cfg.data.data_val)
                log.info(
                    "bcd epoch %d valid: %s exact_auc %.6f",
                    epoch, va.row(), va.exact_auc,
                )
                va.nnz_w = prog.nnz_w
                prog = va
            for cb in self.epoch_callbacks:
                cb(epoch, prog)
            last = prog
        self.w = w
        if cfg.learner.model_out:
            from ..updaters.updater import FMState

            state = FMState(
                w=w,
                z=jnp.zeros_like(w),
                n=jnp.zeros_like(w),
                V=jnp.zeros((0, self.num_rows), jnp.float32),
                nV=jnp.zeros((0, self.num_rows), jnp.float32),
                cnt=jnp.zeros_like(w),
            )
            checkpoint.save(cfg.learner.model_out, state, {"learner": "bcd"})
        return last
