"""Cumulative composition timing of the SORTED kernel=pairs train step.

The isolated sorted backward measures 2.76 ms (hw_segsum_bd.py) yet the
full step only dropped 23.1 -> 22.7 ms. This times the real step's
prefixes — pull, +fwd, +sorted-bwd, +apply, +metrics — on the real chip
to find where the composition loses the win.

Run:  timeout 3600 python scripts/hw_sorted_step_bd.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, fetch, iters=30):
    fetch(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    fetch(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bench import BATCH, K, NNZ, NUM_BITS, make_batches
    from difacto_tpu.config import Config
    from difacto_tpu.data.prep import build_sorted_slots, prep_batch
    from difacto_tpu.learners.step import _batch_metrics
    from difacto_tpu.models.losses import fm_predict, logit_grad_coeff
    from difacto_tpu.ops.pair_sweep import (
        apply_pairs, build_pair_meta, pull_pairs,
    )
    from difacto_tpu.ops.segsum import lanes_2d, segsum_sorted
    from difacto_tpu.updaters.updater import FMUpdater

    assert jax.default_backend() == "tpu"
    N = 1 << NUM_BITS
    cfg = Config.from_kwargs([
        ("batch_size", str(BATCH)), ("num_bits", str(NUM_BITS)),
        ("max_nnz_per_row", str(NNZ)), ("V_dim", str(K)),
        ("kernel", "pairs"),
    ])
    upd = FMUpdater(cfg.model)
    param = upd.param
    state = jax.device_put(upd.init_state(N, 0))
    b = make_batches(1)[0]
    pb = prep_batch(b, N)
    ss = build_sorted_slots(pb.inv, pb.vals, pb.uids.shape[0])
    m = build_pair_meta(pb.uids, N, 1024)
    U = pb.uids.shape[0]
    D = 1 + K
    pp = (D + 7) // 8 * 8

    put = jax.device_put
    uids, inv, cnts, valid = (
        put(pb.uids), put(pb.inv), put(pb.ucounts), put(pb.valid))
    vals, labels, mask = put(pb.vals), put(pb.labels), put(pb.mask)
    mb, mw, mf, mwf = put(m.blocks), put(m.wins), put(m.first), put(m.wfirst)
    x_s, bidx, inv_s = put(ss.x_sorted), put(ss.bidx), put(ss.inv_sorted)
    stt, stw, stf = (put(ss.seg_tiles), put(ss.seg_wins), put(ss.seg_first))

    fetch = lambda r: float(jax.tree.leaves(r)[0].reshape(-1)[0])
    B, L = BATCH, NNZ

    def pull(s):
        return pull_pairs(s, uids, (mb, mw, None, mwf), param,
                          block_rows=1024)

    def fwd(s):
        rows_p = pull(s)
        rows_u = jnp.where(valid[:, None], rows_p.T, 0.0)
        rows = rows_u[inv].reshape(B, L, D)
        f = fm_predict(vals, rows[..., 0], rows[..., 1:])
        d, loss, correct = logit_grad_coeff(f.py, labels, mask)
        return rows_u, f, d, loss, correct

    def bwd(s):
        # the PRODUCTION sorted backward (learners/step.py)
        from difacto_tpu.learners.step import worker_grads_sorted
        from difacto_tpu.ops.localize import Localized

        rows_p = pull(s)
        rows_u = jnp.where(valid[:, None], rows_p.T, 0.0)
        loc = Localized(uids=uids, inv=inv, counts=cnts, valid=valid)
        grads_p, py, metrics = worker_grads_sorted(
            rows_u, loc, vals, labels, mask,
            (x_s, bidx, inv_s, stt, stw, stf))
        return grads_p, metrics.logloss_sum, None, metrics

    def full(s):
        grads_p, loss, _, metrics = bwd(s)
        vf = valid.astype(jnp.float32)
        payload = jnp.concatenate(
            [jnp.where(valid[None, :], grads_p, 0.0),
             (cnts * vf)[None, :], vf[None, :]], axis=0)
        s2 = apply_pairs(s, uids, payload, (mb, mw, mf, None), param,
                         block_rows=1024)
        return s2.w, loss, metrics

    def full_metrics(s):
        w, loss, metrics = full(s)
        return w, metrics

    jp = jax.jit(pull)
    jf = jax.jit(lambda s: fwd(s)[2])
    jb = jax.jit(lambda s: bwd(s)[0])
    j4 = jax.jit(full)
    j5 = jax.jit(full_metrics)
    t1 = timeit(lambda: jp(state), fetch)
    t2 = timeit(lambda: jf(state), fetch)
    t3 = timeit(lambda: jb(state), fetch)
    t4 = timeit(lambda: j4(state), fetch)
    t5 = timeit(lambda: j5(state), fetch)
    print(f"pull:                  {t1:7.2f} ms")
    print(f"+ fwd (d):             {t2:7.2f} ms  (+{t2 - t1:.2f})")
    print(f"+ sorted bwd (grads):  {t3:7.2f} ms  (+{t3 - t2:.2f})")
    print(f"+ apply (full step):   {t4:7.2f} ms  (+{t4 - t3:.2f})")
    print(f"+ metrics:             {t5:7.2f} ms  (+{t5 - t4:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
