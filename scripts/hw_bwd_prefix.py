"""Prefix timing INSIDE the composed sorted backward (round-4 drill).

The sorted bwd costs +9.2 ms composed vs ~5-6 isolated-parts sum. Times
real-graph prefixes (each jit includes pull + fwd, the common prefix
measured at 6.16 ms) to locate the composed fat: d-gather, S-gather +
payload build, transpose, segsum.

Run:  timeout 2400 python scripts/hw_bwd_prefix.py
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
    from difacto_tpu.models.losses import fm_predict, logit_grad_coeff
    from difacto_tpu.ops.pair_sweep import build_pair_meta, pull_pairs
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

    put = jax.device_put
    uids, inv, valid = put(pb.uids), put(pb.inv), put(pb.valid)
    vals, labels, mask = put(pb.vals), put(pb.labels), put(pb.mask)
    mb, mw, mwf = put(m.blocks), put(m.wins), put(m.wfirst)
    x_s, bidx, inv_s = put(ss.x_sorted), put(ss.bidx), put(ss.inv_sorted)
    stt, stw, stf = put(ss.seg_tiles), put(ss.seg_wins), put(ss.seg_first)
    fetch = lambda r: float(jax.tree.leaves(r)[0].reshape(-1)[0])
    B, L = BATCH, NNZ

    def common(s):
        rows_p = pull_pairs(s, uids, (mb, mw, None, mwf), param,
                            block_rows=1024)
        rows_u = jnp.where(valid[:, None], rows_p.T, 0.0)
        rows = rows_u[inv].reshape(B, L, D)
        f = fm_predict(vals, rows[..., 0], rows[..., 1:])
        d, loss, correct = logit_grad_coeff(f.py, labels, mask)
        return rows_u, f, d

    def pfx_d(s):
        _, _, d = common(s)
        dw_s = d[bidx] * x_s
        return jnp.sum(dw_s)

    def pfx_pay(s):
        _, f, d = common(s)
        dw_s = d[bidx] * x_s
        pay = jnp.concatenate(
            [dw_s[:, None], (dw_s * x_s)[:, None],
             dw_s[:, None] * f.S[bidx]], axis=1)
        return jnp.sum(pay[:, -1])

    def pfx_payT(s):
        _, f, d = common(s)
        dw_s = d[bidx] * x_s
        pay = jnp.concatenate(
            [dw_s[:, None], (dw_s * x_s)[:, None],
             dw_s[:, None] * f.S[bidx]], axis=1)
        payT = jnp.pad(pay.T, ((0, 24 - pay.shape[1]), (0, 0)))
        return jnp.sum(payT[0])

    def pfx_seg(s):
        rows_u, f, d = common(s)
        dw_s = d[bidx] * x_s
        pay = jnp.concatenate(
            [dw_s[:, None], (dw_s * x_s)[:, None],
             dw_s[:, None] * f.S[bidx]], axis=1)
        payT = jnp.pad(pay.T, ((0, 24 - pay.shape[1]), (0, 0)))
        segs = segsum_sorted(payT, lanes_2d(inv_s), (stt, stw, stf), ub=U)
        gV = segs[2 : 2 + K] - rows_u.T[1:] * segs[1][None, :]
        return jnp.sum(gV[0])

    j0 = jax.jit(lambda s: common(s)[2])
    j1, j2, j3, j4 = (jax.jit(f) for f in (pfx_d, pfx_pay, pfx_payT, pfx_seg))
    t0 = timeit(lambda: j0(state), fetch)
    t1 = timeit(lambda: j1(state), fetch)
    t2 = timeit(lambda: j2(state), fetch)
    t3 = timeit(lambda: j3(state), fetch)
    t4 = timeit(lambda: j4(state), fetch)
    print(f"pull+fwd (common):        {t0:7.2f} ms")
    print(f"+ dw_s = d[bidx]*x:       {t1:7.2f} ms  (+{t1 - t0:.2f})")
    print(f"+ pay (S[bidx], concat):  {t2:7.2f} ms  (+{t2 - t1:.2f})")
    print(f"+ transpose+pad:          {t3:7.2f} ms  (+{t3 - t2:.2f})")
    print(f"+ segsum + combine:       {t4:7.2f} ms  (+{t4 - t3:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
