"""Variants to kill the composed-gather penalty in the sorted backward.

hw_bwd_prefix.py: d[bidx] costs +4.68 ms in-graph (0.99 isolated),
S[bidx] +2.76 (1.02 isolated). Tests: (A) optimization_barrier on (d, S)
before the gathers; (B) ONE combined [B, 1+K] row gather; (C) both.

Run:  timeout 2400 python scripts/hw_bwd_variants.py
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

    def finish(rows_u, pay):
        payT = jnp.pad(pay.T, ((0, 24 - pay.shape[1]), (0, 0)))
        segs = segsum_sorted(payT, lanes_2d(inv_s), (stt, stw, stf), ub=U)
        gV = segs[2 : 2 + K] - rows_u.T[1:] * segs[1][None, :]
        return jnp.sum(gV[0]) + jnp.sum(segs[0])

    def var_base(s):
        rows_u, f, d = common(s)
        dw_s = d[bidx] * x_s
        pay = jnp.concatenate(
            [dw_s[:, None], (dw_s * x_s)[:, None],
             dw_s[:, None] * f.S[bidx]], axis=1)
        return finish(rows_u, pay)

    def var_barrier(s):
        rows_u, f, d = common(s)
        d, S = jax.lax.optimization_barrier((d, f.S))
        dw_s = d[bidx] * x_s
        pay = jnp.concatenate(
            [dw_s[:, None], (dw_s * x_s)[:, None],
             dw_s[:, None] * S[bidx]], axis=1)
        return finish(rows_u, pay)

    def var_onegather(s):
        rows_u, f, d = common(s)
        dS = jnp.concatenate([d[:, None], f.S], axis=1)      # [B, 1+K]
        g = dS[bidx]                                         # [BLp, 1+K]
        dw_s = g[:, 0] * x_s
        pay = jnp.concatenate(
            [dw_s[:, None], (dw_s * x_s)[:, None],
             dw_s[:, None] * g[:, 1:]], axis=1)
        return finish(rows_u, pay)

    def var_both(s):
        rows_u, f, d = common(s)
        dS = jax.lax.optimization_barrier(
            jnp.concatenate([d[:, None], f.S], axis=1))
        g = dS[bidx]
        dw_s = g[:, 0] * x_s
        pay = jnp.concatenate(
            [dw_s[:, None], (dw_s * x_s)[:, None],
             dw_s[:, None] * g[:, 1:]], axis=1)
        return finish(rows_u, pay)

    names = ["base", "barrier", "one-gather", "both"]
    fns = [var_base, var_barrier, var_onegather, var_both]
    outs = []
    for name, f in zip(names, fns):
        j = jax.jit(f)
        t = timeit(lambda: j(state), fetch)
        outs.append(float(j(state)))
        print(f"{name:12s} {t:7.2f} ms", flush=True)
    ref = outs[0]
    for name, o in zip(names, outs):
        assert abs(o - ref) < 1e-3 * max(1.0, abs(ref)), (name, o, ref)
    print("all variants numerically consistent")
    return 0


if __name__ == "__main__":
    sys.exit(main())
