"""Micro-split of the SORTED backward (round-4 follow-up).

bench.py with segsum=sorted measured only 22.7 ms vs 23.1 scatter — the
10.9 ms scatter became ~8+ ms of sorted-path work. This script times the
replacement's pieces so the regression lands on the measured sub-term.

Run:  timeout 3600 python scripts/hw_segsum_bd.py
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
    from difacto_tpu.data.prep import build_sorted_slots, prep_batch
    from difacto_tpu.ops.segsum import lanes_2d, segsum_sorted

    assert jax.default_backend() == "tpu"
    N = 1 << NUM_BITS
    b = make_batches(1)[0]
    pb = prep_batch(b, N)
    ss = build_sorted_slots(pb.inv, pb.vals, pb.uids.shape[0])
    U = pb.uids.shape[0]
    D = 1 + K
    BLP = ss.inv_sorted.shape[0]
    pp = (D + 7) // 8 * 8
    print(f"U={U} BLP={BLP} seg pairs={ss.seg_tiles.shape[0]}", flush=True)

    put = jax.device_put
    rng = np.random.default_rng(0)
    rows_u = put((rng.normal(size=(U, D)) * 0.01).astype(np.float32))
    S = put((rng.normal(size=(BATCH, K)) * 0.1).astype(np.float32))
    d = put((rng.normal(size=(BATCH,)) * 0.1).astype(np.float32))
    x_s, bidx, inv_s = put(ss.x_sorted), put(ss.bidx), put(ss.inv_sorted)
    tiles, wins, first = (
        put(ss.seg_tiles), put(ss.seg_wins), put(ss.seg_first))
    payT0 = put((rng.normal(size=(pp, BLP)) * 0.01).astype(np.float32))
    pay_row = put((rng.normal(size=(BLP, D)) * 0.01).astype(np.float32))

    fetch = lambda r: float(jax.tree.leaves(r)[0].reshape(-1)[0])

    t_vm = timeit(jax.jit(lambda: rows_u[inv_s]), fetch)          # monotone V
    t_db = timeit(jax.jit(lambda: d[bidx]), fetch)                # d gather
    t_sb = timeit(jax.jit(lambda: S[bidx]), fetch)                # S gather
    t_tr = timeit(jax.jit(
        lambda: jnp.pad(pay_row.T, ((0, pp - D), (0, 0))) * 1.0), fetch)
    t_seg = timeit(jax.jit(lambda: segsum_sorted(
        payT0, lanes_2d(inv_s), (tiles, wins, first), ub=U)), fetch)

    def bwd_sorted():
        dw_s = d[bidx] * x_s
        S_s = S[bidx]
        V_s = rows_u[inv_s][:, 1:]
        dV_s = dw_s[:, None] * (S_s - x_s[:, None] * V_s)
        pay = jnp.concatenate([dw_s[:, None], dV_s], axis=1)
        payT = jnp.pad(pay.T, ((0, pp - D), (0, 0)))
        return segsum_sorted(payT, lanes_2d(inv_s), (tiles, wins, first),
                             ub=U)

    t_bwd = timeit(jax.jit(bwd_sorted), fetch)

    # variant: planar elementwise (no [BLp, D] materialization)
    def bwd_planar():
        dw_s = d[bidx] * x_s                          # [BLP]
        S_sT = S.T[:, bidx]                           # [K, BLP]
        V_sT = rows_u.T[1:, inv_s]                    # [K, BLP]
        dV_sT = dw_s[None, :] * (S_sT - x_s[None, :] * V_sT)
        payT = jnp.concatenate(
            [dw_s[None, :], dV_sT,
             jnp.zeros((pp - D, BLP), jnp.float32)], axis=0)
        return segsum_sorted(payT, lanes_2d(inv_s), (tiles, wins, first),
                             ub=U)

    t_bwd_p = timeit(jax.jit(bwd_planar), fetch)

    print(f"rows_u[inv_sorted] monotone:   {t_vm:7.2f} ms")
    print(f"d[bidx]:                       {t_db:7.2f} ms")
    print(f"S[bidx]:                       {t_sb:7.2f} ms")
    print(f"pay.T + pad:                   {t_tr:7.2f} ms")
    print(f"segsum kernel alone:           {t_seg:7.2f} ms")
    print(f"sorted bwd end-to-end:         {t_bwd:7.2f} ms")
    print(f"sorted bwd planar variant:     {t_bwd_p:7.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
