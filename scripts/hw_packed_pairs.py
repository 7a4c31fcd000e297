"""Experiment: PACKED-planar state for the pair kernels (DMA-count probe).

The apply kernel moves 14 HBM<->VMEM streams per grid step (w/z/n/cnt
blocks are 4 KB each — tiny DMAs), the pull kernel 6. Hypothesis: per-
stream issue overhead, not bytes, holds the kernels at ~25% of HBM peak
(apply 6.5-7.6 ms, pull 3.7 ms at 5120 pairs). This packs the state as
two planar arrays

    A [2+K, N] = w | cnt | V      (the PULL working set)
    B [2+K, N] = z | n  | nV      (the extra APPLY state)

so pull reads ONE A-block per pair and apply moves A+B in / A+B out
(aliased) — 2-4 streams instead of 14. Measures packed vs current
kernels on the flagship shape and checks bit-equality.

Run:  timeout 3600 python scripts/hw_packed_pairs.py [interpret]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

INTERPRET = len(sys.argv) > 1 and sys.argv[1] == "interpret"


def timeit(fn, fetch, iters=30):
    if INTERPRET:  # correctness-only: interpreted grids are minutes/iter
        return float("nan")
    fetch(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    fetch(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if INTERPRET:
        jax.config.update("jax_platforms", "cpu")

    from bench import BATCH, K, NNZ, NUM_BITS, make_batches
    from difacto_tpu.config import Config
    from difacto_tpu.data.prep import prep_batch
    from difacto_tpu.ops.pair_sweep import (
        _selT, apply_pairs, build_pair_meta, pull_pairs,
    )
    from difacto_tpu.ops.sweep_ms import fused_table_update
    from difacto_tpu.updaters.updater import FMUpdater

    if not INTERPRET:
        assert jax.default_backend() == "tpu"
    if INTERPRET:  # tiny shapes for the CPU correctness pass
        import bench

        bench.BATCH = 512
        bench.NUM_BITS = 13
    from bench import BATCH, NUM_BITS  # re-read (possibly shrunk)

    N = 1 << NUM_BITS
    R = 1024  # block_rows
    W = 128
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
    m = build_pair_meta(pb.uids, N, R)
    U = pb.uids.shape[0]
    P2 = 2 + K  # packed row count (w|cnt|V and z|n|nV)
    print(f"U={U} pairs={m.blocks.shape[0]} packed rows={P2}", flush=True)

    put = jax.device_put
    uids = put(pb.uids)
    mb, mw, mf, mwf = put(m.blocks), put(m.wins), put(m.first), put(m.wfirst)
    # packed state (resident; a production layout would LIVE like this)
    A = put(jnp.concatenate(
        [state.w[None], state.cnt[None], state.V], axis=0))  # [2+K, N]
    Bst = put(jnp.concatenate(
        [state.z[None], state.n[None], state.nV], axis=0))
    uw = jnp.broadcast_to(
        jnp.concatenate([put(pb.uids), jnp.full((W,), N, jnp.int32)])[None, :],
        (8, U + W))

    fetch = lambda r: float(jax.tree.leaves(r)[0].reshape(-1)[0])
    dp = (1 + K + 7) // 8 * 8

    # -- packed pull: ONE [2+K, R] state stream per pair ------------------
    def pull_packed_kernel(blocks_ref, wins_ref, wfirst_ref, uidw_ref,
                           a_ref, out_ref, *, vt: float):
        i = pl.program_id(0)
        base = blocks_ref[i] * R
        selT = _selT(uidw_ref, base, R)                  # [R, W]
        w_row = a_ref[0, :][None, :]                     # [1, R]
        act = (a_ref[1, :] >= vt).astype(jnp.float32)
        v_rows = a_ref[2:, :] * act[None, :]             # [K, R]
        mrows = jnp.concatenate(
            [w_row, v_rows,
             jnp.zeros((dp - 1 - K, R), jnp.float32)], axis=0)
        new = jax.lax.dot_general(
            mrows, selT, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        lid = uidw_ref[0, :] - base
        owned = ((lid >= 0) & (lid < R))[None, :]
        prev = jnp.where(wfirst_ref[i] == 1, 0.0, out_ref[:])
        out_ref[:] = jnp.where(owned, new, prev)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m.blocks.shape[0],),
        in_specs=[
            pl.BlockSpec((8, W), lambda i, b, w, wf: (0, w[i])),
            pl.BlockSpec((P2, R), lambda i, b, w, wf: (0, b[i])),
        ],
        out_specs=pl.BlockSpec((dp, W), lambda i, b, w, wf: (0, w[i])),
    )
    pull_packed = pl.pallas_call(
        functools.partial(pull_packed_kernel, vt=float(param.V_threshold)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((dp, U + W), jnp.float32),
        interpret=INTERPRET,
    )

    jpp = jax.jit(lambda a: pull_packed(mb, mw, mwf, uw, a)[: 1 + K, :U])
    jp0 = jax.jit(lambda s: pull_pairs(
        s, uids, (mb, mw, None, mwf), param, block_rows=R,
        interpret=INTERPRET))
    vmask = np.asarray(pb.valid)  # windows past the real uniques are
    r_new = np.asarray(jpp(A))[:, vmask]   # never visited -> undefined
    r_old = np.asarray(jp0(state))[:, vmask]
    err_p = float(np.abs(r_new - r_old).max())
    t_pp = timeit(lambda: jpp(A), fetch)
    t_p0 = timeit(lambda: jp0(state), fetch)

    # -- packed apply: A+B in, A+B out (aliased) --------------------------
    pp = (3 + K + 7) // 8 * 8
    rng = np.random.default_rng(0)
    payl = (rng.normal(size=(3 + K, U)) * 0.01).astype(np.float32)
    payl[2 + K] = (rng.random(U) > 0.3).astype(np.float32)  # touch
    payl[1 + K] = np.abs(payl[1 + K])                       # add_cnt >= 0? keep any
    pay = put(np.pad(payl, ((0, pp - (3 + K)), (0, W))))

    def apply_packed_kernel(blocks_ref, wins_ref, first_ref, uidw_ref,
                            payw_ref, a_ref, b_ref, a_o, b_o, acc_ref,
                            *, n_pairs: int):
        i = pl.program_id(0)
        base = blocks_ref[i] * R
        selT = _selT(uidw_ref, base, R)
        contrib = jax.lax.dot_general(
            payw_ref[:], selT, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        fst = first_ref[i] == 1
        acc_ref[:] = jnp.where(fst, contrib, acc_ref[:] + contrib)
        nxt = blocks_ref[jnp.minimum(i + 1, n_pairs - 1)]
        is_last = (i == n_pairs - 1) | (nxt != blocks_ref[i])
        acc = acc_ref[:]
        w, cnt, v = a_ref[0, :], a_ref[1, :], a_ref[2:, :]
        z, n, nv = b_ref[0, :], b_ref[1, :], b_ref[2:, :]
        w_n, z_n, n_n, cnt_n, v_n, nv_n = fused_table_update(
            acc, w, z, n, cnt, v, nv, param, K)
        touched = acc[2 + K] > 0.0
        a_new = jnp.concatenate([w_n[None], cnt_n[None], v_n], axis=0)
        b_new = jnp.concatenate([z_n[None], n_n[None], nv_n], axis=0)
        wr = is_last & touched[None, :]
        a_o[:] = jnp.where(wr, a_new, a_ref[:])
        b_o[:] = jnp.where(wr, b_new, b_ref[:])

    bspec = pl.BlockSpec((P2, R), lambda i, b, w, f: (0, b[i]))
    grid_spec_a = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(m.blocks.shape[0],),
        in_specs=[
            pl.BlockSpec((8, W), lambda i, b, w, f: (0, w[i])),
            pl.BlockSpec((pp, W), lambda i, b, w, f: (0, w[i])),
            bspec, bspec,
        ],
        out_specs=(bspec, bspec),
        scratch_shapes=[pltpu.VMEM((pp, R), jnp.float32)],
    )
    apply_packed = pl.pallas_call(
        functools.partial(apply_packed_kernel, n_pairs=m.blocks.shape[0]),
        grid_spec=grid_spec_a,
        out_shape=(jax.ShapeDtypeStruct((P2, N), jnp.float32),) * 2,
        input_output_aliases={5: 0, 6: 1},
        interpret=INTERPRET,
    )

    jap = jax.jit(lambda a, bb: apply_packed(mb, mw, mf, uw, pay, a, bb))
    pay_old = put(payl)
    ja0 = jax.jit(lambda s: apply_pairs(
        s, uids, pay_old, (mb, mw, mf, None), param, block_rows=R,
        interpret=INTERPRET))
    a2, b2 = jap(A, Bst)
    s2 = ja0(state)
    errs = [
        np.abs(np.asarray(a2[0]) - np.asarray(s2.w)).max(),
        np.abs(np.asarray(a2[1]) - np.asarray(s2.cnt)).max(),
        np.abs(np.asarray(a2[2:]) - np.asarray(s2.V)).max(),
        np.abs(np.asarray(b2[0]) - np.asarray(s2.z)).max(),
        np.abs(np.asarray(b2[1]) - np.asarray(s2.n)).max(),
        np.abs(np.asarray(b2[2:]) - np.asarray(s2.nV)).max(),
    ]
    err_a = float(max(errs))
    t_ap = timeit(lambda: jap(A, Bst), fetch)
    t_a0 = timeit(lambda: ja0(state), fetch)

    print(f"pull  packed: {t_pp:6.2f} ms   current: {t_p0:6.2f} ms   "
          f"max|err| {err_p:.2e}")
    print(f"apply packed: {t_ap:6.2f} ms   current: {t_a0:6.2f} ms   "
          f"max|err| {err_a:.2e}")
    return 0 if max(err_p, err_a) < 1e-5 else 1


if __name__ == "__main__":
    sys.exit(main())
