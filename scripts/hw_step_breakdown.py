"""Flagship train-step breakdown on hardware (roofline follow-up).

Times the pieces of the 23.1 ms kernel=pairs flagship step separately —
pull kernel, forward+backward (worker_grads), apply kernel — so the
round-4 optimization target is the measured dominant term, not a guess.
Shapes match bench.py defaults exactly (so Mosaic kernels come from the
persistent cache).

Run:  timeout 3600 python scripts/hw_step_breakdown.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, fetch, iters=30):
    fetch(fn())  # warm
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
    from difacto_tpu.data.prep import prep_batch
    from difacto_tpu.learners.step import worker_grads
    from difacto_tpu.ops.localize import Localized
    from difacto_tpu.ops.pair_sweep import (
        apply_pairs, build_pair_meta, pull_pairs,
    )
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
    m = build_pair_meta(pb.uids, N, 1024)
    U = pb.uids.shape[0]
    print(f"B={BATCH} L={NNZ} table 2^{NUM_BITS} K={K} U={U} "
          f"pairs={m.blocks.shape[0]}", flush=True)

    put = jax.device_put
    uids, inv, cnts, valid = (
        put(pb.uids), put(pb.inv), put(pb.ucounts), put(pb.valid))
    vals, labels, mask = put(pb.vals), put(pb.labels), put(pb.mask)
    mb, mw, mf, mwf = put(m.blocks), put(m.wins), put(m.first), put(m.wfirst)

    fetch = lambda r: float(jax.tree.leaves(r)[0].reshape(-1)[0])

    pull = jax.jit(lambda s: pull_pairs(
        s, uids, (mb, mw, None, mwf), param, block_rows=1024))
    t_pull = timeit(lambda: pull(state), fetch)

    def fwd_bwd(s):
        loc = Localized(uids=uids, inv=inv, counts=cnts, valid=valid)
        rows_p = pull_pairs(s, uids, (mb, mw, None, mwf), param,
                            block_rows=1024)
        rows_u = jnp.where(valid[:, None], rows_p.T, 0.0)
        grads_u, py, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss="fm")
        return grads_u, metrics.logloss_sum

    j_fwd_bwd = jax.jit(fwd_bwd)
    t_pull_fb = timeit(lambda: j_fwd_bwd(state), fetch)

    # forward only (the eval compute): pull + predictions, no grads
    def fwd_only(s):
        loc = Localized(uids=uids, inv=inv, counts=cnts, valid=valid)
        rows_p = pull_pairs(s, uids, (mb, mw, None, mwf), param,
                            block_rows=1024)
        rows_u = jnp.where(valid[:, None], rows_p.T, 0.0)
        _, py, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss="fm")
        return py

    j_fwd_only = jax.jit(fwd_only)
    t_pull_f = timeit(lambda: j_fwd_only(state), fetch)

    # apply alone, fixed payload
    rng = np.random.default_rng(0)
    pay = put(rng.normal(size=(3 + K, U)).astype(np.float32) * 0.01)
    appl = jax.jit(lambda s, p: apply_pairs(
        s, uids, p, (mb, mw, mf, None), param, block_rows=1024))
    t_apply = timeit(lambda: appl(state, pay), fetch)

    # full step (no donation so state can be reused across iters)
    def full(s):
        loc = Localized(uids=uids, inv=inv, counts=cnts, valid=valid)
        rows_p = pull_pairs(s, uids, (mb, mw, None, mwf), param,
                            block_rows=1024)
        rows_u = jnp.where(valid[:, None], rows_p.T, 0.0)
        grads_u, _, metrics = worker_grads(
            rows_u, loc, vals, labels, mask, loss="fm")
        vf = valid.astype(jnp.float32)
        payload = jnp.concatenate(
            [jnp.where(valid[None, :], grads_u.T, 0.0),
             (loc.counts * vf)[None, :], vf[None, :]], axis=0)
        s2 = apply_pairs(s, uids, payload, (mb, mw, mf, None), param,
                         block_rows=1024)
        return s2.w, metrics.logloss_sum

    j_full = jax.jit(full)
    t_full = timeit(lambda: j_full(state), fetch)

    print(f"pull kernel alone:        {t_pull:7.2f} ms")
    print(f"pull + fwd (eval path):   {t_pull_f:7.2f} ms "
          f"(fwd ~ {t_pull_f - t_pull:.2f})")
    print(f"pull + fwd+bwd:           {t_pull_fb:7.2f} ms "
          f"(bwd ~ {t_pull_fb - t_pull_f:.2f})")
    print(f"apply kernel alone:       {t_apply:7.2f} ms")
    print(f"full step (no donation):  {t_full:7.2f} ms "
          f"(sum of parts {t_pull_fb + t_apply:.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
