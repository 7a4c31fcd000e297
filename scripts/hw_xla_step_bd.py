"""Big-table (kernel=xla) train-step breakdown on hardware.

The 2^26 step measures 59.3 ms with the sorted backward (BENCH.md r4).
Times jitted PREFIXES of the exact production step (LocalStore
._prepped_step_sorted math) so each piece's marginal cost is the
composed cost, not an isolated microbenchmark (the round-4 lesson):

    pull            = updater.pull gather (planar w/cnt/V column gathers)
    + fwd           = fm_predict in [B, L] space
    + bwd           = fused [d|S] gather + segsum sorted aggregation
    + update        = FTRL/AdaGrad gathers + scatters (updater.update)

Shapes come from bench.py env knobs (BENCH_BITS=26 for the north-star
config-4 scale; segsum kernel comes from the persistent Mosaic cache).

Run:  BENCH_BITS=26 timeout 3600 python scripts/hw_xla_step_bd.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, fetch, iters=20):
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
    from difacto_tpu.learners.step import worker_grads_sorted
    from difacto_tpu.models.losses import fm_predict, logit_grad_coeff
    from difacto_tpu.ops.localize import Localized
    from difacto_tpu.updaters.updater import FMUpdater

    assert jax.default_backend() == "tpu"
    N = 1 << NUM_BITS
    cfg = Config.from_kwargs([
        ("batch_size", str(BATCH)), ("num_bits", str(NUM_BITS)),
        ("max_nnz_per_row", str(NNZ)), ("V_dim", str(K)),
        ("kernel", "xla"), ("layout", "planar"),
    ])
    upd = FMUpdater(cfg.model)
    state = jax.device_put(upd.init_state(N, 0))
    b = make_batches(1)[0]
    pb = prep_batch(b, N)
    ss = build_sorted_slots(pb.inv, pb.vals, pb.uids.shape[0])
    put = jax.device_put
    uids, inv, valid = put(pb.uids), put(pb.inv), put(pb.valid)
    ucounts = put(pb.ucounts)
    vals, labels, mask = put(pb.vals), put(pb.labels), put(pb.mask)
    ss_dev = tuple(put(np.asarray(x)) for x in (
        ss.x_sorted, ss.bidx, ss.inv_sorted,
        ss.seg_tiles, ss.seg_wins, ss.seg_first,
    ))
    U = pb.uids.shape[0]
    print(f"N=2^{NUM_BITS} U_bucket={U} BLp={ss.inv_sorted.shape[0]}",
          flush=True)
    fetch = lambda r: float(jax.tree.leaves(r)[0].reshape(-1)[0])
    loc = Localized(uids=uids, inv=inv, counts=ucounts, valid=valid)

    p_pull = jax.jit(lambda s: upd.pull(s, uids, valid))

    def f_fwd(s):
        rows_u = upd.pull(s, uids, valid)
        rows = rows_u[inv].reshape(BATCH, NNZ, 1 + K)
        return fm_predict(vals, rows[..., 0], rows[..., 1:]).py

    p_fwd = jax.jit(f_fwd)

    def f_bwd(s):
        rows_u = upd.pull(s, uids, valid)
        grads_p, py, m = worker_grads_sorted(
            rows_u, loc, vals, labels, mask, ss_dev)
        return grads_p

    p_bwd = jax.jit(f_bwd)

    def f_update(s):
        rows_u = upd.pull(s, uids, valid)
        grads_p, py, m = worker_grads_sorted(
            rows_u, loc, vals, labels, mask, ss_dev)
        grads_u = jnp.where(valid[:, None], grads_p.T, 0.0)
        return upd.update(s, uids, grads_u, ucounts, valid)

    p_update = jax.jit(f_update, donate_argnums=0)

    t_pull = timeit(lambda: p_pull(state), fetch)
    t_fwd = timeit(lambda: p_fwd(state), fetch)
    t_bwd = timeit(lambda: p_bwd(state), fetch)

    # the full step donates: ping-pong the ONE resident state (a second
    # copy would OOM the 16 GB chip at 2^26 — state alone is 9.7 GB)
    iters = 20
    s = p_update(state)
    fetch(jax.tree.leaves(s)[0][:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        s = p_update(s)
    fetch(jax.tree.leaves(s)[0][:1])
    t_all = (time.perf_counter() - t0) / iters * 1e3

    print(f"pull              {t_pull:7.2f} ms")
    print(f"pull+fwd          {t_fwd:7.2f} ms   (fwd    {t_fwd - t_pull:+.2f})")
    print(f"pull+fwd+bwd      {t_bwd:7.2f} ms   (bwd    {t_bwd - t_fwd:+.2f})")
    print(f"full step         {t_all:7.2f} ms   (update {t_all - t_bwd:+.2f})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
