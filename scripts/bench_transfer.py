"""Probe tunnel host->device bandwidth and the device-resident step.

Hypothesis (round 2): the flagship prepped step transfers ~6.5 MB of
batch arrays per step; if tunnel h2d is ~100 MB/s, transfers are the
step-time floor and kernel choice barely matters. Measures:
  1. device_put bandwidth on a 6.5 MB pytree;
  2. full train_step_prepped with HOST numpy batches (the bench default);
  3. same with batches device_put ONCE (device-resident floor).
`python scripts/bench_transfer.py`
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

STEPS = 20


def main():
    import jax

    from bench import make_batches
    from difacto_tpu.config import Config
    from difacto_tpu.data.prep import prep_batch
    from difacto_tpu.parallel.store import LocalStore
    from difacto_tpu.updaters.updater import FMUpdater

    BATCH, NNZ, BITS, K = 16384, 40, 22, 16
    cfg = Config.from_kwargs(
        [
            ("batch_size", str(BATCH)),
            ("num_bits", str(BITS)),
            ("max_nnz_per_row", str(NNZ)),
            ("V_dim", str(K)),
        ]
    )
    upd = FMUpdater(cfg.model)
    store = LocalStore(upd, cfg)
    state = store.init_state(0)
    N = 1 << BITS
    batches = make_batches(4)
    pbs = [prep_batch(b, N) for b in batches]
    tree = (
        pbs[0].vals, pbs[0].labels, pbs[0].mask, pbs[0].uids,
        pbs[0].ucounts, pbs[0].inv, pbs[0].valid,
    )
    nbytes = sum(a.nbytes for a in tree)
    print(f"batch pytree: {nbytes / 1e6:.1f} MB", flush=True)

    # 1. raw transfer bandwidth (fresh buffers each time to avoid caching)
    d = jax.device_put(tree)
    _ = float(d[0].reshape(-1)[0])
    t0 = time.perf_counter()
    reps = 10
    for i in range(reps):
        d = jax.device_put(tree)
        _ = float(d[0].reshape(-1)[0])
    dt = time.perf_counter() - t0
    print(
        f"h2d device_put: {dt / reps * 1e3:.1f} ms "
        f"({nbytes * reps / dt / 1e6:.0f} MB/s)",
        flush=True,
    )

    # 2. step with host numpy batches (current bench behavior)
    for i in range(4):
        state, m = store.train_step_prepped(state, pbs[i])
    _ = float(m.logloss_sum)
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = store.train_step_prepped(state, pbs[i % 4])
    _ = float(m.logloss_sum)
    host_ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"step, host batches:   {host_ms:7.2f} ms", flush=True)

    # 3. step with device-resident batches
    import dataclasses

    dpbs = []
    for pb in pbs:
        arrs = jax.device_put(
            (pb.vals, pb.labels, pb.mask, pb.uids, pb.ucounts, pb.inv, pb.valid)
        )
        dpbs.append(
            dataclasses.replace(
                pb, vals=arrs[0], labels=arrs[1], mask=arrs[2], uids=arrs[3],
                ucounts=arrs[4], inv=arrs[5], valid=arrs[6],
            )
        )
    state, m = store.train_step_prepped(state, dpbs[0])
    _ = float(m.logloss_sum)
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = store.train_step_prepped(state, dpbs[i % 4])
    _ = float(m.logloss_sum)
    dev_ms = (time.perf_counter() - t0) / STEPS * 1e3
    print(f"step, device batches: {dev_ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
