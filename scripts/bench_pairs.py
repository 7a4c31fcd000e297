"""Decompose the kernel=pairs train step on the real chip.

Times, as separate donated jits: the pair pull/apply kernels, their XLA
planar equivalents, the worker math, and the full pairs step — so we
know whether the pair kernels beat the XLA table ops and how much the
un-fused worker portion costs. `python scripts/bench_pairs.py [block_rows]`.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

BATCH, NNZ, K, BITS = 16384, 40, 16, 22
BLOCK_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
STEPS = 20


def timeit(fn, *args, donate0=False):
    import jax

    f = jax.jit(fn, donate_argnums=(0,) if donate0 else ())
    out = f(*args)
    first = jax.tree.leaves(out)[0]
    _ = float(first.reshape(-1)[0])
    if donate0:
        args = (out if not isinstance(out, tuple) else out[0],) + args[1:]
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = f(*args)
        if donate0:
            args = (out if not isinstance(out, tuple) else out[0],) + args[1:]
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_batches
    from difacto_tpu.config import FMParam
    from difacto_tpu.data.prep import prep_batch
    from difacto_tpu.learners.step import worker_grads
    from difacto_tpu.ops.localize import Localized
    from difacto_tpu.ops.pair_sweep import apply_pairs, build_pair_meta, pull_pairs
    from difacto_tpu.updaters.updater import FMUpdater

    N = 1 << BITS
    p = FMParam()
    p.V_dim = K
    p.V_threshold = 1
    upd = FMUpdater(p)
    state = upd.init_state(N, seed=0)

    b = make_batches(1)[0]
    pb = prep_batch(b, N)
    meta = build_pair_meta(pb.uids, N, BLOCK_ROWS)
    U = pb.uids.shape[0]
    print(
        f"N=2^{BITS} B={BATCH} L={NNZ} K={K} U={U} "
        f"block_rows={BLOCK_ROWS} pairs={meta.blocks.shape[0]}",
        flush=True,
    )

    uids = jax.device_put(pb.uids)
    valid = jax.device_put(pb.valid)
    ucounts = jax.device_put(pb.ucounts)
    inv = jax.device_put(pb.inv)
    vals = jax.device_put(pb.vals)
    labels = jax.device_put(pb.labels)
    mask = jax.device_put(pb.mask)
    mdev = tuple(jax.device_put(x) for x in (meta.blocks, meta.wins, meta.first, meta.wfirst))
    rng = np.random.default_rng(0)
    grads_u = jax.device_put(rng.normal(0, 0.1, (U, 1 + K)).astype(np.float32))
    payload = jax.device_put(
        np.concatenate(
            [
                rng.normal(0, 0.1, (1 + K, U)),
                pb.ucounts[None, :],
                pb.valid[None, :].astype(np.float32),
            ],
            axis=0,
        ).astype(np.float32)
    )
    rows_u = jax.device_put(rng.normal(0, 0.1, (U, 1 + K)).astype(np.float32))

    import os

    if not os.environ.get("SKIP_XLA"):
        ms = timeit(lambda s, u, v: upd.pull(s, u, v), state, uids, valid)
        print(f"XLA planar pull  [U,17]:      {ms:7.2f} ms", flush=True)
        ms = timeit(
            lambda s, u, g, c, v: upd.update(s, u, g, c, v),
            state, uids, grads_u, ucounts, valid, donate0=True,
        )
        print(f"XLA planar update:            {ms:7.2f} ms", flush=True)
        ms = timeit(
            lambda r, i, v, l, m: worker_grads(
                r, Localized(uids=uids, inv=i, counts=ucounts, valid=valid), v, l, m
            ),
            rows_u, inv, vals, labels, mask,
        )
        print(f"worker_grads (expand+fm+agg): {ms:7.2f} ms", flush=True)
        state = upd.init_state(N, seed=0)  # previous state was donated

    ms = timeit(
        lambda s, u: pull_pairs(s, u, mdev, p, block_rows=BLOCK_ROWS),
        state, uids,
    )
    print(f"pull_pairs kernel:            {ms:7.2f} ms", flush=True)
    ms = timeit(
        lambda s, u, pay: apply_pairs(s, u, pay, mdev, p, block_rows=BLOCK_ROWS),
        state, uids, payload, donate0=True,
    )
    print(f"apply_pairs kernel:           {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
