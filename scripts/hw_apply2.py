"""Flagship apply-kernel A/B: one window per grid step (production) vs
two windows per step (ops/pair_sweep.py::apply_pairs2 + DualPairMeta).

The apply sweep is the flagship step's largest kernel term (~6.6 ms of
16.2; BENCH.md r4) and its ~1.29 us/grid-step sits above the ~1 us
dense-grid floor — if the cost is per-step machinery, halving the grid
(5120 -> ~2900 steps, each doing two selects+matmuls) should recover
1-2 ms. pl.when gating, stream count, and bf16x3 selects were all
measured-rejected before (BENCH.md); this is the remaining named idea.

Run:  timeout 3600 python scripts/hw_apply2.py   (cold Mosaic compile of
the dual kernel: 5-15 min)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

B, L, NB, K, U = 16384, 40, 22, 16, 131072


def main() -> int:
    import jax
    import jax.numpy as jnp

    from difacto_tpu.config import FMParam
    from difacto_tpu.ops.pair_sweep import (
        apply_pairs, apply_pairs2, build_dual_apply_meta, build_pair_meta,
    )
    from difacto_tpu.updaters.updater import FMUpdater

    assert jax.default_backend() == "tpu"
    N = 1 << NB
    rng = np.random.default_rng(0)
    p = FMParam()
    p.V_dim = K
    p.V_threshold = 0
    upd = FMUpdater(p)
    state = upd.init_state(N, seed=1)

    # flagship-like uniques: Zipf ids hashed over the table
    z = rng.zipf(1.2, size=B * L).astype(np.uint64)
    with np.errstate(over="ignore"):
        ids = ((z * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(N)).astype(
            np.int64
        )
    raw = np.unique(ids)
    nv = min(len(raw), U - 1)
    uids_np = np.full(U, N, np.int32)
    uids_np[:nv] = raw[:nv]
    valid = np.arange(U) < nv
    uids = jax.device_put(uids_np)
    pay = jax.device_put(
        (rng.normal(size=(3 + K, U)) * valid[None, :]).astype(np.float32)
    )

    m1 = build_pair_meta(uids_np, N, 1024)
    m2 = build_dual_apply_meta(uids_np, N, 1024)
    print(
        f"uniques {nv}; single-window pairs {m1.blocks.shape[0]} "
        f"(real {(m1.wins != U // 128).sum()}), dual steps "
        f"{m2.blocks.shape[0]} (bucket) real "
        f"{(~((m2.wins_a == U // 128) & (m2.wins_b == U // 128))).sum()}",
        flush=True,
    )

    def timeit(fn, iters=30):
        s = fn(upd.init_state(N, seed=1))  # donated: fresh state per run
        float(s.w[0])
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(s)
        float(s.w[0])
        del s
        return (time.perf_counter() - t0) / iters * 1e3

    d1 = jax.device_put((m1.blocks, m1.wins, m1.first, m1.wfirst))
    d2 = jax.device_put((m2.blocks, m2.wins_a, m2.wins_b, m2.first))
    a1 = jax.jit(
        lambda s: apply_pairs(s, uids, pay, d1, p, block_rows=1024),
        donate_argnums=0,
    )
    a2 = jax.jit(
        lambda s: apply_pairs2(s, uids, pay, d2, p, block_rows=1024),
        donate_argnums=0,
    )
    t1 = timeit(a1)
    print(f"apply_pairs  (1 win/step): {t1:6.2f} ms", flush=True)
    t2 = timeit(a2)
    print(f"apply_pairs2 (2 win/step): {t2:6.2f} ms "
          f"({(t1 - t2) / t1 * 100:+.1f}%)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
