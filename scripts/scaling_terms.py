"""Measured per-step multi-host overhead terms vs shard count S.

The >95% weak-scaling projection (BENCH.md) rests on three per-step
host/comm terms that DON'T ride the per-chip compute: (a) the send-bucket
allgather payload, (b) the per-process pair-schedule build, (c) the
owner-stream lane count picked by the batch-actual capacity. This script
MEASURES (b) and (c) per S on synthetic flagship-shaped batches (weak
scaling: per-process batch fixed at B=16384, L=40; global table 2^22 rows
so per-shard tables shrink with S, exactly the production sharding), and
reports (a)'s exact byte count (its wall time is ICI-bound on hardware;
on this host a CPU loopback timing would be meaningless).

The old O(S^2*C) build (every process building EVERY owner's schedule,
flagged by round-3 verdict weak #1) is timed alongside for contrast.

Run (pure host + CPU jax):  python scripts/scaling_terms.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from difacto_tpu.data.batch_iter import Batch  # noqa: E402
from difacto_tpu.data.prep import (  # noqa: E402
    _finish_metas, _owner_raws, _send_buckets, prep_batch_sharded,
    shard_bucket_fills,
)
from difacto_tpu.ops.pair_sweep import W, _bucket  # noqa: E402
from difacto_tpu.parallel.store import _cap_ladder, _round_up  # noqa: E402

B, L, NUM_BITS = 16384, 40, 22
N = 1 << NUM_BITS


def make_batch(seed: int) -> Batch:
    rng = np.random.default_rng(seed)
    z = rng.zipf(1.2, size=(B, L)).astype(np.uint64)
    with np.errstate(over="ignore"):
        ids = ((z * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(N)).astype(
            np.int32
        )
    return Batch(ids, np.ones((B, L), np.float32),
                 (rng.random(B) > 0.5).astype(np.float32),
                 np.ones(B, np.float32))


def main() -> int:
    print(f"weak scaling: per-process batch {B}x{L}, global table 2^"
          f"{NUM_BITS}; 1 local shard per process")
    print(f"{'S':>3} {'C':>6} {'fill%':>6} {'Cpin':>6} {'pin%':>6} "
          f"{'ag_KB':>7} {'build_ms':>8} {'old_ms':>8} {'pairs':>7}")
    for S in (2, 4, 8, 16, 32):
        # each process preps its own local batch; synthesize all S — and
        # T later "steps" to measure the store.pin_capacity() occupancy
        # (epoch-0 max pins the capacity; later batches ride it exactly)
        T = 5
        step_pbs = [
            [prep_batch_sharded(make_batch(100 + t * 1000 + p), N, 1)
             for p in range(S)]
            for t in range(T)
        ]
        step_fills = [
            [shard_bucket_fills(pb, N, S) for pb in pbs_t]
            for pbs_t in step_pbs
        ]
        needs = [
            _round_up(max(max(int(f.max()) for f in fs), 1), W)
            for fs in step_fills
        ]
        C_pin = max(needs)                 # = store.pin_capacity()
        pin_fill = float(np.mean([
            np.mean([f.mean() for f in fs]) / C_pin for fs in step_fills
        ]))
        pbs, fills = step_pbs[0], step_fills[0]
        gmax = max(int(f.max()) for f in fills)
        C = _cap_ladder(_round_up(max(gmax, 1), W))
        mean_fill = float(np.mean([f.mean() for f in fills]))
        # (a) allgather payload: each process contributes n_local*S*C i32
        ag_bytes = S * C * 4
        # (b) per-process build, NEW path: local send buckets + local
        # owner raws + finish (pair bucket from the allgathered max —
        # here computed directly; the allgather itself is (a))
        sends = [_send_buckets(pb, N, S, C) for pb in pbs]
        send = np.concatenate(sends, axis=0)  # [S, S, C] global

        def build_one(pid: int):
            raws = _owner_raws(send, N, 1024, range(pid, pid + 1))
            lmax = max((r[0].shape[0] for r in raws), default=0)
            return raws, lmax

        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            raws, lmax = build_one(0)
            P = _bucket(max(lmax, 1))
            metas = _finish_metas(raws, S, C, 1024, N, P)
        t_new = (time.perf_counter() - t0) / iters * 1e3
        # old O(S^2*C) contrast: every owner on every process
        t0 = time.perf_counter()
        raws_all = _owner_raws(send, N, 1024, range(S))
        t_old = (time.perf_counter() - t0) * 1e3
        print(f"{S:>3} {C:>6} {100*mean_fill/C:>5.1f}% {C_pin:>6} "
              f"{100*pin_fill:>5.1f}% "
              f"{ag_bytes/1024:>6.1f}K {t_new:>8.2f} {t_old:>8.2f} "
              f"{metas.pull_blocks.shape[1]:>7}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
