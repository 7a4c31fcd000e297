"""FFM flagship step time: sorted segsum backward vs XLA scatter.

BASELINE config-5 shapes (BENCH.md round 4: 173.3k ex/s on the pair
kernels with the scatter backward): slot-position fields, batch 4096,
L = 24 fields, k = 4 per (feature, field) -> K = 96, 2^22 table,
kernel=auto -> pairs. Measures the steady-state train_step_prepped via
device-resident replayed batches (the production cache_on_device path).

Run:  timeout 3600 python scripts/hw_ffm_sorted.py [scatter|sorted|both]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax

    from difacto_tpu.config import Config
    from difacto_tpu.data.batch_iter import Batch
    from difacto_tpu.data.prep import build_sorted_slots, prep_batch
    from difacto_tpu.parallel.store import LocalStore
    from difacto_tpu.updaters.updater import FMUpdater
    from difacto_tpu.utils.place import place_batch

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    assert jax.default_backend() == "tpu"
    B, L, NB, k = 4096, 24, 22, 4
    N = 1 << NB
    rng = np.random.default_rng(0)
    batches = []
    for _ in range(4):
        z = rng.zipf(1.2, size=(B, L)).astype(np.uint64)
        with np.errstate(over="ignore"):
            ids = ((z * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(N)).astype(
                np.int32
            )
        batches.append(Batch(
            ids, np.ones((B, L), np.float32),
            (rng.random(B) > 0.5).astype(np.float32),
            np.ones(B, np.float32),
        ))

    for seg in (("scatter", "sorted") if which == "both" else (which,)):
        cfg = Config.from_kwargs([
            ("batch_size", str(B)), ("num_bits", str(NB)),
            ("max_nnz_per_row", str(L)), ("V_dim", str(k)),
            ("loss", "ffm"), ("segsum", seg), ("cache_on_device", "1"),
        ])
        upd = FMUpdater(cfg.effective_model_param())
        store = LocalStore(upd, cfg)
        print(f"[{seg}] kernel={'pairs' if store.pairs else 'xla'} "
              f"sorted_grads={store.sorted_grads}", flush=True)
        state = store.init_state(0)
        pbs = []
        for b in batches:
            pb = prep_batch(b, N)
            if store.sorted_grads:
                pb.sorted_slots = build_sorted_slots(
                    pb.inv, pb.vals, pb.uids.shape[0],
                    with_slots=True,
                )
            pbs.append(place_batch(pb))
        t0 = time.time()
        state, m = store.train_step_prepped(state, pbs[0])
        _ = float(m.examples)
        print(f"[{seg}] first step (compile) {time.time()-t0:.1f} s",
              flush=True)
        for pb in pbs:
            state, m = store.train_step_prepped(state, pb)
        _ = float(m.examples)
        iters = 30
        t0 = time.perf_counter()
        for i in range(iters):
            state, m = store.train_step_prepped(state, pbs[i % len(pbs)])
        _ = float(m.examples)
        dt = (time.perf_counter() - t0) / iters
        print(f"[{seg}] {dt*1e3:.2f} ms/step = {B/dt:,.0f} ex/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
