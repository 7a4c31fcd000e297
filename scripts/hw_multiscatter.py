"""Can the COLD table ride the fast-scatter regime too, by splitting it
into many <=2^18-row sub-tables?

hw_scatter_cliff.py showed [36, N] scatter-add costs ~22 ns/index at
N<=2^18 and ~156 ns/index above. If K independent scatters into K small
tables cost ~22 ns/idx TOTAL (i.e. per-op dispatch overhead is small and
XLA doesn't serialize pathologically), the hot/cold split generalizes:
remap + uniform sub-bucketing makes EVERY update fast, and the 2^26 cold
scatter (~4 ms of the 18.7 ms step) mostly disappears.

Measures, for K sub-tables of [36, 2^26/K] rows (K = 1 control, 16, 64,
256), a donated jit fn doing all K scatter-adds of uniformly-spread
sorted indices (total 40960, the realistic cold count) — plus the same
for gathers — and reports ms + compile wall.

Run:  timeout 3600 python scripts/hw_multiscatter.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

D = 36
NB = 26
U_TOTAL = 40960


def main() -> int:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    skw = dict(indices_are_sorted=True, unique_indices=True, mode="drop")
    gkw = dict(indices_are_sorted=True, unique_indices=True,
               mode="fill", fill_value=0)
    N = 1 << NB
    rng = np.random.default_rng(0)

    def step(tabs, idxs, deltas):
        return tuple(
            t.at[:, i].add(d, **skw)
            for t, i, d in zip(tabs, idxs, deltas)
        )

    def gstep(tabs, idxs):
        return tuple(t.at[:, i].get(**gkw) for t, i in zip(tabs, idxs))

    for K in (16, 64, 256, 1):
        rows = N // K
        cap = U_TOTAL // K
        # args, not closure constants (256 embedded constants bloat the
        # graph); prior iterations' tables must be freed before mk()
        idxs = tuple(
            jax.device_put(np.sort(
                rng.choice(rows, cap, replace=False)).astype(np.int32))
            for _ in range(K)
        )
        deltas = tuple(jax.device_put(np.ones((D, cap), np.float32))
                       for _ in range(K))
        mk = jax.jit(lambda K=K, rows=rows: tuple(
            jnp.zeros((D, rows), jnp.float32) for _ in range(K)))

        pj = jax.jit(step, donate_argnums=0)
        t0 = time.perf_counter()
        s = pj(mk(), idxs, deltas)
        float(s[0][0, 0])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(20):
            s = pj(s, idxs, deltas)
        float(s[0][0, 0])
        t = (time.perf_counter() - t0) / 20 * 1e3
        gj = jax.jit(gstep)
        r = gj(s, idxs)
        float(r[0][0, 0])
        t0 = time.perf_counter()
        for _ in range(20):
            r = gj(s, idxs)
        float(r[0][0, 0])
        tg = (time.perf_counter() - t0) / 20 * 1e3
        print(
            f"K={K:3d} x [36, 2^{NB}/{K}]: scatter {t:7.2f} ms "
            f"({t * 1e6 / U_TOTAL:6.1f} ns/idx)  gather {tg:7.2f} ms  "
            f"compile {compile_s:5.1f}s",
            flush=True,
        )
        del s, r, idxs, deltas
    return 0


if __name__ == "__main__":
    sys.exit(main())
