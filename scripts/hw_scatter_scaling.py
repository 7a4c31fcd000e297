"""Scatter cost model: does a donated XLA TPU scatter-add copy its
operand, and does its time scale with table size N or index count U?

Prints temp-allocation sizes from compiled.memory_analysis() (a copy
shows up as ~operand-sized temp) plus timings over an N x U sweep for
the 1-D row scatter and the [K, N] lane scatter.

Run:  timeout 1800 python scripts/hw_scatter_scaling.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    fetch = lambda r: float(jax.tree.leaves(r)[0].reshape(-1)[0])
    K = 16
    skw = dict(indices_are_sorted=True, unique_indices=True, mode="drop")

    def ping(p, mk, iters=20):
        s = p(mk())
        fetch(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = p(s)
        fetch(s)
        return (time.perf_counter() - t0) / iters * 1e3

    for bits in (22, 24, 26):
        N = 1 << bits
        for U in (32768, 131072):
            uids = jax.device_put(
                np.sort(
                    np.random.default_rng(U).choice(N, U, replace=False)
                ).astype(np.int32)
            )
            d1 = jax.device_put(np.ones(U, np.float32))
            dK = jax.device_put(np.ones((K, U), np.float32))
            mk1 = jax.jit(lambda: jnp.zeros(N, jnp.float32))
            mkV = jax.jit(lambda: jnp.zeros((K, N), jnp.float32))
            p1 = jax.jit(lambda s: s.at[uids].add(d1, **skw), donate_argnums=0)
            pV = jax.jit(lambda s: s.at[:, uids].add(dK, **skw),
                         donate_argnums=0)
            m1 = p1.lower(jax.ShapeDtypeStruct((N,), jnp.float32)).compile()
            mV = pV.lower(
                jax.ShapeDtypeStruct((K, N), jnp.float32)
            ).compile()
            a1, aV = m1.memory_analysis(), mV.memory_analysis()
            t1 = ping(p1, mk1)
            tV = ping(pV, mkV)
            print(
                f"N=2^{bits} U={U}: row1d {t1:6.2f} ms"
                f" (temp {a1.temp_size_in_bytes/2**20:7.1f} MB)"
                f"   laneK {tV:6.2f} ms"
                f" (temp {aV.temp_size_in_bytes/2**20:7.1f} MB)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
