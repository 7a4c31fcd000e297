"""Isolated donated scatter-add/gather cost per layout piece at 2^26.

Which of the six planar pieces binds the 44-48 ms update, and what do
the indices_are_sorted/unique_indices/drop flags buy per piece? Pieces:

  w1       [N] f32, 131k sorted-unique indices        (w/z/n/cnt each)
  vlane    [K, N] at[:, idx]  lane-indexed            (V/nV each)
  vsplit   K separate [N] arrays, K 1-D scatters in one jit
  stacked  [D, N] at[:, idx]  one lane-indexed scatter (in-place probe)

Run:  BENCH_BITS=26 timeout 1800 python scripts/hw_scatter_probe.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bench import K, NUM_BITS, make_batches
    from difacto_tpu.data.prep import prep_batch

    assert jax.default_backend() == "tpu"
    N = 1 << NUM_BITS
    D = 4 + 2 * K
    pb = prep_batch(make_batches(1)[0], N)
    U = pb.uids.shape[0]
    uids = jax.device_put(pb.uids)
    fetch = lambda r: float(jax.tree.leaves(r)[0].reshape(-1)[0])
    print(f"N=2^{NUM_BITS} K={K} U={U}", flush=True)
    d1 = jax.device_put(np.random.default_rng(0).normal(size=U).astype(np.float32))
    dK = jax.device_put(
        np.random.default_rng(1).normal(size=(K, U)).astype(np.float32)
    )
    dD = jax.device_put(
        np.random.default_rng(2).normal(size=(D, U)).astype(np.float32)
    )
    skw = dict(indices_are_sorted=True, unique_indices=True, mode="drop")

    def ping(p, mk, iters=20):
        s = p(mk())
        fetch(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = p(s)
        fetch(s)
        return (time.perf_counter() - t0) / iters * 1e3

    def pure(p, state, iters=20):
        fetch(p(state))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = p(state)
        fetch(r)
        return (time.perf_counter() - t0) / iters * 1e3

    # -- 1-D [N] piece ----------------------------------------------------
    mk1 = jax.jit(lambda: jnp.zeros(N, jnp.float32))
    idx0 = jnp.where(jax.device_put(pb.valid), uids, 0)
    t = ping(jax.jit(lambda s: s.at[idx0].add(d1), donate_argnums=0), mk1)
    print(f"w1   scatter noflags   {t:7.2f} ms", flush=True)
    t = ping(jax.jit(lambda s: s.at[uids].add(d1, **skw), donate_argnums=0), mk1)
    print(f"w1   scatter flags     {t:7.2f} ms", flush=True)
    t = pure(jax.jit(lambda s: s.at[uids].get(
        indices_are_sorted=True, unique_indices=True, mode="fill",
        fill_value=0)), mk1())
    print(f"w1   gather  flags     {t:7.2f} ms", flush=True)

    # -- [K, N] lane-indexed piece ----------------------------------------
    mkV = jax.jit(lambda: jnp.zeros((K, N), jnp.float32))
    t = ping(jax.jit(lambda s: s.at[:, idx0].add(dK), donate_argnums=0), mkV)
    print(f"vlane scatter noflags  {t:7.2f} ms", flush=True)
    t = ping(jax.jit(lambda s: s.at[:, uids].add(dK, **skw), donate_argnums=0), mkV)
    print(f"vlane scatter flags    {t:7.2f} ms", flush=True)
    t = pure(jax.jit(lambda s: s.at[:, uids].get(
        indices_are_sorted=True, unique_indices=True, mode="fill",
        fill_value=0)), mkV())
    print(f"vlane gather  flags    {t:7.2f} ms", flush=True)

    # -- K split 1-D pieces in one jit -------------------------------------
    mkVs = lambda: tuple(mk1() for _ in range(K))

    def upK(vs):
        return tuple(v.at[uids].add(dK[k], **skw) for k, v in enumerate(vs))

    t = ping(jax.jit(upK, donate_argnums=0), mkVs)
    print(f"vsplit scatter flags   {t:7.2f} ms  ({K} 1-D scatters)", flush=True)

    # -- stacked [D, N]: does flags+donate go in place? --------------------
    try:
        mkS = jax.jit(lambda: jnp.zeros((D, N), jnp.float32))
        t = ping(jax.jit(lambda s: s.at[:, uids].add(dD, **skw),
                         donate_argnums=0), mkS)
        print(f"stacked scatter flags  {t:7.2f} ms", flush=True)
    except Exception as e:  # RESOURCE_EXHAUSTED -> still copying
        print(f"stacked scatter flags  FAILED: {type(e).__name__}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
