"""Row-window (super-row) scatter/gather probe at 2^26, K=16, U=131k.

Per the scaling probe (hw_scatter_scaling.py) XLA TPU scatters are
in-place (temp 0 MB) and cost ~23 ns/index/contig-elem-group with ~7 ns
per extra STRIDED lane — so the [K, N] lane scatters bind the update
(2 x 15.6 ms). Candidates measured here keep ONE scatter whose windows
are CONTIGUOUS lanes:

  g32  table [N/32, 32*36=1152] (zero physical pad, 9.66 GB)
  g16  table [N/16, 16*36= 576] (pads to 640 lanes, 10.7 GB)

  scat: t.at[r_i].add(wide)  with wide [U, C] mask-built (one key's
        D-slice nonzero per window; duplicate r_i legal under add)
  pull: t[r_i] -> [U, C] -> take_along_axis -> [U, D]

plus laneK scatter-SET vs ADD (does set halve the read-modify-write?).

Run:  timeout 1800 python scripts/hw_rowwin_probe.py
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
    NUM_BITS, K, U = 26, 16, 131072
    N = 1 << NUM_BITS
    D = 4 + 2 * K
    rng = np.random.default_rng(7)
    uids_np = np.sort(rng.choice(N, U, replace=False)).astype(np.int32)
    uids = jax.device_put(uids_np)
    dD = jax.device_put(rng.normal(size=(U, D)).astype(np.float32))
    dK = jax.device_put(rng.normal(size=(K, U)).astype(np.float32))
    skw = dict(indices_are_sorted=True, unique_indices=True, mode="drop")

    def ping(p, mk, iters=20):
        s = p(mk())
        fetch(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = p(s)
        fetch(s)
        return (time.perf_counter() - t0) / iters * 1e3

    def pure(p, s, iters=20):
        fetch(p(s))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = p(s)
        fetch(r)
        return (time.perf_counter() - t0) / iters * 1e3

    # laneK set vs add (flags)
    mkV = jax.jit(lambda: jnp.zeros((K, N), jnp.float32))
    t = ping(jax.jit(lambda s: s.at[:, uids].set(dK, **skw),
                     donate_argnums=0), mkV)
    print(f"laneK scatter-SET flags  {t:6.2f} ms", flush=True)

    for G in (32, 16):
        C = G * D
        r_i = jax.device_put((uids_np // G).astype(np.int32))
        j_i = jax.device_put((uids_np % G).astype(np.int32))
        mkT = jax.jit(lambda: jnp.zeros((N // G, C), jnp.float32))

        def scat(t):
            wide = jnp.where(
                jnp.arange(G)[None, :, None] == j_i[:, None, None],
                dD[:, None, :], 0.0,
            ).reshape(U, C)
            return t.at[r_i].add(wide, indices_are_sorted=True,
                                 unique_indices=False, mode="drop")

        def pull(t):
            full = t.at[r_i].get(indices_are_sorted=True,
                                 unique_indices=False, mode="fill",
                                 fill_value=0)
            return jnp.take_along_axis(
                full.reshape(U, G, D), j_i[:, None, None], axis=1
            )[:, 0, :]

        ts = ping(jax.jit(scat, donate_argnums=0), mkT)
        print(f"g{G}  row-window scatter  {ts:6.2f} ms", flush=True)
        tp = pure(jax.jit(pull), mkT())
        print(f"g{G}  row-window pull     {tp:6.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
