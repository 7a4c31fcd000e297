"""Probe: row-packed state table [N, D] vs planar/scalar layouts.

Decomposition (BENCH.md round 2) shows the flagship step spends ~60 ms
in 4x 1D gathers + 4x 1D scatters + 2x planar-2D gathers + 2x planar-2D
scatters on the state arrays. If ONE [U, D] row gather + ONE [U, D] row
scatter-add replaces them at row-gather speeds (~5-20 ns/row), the step
drops to ~20 ms. Memory note: XLA pads the minor dim to 128 lanes, so
[N, 36] occupies [N, 128] physically (2 GB at 2^22) — acceptable to
2^24; planar stays the big-table layout.

Run: python scripts/bench_packed.py [bits]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

BITS = int(sys.argv[1]) if len(sys.argv) > 1 else 22
U = 131072
K = 16
STEPS = 20


def timeit(fn, *args, donate0=False):
    import jax

    f = jax.jit(fn, donate_argnums=(0,) if donate0 else ())
    out = f(*args)
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    if donate0:
        args = (out,) + args[1:]
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = f(*args)
        if donate0:
            args = (out,) + args[1:]
    _ = float(jax.tree.leaves(out)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / STEPS * 1e3


def main():
    import jax
    import jax.numpy as jnp

    N = 1 << BITS
    rng = np.random.default_rng(0)
    uids = jax.device_put(
        np.sort(rng.choice(N, U, replace=False)).astype(np.int32)
    )
    for D in (36, 128):
        tbl = jax.device_put(np.zeros((N, D), np.float32))
        g = jax.device_put(rng.normal(0, 0.1, (U, D)).astype(np.float32))
        ms_g = timeit(lambda t, u: t[u], tbl, uids)
        ms_s = timeit(lambda t, u, x: t.at[u].add(x), tbl, uids, g, donate0=True)
        ms_set = timeit(lambda t, u, x: t.at[u].set(x), tbl, uids, g, donate0=True)
        print(
            f"[N,{D:3d}] row gather {ms_g:6.2f} ms | scatter-add {ms_s:6.2f}"
            f" ms | scatter-set {ms_set:6.2f} ms", flush=True,
        )

    # fused mini-updater on packed rows: gather -> FTRL/AdaGrad math ->
    # scatter-add deltas (the full state update minus the batch math)
    D = 4 + 2 * K
    tbl = jax.device_put(np.zeros((N, D), np.float32))
    grads = jax.device_put(rng.normal(0, 0.1, (U, 1 + K)).astype(np.float32))
    cntu = jax.device_put(np.ones(U, np.float32))

    def packed_update(t, u, gr, ac):
        rows = t[u]
        w, z, n, cnt = rows[:, 0], rows[:, 1], rows[:, 2], rows[:, 3]
        V = rows[:, 4 : 4 + K]
        nV = rows[:, 4 + K :]
        g = gr[:, 0]
        n_new = n + g * g
        sigma = (jnp.sqrt(n_new) - jnp.sqrt(n)) / 0.01
        z_new = z + g - sigma * w
        w_new = jnp.where(
            jnp.abs(z_new) <= 1.0, 0.0,
            -(z_new - jnp.sign(z_new) * 1.0) / ((1.0 + jnp.sqrt(n_new)) / 0.01 + 0.1),
        )
        gV = gr[:, 1:]
        nV_new = nV + gV * gV
        V_new = V - 0.01 * gV / (jnp.sqrt(nV_new) + 1.0)
        new_rows = jnp.concatenate(
            [w_new[:, None], z_new[:, None], n_new[:, None],
             (cnt + ac)[:, None], V_new, nV_new], axis=1,
        )
        return t.at[u].add(new_rows - rows)

    ms = timeit(packed_update, tbl, uids, grads, cntu, donate0=True)
    print(f"fused packed updater (gather+math+scatter): {ms:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
