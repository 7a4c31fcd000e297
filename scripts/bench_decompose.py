"""Decompose the flagship train step into its sparse-op components.

Times each piece as its own donated jit so we know where the next
millisecond lives before attempting kernel work (BENCH.md round-2).
Run on the real chip: `python scripts/bench_decompose.py [bits]`.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

BATCH, NNZ, K = 16384, 40, 16
BITS = int(sys.argv[1]) if len(sys.argv) > 1 else 22
STEPS = 20


def timeit(fn, *args, donate0=False):
    import jax

    f = jax.jit(fn, donate_argnums=(0,) if donate0 else ())
    out = f(*args)
    first = jax.tree.leaves(out)[0]
    _ = float(first.reshape(-1)[0])  # force completion
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
    from difacto_tpu.data.prep import prep_batch

    N = 1 << BITS
    b = make_batches(1)[0]
    pb = prep_batch(b, N)
    U = pb.uids.shape[0]
    print(f"N=2^{BITS}, B={BATCH}, L={NNZ}, K={K}, U_bucket={U}", flush=True)

    rng = np.random.default_rng(0)
    uids = jax.device_put(pb.uids)
    inv = jax.device_put(pb.inv)
    vals = jax.device_put(pb.vals)
    rows_u = jax.device_put(rng.normal(0, 0.1, (U, 1 + K)).astype(np.float32))
    flat = jax.device_put(rng.normal(0, 0.1, (BATCH * NNZ, 1 + K)).astype(np.float32))
    table = jax.device_put(rng.normal(0, 0.1, (N,)).astype(np.float32))
    tableK = jax.device_put(rng.normal(0, 0.1, (K, N)).astype(np.float32))
    gu = jax.device_put(rng.normal(0, 0.1, (U,)).astype(np.float32))
    guK = jax.device_put(rng.normal(0, 0.1, (K, U)).astype(np.float32))

    ms = timeit(lambda r, i: r[i], rows_u, inv)
    print(f"expand gather   [U,17]->[BL,17]: {ms:7.2f} ms", flush=True)
    ms = timeit(
        lambda f, i: jnp.zeros((U, 1 + K), jnp.float32).at[i].add(f), flat, inv
    )
    print(f"grad scatter    [BL,17]->[U,17]: {ms:7.2f} ms", flush=True)
    ms = timeit(lambda t, u: t[u], table, uids)
    print(f"table gather 1D [N]->[U]:        {ms:7.2f} ms", flush=True)
    ms = timeit(lambda t, u, g: t.at[u].add(g), table, uids, gu, donate0=True)
    print(f"table scatter 1D [U]->[N]:       {ms:7.2f} ms", flush=True)
    ms = timeit(lambda t, u: t[:, u], tableK, uids)
    print(f"table gather 2D [K,N]->[K,U]:    {ms:7.2f} ms", flush=True)
    ms = timeit(lambda t, u, g: t.at[:, u].add(g), tableK, uids, guK, donate0=True)
    print(f"table scatter 2D [K,U]->[K,N]:   {ms:7.2f} ms", flush=True)

    # FM math alone (no sparse ops): dense [B,L(,K)] elementwise + reduces
    W = jax.device_put(rng.normal(0, 0.1, (BATCH, NNZ)).astype(np.float32))
    V = jax.device_put(rng.normal(0, 0.1, (BATCH, NNZ, K)).astype(np.float32))
    y = jax.device_put(b.labels)

    def fmmath(vals, W, V, y):
        lin = (vals * W).sum(-1)
        xv = vals[..., None] * V
        S = xv.sum(1)
        Q = (xv * xv).sum(1)
        py = lin + 0.5 * (S * S - Q).sum(-1)
        d = jax.nn.sigmoid(py) - y
        dW = vals * d[:, None]
        dV = d[:, None, None] * vals[:, :, None] * (S[:, None, :] - xv)
        return py, dW, dV

    ms = timeit(fmmath, vals, W, V, y)
    print(f"FM fwd+bwd dense math:           {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
