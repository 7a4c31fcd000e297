"""Experiment: scatter/gather hints on the big-table XLA update.

The 2^26 xla step spends 43.4 of 58.6 ms in updater.update — six
scatter-adds + seven gathers at ~100k unique sorted indices over 67M-row
planar arrays (scripts/hw_xla_step_bd.py). Those scatters carry NO
`unique_indices` / `indices_are_sorted` hints, so XLA must assume
duplicate indices and lower the safe (slow) scatter. Our indices are
sorted-unique by construction (prep radix dedup); pad lanes can be
rewritten to DISTINCT out-of-range ids (N + lane) and dropped with
mode='drop', keeping the whole index vector strictly sorted + unique.

Measures w-style [N] and V-style [K, N] gathers and scatter-adds with
and without hints at 2^26 shapes, checking results stay bit-identical.

Run:  BENCH_BITS=26 timeout 2400 python scripts/hw_scatter_hints.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, fetch, iters=20):
    fetch(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    fetch(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bench import BATCH, K, NNZ, NUM_BITS, make_batches
    from difacto_tpu.data.prep import prep_batch

    assert jax.default_backend() == "tpu"
    N = 1 << NUM_BITS
    b = make_batches(1)[0]
    pb = prep_batch(b, N)
    U = pb.uids.shape[0]
    rng = np.random.default_rng(0)
    put = jax.device_put

    uids = put(pb.uids)           # sorted, pads = sentinel N (duplicated)
    valid = put(pb.valid)
    # distinct out-of-range pad ids: strictly sorted AND unique overall
    lane = np.arange(U, dtype=np.int32)
    u2 = put(np.where(pb.valid, pb.uids, N + lane).astype(np.int32))

    w = put(rng.normal(size=N).astype(np.float32))
    V = put(rng.normal(size=(K, N)).astype(np.float32) * 0.01)
    dw = put(rng.normal(size=U).astype(np.float32) * 0.01)
    dV = put(rng.normal(size=(K, U)).astype(np.float32) * 0.01)
    vf = put(pb.valid.astype(np.float32))
    fetch = lambda r: float(jax.tree.leaves(r)[0].reshape(-1)[0])

    # --- baselines: clamp-to-0 + masked delta (production shape) ---
    uc = put(np.where(pb.valid, pb.uids, 0).astype(np.int32))

    g_w0 = jax.jit(lambda: w[uc])
    s_w0 = jax.jit(lambda: w.at[uc].add(vf * dw))
    g_V0 = jax.jit(lambda: V[:, uc])
    s_V0 = jax.jit(lambda: V.at[:, uc].add(vf[None, :] * dV))

    # --- hinted: distinct-OOB pads, mode=drop/fill, sorted+unique ---
    g_w1 = jax.jit(lambda: w.at[u2].get(
        mode="fill", fill_value=0.0,
        indices_are_sorted=True, unique_indices=True))
    s_w1 = jax.jit(lambda: w.at[u2].add(
        dw, mode="drop", indices_are_sorted=True, unique_indices=True))
    g_V1 = jax.jit(lambda: V.at[:, u2].get(
        mode="fill", fill_value=0.0,
        indices_are_sorted=True, unique_indices=True))
    s_V1 = jax.jit(lambda: V.at[:, u2].add(
        dV, mode="drop", indices_are_sorted=True, unique_indices=True))

    # correctness: scatters must agree exactly (valid deltas identical,
    # pads dropped vs masked-to-zero; id-0 collisions in the baseline
    # add 0.0 so both paths leave row 0 at w[0] + its real delta)
    sw0, sw1 = np.asarray(s_w0()), np.asarray(s_w1())
    eq_w = np.array_equal(sw0, sw1)
    sV0, sV1 = np.asarray(s_V0()), np.asarray(s_V1())
    eq_V = np.array_equal(sV0, sV1)
    # gathers agree on valid lanes (pads: baseline returns row 0, hinted
    # returns fill 0.0 — production masks those lanes anyway)
    vm = np.asarray(pb.valid)
    gw0, gw1 = np.asarray(g_w0()), np.asarray(g_w1())
    eq_gw = np.array_equal(gw0[vm], gw1[vm])
    gV0, gV1 = np.asarray(g_V0()), np.asarray(g_V1())
    eq_gV = np.array_equal(gV0[:, vm], gV1[:, vm])

    t = {k: timeit(f, fetch) for k, f in [
        ("gather w   plain", g_w0), ("gather w   hinted", g_w1),
        ("gather V   plain", g_V0), ("gather V   hinted", g_V1),
        ("scatter w  plain", s_w0), ("scatter w  hinted", s_w1),
        ("scatter V  plain", s_V0), ("scatter V  hinted", s_V1),
    ]}
    for k, v in t.items():
        print(f"{k}: {v:7.2f} ms", flush=True)
    print(f"equal: scatter_w={eq_w} scatter_V={eq_V} "
          f"gather_w={eq_gw} gather_V={eq_gV}")
    print(f"U={U} N=2^{NUM_BITS}")
    return 0 if (eq_w and eq_V and eq_gw and eq_gV) else 1


if __name__ == "__main__":
    sys.exit(main())
