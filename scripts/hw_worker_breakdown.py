"""Micro-split of the flagship worker fwd+bwd (roofline follow-up #2).

hw_step_breakdown.py showed the XLA worker math (gather -> FM fwd/bwd ->
scatter-add) is the step's dominant term (~14 ms of 24), not the pair
kernels (3.7 + 7.6 ms). This script times its pieces in isolation so the
optimization lands on the measured sub-term:

  gather      rows_u[inv]                  655k x 17-lane row gather
  fm math     fm_loss_grad on pre-gathered rows (no gather/scatter)
  scatter     zeros.at[inv].add(flat)      655k x 17-lane scatter-add
  perm gather flat[perm]                   the per-slot route's substitute
  cumsum-diff flat[perm] -> cumsum -> boundary diffs — a segment-sum
              over the HOST-sorted slot stream with NO scatter at all
              (the radix sort in prep already orders slots by key, so
              the permutation is free host-side)
  fused       gather + math (+DCE'd grads) as XLA fuses them

Run:  timeout 3600 python scripts/hw_worker_breakdown.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(fn, fetch, iters=30):
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
    from difacto_tpu.models.losses import fm_loss_grad

    assert jax.default_backend() == "tpu"
    N = 1 << NUM_BITS
    b = make_batches(1)[0]
    pb = prep_batch(b, N)
    U = pb.uids.shape[0]
    B, L, D = BATCH, NNZ, 1 + K
    BL = B * L
    print(f"B={B} L={L} K={K} U={U} BL={BL}", flush=True)

    put = jax.device_put
    rng = np.random.default_rng(0)
    rows_u = put((rng.normal(size=(U, D)) * 0.01).astype(np.float32))
    inv = put(pb.inv)
    vals, labels, mask = put(pb.vals), put(pb.labels), put(pb.mask)
    flat = put((rng.normal(size=(BL, D)) * 0.01).astype(np.float32))
    keys = np.where(b.ids.reshape(-1) < 0, np.int32(N), b.ids.reshape(-1))
    perm = put(np.argsort(keys, kind="stable").astype(np.int32))

    fetch = lambda r: float(jax.tree.leaves(r)[0].reshape(-1)[0])

    j_gather = jax.jit(lambda r: r[inv])
    t_gather = timeit(lambda: j_gather(rows_u), fetch)

    def math_only(rows):  # pre-gathered [BL, D]
        r3 = rows.reshape(B, L, D)
        fwd, g = fm_loss_grad(vals, r3[..., 0], r3[..., 1:], labels, mask)
        return (jnp.concatenate(
            [g.dW.reshape(BL, 1), g.dV.reshape(BL, K)], axis=1),
            jnp.sum(g.loss))

    rows_g = jax.jit(lambda r: r[inv])(rows_u)
    rows_g.block_until_ready()
    j_math = jax.jit(math_only)
    t_math = timeit(lambda: j_math(rows_g), fetch)

    j_scatter = jax.jit(
        lambda f: jnp.zeros((U, D), f.dtype).at[inv].add(f))
    t_scatter = timeit(lambda: j_scatter(flat), fetch)

    j_perm = jax.jit(lambda f: f[perm])
    t_perm = timeit(lambda: j_perm(flat), fetch)

    # cumsum-diff segment-sum: slots sorted by key (perm), per-key sums
    # are prefix differences at host-known segment boundaries. Boundaries
    # come from pb.ucounts (the dedup already counted each key's slots);
    # bucket-pad lanes get start == end -> exact zero.
    counts_i = pb.ucounts.astype(np.int64)
    ends_np = np.cumsum(counts_i)
    starts_np = ends_np - counts_i
    starts, ends = put(starts_np.astype(np.int32)), put(ends_np.astype(np.int32))

    def seg_cumsum(f):
        fp = f[perm]                                   # [BL, D] sorted
        cs = jnp.cumsum(fp.astype(jnp.float32), axis=0)
        cs0 = jnp.concatenate([jnp.zeros((1, D), jnp.float32), cs])
        return cs0[ends] - cs0[starts]                 # [U, D]

    j_seg = jax.jit(seg_cumsum)
    t_seg = timeit(lambda: j_seg(flat), fetch)
    ref = np.zeros((U, D), np.float32)
    np.add.at(ref, pb.inv, np.asarray(flat))
    err_seg = float(np.abs(np.asarray(j_seg(flat)) - ref).max())

    def fused(r):
        rows = r[inv].reshape(B, L, D)
        fwd, g = fm_loss_grad(vals, rows[..., 0], rows[..., 1:], labels, mask)
        return (jnp.concatenate(
            [g.dW.reshape(BL, 1), g.dV.reshape(BL, K)], axis=1),
            jnp.sum(g.loss))

    j_fused = jax.jit(fused)
    t_fused = timeit(lambda: j_fused(rows_u), fetch)

    def fused_all(r):
        flat_g, ll = fused(r)
        return jnp.zeros((U, D), flat_g.dtype).at[inv].add(flat_g), ll

    j_all = jax.jit(fused_all)
    t_all = timeit(lambda: j_all(rows_u), fetch)

    print(f"gather rows_u[inv] [{BL}x{D}]:    {t_gather:7.2f} ms")
    print(f"fm math (pre-gathered):           {t_math:7.2f} ms")
    print(f"scatter-add at[inv] [{U}x{D}]:  {t_scatter:7.2f} ms")
    print(f"perm gather flat[perm]:           {t_perm:7.2f} ms")
    print(f"cumsum-diff segment-sum:          {t_seg:7.2f} ms "
          f"(max|err| vs scatter {err_seg:.2e})")
    print(f"gather+math fused:                {t_fused:7.2f} ms")
    print(f"gather+math+scatter fused:        {t_all:7.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
