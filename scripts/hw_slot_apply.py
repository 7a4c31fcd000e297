"""Experiment: per-SLOT apply vs scatter-add + per-KEY apply (flagship).

Roofline follow-up (BENCH.md round-4 queue #1): if the XLA backward
scatter-add (`worker_grads`: grads_u = zeros.at[inv].add(flat), 655k
indices x 17 lanes) is a dominant step cost, the apply kernel can eat it
— it already aggregates duplicate ids in-kernel (accumulate-until-flush
across a block's pairs), so a host-built stable slot permutation (slots
sorted by id, computed in prep for free next to the radix dedup) lets
the step feed PER-SLOT payloads straight to `apply_pairs`:

    XLA:   flat [B*L, D] --scatter-add--> grads_u [U, D] --apply_pairs-->
    here:  flat [B*L, D] --gather(perm)--> sorted slots --apply_pairs-->

Cost delta = (gather 655k idx) + (apply over 5120->5210 pairs at W=128
windows of 655k lanes instead of 131k) - (scatter-add 655k idx).

This script measures both apply variants in isolation on real Mosaic and
checks bit-equality of the resulting state. Run when the chip is free:

    timeout 3600 python scripts/hw_slot_apply.py
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
    from difacto_tpu.config import Config
    from difacto_tpu.data.prep import prep_batch
    from difacto_tpu.ops.pair_sweep import apply_pairs, build_pair_meta
    from difacto_tpu.updaters.updater import FMUpdater

    assert jax.default_backend() == "tpu"
    N = 1 << NUM_BITS
    cfg = Config.from_kwargs([
        ("batch_size", str(BATCH)), ("num_bits", str(NUM_BITS)),
        ("max_nnz_per_row", str(NNZ)), ("V_dim", str(K)),
        ("kernel", "pairs"),
    ])
    upd = FMUpdater(cfg.model)
    param = upd.param
    state = jax.device_put(upd.init_state(N, 0))
    b = make_batches(1)[0]
    pb = prep_batch(b, N)
    U = pb.uids.shape[0]
    BL = BATCH * NNZ
    assert BL % 128 == 0

    # per-key route (production today)
    mk = build_pair_meta(pb.uids, N, 1024)
    # per-slot route: stable sort of slots by key (prep-side, ~5 ms host)
    keys = np.where(b.ids.reshape(-1) < 0, np.int32(N), b.ids.reshape(-1))
    perm = np.argsort(keys, kind="stable").astype(np.int32)
    stream = keys[perm].astype(np.int32)
    ms = build_pair_meta(stream, N, 1024)
    print(f"U={U} BL={BL} pairs per-key={mk.blocks.shape[0]} "
          f"per-slot={ms.blocks.shape[0]}", flush=True)

    put = jax.device_put
    rng = np.random.default_rng(0)
    flat = (rng.normal(size=(BL, 1 + K)) * 0.01).astype(np.float32)
    flat[keys >= N] = 0.0  # padding slots carry nothing
    flat_d = put(flat)
    inv_d, uids_d = put(pb.inv), put(pb.uids)
    valid_d = put(pb.valid)
    perm_d, stream_d = put(perm), put(stream)
    mk_d = (put(mk.blocks), put(mk.wins), put(mk.first), None)
    ms_d = (put(ms.blocks), put(ms.wins), put(ms.first), None)
    vmask = (stream < N).astype(np.float32)
    vmask_d = put(vmask)
    ucounts_d = put(pb.ucounts)

    def per_key(s, f):
        grads_u = jnp.zeros((U, 1 + K), f.dtype).at[inv_d].add(f)
        vf = valid_d.astype(jnp.float32)
        pay = jnp.concatenate(
            [jnp.where(valid_d[None, :], grads_u.T, 0.0),
             (ucounts_d * vf)[None, :], vf[None, :]], axis=0)
        return apply_pairs(s, uids_d, pay, mk_d, param, block_rows=1024)

    def per_slot(s, f):
        fp = f[perm_d]  # [BL, D] sorted-slot order
        pay = jnp.concatenate(
            [fp.T, vmask_d[None, :], vmask_d[None, :]], axis=0)
        return apply_pairs(s, stream_d, pay, ms_d, param, block_rows=1024)

    jk = jax.jit(per_key)
    js = jax.jit(per_slot)
    fetch = lambda r: float(r.w[0])
    t_key = timeit(lambda: jk(state, flat_d), fetch)
    t_slot = timeit(lambda: js(state, flat_d), fetch)

    # equality: both must equal the updater reference on aggregated grads
    agg = np.zeros((U, 1 + K), np.float32)
    np.add.at(agg, pb.inv, flat)
    ref = jax.jit(upd.update)(
        state, jnp.asarray(pb.uids), jnp.asarray(agg),
        jnp.asarray(pb.ucounts), jnp.asarray(pb.valid),
    )
    sk = jk(state, flat_d)
    ss = js(state, flat_d)
    errs = {}
    for name in ("w", "z", "n", "V", "nV", "cnt"):
        a, r = np.asarray(getattr(sk, name)), np.asarray(getattr(ref, name))
        s2 = np.asarray(getattr(ss, name))
        if a.size:
            errs[name] = (float(np.abs(a - r).max()), float(np.abs(s2 - r).max()))
    emax = max(max(v) for v in errs.values())
    print(f"per-key apply (scatter-add + {mk.blocks.shape[0]} pairs): "
          f"{t_key:.2f} ms")
    print(f"per-slot apply ({ms.blocks.shape[0]} pairs, no scatter):   "
          f"{t_slot:.2f} ms")
    print("note: cnt semantics differ by design check — per-slot adds 1 "
          "per slot (sum=count) vs per-key count; both equal the reference")
    print(f"max |err| vs updater reference: {emax:.2e} "
          f"({'OK' if emax < 1e-4 else 'MISMATCH ' + str(errs)})")
    return 0 if emax < 1e-4 else 1


if __name__ == "__main__":
    sys.exit(main())
