"""Measure the per-slot scalar-accumulation primitive on real TPU.

BENCH.md round-1 open question: the sorted pipeline's apply sweep pays a
one-hot select tax of windows x G x R VPU writes (independent of block
size, ~N x S x G bytes — unaffordable at 2^22+ tables). The candidate
replacement aggregates slots into a block accumulator with dynamic-
SUBLANE read-modify-writes:

    acc[lid_j, :] += payload[j, :]     (ids staged in SMEM)

This probe measures that primitive's per-slot cost in isolation. If it
lands near ~5 ns/slot, the fused apply costs ~3 ms/step at flagship
shapes and the select dies; if it's 50-100 ns/slot, document-reject.

Run: `python scripts/bench_slot_accum.py [n_slots_log2]`
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

R = 1024          # table block rows (accumulator sublanes)
PP = 128          # payload width (lanes; 3+K padded — use a full vreg)
W = 2048          # slots per SMEM window
LOG2 = int(sys.argv[1]) if len(sys.argv) > 1 else 19
NSLOTS = 1 << LOG2


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nwin = NSLOTS // W

    def kernel(sid_ref, pay_ref, out_ref, pay_s, sem):
        # zero the accumulator once
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        w = pl.program_id(0)
        cp = pltpu.make_async_copy(
            pay_ref.at[pl.ds(w * W, W), :], pay_s, sem
        )
        cp.start()
        cp.wait()

        def body(j, _):
            lid = sid_ref[w * W + j]
            out_ref[pl.ds(lid, 1), :] += pay_s[pl.ds(j, 1), :]
            return 0

        jax.lax.fori_loop(0, W, body, 0)

    rng = np.random.default_rng(0)
    # sorted ids like the real pipeline (sorted within a block slice)
    sid = np.sort(rng.integers(0, R, NSLOTS)).astype(np.int32)
    pay = rng.normal(0, 1, (NSLOTS, PP)).astype(np.float32)

    f = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nwin,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((W, PP), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((R, PP), jnp.float32),
    )
    jf = jax.jit(lambda s, p: f(s, p))
    sid_d, pay_d = jax.device_put(sid), jax.device_put(pay)
    out = jf(sid_d, pay_d)
    _ = float(out[0, 0])
    # correctness check vs numpy
    want = np.zeros((R, PP), np.float32)
    np.add.at(want, sid, pay)
    got = np.asarray(out)
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-6)
    print(f"rel err vs numpy: {err:.2e}", flush=True)

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jf(sid_d, pay_d)
    _ = float(out[0, 0])
    dt = (time.perf_counter() - t0) / reps
    print(
        f"{NSLOTS} slots x {PP} lanes: {dt*1e3:.2f} ms "
        f"=> {dt/NSLOTS*1e9:.1f} ns/slot", flush=True,
    )


if __name__ == "__main__":
    main()
