"""Microbenchmark bisection of the apply-sweep kernel cost on real TPU.

Variants isolate: window DMAs, sel construction, matmul, precision.
Run: python scripts/bisect_apply.py <variant> [block_rows]
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = 1024
N = 1 << 20
U = 100000
K = 4
PP = 8


def kernel(off_ref, sid_ref, pay_ref, w_ref, w_o, uid_s, pay_s, in_sem, pay_sem,
           acc_ref, *, block_rows, variant):
    i = pl.program_id(0)
    base = i * block_rows
    start = off_ref[0, i]
    end = off_ref[0, i + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(end > start)
    def _():
        astart = (start // G) * G

        def win(w_i, _):
            lo = astart + w_i * G
            if variant != "nodma":
                cp1 = pltpu.make_async_copy(sid_ref.at[pl.ds(lo, G)], uid_s, in_sem)
                cp2 = pltpu.make_async_copy(pay_ref.at[:, pl.ds(lo, G)], pay_s, pay_sem)
                cp1.start()
                cp2.start()
                cp1.wait()
                cp2.wait()
            if variant == "dmaonly":
                acc_ref[0, 0] = acc_ref[0, 0] + pay_s[0, 0]
                return 0
            lid = uid_s[:] - base
            rows = jax.lax.broadcasted_iota(jnp.int32, (G, block_rows), 1)
            sel = jnp.where(lid[:, None] == rows, 1.0, 0.0)
            if variant == "selonly":
                acc_ref[:] = acc_ref[:] + jnp.sum(sel[:PP].T @ jnp.ones((PP, PP), jnp.float32), axis=1)[None, :] * 0
                return 0
            prec = (jax.lax.Precision.HIGHEST if variant == "highest"
                    else jax.lax.Precision.DEFAULT)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                pay_s[:], sel, preferred_element_type=jnp.float32, precision=prec
            )
            return 0

        nwin = (end - astart + G - 1) // G
        jax.lax.fori_loop(0, nwin, win, 0)

    w_o[:] = w_ref[:] + acc_ref[0]


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "highest"
    br = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    rng = np.random.default_rng(0)
    sid = np.sort(rng.choice(N, size=U, replace=False)).astype(np.int32)
    pad = G + (-U) % G
    sid_p = jnp.asarray(np.concatenate([sid, np.full(pad, N, np.int32)]))
    pay = jnp.asarray(rng.normal(size=(PP, U + pad)).astype(np.float32))
    nb = N // br
    bounds = np.arange(nb + 1) * br
    off = jnp.asarray(np.searchsorted(sid, bounds).astype(np.int32))[None, :]
    w = jnp.zeros(N, jnp.float32)

    kern = functools.partial(kernel, block_rows=br, variant=variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((br,), lambda i, off: (i,)),
        ],
        out_specs=pl.BlockSpec((br,), lambda i, off: (i,)),
        scratch_shapes=[
            pltpu.VMEM((G,), jnp.int32),
            pltpu.VMEM((PP, G), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((PP, br), jnp.float32),
        ],
    )
    f = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    t0 = time.perf_counter()
    out = f(off, sid_p, pay, w)
    _ = float(out[0])
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = f(off, sid_p, pay, w)
    _ = float(out[0])
    print(f"{variant} br={br}: compile {tc:.0f}s steady {(time.perf_counter()-t0)/reps*1e3:.1f} ms")


if __name__ == "__main__":
    main()


def kernel4(off_ref, sid_ref, pay_ref, w_ref, z_ref, n_ref, c_ref,
            w_o, z_o, n_o, c_o, uid_s, pay_s, in_sem, pay_sem, acc_ref,
            *, block_rows, variant):
    i = pl.program_id(0)
    base = i * block_rows
    start = off_ref[0, i]
    end = off_ref[0, i + 1]
    acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(end > start)
    def _():
        astart = (start // G) * G

        def win(w_i, _):
            lo = astart + w_i * G
            cp1 = pltpu.make_async_copy(sid_ref.at[pl.ds(lo, G)], uid_s, in_sem)
            cp2 = pltpu.make_async_copy(pay_ref.at[:, pl.ds(lo, G)], pay_s, pay_sem)
            cp1.start(); cp2.start(); cp1.wait(); cp2.wait()
            lid = uid_s[:] - base
            rows = jax.lax.broadcasted_iota(jnp.int32, (G, block_rows), 1)
            sel = jnp.where(lid[:, None] == rows, 1.0, 0.0)
            acc_ref[:] = acc_ref[:] + jnp.dot(
                pay_s[:], sel, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            return 0

        nwin = (end - astart + G - 1) // G
        jax.lax.fori_loop(0, nwin, win, 0)

    g = acc_ref[0]
    w, z, n, c = w_ref[:], z_ref[:], n_ref[:], c_ref[:]
    n_new = n + g * g
    sigma = (jnp.sqrt(n_new) - jnp.sqrt(n)) / 0.01
    z_new = z + g - sigma * w
    w_new = jnp.where(jnp.abs(z_new) <= 1.0, 0.0,
                      -(z_new - jnp.sign(z_new)) / ((1.0 + jnp.sqrt(n_new)) / 0.01 + 0.1))
    touch = acc_ref[1] != 0
    w_o[:] = jnp.where(touch, w_new, w)
    z_o[:] = jnp.where(touch, z_new, z)
    n_o[:] = jnp.where(touch, n_new, n)
    c_o[:] = c + acc_ref[2]


def main4(alias: bool, br=1024):
    rng = np.random.default_rng(0)
    sid = np.sort(rng.choice(N, size=U, replace=False)).astype(np.int32)
    pad = G + (-U) % G
    sid_p = jnp.asarray(np.concatenate([sid, np.full(pad, N, np.int32)]))
    pay = jnp.asarray(rng.normal(size=(PP, U + pad)).astype(np.float32))
    nb = N // br
    off = jnp.asarray(np.searchsorted(sid, np.arange(nb + 1) * br).astype(np.int32))[None, :]
    st = [jnp.zeros(N, jnp.float32) for _ in range(4)]

    kern = functools.partial(kernel4, block_rows=br, variant="x")
    bs = pl.BlockSpec((br,), lambda i, off: (i,))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY), bs, bs, bs, bs],
        out_specs=(bs, bs, bs, bs),
        scratch_shapes=[
            pltpu.VMEM((G,), jnp.int32),
            pltpu.VMEM((PP, G), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((PP, br), jnp.float32),
        ],
    )
    f = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct((N,), jnp.float32) for _ in range(4)),
        input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3} if alias else {},
    )
    t0 = time.perf_counter()
    outs = f(off, sid_p, pay, *st)
    _ = float(outs[0][0]); tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        outs = f(off, sid_p, pay, *st)
    _ = float(outs[0][0])
    print(f"4state alias={alias} br={br}: compile {tc:.0f}s steady {(time.perf_counter()-t0)/5*1e3:.1f} ms")
