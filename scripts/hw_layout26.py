"""Big-table (2^26) state-layout shootout: pull + update cost per layout.

The 2^26 kernel=xla step spends 43.9 of 58.8 ms in updater.update and
8.9 ms in updater.pull (scripts/hw_xla_step_bd.py, round 5) — six planar
arrays mean 6 gathers + 6 scatters, and XLA TPU scatters cost per-ELEMENT
(~8 ns), so [K, N] lane-indexed scatters dominate. Candidate layouts that
turn the update into ONE gather + ONE scatter without the PackedFMState
[N, 128] physical-pad blowup (32 GB at 2^26):

  planar   six arrays w/z/n/cnt [N] + V/nV [K, N]   (baseline, 9.66 GB)
  stacked  ONE [D, N] array, D = 4+2K rows           (phys [40, N], 10.7 GB)
  super32  ONE [N/32, 32*D] array: 32 consecutive feature rows per
           "super-row"; 32*36 = 1152 = 9*128 lanes — ZERO physical pad
           (9.66 GB). Gather/scatter address [1, D] windows at
           (row u//32, lane (u%32)*D) via 2-D lax.gather/scatter_add —
           per-INDEX cost, contiguous sublane-major windows.
  super32w same table; scatter writes the full 1152-lane window per index
           (mask-built delta), gather pulls the full window then selects.

Each non-planar variant splits the update into a (pull+math) delta jit
and a SCATTER-ONLY donated jit: a fused gather->scatter on one table made
XLA materialize a full table copy (RESOURCE_EXHAUSTED at 2^26 — the
gather's read blocks aliasing the donated operand into the scatter), while
a scatter whose operand has no other use aliases in place. The [U, D]
delta handoff costs ~19 MB.

Run one variant per PROCESS (an OOM can wedge the tunneled runtime):
    BENCH_BITS=26 timeout 1200 python scripts/hw_layout26.py <variant>
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit_pure(fn, fetch, iters=20):
    fetch(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    fetch(r)
    return (time.perf_counter() - t0) / iters * 1e3


def timeit_donate(fn, state, fetch, iters=20):
    s = fn(state)
    fetch(s)
    t0 = time.perf_counter()
    for _ in range(iters):
        s = fn(s)
    fetch(s)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import K, NUM_BITS, make_batches
    from difacto_tpu.data.prep import prep_batch

    variant = sys.argv[1]
    assert jax.default_backend() == "tpu"
    N = 1 << NUM_BITS
    D = 4 + 2 * K
    pb = prep_batch(make_batches(1)[0], N)
    U = pb.uids.shape[0]
    put = jax.device_put
    uids, valid = put(pb.uids), put(pb.valid)
    grads = put(
        np.random.default_rng(0).normal(size=(U, 1 + K)).astype(np.float32)
    )
    add_cnt = put(pb.ucounts)
    print(f"variant={variant} N=2^{NUM_BITS} D={D} U={U}", flush=True)
    fetch = lambda r: float(jax.tree.leaves(r)[0].reshape(-1)[0])
    lr, beta, l1, l2 = 0.01, 1.0, 1.0, 1e-5
    Vlr, Vbeta, Vl2, thr = 0.005, 1.0, 1e-5, 2.0

    def ftrl_w(w, z, n, g, m):
        n2 = n + g * g
        sig = (jnp.sqrt(n2) - jnp.sqrt(n)) / lr
        z2 = z + g - sig * w
        w2 = jnp.where(
            jnp.abs(z2) <= l1, 0.0,
            -(z2 - jnp.sign(z2) * l1) / ((beta + jnp.sqrt(n2)) / lr + l2),
        )
        return m * (w2 - w), m * (z2 - z), m * (n2 - n)

    def ada_V(V, nV, gV, mV):
        g2 = gV + Vl2 * V
        nV2 = nV + g2 * g2
        V2 = V - Vlr * g2 / (jnp.sqrt(nV2) + Vbeta)
        return mV * (V2 - V), mV * (nV2 - nV)

    if variant == "planarf":
        # planar six-array layout, but every gather/scatter carries the
        # truth XLA can exploit: indices_are_sorted + unique_indices
        # (prep uids are sorted-unique with OOB num_rows sentinels) and
        # mode=fill/drop (sentinels never clamp to row 0, they vanish).
        w = jax.jit(lambda: jnp.zeros(N, jnp.float32))
        state = dict(
            w=w(), z=w(), n=w(), cnt=w(),
            V=jax.jit(lambda: jnp.zeros((K, N), jnp.float32))(),
            nV=jax.jit(lambda: jnp.zeros((K, N), jnp.float32))(),
        )
        gkw = dict(indices_are_sorted=True, unique_indices=True,
                   mode="fill", fill_value=0)
        skw = dict(indices_are_sorted=True, unique_indices=True,
                   mode="drop")

        def pull(st):
            w_u = st["w"].at[uids].get(**gkw)
            cnt = st["cnt"].at[uids].get(**gkw)
            act = (valid & (cnt >= thr)).astype(jnp.float32)
            V = st["V"].at[:, uids].get(**gkw).T * act[:, None]
            return jnp.concatenate([w_u[:, None], V], axis=1)

        def update(st):
            m = valid.astype(jnp.float32)
            w_u = st["w"].at[uids].get(**gkw)
            z_u = st["z"].at[uids].get(**gkw)
            n_u = st["n"].at[uids].get(**gkw)
            cnt = st["cnt"].at[uids].get(**gkw)
            dw, dz, dn = ftrl_w(w_u, z_u, n_u, grads[:, 0], m)
            mV = (valid & (cnt >= thr)).astype(jnp.float32)[None]
            V_u = st["V"].at[:, uids].get(**gkw)
            nV_u = st["nV"].at[:, uids].get(**gkw)
            dV, dnV = ada_V(V_u, nV_u, grads[:, 1:].T, mV)
            return dict(
                w=st["w"].at[uids].add(dw, **skw),
                z=st["z"].at[uids].add(dz, **skw),
                n=st["n"].at[uids].add(dn, **skw),
                cnt=st["cnt"].at[uids].add(m * add_cnt, **skw),
                V=st["V"].at[:, uids].add(dV, **skw),
                nV=st["nV"].at[:, uids].add(dnV, **skw),
            )

        p_pull = jax.jit(pull)
        p_up = jax.jit(update, donate_argnums=0)
        t_pull = timeit_pure(lambda: p_pull(state), fetch)
        print(f"  pull  {t_pull:7.2f} ms", flush=True)
        t_up = timeit_donate(p_up, state, fetch)

    elif variant == "planar":
        from difacto_tpu.config import FMParam
        from difacto_tpu.updaters.updater import FMUpdater

        upd = FMUpdater(FMParam(V_dim=K))
        state = jax.jit(lambda: upd.init_state(N, 0))()
        p_pull = jax.jit(lambda s: upd.pull(s, uids, valid))
        p_up = jax.jit(
            lambda s: upd.update(s, uids, grads, add_cnt, valid),
            donate_argnums=0,
        )
        t_pull = timeit_pure(lambda: p_pull(state), fetch)
        t_up = timeit_donate(p_up, state, fetch)

    elif variant == "stacked":
        # rows: w|z|n|cnt|V(K)|nV(K)  -> [D, N]
        state = jax.jit(lambda: jnp.zeros((D, N), jnp.float32))()
        idx = jnp.where(valid, uids, 0)

        def pull(t):
            r = t[:, idx]                     # ONE lane-indexed gather [D, U]
            v = valid.astype(jnp.float32)
            w = r[0] * v
            act = (valid & (r[3] >= thr)).astype(jnp.float32)
            return jnp.concatenate([w[None], r[4 : 4 + K] * act[None]], 0)

        def delta_of(t):
            r = t[:, idx]
            m = valid.astype(jnp.float32)
            dw, dz, dn = ftrl_w(r[0], r[1], r[2], grads[:, 0], m)
            mV = (valid & (r[3] >= thr)).astype(jnp.float32)[None]
            dV, dnV = ada_V(r[4 : 4 + K], r[4 + K :], grads[:, 1:].T, mV)
            return jnp.concatenate(
                [dw[None], dz[None], dn[None], (m * add_cnt)[None], dV, dnV], 0
            )

        p_pull = jax.jit(pull)
        p_delta = jax.jit(delta_of)
        p_sc = jax.jit(
            lambda t, d: t.at[:, idx].add(d), donate_argnums=0
        )                                     # ONE lane-indexed scatter
        t_pull = timeit_pure(lambda: p_pull(state), fetch)
        print(f"  pull  {t_pull:7.2f} ms", flush=True)
        delta = p_delta(state)
        t_delta = timeit_pure(lambda: p_delta(state), fetch)
        print(f"  delta {t_delta:7.2f} ms", flush=True)
        s = p_sc(state, delta)
        fetch(s)
        t0 = time.perf_counter()
        for _ in range(20):
            s = p_sc(s, delta)
        fetch(s)
        t_sc = (time.perf_counter() - t0) / 20 * 1e3
        t_up = t_delta + t_sc
        print(f"  scat  {t_sc:7.2f} ms", flush=True)

    elif variant in ("super32", "super32w"):
        G = 32
        C = G * D
        state = jax.jit(lambda: jnp.zeros((N // G, C), jnp.float32))()
        idx = jnp.where(valid, uids, 0)
        r_i = (idx // G).astype(jnp.int32)
        c_i = ((idx % G) * D).astype(jnp.int32)
        gd = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1),
        )
        sd = lax.ScatterDimensionNumbers(
            update_window_dims=(1,), inserted_window_dims=(0,),
            scatter_dims_to_operand_dims=(0, 1),
        )
        starts = jnp.stack([r_i, c_i], 1)

        def rows_of(t):
            if variant == "super32":
                return lax.gather(
                    t, starts, gd, (1, D),
                    mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                )                                  # [U, D] 2-D window gather
            full = t[r_i]                          # [U, C] row gather
            return jnp.take_along_axis(
                full.reshape(U, G, D), (idx % G)[:, None, None], axis=1
            )[:, 0, :]

        def pull(t):
            r = rows_of(t)
            v = valid.astype(jnp.float32)
            w = r[:, 0] * v
            act = (valid & (r[:, 3] >= thr)).astype(jnp.float32)
            return jnp.concatenate([w[:, None], r[:, 4 : 4 + K] * act[:, None]], 1)

        def delta_of(t):
            r = rows_of(t)
            m = valid.astype(jnp.float32)
            dw, dz, dn = ftrl_w(r[:, 0], r[:, 1], r[:, 2], grads[:, 0], m)
            mV = (valid & (r[:, 3] >= thr)).astype(jnp.float32)[:, None]
            dV, dnV = ada_V(r[:, 4 : 4 + K], r[:, 4 + K :], grads[:, 1:], mV)
            return jnp.concatenate(
                [dw[:, None], dz[:, None], dn[:, None],
                 (m * add_cnt)[:, None], dV, dnV], 1)   # [U, D]

        def scat(t, delta):
            if variant == "super32":
                return lax.scatter_add(
                    t, starts, delta, sd,
                    mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
                )                                  # 2-D window scatter
            wide = jnp.where(
                (jnp.arange(G)[None, :, None] == (idx % G)[:, None, None]),
                delta[:, None, :], 0.0,
            ).reshape(U, C)                        # mask-built full window
            return t.at[r_i].add(wide)             # sublane row scatter

        p_pull = jax.jit(pull)
        p_delta = jax.jit(delta_of)
        p_sc = jax.jit(scat, donate_argnums=0)
        t_pull = timeit_pure(lambda: p_pull(state), fetch)
        print(f"  pull  {t_pull:7.2f} ms", flush=True)
        delta = p_delta(state)
        t_delta = timeit_pure(lambda: p_delta(state), fetch)
        print(f"  delta {t_delta:7.2f} ms", flush=True)
        s = p_sc(state, delta)
        fetch(s)
        t0 = time.perf_counter()
        for _ in range(20):
            s = p_sc(s, delta)
        fetch(s)
        t_sc = (time.perf_counter() - t0) / 20 * 1e3
        t_up = t_delta + t_sc
        print(f"  scat  {t_sc:7.2f} ms", flush=True)

    else:
        raise SystemExit(f"unknown variant {variant}")

    print(f"{variant}: pull {t_pull:7.2f} ms   update {t_up:7.2f} ms",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
