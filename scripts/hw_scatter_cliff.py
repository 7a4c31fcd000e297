"""Where does the XLA TPU scatter-add leave the per-index serial-loop
regime?  Two hypotheses behind the 2^26 stacked-update cost (20.3 ms =
~155 ns/index for a [36, N] lane scatter, BENCH.md round 5):

  A. TARGET SIZE: cost/index vs table rows N (fixed U) — the round-3
     finding "~1.2 ns/element when the scatter TARGET is small (139k
     rows)" suggests a cliff somewhere in 2^17..2^22.
  B. INDEX LOCALITY: same 2^26 table, indices confined to a prefix
     range R — if the loop cost is really DMA/cache locality, a
     frequency-ordered id remap alone (no table split) would fix it.

Also measures the hot/cold composition directly: one small hot table +
the big table, two scatters in one donated jit fn, vs the single big
scatter — the candidate design for the 2^26 step.

Run:  timeout 3600 python scripts/hw_scatter_cliff.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

D = 36          # 4+2K at K=16
UBIG = 131072   # the 2^26 flagship unique bucket


def main() -> int:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    fetch = lambda r: float(jax.tree.leaves(r)[0][0, 0])
    skw = dict(indices_are_sorted=True, unique_indices=True, mode="drop")

    def ping(p, mk, iters=20):
        s = p(mk())
        fetch(s)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = p(s)
        fetch(s)
        return (time.perf_counter() - t0) / iters * 1e3

    rng = np.random.default_rng(0)

    print("== A: [36, N] lane scatter-add, cost vs TARGET rows N ==",
          flush=True)
    for bits in (17, 18, 19, 20, 21, 22, 24):
        N = 1 << bits
        U = min(UBIG, N // 2)
        uids = jax.device_put(
            np.sort(rng.choice(N, U, replace=False)).astype(np.int32))
        d = jax.device_put(np.ones((D, U), np.float32))
        mk = jax.jit(lambda N=N: jnp.zeros((D, N), jnp.float32))
        p = jax.jit(lambda s: s.at[:, uids].add(d, **skw), donate_argnums=0)
        t = ping(p, mk)
        print(f"  N=2^{bits:<2d} U={U:6d}: {t:7.2f} ms  "
              f"{t * 1e6 / U:7.1f} ns/idx", flush=True)

    print("== B: [36, 2^26] table, U=131072 indices confined to prefix R ==",
          flush=True)
    N = 1 << 26
    mk = jax.jit(lambda: jnp.zeros((D, N), jnp.float32))
    for rbits in (18, 20, 23, 26):
        R = 1 << rbits
        uids = jax.device_put(
            np.sort(rng.choice(R, min(UBIG, R // 2),
                               replace=False)).astype(np.int32))
        U = uids.shape[0]
        d = jax.device_put(np.ones((D, U), np.float32))
        p = jax.jit(lambda s: s.at[:, uids].add(d, **skw), donate_argnums=0)
        t = ping(p, mk)
        print(f"  R=2^{rbits:<2d} U={U:6d}: {t:7.2f} ms  "
              f"{t * 1e6 / U:7.1f} ns/idx", flush=True)

    print("== C: hot/cold composition at 2^26 (hot H rows, split U) ==",
          flush=True)
    # Zipf-ish split guess: ~70% of uniques hot at H=2^17..2^19
    for hbits, hot_frac in ((17, 0.6), (18, 0.7), (19, 0.75)):
        H = 1 << hbits
        Uh = int(UBIG * hot_frac)
        Uc = UBIG - Uh
        uh = jax.device_put(
            np.sort(rng.choice(H, min(Uh, H - 1),
                               replace=False)).astype(np.int32))
        Uh = uh.shape[0]
        uc = jax.device_put(
            np.sort(rng.choice(N - H, Uc, replace=False)).astype(np.int32))
        dh = jax.device_put(np.ones((D, Uh), np.float32))
        dc = jax.device_put(np.ones((D, Uc), np.float32))
        mk2 = jax.jit(lambda H=H: (jnp.zeros((D, H), jnp.float32),
                                   jnp.zeros((D, N), jnp.float32)))

        def p2(s, uh=uh, uc=uc, dh=dh, dc=dc):
            h, c = s
            return (h.at[:, uh].add(dh, **skw),
                    c.at[:, uc].add(dc, **skw))

        p2j = jax.jit(p2, donate_argnums=0)
        t = ping(p2j, mk2)
        print(f"  H=2^{hbits} Uh={Uh} Uc={Uc}: {t:7.2f} ms "
              f"(vs single-big ~{UBIG * 155e-6:.1f})", flush=True)

    print("== D: gather cost vs target (same shapes as A, fill mode) ==",
          flush=True)
    gkw = dict(indices_are_sorted=True, unique_indices=True,
               mode="fill", fill_value=0)
    for bits in (17, 19, 22, 26):
        Ng = 1 << bits
        U = min(UBIG, Ng // 2)
        uids = jax.device_put(
            np.sort(rng.choice(Ng, U, replace=False)).astype(np.int32))
        # src as an ARGUMENT: a closure-captured device array becomes a
        # jit constant, whose lowering fetches it to host — a 9.66 GB
        # d2h at 2^26 (this OOM'd the first run of this script)
        src = jax.device_put(np.ones((D, Ng), np.float32))
        pg = jax.jit(lambda s, i: s.at[:, i].get(**gkw))
        r = pg(src, uids)
        float(r[0, 0])
        t0 = time.perf_counter()
        for _ in range(20):
            r = pg(src, uids)
        float(r[0, 0])
        t = (time.perf_counter() - t0) / 20 * 1e3
        print(f"  N=2^{bits:<2d} U={U:6d}: {t:7.2f} ms  "
              f"{t * 1e6 / U:7.1f} ns/idx", flush=True)
        del src, r, uids
    return 0


if __name__ == "__main__":
    sys.exit(main())
