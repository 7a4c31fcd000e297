"""Real-chip kernel regression gate (see conftest.py for why/how).

Two facts the CPU suite cannot protect (VERDICT r3 weak #5):

* the S=8 owner-side pair schedules compile under REAL Mosaic and stay
  bit-exact against the FMUpdater semantic reference — the multi-chip
  production path, validated here on one chip because the kernels see
  only the schedule, never the mesh;
* a flagship-shaped LocalStore pairs train step compiles, runs, and
  reproduces the XLA step — a one-batch bench smoke that also prints
  the ms/step it saw, so a perf cliff is visible in the gate's output.

Run: DIFACTO_HW=1 timeout 3600 python -m pytest tests_hw/ -x -q
(first run per Mosaic-cache state can take 5-15 min/shape to compile).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def test_hw_sharded_pair_schedules_bit_exact(tpu):
    """scripts/hw_sharded_pairs.py as a gate: S=8 multi-segment pull
    (window-order, cross-segment first-visit blending) and apply
    (block-order, accumulate-until-flush) on real Mosaic, err < 1e-4."""
    from scripts.hw_sharded_pairs import main

    assert main() == 0


def test_hw_pairs_train_step_matches_xla(tpu):
    """One flagship-shaped batch: kernel=pairs vs kernel=xla on the real
    chip, same prepped inputs, state bit-close after a train step."""
    import jax

    from difacto_tpu.config import Config
    from difacto_tpu.data.batch_iter import Batch
    from difacto_tpu.data.prep import prep_batch
    from difacto_tpu.parallel.store import LocalStore
    from difacto_tpu.updaters.updater import FMUpdater

    B, L, num_bits, K = 16384, 40, 22, 16
    N = 1 << num_bits
    rng = np.random.default_rng(7)
    ids = rng.integers(0, N, (B, L)).astype(np.int32)
    ids[rng.random((B, L)) < 0.08] = -1
    batch = Batch(
        ids,
        np.where(ids >= 0, 1.0, 0.0).astype(np.float32),
        (rng.random(B) > 0.5).astype(np.float32),
        np.ones(B, np.float32),
    )

    def run(kernel):
        from difacto_tpu.updaters.updater import (
            PackedFMState, StackedFMState, unpack_state, unstack_state,
        )

        cfg = Config.from_kwargs([
            ("batch_size", str(B)), ("num_bits", str(num_bits)),
            ("max_nnz_per_row", str(L)), ("V_dim", str(K)),
            ("store", "local"), ("kernel", kernel),
        ])
        st = LocalStore(FMUpdater(cfg.model), cfg)
        state = st.init_state(seed=3)
        pb = prep_batch(batch, N)
        state, _ = st.train_step_prepped(state, pb)  # compile
        float(np.asarray(jax.tree_util.tree_leaves(state)[0]).ravel()[0])
        t0 = time.time()
        state, _ = st.train_step_prepped(state, pb)
        float(np.asarray(jax.tree_util.tree_leaves(state)[0]).ravel()[0])
        dt = time.time() - t0
        if isinstance(state, PackedFMState):
            state = jax.jit(unpack_state)(state)
        elif isinstance(state, StackedFMState):
            state = jax.jit(unstack_state)(state)
        return jax.device_get(state), dt

    s_xla, t_xla = run("xla")
    s_pairs, t_pairs = run("pairs")
    print(f"hw smoke: xla {t_xla*1e3:.1f} ms/step, pairs {t_pairs*1e3:.1f} "
          f"ms/step (flagship 2^22, untimed-warmup single step)")
    for name in ("w", "z", "n", "V", "nV", "cnt"):
        a, b = np.asarray(getattr(s_xla, name)), np.asarray(
            getattr(s_pairs, name))
        if a.size:
            np.testing.assert_allclose(a, b, atol=2e-4, err_msg=name)


def test_hw_hot_split_matches_stacked(tpu):
    """The hot/cold frequency-split path (round 5b: the 2^26 production
    regime) vs the single stacked table on the real chip: one train
    step from an identical start, canonical state compared on 512
    sampled rows + permutation-invariant sums; prints both ms/step so
    the ~1.8x is visible in the gate output.

    Tunnel discipline (CLAUDE.md): NO multi-GB transfers — V starts at
    a CONSTANT (set on device; any layout permutation of a constant is
    the constant), and the comparison fetches only [36, 512] sampled
    rows plus a handful of scalars."""
    import jax
    import jax.numpy as jnp

    from difacto_tpu.config import Config
    from difacto_tpu.data.batch_iter import Batch
    from difacto_tpu.data.prep import prep_batch
    from difacto_tpu.data.remap import build_remap, count_sample
    from difacto_tpu.parallel.store import LocalStore
    from difacto_tpu.updaters.updater import (
        FMUpdater, HotColdFMState, StackedFMState,
    )

    B, L, num_bits, K, H = 16384, 40, 24, 16, 1 << 18
    N = 1 << num_bits
    rng = np.random.default_rng(11)
    z = rng.zipf(1.2, size=(B, L)).astype(np.uint64)
    with np.errstate(over="ignore"):
        ids = ((z * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(N)).astype(
            np.int32
        )
    ids[rng.random((B, L)) < 0.08] = -1
    batch = Batch(
        ids,
        np.where(ids >= 0, 1.0, 0.0).astype(np.float32),
        (rng.random(B) > 0.5).astype(np.float32),
        np.ones(B, np.float32),
    )
    lut = build_remap(count_sample(iter([batch]), N, 1), H)
    # sample touched AND untouched canonical rows for the digest
    touched = np.unique(ids[ids >= 0])
    sample = np.concatenate([
        rng.choice(touched, 384, replace=False),
        rng.choice(N, 128, replace=False),
    ]).astype(np.int64)

    def run(hot):
        cfg = Config.from_kwargs([
            ("batch_size", str(B)), ("num_bits", str(num_bits)),
            ("max_nnz_per_row", str(L)), ("V_dim", str(K)),
            ("store", "local"), ("kernel", "xla"),
            ("hot_rows", str(hot)), ("V_init_scale", "0.01"),
        ])
        st = LocalStore(FMUpdater(cfg.model), cfg)
        from difacto_tpu.utils.place import place_batch

        if hot:
            st.set_remap(lut)
            pb = prep_batch(batch, N, remap=lut, hot_rows=hot)
        else:
            pb = prep_batch(batch, N)
        pb = place_batch(pb)  # device-resident, like the production cache
        # (unplaced, each step re-ships ~13 MB over the ~60 MB/s tunnel
        # and the printed ms/step measures the link, not the chip)
        state = st.init_state(seed=3)
        setv = jax.jit(lambda t: t.at[4 : 4 + K].set(0.01),
                       donate_argnums=0)
        if hot:
            state = HotColdFMState(hot=setv(state.hot),
                                   cold=setv(state.cold))
        else:
            state = StackedFMState(tbl=setv(state.tbl))
        state, _ = st.train_step_prepped(state, pb)  # compile
        tb0 = state.hot if hot else state.tbl
        float(tb0[0, 0])
        t0 = time.time()
        state, _ = st.train_step_prepped(state, pb)
        tb0 = state.hot if hot else state.tbl
        float(tb0[0, 0])
        dt = time.time() - t0
        # canonical digest: sampled rows + permutation-invariant sums
        if hot:
            pos = lut[sample]
            rows = np.where(
                (pos < H)[None, :],
                np.asarray(jax.jit(
                    lambda t: t[:, jnp.where(pos < H, pos, 0)]
                )(state.hot)),
                np.asarray(jax.jit(
                    lambda t: t[:, jnp.where(pos >= H, pos - H, 0)]
                )(state.cold)),
            )
            # positive-definite digests: a signed sum over 16M f32 rows
            # cancels toward zero, where any associativity difference
            # (hot+cold vs one table) breaks a relative tolerance
            sums = [
                float(jnp.sum(jnp.abs(state.hot[i]))
                      + jnp.sum(jnp.abs(state.cold[i])))
                for i in (0, 2, 3)
            ]
        else:
            # the stacked run preps WITHOUT remap: canonical row h is
            # simply column h
            rows = np.asarray(
                jax.jit(lambda t: t[:, sample])(state.tbl)
            )
            sums = [
                float(jnp.sum(jnp.abs(state.tbl[i]))) for i in (0, 2, 3)
            ]
        return rows, sums, dt

    r0, sums0, t0 = run(0)
    r1, sums1, t1 = run(H)
    print(f"hw hot-split smoke (2^24): stacked {t0*1e3:.1f} ms/step, "
          f"hot/cold {t1*1e3:.1f} ms/step")
    # rtol covers the big accumulator planes (n sums g^2 into ~1e4-size
    # values; the two lane numberings tile the segsum differently, so
    # per-key f32 association differs by ~ulp — measured max rel 2.6e-7)
    np.testing.assert_allclose(r0, r1, rtol=1e-5, atol=2e-4)
    np.testing.assert_allclose(sums0, sums1, rtol=1e-4)
