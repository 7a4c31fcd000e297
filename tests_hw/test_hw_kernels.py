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
