"""Localizer tests (reference: localizer_test.cc — compact ids + counts)."""

import jax.numpy as jnp
import numpy as np

from difacto_tpu.ops.localize import localize


def test_localize_matches_numpy_unique():
    ids = np.array([[5, 3, 5, -1], [7, 3, -1, -1]], np.int32)
    loc = localize(jnp.asarray(ids), num_rows=16, unique_size=8)
    uids = np.asarray(loc.uids)
    valid = np.asarray(loc.valid)
    assert list(uids[valid]) == [3, 5, 7]
    # counts: 3 appears twice, 5 twice, 7 once
    counts = np.asarray(loc.counts)
    assert counts[list(uids).index(3)] == 2
    assert counts[list(uids).index(5)] == 2
    assert counts[list(uids).index(7)] == 1
    # invalid lanes hold the sentinel and zero counts
    assert (uids[~valid] == 16).all()
    assert (counts[~valid] == 0).all()


def test_inverse_reconstructs():
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 50, size=(8, 16)).astype(np.int32)
    ids[rng.random(ids.shape) < 0.3] = -1
    loc = localize(jnp.asarray(ids), num_rows=64, unique_size=8 * 16)
    uids = np.asarray(loc.uids)
    recon = uids[np.asarray(loc.inv)].reshape(8, 16)
    real = ids >= 0
    np.testing.assert_array_equal(recon[real], ids[real])
    # padded slots must reference invalid (sentinel) lanes
    assert (recon[~real] == 64).all()


def test_counts_total():
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 30, size=(4, 8)).astype(np.int32)
    loc = localize(jnp.asarray(ids), num_rows=32, unique_size=32)
    assert float(np.asarray(loc.counts).sum()) == 32.0


def test_sorted_output():
    ids = np.array([[9, 1, 4, 1]], np.int32)
    loc = localize(jnp.asarray(ids), num_rows=16, unique_size=4)
    uids = np.asarray(loc.uids)
    assert (np.diff(uids) >= 0).all()


def test_overflow_counted_not_silent():
    """unique_size smaller than the batch's distinct ids must be COUNTED
    (round-1 advisor finding: it used to be silently wrong)."""
    ids = np.array([[1, 2, 3, 4, 5, 6, 7, 8]], np.int32)
    loc = localize(jnp.asarray(ids), num_rows=16, unique_size=4)
    assert float(loc.overflow) == 4.0
    # the kept lanes are the 4 smallest distinct ids, correctly counted
    np.testing.assert_array_equal(np.asarray(loc.uids), [1, 2, 3, 4])
    np.testing.assert_array_equal(np.asarray(loc.counts), [1, 1, 1, 1])
    # no overflow when it fits (padding never counts as overflow)
    ids2 = np.array([[1, 2, 2, -1]], np.int32)
    loc2 = localize(jnp.asarray(ids2), num_rows=16, unique_size=4)
    assert float(loc2.overflow) == 0.0


def test_overflow_surfaces_in_step_metrics():
    from difacto_tpu.config import Config
    from difacto_tpu.parallel.store import LocalStore
    from difacto_tpu.updaters.updater import FMUpdater

    cfg = Config.from_kwargs(
        [("batch_size", "4"), ("num_bits", "8"), ("max_nnz_per_row", "8"),
         ("V_dim", "0"), ("unique_size", "4")]
    )
    store = LocalStore(FMUpdater(cfg.model), cfg)
    s = store.init_state(0)
    rng = np.random.default_rng(0)
    ids = rng.permutation(np.arange(32, dtype=np.int32)).reshape(4, 8)
    vals = np.ones((4, 8), np.float32)
    labels = np.ones(4, np.float32)
    mask = np.ones(4, np.float32)
    s, m = store.train_step(s, ids, vals, labels, mask)
    assert float(m.dropped_ids) == 28.0  # 32 distinct ids, 4 lanes
