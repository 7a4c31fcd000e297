"""Sorted-slot segment-sum kernel tests (interpret mode on CPU).

ops/segsum.py replaces the XLA scatter-add in the kernel=pairs train
step (measured 10.9 ms of the 24 ms flagship step — BENCH.md round 4).
Pins: the kernel against np.add.at, the meta-builder invariants, the
sorted worker backward against the scatter worker backward, and the full
LocalStore kernel=pairs train path segsum=sorted vs segsum=scatter.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from helpers import fm_leaves

from difacto_tpu.config import Config
from difacto_tpu.data.batch_iter import Batch
from difacto_tpu.data.prep import build_sorted_slots, prep_batch
from difacto_tpu.learners.step import worker_grads, worker_grads_sorted
from difacto_tpu.ops.localize import Localized
from difacto_tpu.ops.segsum import (
    build_seg_meta, lanes_2d, pad_sorted_stream, segsum_sorted,
)
from difacto_tpu.parallel.store import LocalStore
from difacto_tpu.updaters.updater import FMUpdater


def _run_segsum(pay, inv_p, ub, tile_slots=1024, win_lanes=512):
    meta = build_seg_meta(inv_p, ub, tile_slots, win_lanes)
    return np.asarray(
        segsum_sorted(
            jnp.asarray(pay), lanes_2d(jnp.asarray(inv_p)),
            (jnp.asarray(meta.tiles), jnp.asarray(meta.wins),
             jnp.asarray(meta.first)),
            ub=ub, tile_slots=tile_slots, win_lanes=win_lanes,
            interpret=True,
        )
    ), meta


@pytest.mark.parametrize(
    "bl,ub,pp", [(4096, 1024, 8), (5000, 640, 24), (2048, 4096, 16)]
)
def test_segsum_matches_scatter(bl, ub, pp):
    rng = np.random.default_rng(bl + ub)
    lanes = np.sort(rng.integers(0, ub, bl)).astype(np.int32)
    inv_p = pad_sorted_stream(lanes)
    blp = inv_p.shape[0]
    pay = rng.normal(size=(pp, blp)).astype(np.float32)
    pay[:, bl:] = 0.0
    out, _ = _run_segsum(pay, inv_p, ub)
    ref = np.zeros((pp, ub), np.float32)
    np.add.at(ref.T, lanes, pay[:, :bl].T)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-5)


def test_segsum_uncovered_windows_zero():
    # uniques cluster at the bottom; lanes near ub are sentinel padding
    # no slot maps to — their windows must come back EXACT zero (the
    # store masks with `valid`, but grads_u is also exposed directly)
    rng = np.random.default_rng(3)
    bl, ub = 2048, 8192
    lanes = np.sort(rng.integers(0, 600, bl)).astype(np.int32)
    inv_p = pad_sorted_stream(lanes)
    pay = rng.normal(size=(8, inv_p.shape[0])).astype(np.float32)
    pay[:, bl:] = 0.0
    out, meta = _run_segsum(pay, inv_p, ub)
    assert np.all(out[:, 1024:] == 0.0)
    # every real window appears exactly as a run in the schedule
    assert set(meta.wins[meta.first == 1].tolist()) >= set(
        range(meta.n_win)
    )


def test_seg_meta_invariants():
    rng = np.random.default_rng(11)
    for _ in range(4):
        bl = int(rng.integers(1000, 9000))
        ub = int(rng.integers(512, 4096))
        lanes = np.sort(rng.integers(0, ub, bl)).astype(np.int32)
        inv_p = pad_sorted_stream(lanes)
        m = build_seg_meta(inv_p, ub)
        # window-major, tiles monotone within a window run
        w = m.wins.astype(np.int64)
        run_start = m.first == 1
        assert run_start[0]
        assert np.all((w[1:] >= w[:-1]) | (m.wins[1:] == m.n_win))
        same = m.wins[1:] == m.wins[:-1]
        assert np.all(m.tiles[1:][same] >= m.tiles[:-1][same])
        # pad pairs target the sentinel window only
        n_tiles = inv_p.shape[0] // m.tile_slots
        assert np.all(m.tiles < n_tiles)
        assert np.all(m.wins <= m.n_win)


def _batch(seed, B=256, L=12, N=4096, pad_frac=0.1):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, N, (B, L)).astype(np.int32)
    ids[rng.random((B, L)) < pad_frac] = -1
    vals = np.where(ids < 0, 0.0, rng.normal(size=(B, L))).astype(np.float32)
    return Batch(
        ids, vals, (rng.random(B) > 0.5).astype(np.float32),
        np.ones(B, np.float32),
    )


@pytest.mark.parametrize("K", [0, 4])
def test_worker_grads_sorted_matches_scatter(K):
    N = 4096
    b = _batch(5)
    pb = prep_batch(b, N)
    ss = build_sorted_slots(pb.inv, pb.vals, pb.uids.shape[0])
    rng = np.random.default_rng(0)
    U = pb.uids.shape[0]
    rows_u = jnp.asarray(
        (rng.normal(size=(U, 1 + K)) * 0.1).astype(np.float32)
    )
    loc = Localized(
        uids=jnp.asarray(pb.uids), inv=jnp.asarray(pb.inv),
        counts=jnp.asarray(pb.ucounts), valid=jnp.asarray(pb.valid),
    )
    args = (jnp.asarray(pb.vals), jnp.asarray(pb.labels),
            jnp.asarray(pb.mask))
    g_ref, py_ref, m_ref = worker_grads(rows_u, loc, *args)
    g_s, py_s, m_s = worker_grads_sorted(
        rows_u, loc, *args,
        (jnp.asarray(ss.x_sorted), jnp.asarray(ss.bidx),
         jnp.asarray(ss.inv_sorted), jnp.asarray(ss.seg_tiles),
         jnp.asarray(ss.seg_wins), jnp.asarray(ss.seg_first)),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(py_s), np.asarray(py_ref),
                               atol=1e-5)
    # junk lane (ub-1) may differ — scatter accumulates pad slots there
    # with x == 0, sorted ditto; both are masked by `valid` downstream
    vmask = np.asarray(pb.valid)
    np.testing.assert_allclose(
        np.asarray(g_s.T)[vmask], np.asarray(g_ref)[vmask],
        atol=2e-5, rtol=1e-5,
    )
    assert float(m_s.logloss_sum) == pytest.approx(
        float(m_ref.logloss_sum), rel=1e-6
    )


@pytest.mark.parametrize("K,min_ub", [(4, None), (0, None), (4, 2048)])
def test_local_pairs_sorted_matches_scatter_training(K, min_ub):
    N = 4096
    states = {}
    for seg in ("scatter", "sorted"):
        cfg = Config.from_kwargs([
            ("batch_size", "256"), ("num_bits", "12"),
            ("max_nnz_per_row", "12"), ("V_dim", str(K)),
            ("kernel", "pairs"), ("interpret", "1"), ("segsum", seg),
            ("unique_size", str(min_ub or 0)),
        ])
        upd = FMUpdater(cfg.model)
        store = LocalStore(upd, cfg, interpret=True)
        assert store.sorted_grads == (seg == "sorted")
        st = store.init_state(0)
        for s in range(5):
            pb = prep_batch(_batch(s), N, min_ub=min_ub)
            st, _ = store.train_step_prepped(st, pb)
        states[seg] = fm_leaves(st)
    for a, b in zip(
        jax.tree.leaves(states["scatter"]), jax.tree.leaves(states["sorted"])
    ):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


def test_sharded_pairs_sorted_matches_scatter_training():
    from difacto_tpu.data.prep import prep_batch_sharded
    from difacto_tpu.parallel.store import ShardedStore

    N_BITS = 12
    states = {}
    metrics = {}
    for seg in ("scatter", "sorted"):
        cfg = Config.from_kwargs([
            ("batch_size", "256"), ("num_bits", str(N_BITS)),
            ("max_nnz_per_row", "12"), ("V_dim", "4"),
            ("kernel", "pairs"), ("segsum", seg),
        ])
        upd = FMUpdater(cfg.model)
        store = ShardedStore(upd, cfg, interpret=True)
        assert store.sorted_grads == (seg == "sorted")
        st = store.init_state(0)
        for s in range(4):
            pb = prep_batch_sharded(_batch(s, N=1 << N_BITS), store.num_rows,
                                    store.S)
            st, m = store.train_step_prepped(st, pb)
            if seg == "sorted" and s == 0:
                assert pb.sorted_slots is not None  # cached for replay
        states[seg] = fm_leaves(st)
        metrics[seg] = float(m.logloss_sum)
    assert metrics["scatter"] == pytest.approx(metrics["sorted"], rel=1e-5)
    for a, b in zip(
        jax.tree.leaves(states["scatter"]), jax.tree.leaves(states["sorted"])
    ):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "K,layout", [(4, "packed"), (4, "planar"), (0, "packed"),
                 (4, "stacked"), (0, "stacked")]
)
def test_local_xla_sorted_matches_scatter_training(K, layout):
    """kernel=xla + segsum=sorted (the big-table path's aggregation —
    table-size independent, same kernel as pairs) trains bit-close to
    the plain XLA scatter path, both layouts."""
    N = 4096
    states = {}
    for seg in ("scatter", "sorted"):
        cfg = Config.from_kwargs([
            ("batch_size", "256"), ("num_bits", "12"),
            ("max_nnz_per_row", "12"), ("V_dim", str(K)),
            ("kernel", "xla"), ("segsum", seg), ("layout", layout),
        ])
        upd = FMUpdater(cfg.model)
        store = LocalStore(upd, cfg)
        assert store.sorted_grads == (seg == "sorted")
        assert not store.pallas and not store.pairs
        st = store.init_state(0)
        for s in range(5):
            pb = prep_batch(_batch(s), N)
            st, _ = store.train_step_prepped(st, pb)
        states[seg] = fm_leaves(st)
    for a, b in zip(
        jax.tree.leaves(states["scatter"]), jax.tree.leaves(states["sorted"])
    ):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


def test_local_sweep_sorted_matches_scatter_training():
    """The whole-table-sweep (pallas, interpret) prepped path also rides
    the sorted backward when segsum=sorted."""
    N = 4096
    states = {}
    for seg in ("scatter", "sorted"):
        cfg = Config.from_kwargs([
            ("batch_size", "256"), ("num_bits", "12"),
            ("max_nnz_per_row", "12"), ("V_dim", "4"),
            ("kernel", "pallas"), ("interpret", "1"), ("segsum", seg),
        ])
        upd = FMUpdater(cfg.model)
        store = LocalStore(upd, cfg, interpret=True)
        assert store.pallas and store.sorted_grads == (seg == "sorted")
        st = store.init_state(0)
        for s in range(4):
            pb = prep_batch(_batch(s), N)
            st, _ = store.train_step_prepped(st, pb)
        states[seg] = fm_leaves(st)
    for a, b in zip(
        jax.tree.leaves(states["scatter"]), jax.tree.leaves(states["sorted"])
    ):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


def test_sharded_xla_sorted_matches_scatter_training():
    """ShardedStore kernel=xla + segsum=sorted: worker-side sorted
    aggregation before routing ≡ the scatter path, multi-step."""
    from difacto_tpu.data.prep import prep_batch_sharded
    from difacto_tpu.parallel.store import ShardedStore

    N_BITS = 12
    states = {}
    metrics = {}
    for seg in ("scatter", "sorted"):
        cfg = Config.from_kwargs([
            ("batch_size", "256"), ("num_bits", str(N_BITS)),
            ("max_nnz_per_row", "12"), ("V_dim", "4"),
            ("kernel", "xla"), ("segsum", seg),
        ])
        upd = FMUpdater(cfg.model)
        store = ShardedStore(upd, cfg)
        assert store.sorted_grads == (seg == "sorted")
        st = store.init_state(0)
        for s in range(4):
            pb = prep_batch_sharded(_batch(s, N=1 << N_BITS), store.num_rows,
                                    store.S)
            st, m = store.train_step_prepped(st, pb)
        states[seg] = fm_leaves(st)
        metrics[seg] = float(m.logloss_sum)
    assert metrics["scatter"] == pytest.approx(metrics["sorted"], rel=1e-5)
    for a, b in zip(
        jax.tree.leaves(states["scatter"]), jax.tree.leaves(states["sorted"])
    ):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


def _ffm_batch(seed, B=48, L=6, N=4096, pad_frac=0.2, with_fields=False, F=3):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, N, (B, L)).astype(np.int32)
    ids[rng.random((B, L)) < pad_frac] = -1
    vals = np.where(ids < 0, 0.0, rng.normal(size=(B, L))).astype(np.float32)
    fields = rng.integers(0, F, (B, L)).astype(np.int32) if with_fields else None
    return Batch(
        ids, vals, (rng.random(B) > 0.5).astype(np.float32),
        np.ones(B, np.float32), fields=fields,
    )


@pytest.mark.parametrize("explicit_fields", [False, True])
def test_worker_grads_sorted_ffm_matches_scatter(explicit_fields):
    """FFM on the sorted segment-sum backward (direct per-slot payload
    gather via slot_sorted) ≡ the scatter backward, both field modes."""
    N, L, k = 4096, 6, 2
    F = 3 if explicit_fields else L
    K = F * k
    b = _ffm_batch(11, L=L, N=N, with_fields=explicit_fields, F=F)
    pb = prep_batch(b, N)
    ss = build_sorted_slots(pb.inv, pb.vals, pb.uids.shape[0],
                            with_slots=True)
    rng = np.random.default_rng(0)
    U = pb.uids.shape[0]
    rows_u = jnp.asarray(
        (rng.normal(size=(U, 1 + K)) * 0.1).astype(np.float32)
    )
    loc = Localized(
        uids=jnp.asarray(pb.uids), inv=jnp.asarray(pb.inv),
        counts=jnp.asarray(pb.ucounts), valid=jnp.asarray(pb.valid),
    )
    args = (jnp.asarray(pb.vals), jnp.asarray(pb.labels),
            jnp.asarray(pb.mask))
    fkw = dict(
        loss="ffm",
        fields=jnp.asarray(b.fields) if explicit_fields else None,
        num_fields=F if explicit_fields else 0,
    )
    g_ref, py_ref, m_ref = worker_grads(rows_u, loc, *args, **fkw)
    g_s, py_s, m_s = worker_grads_sorted(
        rows_u, loc, *args,
        (jnp.asarray(ss.x_sorted), jnp.asarray(ss.bidx),
         jnp.asarray(ss.inv_sorted), jnp.asarray(ss.seg_tiles),
         jnp.asarray(ss.seg_wins), jnp.asarray(ss.seg_first)),
        slot_s=jnp.asarray(ss.slot_sorted),
        interpret=True, **fkw,
    )
    np.testing.assert_allclose(np.asarray(py_s), np.asarray(py_ref),
                               atol=1e-5)
    vmask = np.asarray(pb.valid)
    np.testing.assert_allclose(
        np.asarray(g_s.T)[vmask], np.asarray(g_ref)[vmask],
        atol=2e-5, rtol=1e-5,
    )
    assert float(m_s.logloss_sum) == pytest.approx(
        float(m_ref.logloss_sum), rel=1e-6
    )


@pytest.mark.parametrize("kernel", ["pairs", "xla"])
def test_local_ffm_sorted_matches_scatter_training(kernel):
    """Slot-position FFM (F = L) through LocalStore rides the sorted
    segsum backward on BOTH kernel paths, bit-close to scatter."""
    N_BITS = 12
    N = 1 << N_BITS
    L = 6
    states = {}
    for seg in ("scatter", "sorted"):
        cfg = Config.from_kwargs([
            ("batch_size", "48"), ("num_bits", str(N_BITS)),
            ("max_nnz_per_row", str(L)), ("V_dim", "2"), ("loss", "ffm"),
            ("kernel", kernel),
            ("interpret", "1" if kernel == "pairs" else "0"),
            ("segsum", seg),
        ])
        upd = FMUpdater(cfg.effective_model_param())
        store = LocalStore(upd, cfg, interpret=kernel == "pairs")
        assert store.sorted_grads == (seg == "sorted")
        st = store.init_state(0)
        for s in range(4):
            pb = prep_batch(_ffm_batch(s, L=L, N=N), N)
            st, _ = store.train_step_prepped(st, pb)
        states[seg] = fm_leaves(st)
    for a, b in zip(
        jax.tree.leaves(states["scatter"]), jax.tree.leaves(states["sorted"])
    ):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)


def test_sharded_ffm_fields_sorted_matches_scatter_training():
    """Explicit-fields FFM (libffm) through ShardedStore kernel=xla +
    segsum=sorted ≡ scatter — exercises the fields + slot_sorted arg
    plumbing through the stacked shard_map specs."""
    from difacto_tpu.data.prep import prep_batch_sharded
    from difacto_tpu.parallel.store import ShardedStore

    N_BITS = 12
    N = 1 << N_BITS
    L, F = 6, 3
    states = {}
    for seg in ("scatter", "sorted"):
        cfg = Config.from_kwargs([
            ("batch_size", "48"), ("num_bits", str(N_BITS)),
            ("max_nnz_per_row", str(L)), ("V_dim", "2"), ("loss", "ffm"),
            ("data_format", "libffm"), ("num_fields", str(F)),
            ("kernel", "xla"), ("segsum", seg),
        ])
        upd = FMUpdater(cfg.effective_model_param())
        store = ShardedStore(upd, cfg)
        assert store.sorted_grads == (seg == "sorted")
        st = store.init_state(0)
        for s in range(3):
            pb = prep_batch_sharded(
                _ffm_batch(s, L=L, N=N, with_fields=True, F=F),
                store.num_rows, store.S, num_fields=F,
            )
            st, m = store.train_step_prepped(st, pb)
        states[seg] = fm_leaves(st)
    for a, b in zip(
        jax.tree.leaves(states["scatter"]), jax.tree.leaves(states["sorted"])
    ):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=1e-5)
