"""Owner-side pair kernels in the ShardedStore (interpret mode, 8-device
CPU mesh): the prepped pairs path must match the prepped XLA path
multi-step — same final state, same metrics, same eval scores.

This extends the seam-substitution pattern (SURVEY.md §4, reference
StoreLocal vs StoreDist) to the kernel axis: LocalStore ≡ ShardedStore ≡
pair-kernel paths are all pinned against each other."""

import numpy as np
import pytest

from helpers import fm_leaves

from difacto_tpu.config import Config
from difacto_tpu.data.batch_iter import rowblock_to_batches
from difacto_tpu.data.prep import build_shard_pair_metas, prep_batch_sharded
from difacto_tpu.data.synthetic import make_ctr_data
from difacto_tpu.parallel.store import ShardedStore
from difacto_tpu.updaters.updater import FMUpdater

BUCKETS = (512,)  # small fixed bucket: C = 128 on 8 shards (128-aligned)


def _mk(V_dim, kernel, interpret, **kw):
    kwargs = [
        ("batch_size", "256"),
        ("num_bits", "13"),
        ("max_nnz_per_row", "16"),
        ("V_dim", str(V_dim)),
        ("kernel", kernel),
    ] + [(k, str(v)) for k, v in kw.items()]
    cfg = Config.from_kwargs(kwargs)
    upd = FMUpdater(cfg.model)
    return ShardedStore(upd, cfg, interpret=interpret)


def _batches(n_rows=768, seed=3):
    blk = make_ctr_data(n_rows, num_fields=12, vocab_per_field=500, seed=seed)
    return list(rowblock_to_batches(blk, 256, 16, 13))


@pytest.mark.parametrize("V_dim,extra", [
    (4, {}),
    (0, {}),
    (2, {"tail_feature_filter": 2, "w_updater": "adagrad"}),
])
def test_sharded_pairs_matches_xla_train(V_dim, extra):
    xla = _mk(V_dim, "xla", False, **extra)
    prs = _mk(V_dim, "pairs", True, **extra)
    assert prs.pairs and not xla.pairs
    s1, s2 = xla.init_state(0), prs.init_state(0)
    for b in _batches():
        pb1 = prep_batch_sharded(b, xla.num_rows, xla.S, buckets=BUCKETS)
        pb2 = prep_batch_sharded(b, prs.num_rows, prs.S, buckets=BUCKETS)
        s1, m1 = xla.train_step_prepped(s1, pb1)
        s2, m2 = prs.train_step_prepped(s2, pb2)
        # built schedule is cached on the batch for reuse
        assert pb2.pair_metas is not None
    for name in ("w", "z", "n", "V", "nV", "cnt"):
        a = np.asarray(getattr(fm_leaves(s1), name))
        b = np.asarray(getattr(fm_leaves(s2), name))
        np.testing.assert_allclose(a, b, atol=1e-4, err_msg=name)
    np.testing.assert_allclose(
        float(m1.logloss_sum), float(m2.logloss_sum), rtol=1e-5
    )
    assert float(m1.dropped_ids) == float(m2.dropped_ids) == 0.0


def test_sharded_pairs_matches_xla_eval():
    xla = _mk(4, "xla", False)
    prs = _mk(4, "pairs", True)
    s1, s2 = xla.init_state(0), prs.init_state(0)
    bs = _batches()
    pb = prep_batch_sharded(bs[0], xla.num_rows, xla.S, buckets=BUCKETS)
    s1, _ = xla.train_step_prepped(s1, pb)
    s2, _ = prs.train_step_prepped(s2, pb)
    for b in bs[1:]:
        pb1 = prep_batch_sharded(b, xla.num_rows, xla.S, buckets=BUCKETS)
        m1, py1 = xla.eval_step_prepped(s1, pb1)
        m2, py2 = prs.eval_step_prepped(s2, pb1)
        np.testing.assert_allclose(
            np.asarray(py1), np.asarray(py2), atol=1e-4
        )
        np.testing.assert_allclose(
            float(m1.logloss_sum), float(m2.logloss_sum), rtol=1e-5
        )


def test_pairs_capacity_fits_skewed_batches():
    """Host-chosen capacity = the batch's actual max bucket fill: a batch
    whose ids ALL land in one shard's range (worst-case routing skew,
    which a capacity_factor guess would drop from) trains with zero
    drops and matches the single-device LocalStore result."""
    from difacto_tpu.data.batch_iter import Batch
    from difacto_tpu.data.prep import prep_batch
    from difacto_tpu.parallel.store import LocalStore

    prs = _mk(2, "pairs", True)
    kwargs = [
        ("batch_size", "256"), ("num_bits", "13"),
        ("max_nnz_per_row", "16"), ("V_dim", "2"), ("kernel", "xla"),
    ]
    cfg = Config.from_kwargs(kwargs)
    loc = LocalStore(FMUpdater(cfg.model), cfg)
    rng = np.random.default_rng(11)
    rows_per_shard = prs.num_rows // prs.S
    s1, s2 = loc.init_state(0), prs.init_state(0)
    for i in range(3):
        ids = rng.integers(0, rows_per_shard, (256, 16)).astype(np.int32)
        b = Batch(
            ids, np.ones((256, 16), np.float32),
            (rng.random(256) > 0.5).astype(np.float32),
            np.ones(256, np.float32),
        )
        s1, m1 = loc.train_step_prepped(
            s1, prep_batch(b, loc.num_rows, buckets=BUCKETS)
        )
        pb = prep_batch_sharded(b, prs.num_rows, prs.S, buckets=BUCKETS)
        s2, m2 = prs.train_step_prepped(s2, pb)
        assert float(m2.dropped_ids) == 0.0
        # every id lives in shard 0's range -> one bucket carries the
        # whole per-source unique set
        assert pb.pair_metas.capacity >= 128
    for name in ("w", "z", "n", "V", "nV", "cnt"):
        a = np.asarray(getattr(fm_leaves(s1), name))
        b = np.asarray(getattr(fm_leaves(s2), name))
        np.testing.assert_allclose(a, b, atol=1e-4, err_msg=name)


def test_sharded_pairs_s1_matches_local_pairs():
    """num_shards=1: the sharded store skips routing and must reproduce
    the LocalStore pair path exactly (this is what a single-chip run of
    store=sharded executes)."""
    from difacto_tpu.data.prep import prep_batch
    from difacto_tpu.parallel.store import LocalStore

    prs = _mk(4, "pairs", True, num_shards=1)
    assert prs.S == 1
    kwargs = [
        ("batch_size", "256"), ("num_bits", "13"),
        ("max_nnz_per_row", "16"), ("V_dim", "4"), ("kernel", "pairs"),
    ]
    cfg = Config.from_kwargs(kwargs)
    loc = LocalStore(FMUpdater(cfg.model), cfg, interpret=True)
    s1, s2 = loc.init_state(0), prs.init_state(0)
    for b in _batches(512):
        # whole-batch unique sets are bigger than the per-shard BUCKETS
        # ladder; the pair kernels need a 128-aligned bucket
        s1, m1 = loc.train_step_prepped(
            s1, prep_batch(b, loc.num_rows, buckets=(8192,))
        )
        pb = prep_batch_sharded(b, prs.num_rows, 1, buckets=(8192,))
        s2, m2 = prs.train_step_prepped(s2, pb)
    for name in ("w", "z", "n", "V", "nV", "cnt"):
        np.testing.assert_allclose(
            np.asarray(getattr(fm_leaves(s1), name)),
            np.asarray(getattr(fm_leaves(s2), name)),
            atol=1e-5, err_msg=name,
        )
    np.testing.assert_allclose(
        float(m1.logloss_sum), float(m2.logloss_sum), rtol=1e-6
    )


def test_prebuilt_metas_match_store_built():
    """The prep-thread schedule (learner wiring) equals the store-built
    one: a batch trained with pre-attached metas matches one without."""
    a = _mk(4, "pairs", True)
    b = _mk(4, "pairs", True)
    s1, s2 = a.init_state(0), b.init_state(0)
    for bb in _batches(512):
        pb1 = prep_batch_sharded(bb, a.num_rows, a.S, buckets=BUCKETS)
        pb2 = prep_batch_sharded(bb, b.num_rows, b.S, buckets=BUCKETS)
        pb2.pair_metas = build_shard_pair_metas(
            pb2, b.num_rows, b.pairs_capacity(pb2), b.block_rows
        )
        s1, _ = a.train_step_prepped(s1, pb1)
        s2, _ = b.train_step_prepped(s2, pb2)
    for name in ("w", "V", "cnt"):
        np.testing.assert_allclose(
            np.asarray(getattr(fm_leaves(s1), name)),
            np.asarray(getattr(fm_leaves(s2), name)),
            atol=1e-5, err_msg=name,
        )


def test_mp_send_buckets_and_metas_match_single_process():
    """The multi-process schedule path (per-process send buckets ->
    allgathered global send matrix -> per-owner metas) must reproduce the
    single-process builder exactly: 2 emulated processes x 2 local shards
    give the same schedules as one process over all 4 shards."""
    from difacto_tpu.data.batch_iter import Batch
    from difacto_tpu.data.prep import (
        _metas_from_send, _send_buckets, prep_batch_sharded,
    )

    N, S, C, ub, br = 1 << 13, 4, 256, 512, 256
    rng = np.random.default_rng(9)
    B, L = 256, 16
    ids = rng.integers(0, N, (B, L)).astype(np.int32)
    ids[rng.random((B, L)) < 0.1] = -1
    vals = np.ones((B, L), np.float32)
    labels = (rng.random(B) > 0.5).astype(np.float32)
    mask = np.ones(B, np.float32)
    gb = Batch(ids, vals, labels, mask)

    pb_full = prep_batch_sharded(gb, N, S, fixed_ub=ub)
    send_full = _send_buckets(pb_full, N, S, C)

    halves = [
        prep_batch_sharded(
            Batch(ids[lo : lo + B // 2], vals[lo : lo + B // 2],
                  labels[lo : lo + B // 2], mask[lo : lo + B // 2]),
            N, S // 2, fixed_ub=ub,
        )
        for lo in (0, B // 2)
    ]
    send_mp = np.concatenate(
        [_send_buckets(h, N, S, C) for h in halves], axis=0
    )
    np.testing.assert_array_equal(send_full, send_mp)

    from difacto_tpu.data.prep import build_shard_pair_metas

    ref = build_shard_pair_metas(pb_full, N, C, br)
    # each emulated process keeps its local owners; stacking reproduces
    # the full schedule (identical Pp/Pa padding on both processes)
    parts = [
        _metas_from_send(send_mp, N, C, br, range(p * 2, (p + 1) * 2))
        for p in range(2)
    ]
    for name in ("pull_blocks", "pull_wins", "pull_wfirst",
                 "apply_blocks", "apply_wins", "apply_first"):
        np.testing.assert_array_equal(
            getattr(ref, name),
            np.concatenate([getattr(m, name) for m in parts], axis=0),
            err_msg=name,
        )


def test_kernel_auto_resolves_pairs_multiprocess(monkeypatch):
    """kernel=auto picks the pair kernels in multi-process TPU runs too
    (round 2 silently fell back to xla there)."""
    import jax as _jax

    from difacto_tpu.parallel.store import _kernel_kind

    cfg = Config.from_kwargs([
        ("batch_size", "256"), ("num_bits", "13"), ("max_nnz_per_row", "16"),
    ])
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    assert _kernel_kind(cfg) == "pairs"


def test_unique_size_pins_pairs_capacity():
    """An explicit unique_size floors the sharded pairs all_to_all
    capacity: batches with different bucket fills land on ONE capacity
    (= one jit/Mosaic specialization — mid-epoch compiles cost minutes
    on a remote compile service), while a pathological batch above the
    floor still gets the next ladder rung (correctness first)."""
    prs = _mk(2, "pairs", True, unique_size=512)
    caps = set()
    for seed in (1, 2, 3):
        for b in _batches(256, seed=seed):
            pb = prep_batch_sharded(b, prs.num_rows, prs.S, buckets=BUCKETS)
            caps.add(prs.pairs_capacity(pb))
    assert len(caps) == 1, caps
    # the pinned capacity honors the configured floor
    assert caps.pop() >= prs._capacity_for(512)

    # without the pin, the same batches may produce several capacities
    free = _mk(2, "pairs", True)
    assert free.cfg.shard.unique_size == 0


def test_pairs_capacity_epoch_pin():
    """pin_capacity() (epoch boundary) pins subsequent batches to the
    exact W-aligned maximum seen, replacing the coarse ~1.5x ladder rung
    (BENCH.md r4 queue #4: rungs overshoot the owner streams ~35%); a
    later batch that exceeds the pin still gets a ladder rung
    (correctness first), and training through the pin stays correct."""
    from difacto_tpu.ops.pair_sweep import W

    store = _mk(2, "pairs", True)
    batches = _batches()
    pbs = [prep_batch_sharded(b, store.num_rows, store.S) for b in batches]
    caps0 = [store.pairs_capacity(pb) for pb in pbs]
    assert store._cap_pin is None
    pin = store.pin_capacity()
    assert pin == store._cap_seen and pin % W == 0
    assert pin <= min(caps0)  # exact need never exceeds the ladder rung
    # post-pin: same batches now ride the tight pin, not the rung
    for pb in pbs:
        assert store.pairs_capacity(pb) == pin
    # training through the pinned capacity stays numerically correct
    st = store.init_state(0)
    for pb in pbs:
        pb.pair_metas = None  # rebuild schedules at the pinned capacity
        st, m = store.train_step_prepped(st, pb)
    assert float(m.examples) == 256 and float(m.dropped_ids) == 0
    # a batch needing more than the pin falls back to a ladder rung
    big = store._cap_resolve(pin + 4 * W)
    assert big > pin and big >= pin + 4 * W
