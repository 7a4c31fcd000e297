"""Hot/cold frequency-split table (HotColdFMState + data/remap.py).

Measured motivation (scripts/hw_scatter_cliff.py): the XLA TPU
scatter-add costs ~156 ns/index into a big [36, N] table but ~22 ns/index
once the target is ~2^18 rows — so a frequency remap + split table makes
the big-table scatter see only the cold minority. These tests pin that
the split is pure LAYOUT: same training trajectory, same scores, same
canonical checkpoint as the single stacked table.
"""

import numpy as np
import pytest

from difacto_tpu.config import Config
from difacto_tpu.data.batch_iter import Batch
from difacto_tpu.data.prep import prep_batch
from difacto_tpu.data.remap import (
    apply_remap, auto_hot_rows, build_remap, count_sample, invert_remap,
)
from difacto_tpu.parallel.store import LocalStore
from difacto_tpu.updaters.updater import FMState, FMUpdater
from difacto_tpu.utils import checkpoint

NB, H = 12, 512
N = 1 << NB


def _cfg(hot, **kv):
    kwargs = [
        ("batch_size", "256"), ("num_bits", str(NB)),
        ("max_nnz_per_row", "10"), ("V_dim", "4"), ("kernel", "xla"),
        ("store", "local"), ("hot_rows", str(hot)),
        ("tail_feature_filter", "1"),
    ] + [(k, str(v)) for k, v in kv.items()]
    return Config.from_kwargs(kwargs)


def _batch(seed):
    r = np.random.default_rng(seed)
    ids = (r.zipf(1.3, (256, 10)) % N).astype(np.int32)
    ids[r.random(ids.shape) < 0.1] = -1
    vals = np.where(ids >= 0, 1.0, 0.0).astype(np.float32)
    return Batch(
        ids, vals, (r.random(256) > 0.5).astype(np.float32),
        np.ones(256, np.float32),
    )


def _host_state(seed=1):
    rng = np.random.default_rng(seed)
    return FMState(
        w=rng.normal(size=N).astype(np.float32),
        z=rng.normal(size=N).astype(np.float32),
        n=np.abs(rng.normal(size=N)).astype(np.float32),
        V=rng.normal(size=(4, N)).astype(np.float32),
        nV=np.abs(rng.normal(size=(4, N))).astype(np.float32),
        cnt=rng.integers(0, 5, N).astype(np.float32),
    )


def _lut():
    batches = [_batch(i) for i in range(4)]
    return batches, build_remap(count_sample(iter(batches), N, 4), H)


def test_remap_is_bijection_and_hot_head_is_hottest():
    batches, lut = _lut()
    assert sorted(lut.tolist()) == list(range(N))
    cnt = count_sample(iter(batches), N, 4)
    hot_min = cnt[lut < H].min()
    cold_max = cnt[lut >= H].max()
    assert hot_min >= cold_max  # head rows at least as frequent as any cold
    inv = invert_remap(lut)
    assert np.array_equal(lut[inv], np.arange(N))
    ids = batches[0].ids
    out = apply_remap(ids, lut)
    assert np.array_equal(out < 0, ids < 0)  # pads pass through
    assert np.array_equal(out[ids >= 0], lut[ids[ids >= 0]])


def test_split_prep_invariants():
    batches, lut = _lut()
    pb = prep_batch(batches[0], N, remap=lut, hot_rows=H)
    ch = pb.uids_hot.shape[0]
    assert np.array_equal(pb.uids[:ch], pb.uids_hot)
    assert np.array_equal(pb.uids[ch:], pb.uids_cold)
    # hot bucket: real ids < H sorted, pads = H (OOB for the hot table)
    hv = pb.valid[:ch]
    assert np.all(pb.uids_hot[hv] < H)
    assert np.all(pb.uids_hot[~hv] == H)
    assert np.all(np.diff(pb.uids_hot) >= 0)
    # cold bucket: real ids in [H, N) sorted, pads = N
    cv = pb.valid[ch:]
    assert np.all((pb.uids_cold[cv] >= H) & (pb.uids_cold[cv] < N))
    assert np.all(pb.uids_cold[~cv] == N)
    assert np.all(np.diff(pb.uids_cold) >= 0)
    # inverse points only at valid lanes or the junk (invalid) lane, and
    # reconstructs the remapped ids exactly
    remapped = apply_remap(batches[0].ids, lut).reshape(-1)
    got = pb.uids[pb.inv]
    real = remapped >= 0
    assert np.array_equal(got[real], remapped[real])
    assert np.all(~pb.valid[pb.inv[~real]])


def _train_pair(segsum="auto"):
    batches, lut = _lut()
    host = _host_state()
    a = LocalStore(FMUpdater(_cfg(0).model), _cfg(0, segsum=segsum))
    sa = a.place_state(host)
    cfg_b = _cfg(H, segsum=segsum)
    b = LocalStore(FMUpdater(cfg_b.model), cfg_b)
    b.set_remap(lut)
    sb = b.place_state(host)
    for bt in batches[:3]:
        sa, ma = a.train_step_prepped(sa, prep_batch(bt, N))
        sb, mb = b.train_step_prepped(
            sb, prep_batch(bt, N, remap=lut, hot_rows=H)
        )
        np.testing.assert_allclose(
            float(ma.logloss_sum), float(mb.logloss_sum), rtol=1e-6
        )
    return a, sa, b, sb, lut


def test_split_trains_identically_to_stacked():
    a, sa, b, sb, lut = _train_pair()
    hb = _batch(99)
    _, py1 = a.eval_step_prepped(sa, prep_batch(hb, N))
    _, py2 = b.eval_step_prepped(
        sb, prep_batch(hb, N, remap=lut, hot_rows=H)
    )
    np.testing.assert_allclose(
        np.asarray(py1), np.asarray(py2), rtol=1e-5, atol=1e-6
    )


def test_split_checkpoint_is_canonical(tmp_path):
    """A split-trained save equals the stacked-trained save bit-close —
    the remap never leaks into the checkpoint format — and loads back
    into a split store through place_state."""
    a, sa, b, sb, lut = _train_pair()
    checkpoint.save(str(tmp_path / "a"), sa)
    checkpoint.save(str(tmp_path / "b"), sb, remap_lut=lut)
    fa, _ = checkpoint.load(str(tmp_path / "a"))
    fb, _ = checkpoint.load(str(tmp_path / "b"))
    for k in ("w", "z", "n", "V", "nV", "cnt"):
        # float32 cancellation in FTRL z admits a couple of ULPs of
        # fusion-order difference; everything else is bit-tight
        np.testing.assert_allclose(
            np.asarray(getattr(fa, k)), np.asarray(getattr(fb, k)),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )
    # reload the canonical file into a FRESH split store (a new run may
    # build a different lut — simulate with a different sample order)
    cfg = _cfg(H)
    c = LocalStore(FMUpdater(cfg.model), cfg)
    lut2 = build_remap(
        count_sample(iter([_batch(7), _batch(8)]), N, 2), H
    )
    c.set_remap(lut2)
    sc, _ = checkpoint.load_for_store(str(tmp_path / "b"), c)
    hb = _batch(99)
    _, py_b = b.eval_step_prepped(
        sb, prep_batch(hb, N, remap=lut, hot_rows=H)
    )
    _, py_c = c.eval_step_prepped(
        sc, prep_batch(hb, N, remap=lut2, hot_rows=H)
    )
    np.testing.assert_allclose(
        np.asarray(py_b), np.asarray(py_c), rtol=1e-4, atol=1e-5
    )


def test_split_with_sorted_segsum_backward():
    """The split rides the sorted segment-sum aggregation too (the
    production 2^26 path is segsum=sorted + hot/cold)."""
    batches, lut = _lut()
    host = _host_state()
    a = LocalStore(FMUpdater(_cfg(0).model), _cfg(0, segsum="scatter"))
    sa = a.place_state(host)
    cfg_b = _cfg(H, segsum="sorted")
    b = LocalStore(FMUpdater(cfg_b.model), cfg_b)
    b.set_remap(lut)
    sb = b.place_state(host)
    for bt in batches[:3]:
        sa, ma = a.train_step_prepped(sa, prep_batch(bt, N))
        sb, mb = b.train_step_prepped(
            sb, prep_batch(bt, N, remap=lut, hot_rows=H)
        )
        np.testing.assert_allclose(
            float(ma.logloss_sum), float(mb.logloss_sum), rtol=1e-5
        )
    hb = _batch(99)
    _, py1 = a.eval_step_prepped(sa, prep_batch(hb, N))
    _, py2 = b.eval_step_prepped(
        sb, prep_batch(hb, N, remap=lut, hot_rows=H)
    )
    np.testing.assert_allclose(
        np.asarray(py1), np.asarray(py2), rtol=1e-4, atol=1e-5
    )


def test_compact_cache_matches_full():
    """cache_compact=1 derives x_sorted/bidx/inv_sorted on device from
    (vals, inv, slot_s) — same training as the host-built arrays, on the
    hot/cold + sorted-segsum production path."""
    from difacto_tpu.data.prep import build_sorted_slots

    batches, lut = _lut()
    host = _host_state()
    cfg_a = _cfg(H, segsum="sorted")
    a = LocalStore(FMUpdater(cfg_a.model), cfg_a)
    a.set_remap(lut)
    sa = a.place_state(host)
    cfg_b = _cfg(H, segsum="sorted", cache_compact=1)
    b = LocalStore(FMUpdater(cfg_b.model), cfg_b)
    b.set_remap(lut)
    sb = b.place_state(host)
    for bt in batches[:3]:
        pa = prep_batch(bt, N, remap=lut, hot_rows=H)
        pb = prep_batch(bt, N, remap=lut, hot_rows=H)
        pa.sorted_slots = build_sorted_slots(
            pa.inv, pa.vals, pa.uids.shape[0]
        )
        pb.sorted_slots = build_sorted_slots(
            pb.inv, pb.vals, pb.uids.shape[0], compact=True
        )
        assert pb.sorted_slots.x_sorted is None
        sa, ma = a.train_step_prepped(sa, pa)
        sb, mb = b.train_step_prepped(sb, pb)
        np.testing.assert_allclose(
            float(ma.logloss_sum), float(mb.logloss_sum), rtol=1e-6
        )
    hb = _batch(99)
    _, py1 = a.eval_step_prepped(sa, prep_batch(hb, N, remap=lut, hot_rows=H))
    _, py2 = b.eval_step_prepped(sb, prep_batch(hb, N, remap=lut, hot_rows=H))
    np.testing.assert_allclose(
        np.asarray(py1), np.asarray(py2), rtol=1e-4, atol=1e-5
    )


def test_hot_rows_config_guards():
    with pytest.raises(ValueError, match="kernel=xla"):
        LocalStore(FMUpdater(_cfg(0).model), _cfg(H, kernel="pairs"))
    cfg = _cfg(H)
    cfg.shard.layout = "packed"
    with pytest.raises(ValueError, match="layout=stacked"):
        LocalStore(FMUpdater(cfg.model), cfg)
    with pytest.raises(ValueError, match="out of range"):
        LocalStore(FMUpdater(_cfg(N).model), _cfg(N))
    # sharded store rejects it
    from difacto_tpu.parallel.store import ShardedStore

    with pytest.raises(ValueError, match="LocalStore"):
        ShardedStore(FMUpdater(_cfg(H).model), _cfg(H, store="sharded"))
    # unsplit batch into a split store is refused, not silently wrong
    store = LocalStore(FMUpdater(_cfg(H).model), _cfg(H))
    state = store.init_state(0)
    with pytest.raises(ValueError, match="unsplit"):
        store.train_step_prepped(state, prep_batch(_batch(0), N))


def test_auto_hot_rows_budget():
    # K=16: D_pad=40 -> 2^18 rows (the measured fast regime); bigger K
    # shrinks the head; tiny tables cap at N/4
    assert auto_hot_rows(1 << 26, 16) == 1 << 18
    assert auto_hot_rows(1 << 26, 64) < auto_hot_rows(1 << 26, 16)
    assert auto_hot_rows(1 << 12, 16) <= (1 << 12) // 4


def test_learner_end_to_end_hot(tmp_path):
    """CLI-shaped run with hot_rows=-1: remap built from the count
    sample, training converges, checkpoint canonical, resume works."""
    from difacto_tpu.data.synthetic import make_ctr_data, write_libsvm
    from difacto_tpu.learners.sgd import SGDLearner

    tr = make_ctr_data(4000, num_fields=8, vocab_per_field=200, seed=1)
    va = make_ctr_data(1000, num_fields=8, vocab_per_field=200, seed=2)
    write_libsvm(tr, str(tmp_path / "tr.svm"))
    write_libsvm(va, str(tmp_path / "va.svm"))

    def run(extra):
        cfg = Config.from_kwargs([
            ("data_in", str(tmp_path / "tr.svm")),
            ("data_val", str(tmp_path / "va.svm")),
            ("batch_size", "512"), ("num_bits", "13"),
            ("max_nnz_per_row", "8"), ("V_dim", "2"), ("kernel", "xla"),
            ("store", "local"), ("max_num_epochs", "4"),
            ("lr_eta", "0.1"), ("l1", "0.1"), ("V_lr_eta", "0.05"),
            ("report_interval", "0"),
            ("model_out", str(tmp_path / "m")),
        ] + extra)
        return SGDLearner(cfg).run()

    prog = run([("hot_rows", "-1"), ("hot_count_batches", "4")])
    assert prog.exact_auc > 0.57, prog.exact_auc
    # identical data without the split converges to the same place
    prog0 = run([])
    assert abs(prog.exact_auc - prog0.exact_auc) < 0.03
    # resume from the canonical checkpoint with a fresh (different) remap
    prog2 = run([
        ("hot_rows", "-1"), ("hot_count_batches", "2"),
        ("model_in", str(tmp_path / "m")), ("max_num_epochs", "5"),
    ])
    assert prog2.exact_auc >= prog.exact_auc - 0.02
