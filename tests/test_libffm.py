"""libffm format + explicit-field FFM tests.

The reference ships FM only; FFM with real ``field:idx:val`` input is the
libffm-model stretch config (BASELINE.json config 5). These tests pin:
the parser, the explicit-fields loss against brute force and against the
slot-position path, and end-to-end training through both stores.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from difacto_tpu.config import Config
from difacto_tpu.data.libsvm import parse_libffm_numpy
from difacto_tpu.models.losses import ffm_loss_grad


def test_parse_libffm_basic():
    text = b"""# comment
1 0:5:1.5 2:7:2 1:3
0 1:9:0.25

-1 0:2:1 0:4:3
"""
    blk = parse_libffm_numpy(text)
    np.testing.assert_array_equal(blk.labels, [1.0, 0.0, -1.0])
    np.testing.assert_array_equal(blk.indptr, [0, 3, 4, 6])
    np.testing.assert_array_equal(blk.indices, [5, 7, 3, 9, 2, 4])
    np.testing.assert_allclose(blk.values, [1.5, 2.0, 1.0, 0.25, 1.0, 3.0])
    np.testing.assert_array_equal(blk.fields, [0, 2, 1, 1, 0, 0])


def test_parse_libffm_rejects_plain_libsvm():
    with pytest.raises(ValueError):
        parse_libffm_numpy(b"1 5:1.5 7:2\n")


def test_parse_libffm_empty():
    blk = parse_libffm_numpy(b"\n# only a comment\n")
    assert blk.num_rows == 0 and blk.fields is not None


def _rand_fields(B=4, L=5, F=3, K=2, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.normal(size=(B, L)).astype(np.float32)
    vals[0, -1] = 0.0  # a padding slot
    W = rng.normal(size=(B, L)).astype(np.float32)
    V4 = rng.normal(size=(B, L, F, K)).astype(np.float32)
    fields = rng.integers(0, F, size=(B, L)).astype(np.int32)
    y = (rng.random(B) > 0.5).astype(np.float32)
    m = np.ones(B, np.float32)
    return vals, W, V4, fields, y, m


def brute_force_ffm_fields(vals, W, V4, fields):
    B, L = vals.shape
    out = np.zeros(B)
    for b in range(B):
        out[b] = float(np.dot(vals[b], W[b]))
        for i in range(L):
            for j in range(i + 1, L):
                out[b] += vals[b, i] * vals[b, j] * float(
                    np.dot(V4[b, i, fields[b, j]], V4[b, j, fields[b, i]])
                )
    return out


def test_ffm_fields_predict_matches_pairwise():
    vals, W, V4, fields, y, m = _rand_fields()
    fwd, _ = ffm_loss_grad(
        jnp.asarray(vals), jnp.asarray(W), jnp.asarray(V4),
        jnp.asarray(y), jnp.asarray(m), fields=jnp.asarray(fields),
    )
    np.testing.assert_allclose(
        np.asarray(fwd.py), brute_force_ffm_fields(vals, W, V4, fields),
        rtol=1e-4,
    )


def test_ffm_fields_identity_matches_slot_position():
    # fields[b, j] = j with F == L must reproduce the slot-position path
    B, L, K = 3, 4, 2
    rng = np.random.default_rng(7)
    vals = rng.normal(size=(B, L)).astype(np.float32)
    W = rng.normal(size=(B, L)).astype(np.float32)
    V4 = rng.normal(size=(B, L, L, K)).astype(np.float32)
    y = (rng.random(B) > 0.5).astype(np.float32)
    m = np.ones(B, np.float32)
    fields = np.broadcast_to(np.arange(L, dtype=np.int32), (B, L)).copy()
    f0, g0 = ffm_loss_grad(*map(jnp.asarray, (vals, W, V4, y, m)))
    f1, g1 = ffm_loss_grad(
        *map(jnp.asarray, (vals, W, V4, y, m)), fields=jnp.asarray(fields)
    )
    np.testing.assert_allclose(np.asarray(f0.py), np.asarray(f1.py), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g0.dV), np.asarray(g1.dV), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g0.dW), np.asarray(g1.dW), rtol=1e-5)


def test_ffm_fields_grads_finite_difference():
    vals, W, V4, fields, y, m = _rand_fields(seed=3)
    _, g = ffm_loss_grad(
        jnp.asarray(vals), jnp.asarray(W), jnp.asarray(V4),
        jnp.asarray(y), jnp.asarray(m), fields=jnp.asarray(fields),
    )
    eps = 1e-3

    def total(V4x):
        _, gg = ffm_loss_grad(
            jnp.asarray(vals), jnp.asarray(W), jnp.asarray(V4x),
            jnp.asarray(y), jnp.asarray(m), fields=jnp.asarray(fields),
        )
        return float(np.sum(np.asarray(gg.loss)))

    for (b, i, f, k) in [(0, 0, 1, 0), (1, 2, 2, 1), (3, 4, 0, 0), (2, 1, 1, 1)]:
        Vp = V4.copy(); Vp[b, i, f, k] += eps
        Vm = V4.copy(); Vm[b, i, f, k] -= eps
        fd = (total(Vp) - total(Vm)) / (2 * eps)
        an = float(np.asarray(g.dV)[b, i, f, k])
        assert abs(fd - an) < 5e-2 * max(1.0, abs(fd)), (b, i, f, k)


def test_config_field_checks():
    with pytest.raises(ValueError):
        Config.from_kwargs([("num_fields", "4")])  # loss != ffm
    with pytest.raises(ValueError):
        Config.from_kwargs([("loss", "ffm"), ("num_fields", "4")])  # not libffm
    with pytest.raises(ValueError):
        Config.from_kwargs([("loss", "ffm"), ("data_format", "libffm")])
    cfg = Config.from_kwargs(
        [("loss", "ffm"), ("data_format", "libffm"), ("num_fields", "4"),
         ("V_dim", "2"), ("max_nnz_per_row", "8")]
    )
    assert cfg.expects_fields()
    assert cfg.effective_model_param().V_dim == 8  # F*k, not L*k


def _ffm_cfg(tmp_path, extra=()):
    from difacto_tpu.data.synthetic import make_ctr_data, write_libffm

    F = 6
    tr = make_ctr_data(
        4000, num_fields=F, vocab_per_field=100, seed=1,
        with_fields=True, shuffle_slots=True,
    )
    va = make_ctr_data(
        1000, num_fields=F, vocab_per_field=100, seed=2,
        with_fields=True, shuffle_slots=True,
    )
    write_libffm(tr, str(tmp_path / "tr.ffm"))
    write_libffm(va, str(tmp_path / "va.ffm"))
    return Config.from_kwargs(
        [
            ("data_in", str(tmp_path / "tr.ffm")),
            ("data_val", str(tmp_path / "va.ffm")),
            ("data_format", "libffm"), ("num_fields", str(F)),
            ("batch_size", "512"), ("num_bits", "13"), ("max_nnz_per_row", "6"),
            ("V_dim", "2"), ("loss", "ffm"), ("max_num_epochs", "8"),
            ("lr_eta", "0.1"), ("l1", "0.1"), ("V_lr_eta", "0.05"),
            ("report_interval", "0"),
        ]
        + list(extra)
    )


def test_libffm_end_to_end_learns_local(tmp_path):
    from difacto_tpu.learners.sgd import SGDLearner

    prog = SGDLearner(_ffm_cfg(tmp_path, [("store", "local")])).run()
    assert prog.exact_auc > 0.57, prog.exact_auc


def test_libffm_local_matches_sharded(tmp_path):
    """Slot-shuffled libffm data: LocalStore and ShardedStore must train
    to the same scores (fields routed through shard_map + all_to_all)."""
    from difacto_tpu.learners.sgd import SGDLearner

    import dataclasses

    cfg_l = _ffm_cfg(tmp_path, [("store", "local"), ("max_num_epochs", "2"),
                                ("shuffle", "false")])
    cfg_s = _ffm_cfg(tmp_path, [("store", "sharded"), ("max_num_epochs", "2"),
                                ("shuffle", "false")])
    ll = SGDLearner(cfg_l)
    ll.run()
    py_l, y_l = ll.predict(cfg_l.data.data_val)
    ls = SGDLearner(cfg_s)
    ls.run()
    py_s, y_s = ls.predict(cfg_s.data.data_val)
    np.testing.assert_array_equal(y_l, y_s)
    np.testing.assert_allclose(py_l, py_s, rtol=2e-4, atol=2e-4)


def test_libffm_raw_path_matches_prepped(tmp_path):
    """host_localize on/off produce the same trained scores on libffm."""
    from difacto_tpu.learners.sgd import SGDLearner

    cfg_a = _ffm_cfg(tmp_path, [("store", "local"), ("max_num_epochs", "1"),
                                ("shuffle", "false"), ("host_localize", "true")])
    cfg_b = _ffm_cfg(tmp_path, [("store", "local"), ("max_num_epochs", "1"),
                                ("shuffle", "false"), ("host_localize", "false")])
    la = SGDLearner(cfg_a)
    la.run()
    py_a, _ = la.predict(cfg_a.data.data_val)
    lb = SGDLearner(cfg_b)
    lb.run()
    py_b, _ = lb.predict(cfg_b.data.data_val)
    np.testing.assert_allclose(py_a, py_b, rtol=2e-4, atol=2e-4)


def test_out_of_range_field_id_raises():
    """Field ids >= num_fields would be silently clipped by the loss —
    the store must reject them host-side instead."""
    import numpy as np
    import pytest

    from difacto_tpu.config import Config
    from difacto_tpu.parallel.store import LocalStore
    from difacto_tpu.updaters.updater import FMUpdater

    cfg = Config.from_kwargs([
        ("batch_size", "32"), ("num_bits", "10"), ("max_nnz_per_row", "4"),
        ("V_dim", "2"), ("loss", "ffm"), ("num_fields", "3"),
        ("data_format", "libffm"),
    ])
    store = LocalStore(FMUpdater(cfg.effective_model_param()), cfg)
    ids = np.zeros((32, 4), np.int32)
    vals = np.ones((32, 4), np.float32)
    labels = np.zeros(32, np.float32)
    mask = np.ones(32, np.float32)
    bad = np.full((32, 4), 7, np.int32)  # field 7 >= num_fields 3
    with pytest.raises(ValueError, match="out of range"):
        store.shard_batch(ids, vals, labels, mask, bad)
    with pytest.raises(ValueError, match="no field ids"):
        store.shard_batch(ids, vals, labels, mask, None)


def test_out_of_range_field_id_raises_on_prepped_path():
    """The prepped fast paths device-place batches before the store's
    validator sees them — prep itself must reject out-of-range fields
    while they are still host numpy (advisor round-2, medium)."""
    import numpy as np
    import pytest

    from difacto_tpu.data.batch_iter import Batch
    from difacto_tpu.data.prep import prep_batch, prep_batch_sharded

    ids = np.zeros((32, 4), np.int32)
    vals = np.ones((32, 4), np.float32)
    labels = np.zeros(32, np.float32)
    mask = np.ones(32, np.float32)
    bad = np.full((32, 4), 7, np.int32)  # field 7 >= num_fields 3
    b = Batch(ids, vals, labels, mask, fields=bad)
    with pytest.raises(ValueError, match="out of range"):
        prep_batch(b, 1024, num_fields=3)
    with pytest.raises(ValueError, match="out of range"):
        prep_batch_sharded(b, 1024, 4, num_fields=3)
    b_none = Batch(ids, vals, labels, mask)
    with pytest.raises(ValueError, match="no field ids"):
        prep_batch(b_none, 1024, num_fields=3)
    # num_fields=0 (slot-position fields / non-ffm): no validation
    prep_batch(b, 1024, num_fields=0)
