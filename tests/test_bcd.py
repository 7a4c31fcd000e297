"""BCD learner tests (reference: the bcd_* components of SURVEY.md §2.1)."""

import numpy as np
import pytest

from difacto_tpu.config import Config
from difacto_tpu.data.synthetic import make_ctr_data, write_libsvm
from difacto_tpu.learners.bcd import BCDLearner


@pytest.fixture(scope="module")
def data(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bcd")
    blk = make_ctr_data(
        4000, num_fields=10, vocab_per_field=200, seed=1, w_scale=0.5, v_scale=0.05
    )
    write_libsvm(blk, str(tmp / "tr.svm"))
    return tmp


def _cfg(data, **kw):
    base = dict(
        data_in=str(data / "tr.svm"),
        batch_size="1024",
        num_bits="13",
        max_nnz_per_row="12",
        V_dim="0",
        max_num_epochs="3",
        l1="0.05",
        l2="0.1",
        learner="bcd",
    )
    base.update({k: str(v) for k, v in kw.items()})
    return Config.from_kwargs(list(base.items()))


def test_bcd_converges(data):
    prog = BCDLearner(_cfg(data)).run()
    assert prog.exact_auc > 0.85
    assert prog.logloss < 0.5


def test_bcd_l1_sparsity(data):
    """Strong l1 must produce much sparser w (the point of BCD in the
    reference: exact-sparsity linear models)."""
    lrn_weak = BCDLearner(_cfg(data, l1="0.01"))
    lrn_strong = BCDLearner(_cfg(data, l1="2.0"))
    p_weak = lrn_weak.run()
    p_strong = lrn_strong.run()
    assert p_strong.nnz_w < p_weak.nnz_w * 0.5


def test_bcd_rejects_fm(data):
    with pytest.raises(AssertionError):
        BCDLearner(_cfg(data, V_dim="8"))


def test_tile_store_roundtrip(data, tmp_path):
    """Disk tiles must reproduce the exact COO content of the stream
    (reference: tile_store_test.cc / tile_builder_test.cc)."""
    from difacto_tpu.data.batch_iter import BatchIter
    from difacto_tpu.data.tile_store import build_tiles

    cfg = _cfg(data)
    num_rows = 1 << cfg.data.num_bits
    mk = lambda: BatchIter(
        cfg.data.data_in, batch_size=cfg.data.batch_size,
        max_nnz=cfg.data.max_nnz_per_row, num_bits=cfg.data.num_bits,
    )
    ts = build_tiles(mk, str(tmp_path / "tiles"), num_rows, num_blocks=16, num_shards=4)

    # reference triple set, computed densely in RAM
    want = set()
    n = 0
    for b in mk():
        rows = int(b.mask.sum())
        r, l = np.nonzero(b.ids[:rows] >= 0)
        for rr, ll in zip(r, l):
            want.add((rr + n, int(b.ids[rr, ll]), float(b.vals[rr, ll])))
        n += rows
    assert ts.n == n

    got = set()
    rpb, S = ts.rows_per_block, ts.num_shards
    for blk in range(ts.num_blocks):
        tr, tc, tv = ts.fetch(blk)
        ext = np.load(tmp_path / "tiles" / "extents.npy")
        for s in range(S):
            e = ext[blk, s]
            for j in range(e):
                grow = int(tr[s, j]) * S + s
                gcol = blk * rpb + int(tc[s, j])
                got.add((grow, gcol, float(tv[s, j])))
    assert got == want

    # shard-order mapping round-trips
    x = np.arange(n, dtype=np.float32)
    np.testing.assert_array_equal(ts.from_shard_order(ts.to_shard_order(x)), x)


def test_bcd_sharded_matches_single_device(data):
    """Row-sharded block steps (8 devices) == single device, the claim
    the round-1 docstring made without an implementation."""
    cfg8 = _cfg(data, max_num_epochs="2")
    cfg1 = _cfg(data, max_num_epochs="2", num_shards="1")
    w8 = BCDLearner(cfg8)
    assert w8.S == 8
    p8 = w8.run()
    w1 = BCDLearner(cfg1)
    assert w1.S == 1
    p1 = w1.run()
    np.testing.assert_allclose(
        np.asarray(w8.w), np.asarray(w1.w), rtol=2e-4, atol=2e-5
    )
    assert abs(p8.exact_auc - p1.exact_auc) < 1e-3


def test_bcd_validation_pass(data):
    from difacto_tpu.data.synthetic import make_ctr_data, write_libsvm

    va = make_ctr_data(1000, num_fields=10, vocab_per_field=200, seed=9,
                       w_scale=0.5, v_scale=0.05)
    import os
    val_path = str(data / "va.svm")
    if not os.path.exists(val_path):
        write_libsvm(va, val_path)
    prog = BCDLearner(_cfg(data, data_val=val_path)).run()
    # run() returns the validation Progress when data_val is set
    assert prog.num_examples == 1000
    assert prog.exact_auc > 0.65  # held-out: linear model on FM-truth data
    assert prog.nnz_w > 0


def test_bcd_checkpoint(data, tmp_path):
    cfg = _cfg(data, model_out=str(tmp_path / "bcd_model"), max_num_epochs="1")
    BCDLearner(cfg).run()
    from difacto_tpu.utils import checkpoint

    state, meta = checkpoint.load(str(tmp_path / "bcd_model"))
    assert meta["learner"] == "bcd"
    assert (np.asarray(state.w) != 0).sum() > 0


def test_bcd_model_scored_via_predict_cli(data, tmp_path):
    """A BCD-trained checkpoint scores through task=predict (the shared
    checkpoint format; scoring always uses the SGD eval path)."""
    from difacto_tpu.cli import main

    cfg = _cfg(data, model_out=str(tmp_path / "m"), max_num_epochs="2")
    BCDLearner(cfg).run()
    out = tmp_path / "scores.txt"
    rc = main([
        "task=predict", "learner=bcd", f"model_in={tmp_path/'m'}",
        f"data_in={data/'tr.svm'}", "batch_size=1024", "num_bits=13",
        "max_nnz_per_row=12", "V_dim=0", f"pred_out={out}", "store=local",
    ])
    assert rc == 0
    scores = np.loadtxt(out)
    assert len(scores) == 4000 and np.isfinite(scores).all()
