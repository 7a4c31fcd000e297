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
