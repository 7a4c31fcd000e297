"""Config / arg-parser tests (reference: tests of ArgParser + dmlc::Parameter)."""

import pytest

from difacto_tpu.config import Config
from difacto_tpu.utils import arg_parser


def test_defaults():
    cfg = Config.from_kwargs([])
    assert cfg.model.lr_eta == 0.01
    assert cfg.model.V_dim == 0
    assert cfg.data.batch_size == 8192


def test_override_and_types():
    cfg = Config.from_kwargs(
        [("lr_eta", "0.5"), ("V_dim", "16"), ("batch_size", "128"), ("shuffle", "false")]
    )
    assert cfg.model.lr_eta == 0.5
    assert cfg.model.V_dim == 16
    assert cfg.data.batch_size == 128
    assert cfg.data.shuffle is False


def test_unknown_key_fatal():
    with pytest.raises(ValueError, match="unknown config keys"):
        Config.from_kwargs([("not_a_key", "1")])


def test_config_file(tmp_path):
    conf = tmp_path / "train.conf"
    conf.write_text("# comment\nlr_eta = 0.3\nV_dim = 8  # inline comment\n\n")
    kwargs = arg_parser.parse([str(conf), "l1=2.5"])
    cfg = Config.from_kwargs(kwargs)
    assert cfg.model.lr_eta == 0.3
    assert cfg.model.V_dim == 8
    assert cfg.model.l1 == 2.5


def test_bad_line(tmp_path):
    conf = tmp_path / "bad.conf"
    conf.write_text("this is not a kv line\n")
    with pytest.raises(ValueError):
        arg_parser.read_file(str(conf))


def test_local_store_rejects_multiprocess(monkeypatch):
    """store=local under process_count > 1 would silently train one model
    per process on its own input part — must fail fast instead."""
    import jax
    import pytest

    from difacto_tpu.config import Config
    from difacto_tpu.parallel.store import LocalStore
    from difacto_tpu.updaters.updater import FMUpdater

    cfg = Config.from_kwargs([
        ("batch_size", "64"), ("num_bits", "10"), ("max_nnz_per_row", "4"),
    ])
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="store=local cannot span"):
        LocalStore(FMUpdater(cfg.model), cfg)
