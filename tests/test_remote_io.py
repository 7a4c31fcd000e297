"""URI-addressed streams over fsspec (reference: dmlc-core src/io/ —
local/HDFS/S3 filesystems behind dmlc::Stream). The remote path is
exercised with fsspec's in-process memory:// filesystem, so the tests
need no network: the same BatchIter that reads local files must read
object-store URIs (glob expansion, byte-range InputSplit parts, gzip
streams, binary CSR shards) and produce identical batches."""

import gzip
import io
import os

import numpy as np
import pytest

fsspec = pytest.importorskip("fsspec")

from difacto_tpu.data.batch_iter import BatchIter, expand_uri
from difacto_tpu.data.converter import load_csr_shard
from difacto_tpu.data.synthetic import make_ctr_data, write_libsvm


@pytest.fixture
def corpus(tmp_path):
    blk = make_ctr_data(600, num_fields=8, vocab_per_field=200, seed=5)
    local = tmp_path / "train.svm"
    write_libsvm(blk, str(local))
    data = local.read_bytes()
    fs = fsspec.filesystem("memory")
    with fs.open("/bucket/train.svm", "wb") as f:
        f.write(data)
    with fs.open("/bucket/train.svm.gz", "wb") as f:
        f.write(gzip.compress(data))
    yield blk, str(local), data
    fs.rm("/bucket", recursive=True)


def _collect(it):
    out = []
    for b in it:
        out.append((b.ids.copy(), b.vals.copy(), b.labels.copy(), b.mask.copy()))
    return out


def test_expand_uri_remote_glob_and_dir(corpus):
    hits = expand_uri("memory://bucket/*.svm")
    assert hits == ["memory:///bucket/train.svm"]  # fs-canonical path
    listing = expand_uri("memory://bucket")
    assert "memory:///bucket/train.svm" in listing
    # the expanded URIs are directly readable
    from difacto_tpu.data.io import open_uri

    with open_uri(hits[0]) as f:
        assert f.read(1)
    with pytest.raises(FileNotFoundError):
        expand_uri("memory://bucket/*.nope")


def test_remote_libsvm_matches_local(corpus):
    _, local, _ = corpus
    a = _collect(BatchIter(local, 128, 10, 14))
    b = _collect(BatchIter("memory://bucket/train.svm", 128, 10, 14))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        for u, v in zip(x, y):
            np.testing.assert_array_equal(u, v)


def test_remote_byte_range_parts_cover_exactly(corpus):
    _, local, _ = corpus
    whole = _collect(BatchIter(local, 128, 10, 14))
    rows = sum(int(m.sum()) for *_x, m in whole)
    parts_rows = 0
    for p in range(3):
        it = BatchIter(
            "memory://bucket/train.svm", 128, 10, 14,
            part_index=p, num_parts=3,
        )
        parts_rows += sum(int(m.sum()) for *_x, m in _collect(it))
    assert parts_rows == rows


def test_remote_gzip_stream(corpus):
    _, local, _ = corpus
    a = _collect(BatchIter(local, 128, 10, 14))
    b = _collect(BatchIter("memory://bucket/train.svm.gz", 128, 10, 14))
    ra = np.concatenate([x[0][x[3] > 0] for x in a])
    rb = np.concatenate([x[0][x[3] > 0] for x in b])
    np.testing.assert_array_equal(ra, rb)


def test_remote_csr_shard(corpus, tmp_path):
    blk, _, _ = corpus
    path = tmp_path / "shard.npz"
    np.savez(path, labels=blk.labels, indptr=blk.indptr,
             indices=blk.indices, values=blk.values)
    fs = fsspec.filesystem("memory")
    with fs.open("/bucket/shard.npz", "wb") as f:
        f.write(path.read_bytes())
    a = load_csr_shard(str(path))
    b = load_csr_shard("memory://bucket/shard.npz")
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_array_equal(a.labels, b.labels)
    # row-range part of a remote shard
    c = load_csr_shard("memory://bucket/shard.npz", part_index=1, num_parts=2)
    n = len(a.labels)
    np.testing.assert_array_equal(c.labels, a.labels[n // 2:])


def test_remote_checkpoint_roundtrip():
    """model_out/model_in to object-store URIs: save + load round-trip
    through memory:// exactly."""
    import jax

    from difacto_tpu.updaters.updater import FMState
    from difacto_tpu.utils import checkpoint

    rng = np.random.default_rng(4)
    st = FMState(
        w=rng.normal(size=64).astype(np.float32),
        z=rng.normal(size=64).astype(np.float32),
        n=rng.random(64).astype(np.float32),
        V=rng.normal(size=(4, 64)).astype(np.float32),
        nV=rng.random((4, 64)).astype(np.float32),
        cnt=rng.integers(0, 5, 64).astype(np.float32),
    )
    prefix = "memory://bucket/ckpt/model"
    out = checkpoint.save(prefix, jax.device_put(st), {"epoch": 2})
    assert out.startswith("memory://")
    loaded, meta = checkpoint.load(prefix)
    assert meta["epoch"] == 2
    for k in ("w", "z", "n", "V", "nV", "cnt"):
        np.testing.assert_array_equal(
            getattr(loaded, k), np.asarray(getattr(st, k)), err_msg=k
        )


def test_remote_sharded_checkpoint_topology_change(monkeypatch):
    """Sharded proc files on an object store restore onto a different
    topology: exercises expand_uri on the proc* glob, the process_count
    file filter, and the range re-slicer over remote streams."""
    import jax

    from difacto_tpu.config import Config
    from difacto_tpu.parallel.store import LocalStore, ShardedStore
    from difacto_tpu.updaters.updater import FMUpdater
    from difacto_tpu.utils import checkpoint

    cfg = Config.from_kwargs([
        ("batch_size", "64"), ("num_bits", "10"), ("max_nnz_per_row", "4"),
        ("V_dim", "2"),
    ])
    store = ShardedStore(FMUpdater(cfg.model), cfg)
    state = store.init_state(3)
    prefix = "memory://ckpt/topo"
    monkeypatch.setattr(checkpoint.jax, "process_count", lambda: 2)
    try:
        checkpoint.save(prefix, state, {"epoch": 1, "step": 0})
    finally:
        monkeypatch.undo()
    fs = fsspec.filesystem("memory")
    assert fs.exists("/ckpt/topo.proc0.npz")

    from helpers import fm_leaves

    loc = LocalStore(FMUpdater(cfg.model), cfg)
    restored, meta = checkpoint.load_for_store(prefix, loc)
    assert meta["sharded"]
    ref = fm_leaves(state)
    got = fm_leaves(restored)
    for name in ("w", "z", "n", "V", "nV", "cnt"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(got, name)),
            err_msg=name,
        )
    fs.rm("/ckpt", recursive=True)
