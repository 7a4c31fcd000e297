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
