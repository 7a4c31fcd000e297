"""Data layer tests (reference: dmlc-core parser tests + localizer_test.cc
+ the InputSplit record-alignment guarantees)."""

import numpy as np
import pytest

from difacto_tpu.base import hash_ids, splitmix64
from difacto_tpu.data.batch_iter import PAD_ID, BatchIter, rowblock_to_batches
from difacto_tpu.data.converter import convert_file, load_csr_shard
from difacto_tpu.data.libsvm import iter_file_chunks, parse_libsvm_numpy
from difacto_tpu.data.synthetic import make_ctr_data, write_libsvm


def test_parse_libsvm_golden():
    text = b"""1 0:1.5 7:2.0
0 3:1.0
# a comment line

1 18446744073709551615:0.25 2:-1
"""
    blk = parse_libsvm_numpy(text)
    assert blk.num_rows == 3
    np.testing.assert_array_equal(blk.labels, [1, 0, 1])
    np.testing.assert_array_equal(blk.indptr, [0, 2, 3, 5])
    np.testing.assert_array_equal(
        blk.indices, np.array([0, 7, 3, 18446744073709551615, 2], np.uint64)
    )
    np.testing.assert_allclose(blk.values, [1.5, 2.0, 1.0, 0.25, -1.0])


def test_parse_negative_label():
    blk = parse_libsvm_numpy(b"-1 1:1\n+1 2:1\n")
    np.testing.assert_array_equal(blk.labels, [-1, 1])


def test_parse_empty():
    assert parse_libsvm_numpy(b"").num_rows == 0
    assert parse_libsvm_numpy(b"\n\n").num_rows == 0


def test_parse_bare_index_means_one():
    """dmlc semantics: a bare 'i' token is value 1.0 (round-1 parity gap —
    the numpy engine used to reject what the C++ engine accepted)."""
    blk = parse_libsvm_numpy(b"1 5 9:2.5 11\n0 3\n")
    np.testing.assert_array_equal(blk.indptr, [0, 3, 4])
    np.testing.assert_array_equal(blk.indices, [5, 9, 11, 3])
    np.testing.assert_allclose(blk.values, [1.0, 2.5, 1.0, 1.0])


def test_parse_label_only_rows_and_malformed():
    import pytest

    blk = parse_libsvm_numpy(b"1\n0 2:3\n")
    np.testing.assert_array_equal(blk.indptr, [0, 0, 1])
    with pytest.raises(ValueError):
        parse_libsvm_numpy(b"1 abc:2\n")
    with pytest.raises(ValueError):
        parse_libsvm_numpy(b"1 3:\n")


def test_chunk_parts_disjoint_and_complete(tmp_path):
    """Byte-range parts must cover every line exactly once (dmlc InputSplit)."""
    path = tmp_path / "d.svm"
    lines = [f"{i % 2} {i}:1\n" for i in range(997)]
    path.write_text("".join(lines))
    seen = []
    for part in range(4):
        for chunk in iter_file_chunks(str(path), chunk_bytes=256, part_index=part, num_parts=4):
            seen.extend(chunk.splitlines())
    assert sorted(seen) == sorted(ln.strip().encode() for ln in lines)


def test_hash_ids_range_and_determinism():
    ids = np.array([0, 1, 2**63, 2**64 - 1], np.uint64)
    h1 = hash_ids(ids, 16)
    h2 = hash_ids(ids, 16)
    np.testing.assert_array_equal(h1, h2)
    assert h1.dtype == np.int32
    assert (h1 >= 0).all() and (h1 < 2**16).all()
    # mixing: distinct inputs should not collide here
    assert len(set(h1.tolist())) == 4


def test_splitmix_uniformity():
    h = splitmix64(np.arange(1 << 14, dtype=np.uint64))
    bins = np.bincount((h & np.uint64(255)).astype(int), minlength=256)
    assert bins.min() > 20  # roughly uniform over 256 buckets (mean 64)


def test_batches_shapes_padding():
    blk = make_ctr_data(100, num_fields=5, vocab_per_field=50, seed=0)
    batches = list(rowblock_to_batches(blk, batch_size=32, max_nnz=8, num_bits=12))
    assert len(batches) == 4
    for b in batches:
        assert b.ids.shape == (32, 8)
        assert b.vals.shape == (32, 8)
        # padding slots: id == PAD_ID and val == 0
        assert ((b.ids == PAD_ID) == (b.vals == 0)).all() or (b.vals[b.ids == PAD_ID] == 0).all()
    # last batch has 100 - 96 = 4 real rows
    assert batches[-1].num_examples == 4
    assert batches[-1].mask[:4].all() and not batches[-1].mask[4:].any()


def test_truncation():
    """Rows longer than max_nnz are truncated, not dropped."""
    blk = make_ctr_data(16, num_fields=10, vocab_per_field=50, seed=0)
    (b,) = rowblock_to_batches(blk, batch_size=16, max_nnz=4, num_bits=12)
    assert (b.ids[:, :4] != PAD_ID).all()


def test_converter_roundtrip(tmp_path):
    blk = make_ctr_data(500, num_fields=6, vocab_per_field=100, seed=3)
    svm = tmp_path / "x.svm"
    write_libsvm(blk, str(svm))
    outs = convert_file(str(svm), str(tmp_path / "x"), rows_per_shard=200)
    assert len(outs) == 3
    rows = 0
    nnz = 0
    for p in outs:
        shard = load_csr_shard(p)
        rows += shard.num_rows
        nnz += shard.nnz
    assert rows == 500 and nnz == blk.nnz
    # first shard content matches the head of the original block
    s0 = load_csr_shard(outs[0])
    np.testing.assert_array_equal(s0.labels, blk.labels[: s0.num_rows])
    np.testing.assert_array_equal(s0.indices, blk.indices[: s0.nnz])


def test_batchiter_epochs_and_formats(tmp_path):
    blk = make_ctr_data(300, num_fields=4, vocab_per_field=40, seed=5)
    svm = tmp_path / "y.svm"
    write_libsvm(blk, str(svm))
    it = BatchIter(str(svm), batch_size=64, max_nnz=4, num_bits=12, shuffle=True, seed=9)
    e1 = [b.labels.copy() for b in it]
    e2 = [b.labels.copy() for b in it]
    assert sum(b.sum() for b in e1) == sum(b.sum() for b in e2)
    # shuffling differs between epochs
    assert any((a != b).any() for a, b in zip(e1, e2))
    # csr format path
    convert_file(str(svm), str(tmp_path / "y"), rows_per_shard=1000)
    it2 = BatchIter(
        str(tmp_path / "y.part*.npz"), batch_size=64, max_nnz=4, num_bits=12,
        data_format="csr",
    )
    total = sum(b.num_examples for b in it2)
    assert total == 300


def test_chunk_boundary_on_newline_no_duplicates(tmp_path):
    """A part boundary landing exactly on a newline must not duplicate
    the line (the boundary line belongs to the part it started in)."""
    path = tmp_path / "b.svm"
    # craft lines so some num_parts=2..5 boundary lands exactly at a '\n'
    lines = [f"1 {i}:1\n" for i in range(64)]
    path.write_text("".join(lines))
    size = path.stat().st_size
    for num_parts in range(2, 6):
        seen = []
        for part in range(num_parts):
            for chunk in iter_file_chunks(
                str(path), chunk_bytes=16, part_index=part, num_parts=num_parts
            ):
                seen.extend(chunk.splitlines())
        assert sorted(seen) == sorted(ln.strip().encode() for ln in lines), num_parts
    # explicit exact-boundary case: boundary at size/2 on a newline
    two = tmp_path / "c.svm"
    two.write_text("1 1:1\n0 2:1\n")  # 6 bytes each -> boundary at 6
    seen = []
    for part in range(2):
        for chunk in iter_file_chunks(str(two), part_index=part, num_parts=2):
            seen.extend(chunk.splitlines())
    assert seen == [b"1 1:1", b"0 2:1"]


def test_multi_part_indices_cover_file(tmp_path):
    """BatchIter with a part-index range iterates all owned parts
    (num_parts_per_file semantics on one host)."""
    blk = make_ctr_data(300, num_fields=4, vocab_per_field=40, seed=5)
    svm = tmp_path / "p.svm"
    write_libsvm(blk, str(svm))
    it = BatchIter(
        str(svm), batch_size=64, max_nnz=4, num_bits=12,
        part_index=range(0, 4), num_parts=4,
    )
    assert sum(b.num_examples for b in it) == 300


def test_num_bits_31_rejected():
    import pytest as _pytest

    from difacto_tpu.config import Config

    with _pytest.raises(AssertionError):
        Config.from_kwargs([("num_bits", "31")])


def test_file_order_shuffles_across_epochs(tmp_path):
    """Multi-file datasets shuffle file order per epoch (shuffle=True)."""
    paths = []
    for i in range(4):
        blk = make_ctr_data(64, num_fields=3, vocab_per_field=20, seed=10 + i)
        p = tmp_path / f"f{i}.svm"
        write_libsvm(blk, str(p))
        paths.append(str(p))
    it = BatchIter(paths, batch_size=64, max_nnz=3, num_bits=12, shuffle=True, seed=3)
    e1 = np.concatenate([b.labels for b in it])
    e2 = np.concatenate([b.labels for b in it])
    assert e1.shape == e2.shape
    assert (e1 != e2).any()  # different file/batch order
    # no shuffle: stable order
    it2 = BatchIter(paths, batch_size=64, max_nnz=3, num_bits=12, shuffle=False)
    a = np.concatenate([b.labels for b in it2])
    b2 = np.concatenate([b.labels for b in it2])
    np.testing.assert_array_equal(a, b2)


def test_gzip_chunks_disjoint_and_complete(tmp_path):
    """.gz streams: chunk-round-robin parts cover every line exactly once,
    and a single-part read matches the plain file (dmlc gzip streams)."""
    import gzip

    lines = [f"{i % 2} {i}:1\n" for i in range(997)]
    gz = tmp_path / "d.svm.gz"
    with gzip.open(gz, "wb") as f:
        f.write("".join(lines).encode())
    whole = b"".join(iter_file_chunks(str(gz)))
    assert whole == "".join(lines).encode()
    seen = []
    for part in range(3):
        for chunk in iter_file_chunks(
            str(gz), chunk_bytes=256, part_index=part, num_parts=3
        ):
            seen.extend(chunk.splitlines())
    assert sorted(seen) == sorted(ln.strip().encode() for ln in lines)


def test_batchiter_reads_gzip(tmp_path):
    """End-to-end: BatchIter over a .gz file yields the same examples as
    the plain text file."""
    from difacto_tpu.data.batch_iter import BatchIter

    import gzip

    lines = [f"{i % 2} {i}:{i + 1}\n" for i in range(100)]
    plain = tmp_path / "d.svm"
    plain.write_text("".join(lines))
    gz = tmp_path / "z.svm.gz"
    with gzip.open(gz, "wb") as f:
        f.write("".join(lines).encode())
    kw = dict(batch_size=32, max_nnz=4, num_bits=16)
    a = [b for b in BatchIter(str(plain), **kw)]
    b = [b for b in BatchIter(str(gz), **kw)]
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x.ids, y.ids)
        np.testing.assert_array_equal(x.vals, y.vals)
        np.testing.assert_array_equal(x.labels, y.labels)


def test_parse_feature_less_lines():
    """Rows with a label but zero features are legal libsvm (bias-only
    examples) and must parse to nnz=0 rows, not crash."""
    from difacto_tpu.data.libsvm import parse_libffm_numpy, parse_libsvm_numpy

    blk = parse_libsvm_numpy(b"1\n0\n")
    assert blk.num_rows == 2 and blk.nnz == 0
    blk = parse_libsvm_numpy(b"1 3:2.0\n0\n")
    assert blk.num_rows == 2 and blk.nnz == 1
    blk = parse_libffm_numpy(b"1\n0\n")
    assert blk.num_rows == 2 and blk.nnz == 0 and blk.fields is not None


def test_prep_min_ub_is_window_aligned():
    """A unique_size floor that is not a multiple of 128 must round up
    (the pair kernels address unique lanes in 128-wide windows)."""
    import numpy as np

    from difacto_tpu.data.batch_iter import Batch
    from difacto_tpu.data.prep import prep_batch

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 4096, (64, 8)).astype(np.int32)
    b = Batch(ids, np.ones((64, 8), np.float32),
              np.zeros(64, np.float32), np.ones(64, np.float32))
    pb = prep_batch(b, 8192, min_ub=100000)
    assert pb.uids.shape[0] % 128 == 0
    assert pb.uids.shape[0] >= 100000
