"""Native (C++) libsvm parser tests (reference: dmlc-core parser tests).

Builds the extension on first run; skips if no toolchain is available.
"""

import numpy as np
import pytest

from difacto_tpu.data import _native
from difacto_tpu.data.libsvm import parse_libsvm_numpy


@pytest.fixture(scope="module")
def native():
    if not _native.available():
        from difacto_tpu.data.build_ext import build

        if build(verbose=False) is None:
            pytest.skip("no C++ toolchain")
        _native._TRIED = False  # re-probe
        _native._LIB = None
    assert _native.available()
    return _native


def test_golden(native):
    blk = native.parse_libsvm(b"1 0:1.5 7:2\n0 3:1\n# c\n\n-1 2:-1e-2\n")
    np.testing.assert_array_equal(blk.labels, [1, 0, -1])
    np.testing.assert_array_equal(blk.indptr, [0, 2, 3, 4])
    np.testing.assert_array_equal(blk.indices, [0, 7, 3, 2])
    np.testing.assert_allclose(blk.values, [1.5, 2.0, 1.0, -0.01], rtol=1e-6)


def test_bare_index_means_one(native):
    blk = native.parse_libsvm(b"1 5 9:2.5 11\n")
    np.testing.assert_array_equal(blk.indices, [5, 9, 11])
    np.testing.assert_allclose(blk.values, [1.0, 2.5, 1.0])


def test_uint64_ids(native):
    blk = native.parse_libsvm(b"0 18446744073709551615:1\n")
    assert blk.indices[0] == np.uint64(18446744073709551615)


def test_matches_numpy_engine(native):
    from difacto_tpu.data.synthetic import make_ctr_data, write_libsvm
    import tempfile, os

    tmp = tempfile.mkdtemp()
    b0 = make_ctr_data(2000, num_fields=8, vocab_per_field=200, seed=7)
    path = os.path.join(tmp, "x.svm")
    write_libsvm(b0, path)
    data = open(path, "rb").read()
    a = parse_libsvm_numpy(data)
    b = native.parse_libsvm(data)
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.indptr, b.indptr)
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.values, b.values, rtol=1e-6)


def test_matches_numpy_engine_with_bare_indices(native):
    """Property test: random corpora mixing 'i:v' and bare 'i' tokens
    (dmlc value-1.0 form) must parse identically through both engines."""
    rng = np.random.default_rng(11)
    for trial in range(5):
        lines = []
        for _ in range(rng.integers(1, 200)):
            label = rng.choice([b"0", b"1", b"-1", b"+1", b"0.5"])
            toks = [label]
            for _ in range(rng.integers(0, 12)):
                idx = rng.integers(0, 1 << 63)
                if rng.random() < 0.4:
                    toks.append(b"%d" % idx)
                else:
                    toks.append(b"%d:%.6g" % (idx, rng.normal()))
            lines.append(b" ".join(toks))
        data = b"\n".join(lines) + (b"\n" if rng.random() < 0.7 else b"")
        a = parse_libsvm_numpy(data)
        b = native.parse_libsvm(data)
        np.testing.assert_array_equal(a.labels, b.labels, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(a.indptr, b.indptr)
        np.testing.assert_array_equal(a.indices, b.indices)
        np.testing.assert_allclose(a.values, b.values, rtol=1e-6)


def test_multithreaded_consistency(native):
    text = b"".join(b"1 %d:1 %d:2\n" % (i, i * 7 + 1) for i in range(5000))
    a = native.parse_libsvm(text, nthreads=1)
    b = native.parse_libsvm(text, nthreads=8)
    np.testing.assert_array_equal(a.labels, b.labels)
    np.testing.assert_array_equal(a.indptr, b.indptr)
    np.testing.assert_array_equal(a.indices, b.indices)


def test_malformed_returns_error(native):
    with pytest.raises(ValueError):
        native.parse_libsvm(b"not a number at all\n")


def test_native_localize_parity():
    """csrc/localizer.cpp (the reference Localizer's C++ counterpart)
    must reproduce the NumPy engine exactly: same sorted uniques, counts,
    and slot->lane inverse, including padding sentinels — at table sizes
    on both sides of the LUT cap."""
    import numpy as np
    import pytest

    from difacto_tpu.data import _native

    if not _native.localize_available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(4)
    for bits, n in ((10, 5000), (22, 100_000), (26, 100_000)):
        N = 1 << bits
        ids = rng.integers(0, N, n).astype(np.int32)
        ids[rng.random(n) < 0.15] = -1
        u1, i1, c1 = _native.localize(ids, N)
        keys = np.where(ids < 0, np.int32(N), ids)
        u2, i2, c2 = np.unique(keys, return_inverse=True, return_counts=True)
        np.testing.assert_array_equal(u1, u2)
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(i1, i2)


def test_localize_ids_native_path_matches_numpy():
    """prep._localize_ids must be engine-independent: force both paths
    over the same >2^24 table and compare the full contract."""
    import numpy as np
    import pytest

    import difacto_tpu.data._native as nat
    import difacto_tpu.data.prep as prep

    if not nat.localize_available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(5)
    N = 1 << 25
    ids = rng.integers(0, N, (512, 16)).astype(np.int32)
    ids[rng.random((512, 16)) < 0.1] = -1
    got = prep._localize_ids(ids, N)  # native path (N > LUT cap)
    orig = nat.localize_available
    nat.localize_available = lambda: False
    try:
        ref = prep._localize_ids(ids, N)  # numpy searchsorted path
    finally:
        nat.localize_available = orig
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
