"""Metric tests (reference: bin_class_metric.h — AUC is the north-star)."""

import numpy as np

from difacto_tpu.ops.metrics import (
    NUM_AUC_BINS,
    auc_from_hist,
    auc_hist_update,
    exact_auc,
    logloss,
)


def brute_force_auc(y, s):
    pos = s[y > 0]
    neg = s[y <= 0]
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_exact_auc_matches_brute_force():
    rng = np.random.default_rng(0)
    y = (rng.random(200) > 0.5).astype(np.float32)
    s = rng.normal(size=200)
    assert abs(exact_auc(y, s) - brute_force_auc(y, s)) < 1e-12


def test_exact_auc_ties():
    y = np.array([1, 0, 1, 0, 1])
    s = np.array([0.5, 0.5, 0.5, 0.1, 0.9])
    assert abs(exact_auc(y, s) - brute_force_auc(y, s)) < 1e-12


def test_exact_auc_degenerate():
    assert exact_auc(np.ones(5), np.arange(5)) == 0.5
    assert exact_auc(np.zeros(5), np.arange(5)) == 0.5


def test_exact_auc_pm1_labels():
    y = np.array([-1, 1, -1, 1])
    s = np.array([0.1, 0.9, 0.2, 0.8])
    assert exact_auc(y, s) == 1.0


def test_binned_auc_close_to_exact():
    rng = np.random.default_rng(1)
    n = 5000
    y = (rng.random(n) > 0.6).astype(np.float32)
    s = rng.normal(size=n) + y  # separable-ish
    hist = np.zeros((2, NUM_AUC_BINS), np.float32)
    hist = np.asarray(auc_hist_update(hist, s, y, np.ones(n, np.float32)))
    assert abs(auc_from_hist(hist) - exact_auc(y, s)) < 2e-3


def test_binned_auc_additive():
    """Histogram AUC must merge across shards like the reference Progress."""
    rng = np.random.default_rng(2)
    y = (rng.random(1000) > 0.5).astype(np.float32)
    s = rng.normal(size=1000) + 0.5 * y
    h_all = np.asarray(
        auc_hist_update(np.zeros((2, NUM_AUC_BINS), np.float32), s, y, np.ones(1000, np.float32))
    )
    h_sum = sum(
        np.asarray(
            auc_hist_update(
                np.zeros((2, NUM_AUC_BINS), np.float32),
                s[i::4], y[i::4], np.ones(250, np.float32),
            )
        )
        for i in range(4)
    )
    np.testing.assert_allclose(h_all, h_sum)
    assert auc_from_hist(h_all) == auc_from_hist(h_sum)


def test_masked_rows_excluded():
    y = np.array([1, 0, 1, 1], np.float32)
    s = np.array([5.0, -5.0, 0.0, 99.0], np.float32)
    w = np.array([1, 1, 1, 0], np.float32)
    h = np.asarray(auc_hist_update(np.zeros((2, NUM_AUC_BINS), np.float32), s, y, w))
    assert h.sum() == 3


def test_logloss():
    y = np.array([1, 0])
    py = np.array([100.0, -100.0])
    assert logloss(y, py) < 1e-8
    assert abs(logloss(np.array([1]), np.array([0.0])) - np.log(2)) < 1e-9


def test_binned_auc_within_computed_error_bound():
    """|binned - exact| <= auc_hist_error_bound(hist) (half the in-bin
    cross-pair mass), including on skewed score distributions where most
    mass piles into few bins."""
    from difacto_tpu.ops.metrics import auc_hist_error_bound

    rng = np.random.default_rng(7)
    n = 20000
    for skew in (0.0, 3.0, 6.0):  # margins pushed far into sigmoid tails
        y = (rng.random(n) > 0.8).astype(np.float32)
        s = rng.normal(size=n) * 0.3 + 0.4 * y + skew
        hist = np.zeros((2, NUM_AUC_BINS), np.float32)
        hist = np.asarray(auc_hist_update(hist, s, y, np.ones(n, np.float32)))
        bound = auc_hist_error_bound(hist)
        err = abs(auc_from_hist(hist) - exact_auc(y, s))
        assert err <= bound + 1e-12, (skew, err, bound)
        # sane scale: spread scores keep the bound ~O(1/num_bins); the
        # skew=6 case saturates the top bin and the bound reports it
        if skew == 0.0:
            assert bound < 5e-3


def test_binned_auc_bound_degenerate_all_tied():
    """All scores identical: binned AUC 0.5 is exact, bound is 0.5 —
    reported, not hidden."""
    from difacto_tpu.ops.metrics import auc_hist_error_bound

    y = np.array([1.0, 0.0, 1.0, 0.0])
    s = np.zeros(4)
    hist = np.zeros((2, NUM_AUC_BINS), np.float32)
    hist = np.asarray(auc_hist_update(hist, s, y, np.ones(4, np.float32)))
    assert auc_from_hist(hist) == 0.5
    assert abs(auc_hist_error_bound(hist) - 0.5) < 1e-12


def test_reservoir_unbiased_on_ordered_stream():
    """The eval collector reservoir-samples: on a stream ordered all-
    positives-first (where a prefix would contain ONLY positives), the
    sample keeps the global class balance and its exact AUC tracks the
    full-stream exact AUC."""
    from difacto_tpu.learners.sgd import _Reservoir

    rng = np.random.default_rng(3)
    n = 40000
    y = np.concatenate([np.ones(n // 2), np.zeros(n // 2)]).astype(np.float32)
    s = (rng.normal(size=n) + 0.8 * y).astype(np.float32)
    res = _Reservoir(2000, seed=0)
    for lo in range(0, n, 1000):  # feed in batches, positives first
        res.add(y[lo : lo + 1000], s[lo : lo + 1000])
    ys, ps = res.sample()
    assert res.truncated and len(ys) == 2000
    frac_pos = ys.mean()
    assert 0.42 < frac_pos < 0.58  # prefix would give 1.0
    assert abs(exact_auc(ys, ps) - exact_auc(y, s)) < 0.03
