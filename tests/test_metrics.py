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
