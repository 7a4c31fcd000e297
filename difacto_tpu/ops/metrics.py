"""Binary classification metrics.

Counterpart of the reference's ``src/loss/bin_class_metric.h`` ::
BinClassMetric (AUC / Accuracy / LogitObjv). Two AUC paths:

* :func:`exact_auc` — host-side sort-based AUC, bit-compatible with the
  reference's sort-by-score computation (the north-star metric).
* device-side binned histograms (:func:`auc_hist_update` under jit,
  :func:`auc_from_hist` on host) — additive across steps and hosts, the
  streaming form that feeds ``Progress`` like difacto's Reporter channel.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

NUM_AUC_BINS = 1024


def exact_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Sort-based AUC with proper tie handling (average rank), matching the
    reference BinClassMetric::AUC semantics. labels in {0,1} (or {-1,+1})."""
    y = np.asarray(labels).astype(np.float64)
    y = (y > 0).astype(np.float64)
    s = np.asarray(scores).astype(np.float64)
    n_pos = y.sum()
    n_neg = y.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.5
    order = np.argsort(s, kind="mergesort")
    s_sorted = s[order]
    # vectorized tie-averaged ranks
    _, inv, counts = np.unique(s_sorted, return_inverse=True, return_counts=True)
    cum = np.cumsum(counts)
    start = cum - counts
    avg = (start + cum + 1) / 2.0  # average of ranks [start+1 .. cum]
    ranks = avg[inv]
    rank_pos = ranks[y[order] > 0].sum()
    return float((rank_pos - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg))


def logloss(labels: np.ndarray, py: np.ndarray) -> float:
    """Mean log(1 + exp(-y*py)) with y in {-1,+1} (labels may be {0,1})."""
    y = np.where(np.asarray(labels) > 0, 1.0, -1.0)
    m = -y * np.asarray(py, dtype=np.float64)
    return float(np.mean(np.log1p(np.exp(-np.abs(m))) + np.maximum(m, 0.0)))


def auc_hist_update(hist, py, labels, weights):
    """Accumulate per-class score histograms on device (jit-friendly).

    hist: f32[2, NUM_AUC_BINS] (row 0 = negatives, row 1 = positives);
    py: raw margins; labels in {0,1}; weights: 1 for real rows, 0 for padding.
    """
    p = jnp.clip(jnp.asarray(py), -30.0, 30.0)
    prob = 1.0 / (1.0 + jnp.exp(-p))
    bins = jnp.clip((prob * NUM_AUC_BINS).astype(jnp.int32), 0, NUM_AUC_BINS - 1)
    is_pos = (labels > 0).astype(jnp.int32)
    flat_idx = is_pos * NUM_AUC_BINS + bins
    upd = jnp.zeros(2 * NUM_AUC_BINS, dtype=hist.dtype).at[flat_idx].add(weights)
    return hist + upd.reshape(2, NUM_AUC_BINS)


def auc_hist_error_bound(hist: np.ndarray) -> float:
    """Worst-case |binned - exact| AUC error for this histogram.

    The binned estimate differs from the exact AUC only on (pos, neg)
    pairs that land in the SAME probability bin: the estimate scores each
    such pair 0.5 (tie), the exact value is in [0, 1], so the error is at
    most 0.5 x (in-bin cross-pair mass) = 0.5 * sum_b pos_b*neg_b / (P*N).
    With 1024 uniform probability bins and any score distribution whose
    in-bin mass is spread (the typical sigmoid-margin case), this is
    O(1/num_bins); the bound is computed from the ACTUAL histogram so a
    pathological spike (all scores equal -> bound 0.5, correctly: AUC is
    genuinely 0.5 under ties) is reported, not hidden. The learner logs
    exact AUC alongside whenever the eval set fits the host cap, and a
    uniform reservoir sample of it beyond."""
    h = np.asarray(hist, dtype=np.float64)
    neg, pos = h[0], h[1]
    n_neg, n_pos = neg.sum(), pos.sum()
    if n_neg == 0 or n_pos == 0:
        return 0.0
    return float(0.5 * np.dot(pos, neg) / (n_pos * n_neg))


def auc_from_hist(hist: np.ndarray) -> float:
    """AUC from (neg, pos) score histograms with within-bin tie averaging."""
    h = np.asarray(hist, dtype=np.float64)
    neg, pos = h[0], h[1]
    n_neg, n_pos = neg.sum(), pos.sum()
    if n_neg == 0 or n_pos == 0:
        return 0.5
    # For each bin b: pairs where pos falls in b:
    #   wins = pos[b] * (# neg in bins < b); ties = pos[b] * neg[b] * 0.5
    cum_neg = np.concatenate([[0.0], np.cumsum(neg)[:-1]])
    wins = float(np.dot(pos, cum_neg))
    ties = float(np.dot(pos, neg)) * 0.5
    return (wins + ties) / (n_pos * n_neg)
