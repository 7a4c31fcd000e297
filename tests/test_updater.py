"""Updater tests (reference: sgd_updater_test.cc — FTRL/AdaGrad state math
against a per-key scalar reference, frequency-adaptive V activation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from difacto_tpu.config import FMParam
from difacto_tpu.updaters.updater import FMUpdater


def scalar_ftrl(w, z, n, g, eta, beta, l1, l2):
    n_new = n + g * g
    sigma = (np.sqrt(n_new) - np.sqrt(n)) / eta
    z_new = z + g - sigma * w
    if abs(z_new) <= l1:
        w_new = 0.0
    else:
        w_new = -(z_new - np.sign(z_new) * l1) / ((beta + np.sqrt(n_new)) / eta + l2)
    return w_new, z_new, n_new


def _updater(**kw):
    p = FMParam()
    for k, v in kw.items():
        setattr(p, k, v)
    return FMUpdater(p)


def test_ftrl_matches_scalar_reference():
    upd = _updater(lr_eta=0.1, lr_beta=1.0, l1=0.5, l2=0.25, V_dim=0)
    state = upd.init_state(16)
    rng = np.random.default_rng(0)
    # emulate several sequential updates on a few keys
    ref = {u: [0.0, 0.0, 0.0] for u in range(16)}
    for step in range(5):
        uids = np.sort(rng.choice(16, size=6, replace=False)).astype(np.int32)
        grads = rng.normal(size=(6, 1)).astype(np.float32)
        valid = np.ones(6, bool)
        state = upd.update(
            state, jnp.asarray(uids), jnp.asarray(grads),
            jnp.ones(6, jnp.float32), jnp.asarray(valid),
        )
        for u, g in zip(uids, grads[:, 0]):
            w, z, n = ref[u]
            ref[u] = list(scalar_ftrl(w, z, n, float(g), 0.1, 1.0, 0.5, 0.25))
    w_dev = np.asarray(state.w)
    for u in range(16):
        assert abs(w_dev[u] - ref[u][0]) < 1e-5, u


def test_ftrl_l1_gives_exact_zeros():
    upd = _updater(lr_eta=0.1, l1=10.0, V_dim=0)
    state = upd.init_state(8)
    uids = jnp.arange(4, dtype=jnp.int32)
    grads = jnp.full((4, 1), 0.05, jnp.float32)  # tiny grads, |z| stays < l1
    state = upd.update(state, uids, grads, jnp.ones(4), jnp.ones(4, bool))
    assert (np.asarray(state.w)[:4] == 0).all()


def test_invalid_lanes_untouched():
    upd = _updater(V_dim=2)
    state = upd.init_state(8)
    w0 = np.asarray(state.w).copy()
    uids = jnp.array([8, 8, 8], jnp.int32)  # sentinel lanes
    grads = jnp.ones((3, 3), jnp.float32) * 100
    state = upd.update(state, uids, grads, jnp.ones(3), jnp.zeros(3, bool))
    np.testing.assert_array_equal(np.asarray(state.w), w0)
    assert np.asarray(state.cnt).sum() == 0


def test_v_activation_gating():
    """V contributes/updates only once cnt >= V_threshold, and the first
    crossing batch does not update V (reference lazy-alloc semantics)."""
    upd = _updater(V_dim=4, V_threshold=2, V_init_scale=0.1)
    state = upd.init_state(8, seed=1)
    V0 = np.asarray(state.V).copy()
    uids = jnp.array([3], jnp.int32)
    valid = jnp.ones(1, bool)

    # pull before any counts: V part must be zero
    rows = np.asarray(upd.pull(state, uids, valid))
    assert (rows[0, 1:] == 0).all()

    g = jnp.ones((1, 5), jnp.float32) * 0.1
    # batch 1: cnt 0 -> 1 (< threshold): no V update
    state = upd.update(state, uids, g, jnp.ones(1), valid)
    np.testing.assert_array_equal(np.asarray(state.V)[:, 3], V0[:, 3])
    # batch 2: cnt 1 -> 2 (crosses): still no V update this batch
    state = upd.update(state, uids, g, jnp.ones(1), valid)
    np.testing.assert_array_equal(np.asarray(state.V)[:, 3], V0[:, 3])
    # pull now returns the initialized V (activated)
    rows = np.asarray(upd.pull(state, uids, valid))
    np.testing.assert_allclose(rows[0, 1:], V0[:, 3], rtol=1e-6)
    # batch 3: active: V updates
    state = upd.update(state, uids, g, jnp.ones(1), valid)
    assert (np.asarray(state.V)[:, 3] != V0[:, 3]).any()
    # untouched rows keep their init
    np.testing.assert_array_equal(np.asarray(state.V)[:, 4], V0[:, 4])


def test_adagrad_w():
    upd = _updater(w_updater="adagrad", lr_eta=0.5, lr_beta=1.0, l2=0.0, V_dim=0)
    state = upd.init_state(4)
    uids = jnp.array([1], jnp.int32)
    g = jnp.array([[2.0]], jnp.float32)
    state = upd.update(state, uids, g, jnp.ones(1), jnp.ones(1, bool))
    # w = 0 - 0.5 * 2 / (sqrt(4) + 1) = -1/3
    assert abs(float(state.w[1]) + 1.0 / 3.0) < 1e-6


def test_sgd_w():
    upd = _updater(w_updater="sgd", lr_eta=0.5, l2=0.0, V_dim=0)
    state = upd.init_state(4)
    uids = jnp.array([2], jnp.int32)
    g = jnp.array([[1.5]], jnp.float32)
    state = upd.update(state, uids, g, jnp.ones(1), jnp.ones(1, bool))
    assert abs(float(state.w[2]) + 0.75) < 1e-6


def test_tail_feature_filter_blocks_rare():
    upd = _updater(V_dim=0, tail_feature_filter=5, l1=0.0)
    state = upd.init_state(8)
    uids = jnp.array([1], jnp.int32)
    g = jnp.array([[1.0]], jnp.float32)
    state = upd.update(state, uids, g, jnp.ones(1), jnp.ones(1, bool))
    assert float(state.w[1]) == 0.0  # cnt 0 < 5: no update
    # after the count pass pushes 5 occurrences, updates apply
    import dataclasses

    state = dataclasses.replace(state, cnt=state.cnt.at[1].set(5.0))
    state = upd.update(state, uids, g, jnp.ones(1), jnp.ones(1, bool))
    assert float(state.w[1]) != 0.0


def test_stats():
    upd = _updater(V_dim=2, V_threshold=1)
    state = upd.init_state(8)
    uids = jnp.array([0, 5], jnp.int32)
    g = jnp.ones((2, 3), jnp.float32)
    state = upd.update(state, uids, g, jnp.ones(2), jnp.ones(2, bool))
    st = upd.stats(state)
    assert float(st["nnz_w"]) == 0.0 or float(st["nnz_w"]) == 2.0  # l1 may zero
    assert float(st["nnz_V"]) == 2.0
