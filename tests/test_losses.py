"""Loss tests (reference: fm_loss_test.cc / logit_loss_test.cc — analytic
gradients checked against a dense NumPy reference and finite differences)."""

import jax.numpy as jnp
import numpy as np
import pytest

from difacto_tpu.models.losses import fm_loss_grad, fm_predict


def dense_fm_reference(vals, W, V):
    """Brute-force FM margin per row: <w,x> + sum_{i<j} x_i x_j <V_i, V_j>."""
    B, L = vals.shape
    out = np.zeros(B)
    for b in range(B):
        out[b] = float(np.dot(vals[b], W[b]))
        for i in range(L):
            for j in range(i + 1, L):
                out[b] += vals[b, i] * vals[b, j] * float(np.dot(V[b, i], V[b, j]))
    return out


def _rand(B=4, L=6, K=3, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.normal(size=(B, L)).astype(np.float32)
    vals[0, -2:] = 0.0  # simulated padding
    W = rng.normal(size=(B, L)).astype(np.float32)
    V = rng.normal(size=(B, L, K)).astype(np.float32)
    labels = (rng.random(B) > 0.5).astype(np.float32)
    mask = np.ones(B, np.float32)
    return vals, W, V, labels, mask


def test_fm_predict_matches_pairwise_reference():
    vals, W, V, _, _ = _rand()
    fwd = fm_predict(jnp.asarray(vals), jnp.asarray(W), jnp.asarray(V))
    ref = dense_fm_reference(vals, W, V)
    np.testing.assert_allclose(np.asarray(fwd.py), ref, rtol=1e-4, atol=1e-4)


def test_k0_is_logistic_regression():
    vals, W, _, _, _ = _rand(K=3)
    V0 = np.zeros((4, 6, 0), np.float32)
    fwd = fm_predict(jnp.asarray(vals), jnp.asarray(W), jnp.asarray(V0))
    np.testing.assert_allclose(np.asarray(fwd.py), (vals * W).sum(-1), rtol=1e-5)


@pytest.mark.parametrize("K", [0, 1, 4])
def test_grads_finite_difference(K):
    vals, W, V, labels, mask = _rand(K=max(K, 1))
    V = V[..., :K].copy()
    eps = 1e-3

    def total_loss(Wx, Vx):
        _, g = fm_loss_grad(
            jnp.asarray(vals), jnp.asarray(Wx), jnp.asarray(Vx),
            jnp.asarray(labels), jnp.asarray(mask),
        )
        return float(np.sum(np.asarray(g.loss)))

    _, g = fm_loss_grad(
        jnp.asarray(vals), jnp.asarray(W), jnp.asarray(V),
        jnp.asarray(labels), jnp.asarray(mask),
    )
    # a handful of W coordinates
    for (b, l) in [(0, 0), (1, 3), (3, 5)]:
        Wp = W.copy(); Wp[b, l] += eps
        Wm = W.copy(); Wm[b, l] -= eps
        fd = (total_loss(Wp, V) - total_loss(Wm, V)) / (2 * eps)
        assert abs(fd - float(g.dW[b, l])) < 5e-2 * max(1.0, abs(fd)), (b, l)
    # a handful of V coordinates
    for (b, l, k) in [(0, 1, 0), (2, 4, K - 1)] if K else []:
        Vp = V.copy(); Vp[b, l, k] += eps
        Vm = V.copy(); Vm[b, l, k] -= eps
        fd = (total_loss(W, Vp) - total_loss(W, Vm)) / (2 * eps)
        assert abs(fd - float(g.dV[b, l, k])) < 5e-2 * max(1.0, abs(fd)), (b, l, k)


def test_masked_rows_produce_zero_grads():
    vals, W, V, labels, mask = _rand()
    mask = np.array([1, 0, 1, 0], np.float32)
    _, g = fm_loss_grad(
        jnp.asarray(vals), jnp.asarray(W), jnp.asarray(V),
        jnp.asarray(labels), jnp.asarray(mask),
    )
    assert np.all(np.asarray(g.dW)[1] == 0)
    assert np.all(np.asarray(g.dV)[3] == 0)
    assert float(g.loss[1]) == 0.0


def test_loss_value_matches_reference_formula():
    """log(1+exp(-y*py)) with y in {-1,+1} (reference LogitLoss convention)."""
    vals, W, V, labels, mask = _rand(seed=3)
    fwd, g = fm_loss_grad(
        jnp.asarray(vals), jnp.asarray(W), jnp.asarray(V),
        jnp.asarray(labels), jnp.asarray(mask),
    )
    y = 2 * labels - 1
    ref = np.log1p(np.exp(-y * np.asarray(fwd.py, dtype=np.float64)))
    np.testing.assert_allclose(np.asarray(g.loss), ref, rtol=1e-5, atol=1e-6)
