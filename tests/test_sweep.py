"""Pallas sweep-kernel tests (interpret mode on CPU): the kernels must
match the XLA reference updater bit-for-bit-ish across configs.

This mirrors the reference's pattern of testing optimized math against a
brute-force reference (SURVEY.md §4: spmv/loss tests vs dense NumPy)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from helpers import fm_leaves
import pytest

from difacto_tpu.config import Config, FMParam
from difacto_tpu.data.batch_iter import rowblock_to_batches
from difacto_tpu.data.synthetic import make_ctr_data
from difacto_tpu.ops.sweep import sweep_apply, sweep_pull
from difacto_tpu.parallel.store import LocalStore
from difacto_tpu.updaters.updater import FMUpdater


def _setup(K, seed=0, N=4096, U=300, cnt_frac=0.5, **pkw):
    rng = np.random.default_rng(seed)
    p = FMParam()
    p.V_dim = K
    p.V_threshold = 2
    p.l1 = 0.1
    p.lr_eta = 0.1
    for k, v in pkw.items():
        setattr(p, k, v)
    upd = FMUpdater(p)
    state = upd.init_state(N, seed=1)
    cnt0 = jnp.asarray((rng.random(N) < cnt_frac).astype(np.float32) * 3)
    state = dataclasses.replace(state, cnt=cnt0)
    raw = np.sort(rng.choice(N, size=U, replace=False)).astype(np.int32)
    valid = np.ones(U, bool)
    valid[-U // 8 :] = False
    uids = jnp.asarray(np.where(valid, raw, N).astype(np.int32))
    grads = jnp.asarray(rng.normal(size=(U, 1 + K)).astype(np.float32))
    addc = jnp.asarray(rng.integers(1, 4, U).astype(np.float32))
    return p, upd, state, uids, grads, addc, jnp.asarray(valid)


@pytest.mark.parametrize(
    "K,wupd,vupd,tff",
    [
        (4, "ftrl", "adagrad", 0),
        (0, "ftrl", "adagrad", 0),
        (2, "adagrad", "sgd", 0),
        (3, "sgd", "adagrad", 2),
    ],
)
def test_sweep_matches_reference(K, wupd, vupd, tff):
    p, upd, state, uids, grads, addc, valid = _setup(
        K, w_updater=wupd, V_updater=vupd, tail_feature_filter=tff
    )
    rows_ref = np.asarray(upd.pull(state, uids, valid))
    rows_pal = np.asarray(
        sweep_pull(state, uids, valid, p, block_rows=512, interpret=True)
    )
    np.testing.assert_allclose(rows_ref, rows_pal, atol=1e-6)

    s_ref = upd.update(state, uids, grads, addc, valid)
    s_pal = sweep_apply(state, uids, grads, addc, valid, p, block_rows=512, interpret=True)
    for name in ("w", "z", "n", "cnt", "V", "nV"):
        a, b = np.asarray(getattr(s_ref, name)), np.asarray(getattr(s_pal, name))
        if a.size:
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_sweep_dense_block_overflow():
    """More than CAP ids landing in one block must still apply exactly
    (the dynamic chunk loop)."""
    K = 2
    N, U = 1024, 400
    p = FMParam()
    p.V_dim = K
    p.V_threshold = 0
    p.lr_eta = 0.1
    upd = FMUpdater(p)
    state = upd.init_state(N, seed=3)
    rng = np.random.default_rng(4)
    # all ids inside block 0 (block_rows=512) -> 400 updates in one block
    raw = np.sort(rng.choice(512, size=U, replace=False)).astype(np.int32)
    uids = jnp.asarray(raw)
    valid = jnp.ones(U, bool)
    grads = jnp.asarray(rng.normal(size=(U, 1 + K)).astype(np.float32))
    addc = jnp.ones(U, jnp.float32)
    s_ref = upd.update(state, uids, grads, addc, valid)
    s_pal = sweep_apply(state, uids, grads, addc, valid, p, block_rows=512, interpret=True)
    for name in ("w", "z", "n", "cnt", "V", "nV"):
        a, b = np.asarray(getattr(s_ref, name)), np.asarray(getattr(s_pal, name))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_localstore_pallas_path_end_to_end():
    cfg = Config.from_kwargs(
        [("batch_size", "256"), ("num_bits", "13"), ("max_nnz_per_row", "16"), ("V_dim", "4")]
    )
    upd = FMUpdater(cfg.model)
    blk = make_ctr_data(512, num_fields=12, vocab_per_field=400, seed=1)
    batches = list(rowblock_to_batches(blk, 256, 16, 13))
    xla = LocalStore(upd, cfg)
    pal = LocalStore(upd, cfg, interpret=True)
    assert pal.pallas and not xla.pallas
    s1, s2 = xla.init_state(0), pal.init_state(0)
    for b in batches:
        s1, m1 = xla.train_step(s1, b.ids, b.vals, b.labels, b.mask)
        s2, m2 = pal.train_step(s2, b.ids, b.vals, b.labels, b.mask)
    for name in ("w", "z", "n", "V", "nV", "cnt"):
        a = np.asarray(getattr(fm_leaves(s1), name))
        b = np.asarray(getattr(fm_leaves(s2), name))
        np.testing.assert_allclose(a, b, atol=1e-4, err_msg=name)
    np.testing.assert_allclose(float(m1.logloss_sum), float(m2.logloss_sum), rtol=1e-5)


def test_sharded_pallas_apply_matches_xla():
    """Owner-side sweep_apply inside shard_map (per-shard local tables)
    must match the XLA sharded path."""
    import jax

    from difacto_tpu.parallel.store import ShardedStore

    cfg = Config.from_kwargs(
        [("batch_size", "256"), ("num_bits", "13"), ("max_nnz_per_row", "16"), ("V_dim", "4")]
    )
    upd = FMUpdater(cfg.model)
    blk = make_ctr_data(512, num_fields=12, vocab_per_field=400, seed=1)
    batches = list(rowblock_to_batches(blk, 256, 16, 13))
    a = ShardedStore(upd, cfg)
    b = ShardedStore(upd, cfg, interpret=True)
    assert b.pallas and not a.pallas
    s1, s2 = a.init_state(0), b.init_state(0)
    for bb in batches:
        s1, _ = a.train_step(s1, *a.shard_batch(bb.ids, bb.vals, bb.labels, bb.mask))
        s2, _ = b.train_step(s2, *b.shard_batch(bb.ids, bb.vals, bb.labels, bb.mask))
    for name in ("w", "z", "n", "V", "nV", "cnt"):
        x = np.asarray(getattr(fm_leaves(s1), name))
        y = np.asarray(getattr(fm_leaves(s2), name))
        np.testing.assert_allclose(x, y, atol=1e-4, err_msg=name)
