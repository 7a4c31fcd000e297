"""Sorted-pipeline tests: the fully-fused path (chunk-sorted slots,
multi-stream sweeps, fused FM kernel — no per-batch unique, no XLA
sparse ops) must reproduce the reference path exactly."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from helpers import fm_leaves
import pytest

from difacto_tpu.config import Config, FMParam
from difacto_tpu.data.batch_iter import Batch, rowblock_to_batches
from difacto_tpu.data.prep import prep_batch_sorted
from difacto_tpu.data.synthetic import make_ctr_data
from difacto_tpu.learners.step import worker_grads
from difacto_tpu.ops.fm_chunk import fm_chunk
from difacto_tpu.ops.localize import localize
from difacto_tpu.ops.sweep_ms import sweep_apply_ms, sweep_pull_ms
from difacto_tpu.parallel.store import LocalStore
from difacto_tpu.updaters.updater import FMUpdater


def _batch(B=64, L=8, N=4096, seed=0, dup_frac=0.3):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, N, size=(B, L)).astype(np.int32)
    ids[rng.random(ids.shape) < 0.15] = -1
    real = ids >= 0
    ids[real] = np.where(rng.random(real.sum()) < dup_frac, 7, ids[real])
    vals = np.where(ids >= 0, rng.normal(size=ids.shape), 0).astype(np.float32)
    labels = (rng.random(B) > 0.5).astype(np.float32)
    mask = np.ones(B, np.float32)
    mask[-3:] = 0
    return Batch(ids, vals, labels, mask)


@pytest.mark.parametrize("K", [0, 4])
def test_pull_ms_per_slot(K):
    N, BR = 4096, 512
    p = FMParam(); p.V_dim = K; p.V_threshold = 2
    upd = FMUpdater(p)
    rng = np.random.default_rng(1)
    state = upd.init_state(N, seed=1)
    state = dataclasses.replace(
        state, cnt=jnp.asarray((rng.random(N) < 0.5).astype(np.float32) * 3)
    )
    b = _batch(seed=2)
    sb = prep_batch_sorted(b, N, BR, chunk_rows=16)
    rows_p = np.asarray(
        sweep_pull_ms(state, jnp.asarray(sb.sid), jnp.asarray(sb.offsets), p,
                      block_rows=BR, interpret=True)
    )
    valid = sb.sid < N
    ref = np.asarray(
        upd.pull(state, jnp.asarray(np.where(valid, sb.sid, N).astype(np.int32)),
                 jnp.asarray(valid))
    )
    got = np.where(valid[:, None], rows_p.T, 0.0)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_apply_ms_aggregates_duplicates():
    N, K, BR = 4096, 4, 512
    p = FMParam(); p.V_dim = K; p.V_threshold = 2; p.l1 = 0.1; p.lr_eta = 0.1
    upd = FMUpdater(p)
    rng = np.random.default_rng(3)
    state = upd.init_state(N, seed=1)
    state = dataclasses.replace(
        state, cnt=jnp.asarray((rng.random(N) < 0.5).astype(np.float32) * 3)
    )
    b = _batch(seed=4, dup_frac=0.5)
    sb = prep_batch_sorted(b, N, BR, chunk_rows=16)
    valid = sb.sid < N
    gslot = rng.normal(size=(len(sb.sid), 1 + K)).astype(np.float32) * valid[:, None]
    vf = valid.astype(np.float32)
    payload = np.concatenate([gslot.T, vf[None], vf[None]], axis=0)
    s_ms = sweep_apply_ms(
        state, jnp.asarray(sb.sid), jnp.asarray(payload), jnp.asarray(sb.offsets),
        p, block_rows=BR, interpret=True,
    )
    # host reference: aggregate per key then one update
    uids, inv = np.unique(np.where(valid, sb.sid, N), return_inverse=True)
    agg = np.zeros((len(uids), 1 + K), np.float32)
    np.add.at(agg, inv, gslot)
    cnt = np.zeros(len(uids), np.float32)
    np.add.at(cnt, inv, vf)
    s_ref = upd.update(
        state, jnp.asarray(np.minimum(uids, N).astype(np.int32)),
        jnp.asarray(agg), jnp.asarray(cnt), jnp.asarray(uids < N),
    )
    for name in ("w", "z", "n", "cnt", "V", "nV"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_ref, name)), np.asarray(getattr(s_ms, name)),
            rtol=1e-5, atol=1e-4, err_msg=name,
        )


def test_fm_chunk_matches_worker_grads():
    N, K, BR = 4096, 4, 512
    p = FMParam(); p.V_dim = K; p.V_threshold = 2
    upd = FMUpdater(p)
    rng = np.random.default_rng(5)
    state = upd.init_state(N, seed=1)
    state = dataclasses.replace(
        state, cnt=jnp.asarray((rng.random(N) < 0.7).astype(np.float32) * 3)
    )
    b = _batch(seed=6)
    loc = localize(jnp.asarray(b.ids), N, b.ids.size)
    rows_ref = upd.pull(state, loc.uids, loc.valid)
    grads_ref, py_ref, _ = worker_grads(
        rows_ref, loc, jnp.asarray(b.vals), jnp.asarray(b.labels), jnp.asarray(b.mask)
    )
    sb = prep_batch_sorted(b, N, BR, chunk_rows=16)
    rows_p = sweep_pull_ms(
        state, jnp.asarray(sb.sid), jnp.asarray(sb.offsets), p,
        block_rows=BR, interpret=True,
    )
    py, grads_p = fm_chunk(
        jnp.asarray(sb.svals), jnp.asarray(sb.srow), jnp.asarray(sb.sid), rows_p,
        jnp.asarray(sb.labels), jnp.asarray(sb.mask), 16, N, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(py), np.asarray(py_ref), atol=1e-5)
    # per-key aggregation of per-slot grads == reference per-key grads
    valid = sb.sid < N
    gs = np.where(valid[None, :], np.asarray(grads_p), 0.0)
    uids = np.asarray(loc.uids)
    keymap = {int(u): i for i, u in enumerate(uids[np.asarray(loc.valid)])}
    agg = np.zeros((len(uids), 1 + K), np.float32)
    for s in np.nonzero(valid)[0]:
        agg[keymap[int(sb.sid[s])]] += gs[:, s]
    np.testing.assert_allclose(agg, np.asarray(grads_ref), atol=1e-5)


@pytest.mark.parametrize("kernel", ["auto", "pairs"])
def test_sorted_training_end_to_end(kernel):
    cfg = Config.from_kwargs(
        [("batch_size", "256"), ("num_bits", "13"), ("max_nnz_per_row", "16"),
         ("V_dim", "4"), ("chunk_rows", "64"), ("block_rows", "512"),
         ("kernel", kernel)]
    )
    upd = FMUpdater(cfg.model)
    blk = make_ctr_data(512, num_fields=12, vocab_per_field=400, seed=1)
    batches = list(rowblock_to_batches(blk, 256, 16, 13))
    xla = LocalStore(upd, Config.from_kwargs(
        [("batch_size", "256"), ("num_bits", "13"), ("max_nnz_per_row", "16"),
         ("V_dim", "4"), ("chunk_rows", "64"), ("block_rows", "512")]
    ))
    srt = LocalStore(upd, cfg, interpret=True)
    assert srt.supports_sorted
    s1, s2 = xla.init_state(0), srt.init_state(0)
    for b in batches:
        s1, m1 = xla.train_step(s1, b.ids, b.vals, b.labels, b.mask)
        sb = prep_batch_sorted(b, 1 << 13, srt.block_rows, 64)
        s2, m2 = srt.train_step_sorted(s2, sb)
        me, pe = srt.eval_step_sorted(s2, sb)
        assert np.isfinite(np.asarray(pe)).all()
    for name in ("w", "z", "n", "V", "nV", "cnt"):
        a = np.asarray(getattr(fm_leaves(s1), name))
        c = np.asarray(getattr(fm_leaves(s2), name))
        np.testing.assert_allclose(a, c, atol=1e-4, err_msg=name)
    np.testing.assert_allclose(
        float(m1.logloss_sum), float(m2.logloss_sum), rtol=1e-5
    )
