"""Pair-grid kernel tests (interpret mode on CPU): the touched-block
sweeps (ops/pair_sweep.py) must match the XLA reference updater across
configs, and the LocalStore kernel=pairs path must train identically to
the XLA path (the same reference-vs-optimized pinning as test_sweep.py,
SURVEY.md §4)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from helpers import fm_leaves

from difacto_tpu.config import Config, FMParam
from difacto_tpu.data.batch_iter import rowblock_to_batches
from difacto_tpu.data.prep import prep_batch
from difacto_tpu.data.synthetic import make_ctr_data
from difacto_tpu.ops.pair_sweep import (
    W, apply_pairs, build_pair_meta, pull_pairs,
)
from difacto_tpu.parallel.store import LocalStore
from difacto_tpu.updaters.updater import FMUpdater


def _setup(K, seed=0, N=4096, U=384, cnt_frac=0.5, **pkw):
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
    # sentinel-padded SORTED uids (the prep.py contract)
    uids_np = np.where(valid, raw, N).astype(np.int32)
    grads = jnp.asarray(rng.normal(size=(U, 1 + K)).astype(np.float32))
    addc = jnp.asarray(rng.integers(1, 4, U).astype(np.float32))
    return p, upd, state, uids_np, grads, addc, jnp.asarray(valid)


def _meta_dev(uids_np, N, block_rows):
    m = build_pair_meta(uids_np, N, block_rows)
    return m, (m.blocks, m.wins, m.first, m.wfirst)


def test_pair_meta_invariants():
    rng = np.random.default_rng(7)
    N, block_rows = 8192, 512
    for trial in range(4):
        n_valid = int(rng.integers(1, 600))
        u = 768
        raw = np.sort(rng.choice(N, size=n_valid, replace=False))
        uids = np.full(u, N, np.int32)
        uids[:n_valid] = raw
        m = build_pair_meta(uids, N, block_rows)
        # every valid lane's (block, window) pair appears exactly once
        want = {
            (int(uids[j]) // block_rows, j // W) for j in range(n_valid)
        }
        pairs = list(zip(m.blocks.tolist(), m.wins.tolist()))
        real = [bw for bw in pairs if bw[1] != u // W]
        assert len(real) == len(set(real)), "duplicate pair"
        assert want <= set(real)
        # sorted by (block, window); windows globally non-decreasing
        assert real == sorted(real)
        wins_real = [wdw for _, wdw in real]
        assert wins_real == sorted(wins_real)
        # pad pairs repeat the last real block with the sentinel window
        for b, wdw in pairs[len(real):]:
            assert wdw == u // W and b == real[-1][0]
        # first/wfirst flags mark run starts
        for i in range(len(pairs)):
            assert m.first[i] == int(i == 0 or m.blocks[i] != m.blocks[i - 1])
            assert m.wfirst[i] == int(i == 0 or m.wins[i] != m.wins[i - 1])


def test_pair_meta_empty():
    uids = np.full(256, 4096, np.int32)  # all sentinel
    m = build_pair_meta(uids, 4096, 512)
    assert (m.wins == 256 // W).all()


@pytest.mark.parametrize(
    "K,wupd,vupd,tff",
    [
        (4, "ftrl", "adagrad", 0),
        (0, "ftrl", "adagrad", 0),
        (2, "adagrad", "sgd", 0),
        (3, "sgd", "adagrad", 2),
    ],
)
def test_pair_sweep_matches_reference(K, wupd, vupd, tff):
    p, upd, state, uids_np, grads, addc, valid = _setup(
        K, w_updater=wupd, V_updater=vupd, tail_feature_filter=tff
    )
    N = state.num_rows
    _, mdev = _meta_dev(uids_np, N, 512)
    uids = jnp.asarray(uids_np)

    rows_ref = np.asarray(upd.pull(state, uids, valid))
    rows_pal = pull_pairs(state, uids, mdev, p, block_rows=512, interpret=True)
    rows_pal = np.asarray(
        jnp.where(valid[:, None], rows_pal.T, 0.0)
    )
    np.testing.assert_allclose(rows_ref, rows_pal, atol=1e-6)

    vf = valid.astype(jnp.float32)
    payload = jnp.concatenate(
        [
            jnp.where(valid[None, :], grads.T, 0.0),
            (addc * vf)[None, :],
            vf[None, :],
        ],
        axis=0,
    )
    s_ref = upd.update(state, uids, grads, addc, valid)
    s_pal = apply_pairs(
        state, uids, payload, mdev, p, block_rows=512, interpret=True
    )
    for name in ("w", "z", "n", "cnt", "V", "nV"):
        a, b = np.asarray(getattr(s_ref, name)), np.asarray(getattr(s_pal, name))
        if a.size:
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_pair_sweep_dense_block():
    """Many ids in one block (several windows per block) and a window
    straddling a block boundary must both apply exactly once per key."""
    K = 2
    N = 1024
    p = FMParam()
    p.V_dim = K
    p.V_threshold = 0
    p.lr_eta = 0.1
    upd = FMUpdater(p)
    state = upd.init_state(N, seed=3)
    rng = np.random.default_rng(4)
    # 300 ids in block 0 (rows 0..511) + 80 ids crossing into block 1
    raw = np.sort(
        np.concatenate(
            [
                rng.choice(512, size=300, replace=False),
                512 + rng.choice(128, size=80, replace=False),
            ]
        )
    ).astype(np.int32)
    u = 384
    uids_np = np.full(u, N, np.int32)
    uids_np[: len(raw)] = raw
    valid = jnp.asarray(np.arange(u) < len(raw))
    uids = jnp.asarray(uids_np)
    grads = jnp.asarray(rng.normal(size=(u, 1 + K)).astype(np.float32))
    addc = jnp.ones(u, jnp.float32)
    _, mdev = _meta_dev(uids_np, N, 512)

    vf = valid.astype(jnp.float32)
    payload = jnp.concatenate(
        [jnp.where(valid[None, :], grads.T, 0.0), (addc * vf)[None, :], vf[None, :]],
        axis=0,
    )
    s_ref = upd.update(state, uids, grads, addc, valid)
    s_pal = apply_pairs(state, uids, payload, mdev, p, block_rows=512, interpret=True)
    for name in ("w", "z", "n", "cnt", "V", "nV"):
        a, b = np.asarray(getattr(s_ref, name)), np.asarray(getattr(s_pal, name))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_dual_apply_meta_invariants():
    from difacto_tpu.ops.pair_sweep import build_dual_apply_meta

    rng = np.random.default_rng(11)
    N, block_rows = 8192, 512
    for trial in range(4):
        n_valid = int(rng.integers(1, 600))
        u = 768
        raw = np.sort(rng.choice(N, size=n_valid, replace=False))
        uids = np.full(u, N, np.int32)
        uids[:n_valid] = raw
        m = build_dual_apply_meta(uids, N, block_rows)
        sent = u // W
        # every valid lane's (block, window) pair appears exactly once
        # across the A and B slots
        want = {
            (int(uids[j]) // block_rows, j // W) for j in range(n_valid)
        }
        got = []
        for b, wa, wb in zip(m.blocks, m.wins_a, m.wins_b):
            if wa != sent:
                got.append((int(b), int(wa)))
            if wb != sent:
                got.append((int(b), int(wb)))
        assert len(got) == len(set(got)), "duplicate pair"
        assert set(got) == want
        # block runs contiguous + first flags
        for i in range(len(m.blocks)):
            assert m.first[i] == int(
                i == 0 or m.blocks[i] != m.blocks[i - 1]
            )
        # ~half the grid of the single-window schedule (padded runs)
        m1 = build_pair_meta(uids, N, block_rows)
        real1 = int((m1.wins != sent).sum())
        real2 = len(got)
        assert real2 == real1


@pytest.mark.parametrize("K,wupd", [(4, "ftrl"), (0, "ftrl"), (4, "adagrad")])
def test_dual_apply_matches_reference(K, wupd):
    from difacto_tpu.ops.pair_sweep import apply_pairs2, build_dual_apply_meta

    p, upd, state, uids_np, grads, addc, valid = _setup(K, w_updater=wupd)
    N = state.num_rows
    m = build_dual_apply_meta(uids_np, N, 512)
    mdev = (m.blocks, m.wins_a, m.wins_b, m.first)
    uids = jnp.asarray(uids_np)
    vf = valid.astype(jnp.float32)
    payload = jnp.concatenate(
        [
            jnp.where(valid[None, :], grads.T, 0.0),
            (addc * vf)[None, :],
            vf[None, :],
        ],
        axis=0,
    )
    s_ref = upd.update(state, uids, grads, addc, valid)
    s_pal = apply_pairs2(
        state, uids, payload, mdev, p, block_rows=512, interpret=True
    )
    for name in ("w", "z", "n", "cnt", "V", "nV"):
        a, b = np.asarray(getattr(s_ref, name)), np.asarray(getattr(s_pal, name))
        if a.size:
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_dual_apply_dense_block():
    """Multi-window block runs (odd AND even lengths) accumulate across
    dual steps before the single fused commit."""
    from difacto_tpu.ops.pair_sweep import apply_pairs2, build_dual_apply_meta

    K, N = 2, 1024
    p = FMParam()
    p.V_dim = K
    p.V_threshold = 0
    p.lr_eta = 0.1
    upd = FMUpdater(p)
    state = upd.init_state(N, seed=3)
    rng = np.random.default_rng(4)
    raw = np.sort(
        np.concatenate(
            [
                rng.choice(512, size=300, replace=False),  # 3 windows
                512 + rng.choice(128, size=80, replace=False),
            ]
        )
    ).astype(np.int32)
    u = 384
    uids_np = np.full(u, N, np.int32)
    uids_np[: len(raw)] = raw
    valid = jnp.asarray(np.arange(u) < len(raw))
    uids = jnp.asarray(uids_np)
    grads = jnp.asarray(rng.normal(size=(u, 1 + K)).astype(np.float32))
    addc = jnp.ones(u, jnp.float32)
    m = build_dual_apply_meta(uids_np, N, 512)
    mdev = (m.blocks, m.wins_a, m.wins_b, m.first)
    vf = valid.astype(jnp.float32)
    payload = jnp.concatenate(
        [jnp.where(valid[None, :], grads.T, 0.0), (addc * vf)[None, :], vf[None, :]],
        axis=0,
    )
    s_ref = upd.update(state, uids, grads, addc, valid)
    s_pal = apply_pairs2(state, uids, payload, mdev, p, block_rows=512,
                         interpret=True)
    for name in ("w", "z", "n", "cnt", "V", "nV"):
        a, b = np.asarray(getattr(s_ref, name)), np.asarray(getattr(s_pal, name))
        np.testing.assert_allclose(a, b, atol=1e-5, err_msg=name)


def test_localstore_pairs_end_to_end():
    """kernel=pairs (interpret) trains bit-close to the XLA prepped path,
    multi-step, including eval scores."""
    cfg_x = Config.from_kwargs(
        [("batch_size", "256"), ("num_bits", "13"), ("max_nnz_per_row", "16"),
         ("V_dim", "4")]
    )
    cfg_p = Config.from_kwargs(
        [("batch_size", "256"), ("num_bits", "13"), ("max_nnz_per_row", "16"),
         ("V_dim", "4"), ("kernel", "pairs"), ("block_rows", "512")]
    )
    upd = FMUpdater(cfg_x.model)
    blk = make_ctr_data(512, num_fields=12, vocab_per_field=400, seed=1)
    batches = list(rowblock_to_batches(blk, 256, 16, 13))
    xla = LocalStore(upd, cfg_x)
    prs = LocalStore(upd, cfg_p, interpret=True)
    assert prs.pairs and not prs.pallas and not xla.pairs
    s1, s2 = xla.init_state(0), prs.init_state(0)
    num_rows = 1 << 13
    for b in batches:
        pb = prep_batch(b, num_rows)
        s1, m1 = xla.train_step_prepped(s1, pb)
        s2, m2 = prs.train_step_prepped(s2, pb)
    for name in ("w", "z", "n", "V", "nV", "cnt"):
        a = np.asarray(getattr(fm_leaves(s1), name))
        b = np.asarray(getattr(fm_leaves(s2), name))
        np.testing.assert_allclose(a, b, atol=1e-4, err_msg=name)
    np.testing.assert_allclose(
        float(m1.logloss_sum), float(m2.logloss_sum), rtol=1e-5
    )
    pb = prep_batch(batches[0], num_rows)
    _, py1 = xla.eval_step_prepped(s1, pb)
    _, py2 = prs.eval_step_prepped(s2, pb)
    np.testing.assert_allclose(np.asarray(py1), np.asarray(py2), atol=1e-4)


def test_pair_bucket_ladder_extends_past_65536():
    """VERDICT r3 #7: one batch past 65536 pairs must land on a ladder
    rung (few Mosaic specializations), never an exact size; beyond the
    explicit ladder the geometric 1.5x rungs continue, 128-aligned."""
    from difacto_tpu.ops.pair_sweep import PAIR_BUCKETS, _bucket

    assert PAIR_BUCKETS[-1] > 65536
    # just past the old end: a rung, not the exact count
    assert _bucket(65537) == 98304
    assert _bucket(65537) == _bucket(98304)  # nearby counts share a rung
    # beyond the explicit ladder: geometric extension, deterministic
    top = PAIR_BUCKETS[-1]
    v = _bucket(top + 1)
    assert v > top and v % 128 == 0
    assert _bucket(top + 1) == _bucket(v)  # still a shared rung
    # inside the ladder nothing changed
    assert _bucket(1) == 256 and _bucket(5000) == 5120
