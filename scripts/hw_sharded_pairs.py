"""Hardware check: S>1 owner-side pair schedules on REAL Mosaic.

Round-2 verdict (weak #3): the sharded pairs route had only ever executed
in interpret mode (one physical chip), and interpret mode does not check
Mosaic rules — a first multi-chip run could hit a Mosaic rejection. The
kernels don't know about the mesh, only the schedule, so this script
drives the exact S=8 artifacts through the REAL kernels on one chip:

  * a flagship-shaped batch is prepped with ``prep_batch_sharded(S=8)``;
  * ``build_shard_pair_metas`` produces the per-owner multi-segment
    schedules (pull ``order="window"`` — the wfirst first-visit blending
    across segments that the single-segment S=1 hardware path never
    exercises — and apply ``order="block"`` with cross-segment
    accumulate-until-flush);
  * each owner's post-all_to_all local-id stream is reconstructed from
    the send buckets (``_send_buckets`` — the host mirror of the device
    routing) and fed to ``pull_pairs``/``apply_pairs`` with
    ``interpret=False``;
  * outputs are compared against the FMUpdater semantic reference
    (pull = gather; apply = host per-key aggregation + updater.update).

Run:  timeout 3600 python scripts/hw_sharded_pairs.py
Pass: prints one line per owner + "HW SHARDED PAIRS: PASS".
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> int:
    import jax
    import jax.numpy as jnp

    from difacto_tpu.config import Config
    from difacto_tpu.data.batch_iter import Batch
    from difacto_tpu.data.prep import (
        _send_buckets, build_shard_pair_metas, prep_batch_sharded,
        shard_bucket_fills,
    )
    from difacto_tpu.ops.pair_sweep import apply_pairs, pull_pairs
    from difacto_tpu.parallel.store import _cap_ladder, _round_up
    from difacto_tpu.updaters.updater import FMUpdater

    assert jax.default_backend() == "tpu", "this script needs the real chip"

    S, num_bits, block_rows, K = 8, 22, 1024, 16
    N = 1 << num_bits
    rps = N // S
    B, L = 16384, 40

    rng = np.random.default_rng(0)
    ids = rng.integers(0, N, (B, L)).astype(np.int32)
    ids[rng.random((B, L)) < 0.08] = -1
    batch = Batch(
        ids, np.where(ids >= 0, 1.0, 0.0).astype(np.float32),
        (rng.random(B) > 0.5).astype(np.float32), np.ones(B, np.float32),
    )
    pb = prep_batch_sharded(batch, N, S)
    fills = shard_bucket_fills(pb, N)
    C = _cap_ladder(_round_up(max(int(fills.max()), 1), 128))
    metas = build_shard_pair_metas(pb, N, C, block_rows)
    send = _send_buckets(pb, N, S, C)
    print(f"S={S} table 2^{num_bits} C={C} stream={S*C} "
          f"Pp={metas.pull_blocks.shape[1]} Pa={metas.apply_blocks.shape[1]}",
          flush=True)

    cfg = Config.from_kwargs([
        ("batch_size", str(B)), ("num_bits", str(num_bits)),
        ("max_nnz_per_row", str(L)), ("V_dim", str(K)),
    ])
    upd = FMUpdater(cfg.model)
    param = upd.param
    state = jax.device_put(upd.init_state(rps, seed=1))
    # make the optimizer state non-trivial so apply exercises real math
    warm = rng.integers(0, rps, 4096).astype(np.int32)
    g0 = rng.normal(size=(4096, 1 + K)).astype(np.float32) * 0.1
    state = jax.jit(upd.update)(
        state, jnp.asarray(warm), jnp.asarray(g0),
        jnp.ones(4096, jnp.float32), jnp.ones(4096, bool),
    )
    float(state.w[0])  # force completion (block_until_ready unreliable)

    ok = True
    for o in (0, 5):
        g = send[:, o, :].reshape(-1).astype(np.int64)
        stream = np.where(g >= N, rps, g - o * rps).astype(np.int32)
        valid = stream < rps
        sd = jnp.asarray(stream)
        pm = (jnp.asarray(metas.pull_blocks[o]), jnp.asarray(metas.pull_wins[o]),
              None, jnp.asarray(metas.pull_wfirst[o]))
        am = (jnp.asarray(metas.apply_blocks[o]), jnp.asarray(metas.apply_wins[o]),
              jnp.asarray(metas.apply_first[o]), None)

        t0 = time.time()
        rows_p = jax.jit(
            lambda st, s: pull_pairs(st, s, pm, param, block_rows=block_rows)
        )(state, sd)
        got_pull = np.asarray(rows_p).T  # [S*C, 1+K]
        t_pull = time.time() - t0
        ref_pull = np.asarray(
            jax.jit(upd.pull)(state, sd, jnp.asarray(valid))
        )
        err_p = np.abs(got_pull[valid] - ref_pull[valid]).max() if valid.any() else 0.0

        pay = np.zeros((3 + K, S * C), np.float32)
        pay[: 1 + K, :] = rng.normal(size=(1 + K, S * C)).astype(np.float32) * 0.1
        pay[:, ~valid] = 0.0
        pay[1 + K, valid] = 1.0  # add_cnt
        pay[2 + K, valid] = 1.0  # touch
        t0 = time.time()
        new_state = jax.jit(
            lambda st, s, p: apply_pairs(
                st, s, p, am, param, block_rows=block_rows
            )
        )(state, sd, jnp.asarray(pay))
        float(new_state.w[0])
        t_apply = time.time() - t0

        # semantic reference: host per-key aggregation + updater.update
        uids_u, inv = np.unique(
            np.where(valid, stream, rps), return_inverse=True
        )
        agg = np.zeros((len(uids_u), 1 + K), np.float32)
        np.add.at(agg, inv, pay[: 1 + K].T * valid[:, None])
        cnts = np.zeros(len(uids_u), np.float32)
        np.add.at(cnts, inv, pay[1 + K] * valid)
        uvalid = uids_u < rps
        ref_state = jax.jit(upd.update)(
            state, jnp.asarray(uids_u.astype(np.int32)), jnp.asarray(agg),
            jnp.asarray(cnts), jnp.asarray(uvalid),
        )
        errs = {}
        for name in ("w", "z", "n", "V", "nV", "cnt"):
            a = np.asarray(getattr(new_state, name))
            b = np.asarray(getattr(ref_state, name))
            if a.size:
                errs[name] = float(np.abs(a - b).max())
        err_a = max(errs.values())
        o_ok = err_p < 1e-4 and err_a < 1e-4
        ok &= o_ok
        print(
            f"owner {o}: pull_err {err_p:.2e} ({t_pull:.1f}s incl compile)  "
            f"apply_err {err_a:.2e} ({t_apply:.1f}s)  "
            f"{'OK' if o_ok else 'MISMATCH ' + str(errs)}",
            flush=True,
        )
    print("HW SHARDED PAIRS:", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
