"""Benchmark harness: flagship FM k=16 sparse training throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/s/chip", "vs_baseline": R}

The reference repo publishes no numbers (BASELINE.md), so ``vs_baseline``
is measured live against a single-thread NumPy implementation of the
identical train step (gather -> FM forward/backward -> per-key aggregate
-> FTRL/AdaGrad update) — the honest stand-in for the reference's
CPU-per-core compute path.

Timing notes (see .claude/skills/verify/SKILL.md): jax.block_until_ready
is unreliable over the tunneled TPU transport, so completion is forced
with a scalar fetch; the first fetch in a process pays a large one-time
tunnel cost and is excluded via warmup.

Resilience contract (round-1 postmortem: the driver's capture timed out
while a health-probe loop slept): ALL device-touching work runs in a
child process killed after BENCH_BUDGET_S seconds (default 900 — a fresh
process's first device fetch alone measures ~130 s over the tunnel), and
the parent ALWAYS prints exactly one well-formed JSON line and exits 0 —
a wedged TPU runtime yields {"value": 0, "error": ...} instead of a hang.

Variants (env vars):
  BENCH_KERNEL=xla|pallas|pairs  table access path   (default pairs —
                            the fastest measured path; if its child run
                            fails, e.g. a cold Mosaic kernel cache
                            overrunning the budget, the parent retries
                            once with the XLA path before reporting an
                            error)
  BENCH_PREP=host|device    id dedup location        (default host)
  BENCH_STORE=local|sharded store implementation     (default local)
  BENCH_LAYOUT=auto|packed|planar  state table layout (default auto)
  BENCH_HOST_BATCHES=1      keep batches host-side (measure the h2d
                            link in the step instead of device compute)
  BENCH_K, BENCH_BATCH, BENCH_BITS, BENCH_NNZ        shape overrides
  BENCH_STEPS, BENCH_SKIP_NUMPY
  BENCH_EVAL=1              measure the scoring (eval) path instead of
                            training — the inference-throughput number
  BENCH_BUDGET_S            child wall-clock cap     (default 900)
  BENCH_HEALTH_RETRIES      extra child attempts after a failure,
                            sleeping BENCH_HEALTH_SLEEP s between
                            (default 0 — opt-in; a wedged runtime can
                            take ~45 min to clear)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 16384))
NNZ = int(os.environ.get("BENCH_NNZ", 40))       # Criteo-Kaggle: 39/row
NUM_BITS = int(os.environ.get("BENCH_BITS", 22)) # 4M-row table (Criteo-Kaggle-scale hashed space)
K = int(os.environ.get("BENCH_K", 16))
STEPS = int(os.environ.get("BENCH_STEPS", 30))
NP_STEPS = 3


def make_batches(n, seed=0):
    from difacto_tpu.data.batch_iter import Batch

    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        # Zipf-ish ids emulate Criteo's power-law key distribution
        z = rng.zipf(1.2, size=(BATCH, NNZ)).astype(np.uint64)
        with np.errstate(over="ignore"):
            ids = (
                (z * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(1 << NUM_BITS)
            ).astype(np.int32)
        vals = np.ones((BATCH, NNZ), np.float32)
        labels = (rng.random(BATCH) > 0.5).astype(np.float32)
        mask = np.ones(BATCH, np.float32)
        out.append(Batch(ids, vals, labels, mask))
    return out


def _store():
    from difacto_tpu.config import Config
    from difacto_tpu.parallel.store import LocalStore, ShardedStore
    from difacto_tpu.updaters.updater import FMUpdater

    kernel = os.environ.get("BENCH_KERNEL", "pairs")
    kwargs = [
        ("batch_size", str(BATCH)),
        ("num_bits", str(NUM_BITS)),
        ("max_nnz_per_row", str(NNZ)),
        ("V_dim", str(K)),
        ("kernel", kernel),
        ("layout", os.environ.get("BENCH_LAYOUT", "auto")),
        ("block_rows", os.environ.get("BENCH_BLOCK_ROWS", "1024")),
        ("segsum", os.environ.get("BENCH_SEGSUM", "auto")),
        # BENCH_HOT: hot/cold frequency split (HotColdFMState) row count;
        # -1 = auto-size, 0 = off
        ("hot_rows", os.environ.get("BENCH_HOT", "0")),
        # bench loops over a fixed batch set: keep their device arrays
        # resident (the sharded store re-places per step otherwise)
        ("cache_batches", "1"),
        ("cache_on_device", "0" if os.environ.get("BENCH_HOST_BATCHES") else "1"),
    ]
    cfg = Config.from_kwargs(kwargs)
    upd = FMUpdater(cfg.model)
    if os.environ.get("BENCH_STORE", "local") == "sharded":
        return ShardedStore(upd, cfg)
    return LocalStore(upd, cfg)


def bench_tpu() -> dict:
    from difacto_tpu.data.prep import prep_batch, prep_batch_sharded
    from difacto_tpu.parallel.store import ShardedStore
    from difacto_tpu.utils.place import place_batch

    store = _store()
    state = store.init_state(0)
    batches = make_batches(8)
    prep = os.environ.get("BENCH_PREP", "host") == "host"
    # default: batches live on the device (the learner overlaps/caches
    # placement — utils/place.py; over this environment's tunneled TPU,
    # per-step h2d re-transfer measures the ~30-90 MB/s tunnel instead of
    # the chip). BENCH_HOST_BATCHES=1 keeps host batches to measure the
    # tunnel-fed end-to-end rate.
    place = not os.environ.get("BENCH_HOST_BATCHES")
    put = place_batch if place else (lambda pb: pb)

    ev = bool(os.environ.get("BENCH_EVAL"))
    if prep and isinstance(store, ShardedStore):
        pbs = [prep_batch_sharded(b, 1 << NUM_BITS, store.S) for b in batches]
        ub = {p.ub for p in pbs}
        if ev:
            step = lambda s, i: (s, store.eval_step_prepped(s, pbs[i % len(pbs)])[0])
        else:
            step = lambda s, i: store.train_step_prepped(s, pbs[i % len(pbs)])
    elif prep:
        remap = None
        if getattr(store, "hot_rows", 0):
            from difacto_tpu.data.remap import build_remap, count_sample

            remap = build_remap(
                count_sample(iter(batches), 1 << NUM_BITS, len(batches)),
                store.hot_rows,
            )
            store.set_remap(remap)

        def prep_one(b):
            pb = prep_batch(
                b, 1 << NUM_BITS, remap=remap,
                hot_rows=getattr(store, "hot_rows", 0),
            )
            if store.pairs:
                from difacto_tpu.ops.pair_sweep import build_pair_meta

                pb.pair_meta = build_pair_meta(
                    pb.uids, 1 << NUM_BITS, store.block_rows
                )
            if getattr(store, "sorted_grads", False):
                from difacto_tpu.data.prep import build_sorted_slots

                pb.sorted_slots = build_sorted_slots(
                    pb.inv, pb.vals, pb.uids.shape[0],
                    compact=bool(os.environ.get("BENCH_COMPACT")),
                )
            return put(pb)

        pbs = [prep_one(b) for b in batches]
        ub = {p.uids.shape[0] for p in pbs}
        if ev:
            step = lambda s, i: (s, store.eval_step_prepped(s, pbs[i % len(pbs)])[0])
        else:
            step = lambda s, i: store.train_step_prepped(s, pbs[i % len(pbs)])
    else:
        ub = {BATCH * NNZ}
        dev = [
            store.shard_batch(b.ids, b.vals, b.labels, b.mask) for b in batches
        ]
        step = lambda s, i: store.train_step(s, *dev[i % len(dev)])

    # warmup: compile all bucket variants + pay one-time fetch cost
    for i in range(len(batches)):
        state, m = step(state, i)
    _ = float(m.logloss_sum)
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = step(state, i)
    _ = float(m.logloss_sum)  # forces completion of the chain
    dt = time.perf_counter() - t0
    return {
        "examples_per_sec": BATCH * STEPS / dt,
        "ms_per_step": dt / STEPS * 1e3,
        "unique_buckets": sorted(ub),
    }


def bench_numpy() -> float:
    """Same math, single-thread NumPy (the CPU-reference stand-in)."""
    rng = np.random.default_rng(0)
    N = 1 << NUM_BITS
    w = np.zeros(N, np.float32)
    z = np.zeros(N, np.float32)
    n = np.zeros(N, np.float32)
    V = (rng.random((N, K), np.float32) - 0.5) * 0.02
    nV = np.zeros((N, K), np.float32)
    eta, beta, l1, l2 = 0.01, 1.0, 1.0, 0.1

    batches = make_batches(2, seed=1)
    t0 = time.perf_counter()
    for s in range(NP_STEPS):
        b = batches[s % 2]
        ids, vals, labels = b.ids, b.vals, b.labels
        flat = ids.reshape(-1)
        uids, inv = np.unique(np.where(flat < 0, N, flat), return_inverse=True)
        U = len(uids)
        uc = np.minimum(uids, N - 1)
        Wg = w[uc][inv].reshape(BATCH, NNZ)
        Vg = V[uc][inv].reshape(BATCH, NNZ, K)
        lin = (vals * Wg).sum(-1)
        xv = vals[..., None] * Vg
        S = xv.sum(1)
        Q = (xv * xv).sum(1)
        py = lin + 0.5 * (S * S - Q).sum(-1)
        d = (1 / (1 + np.exp(-py)) - labels) * b.mask
        dW = (vals * d[:, None]).reshape(-1)
        dV = (d[:, None, None] * vals[:, :, None] * (S[:, None, :] - xv)).reshape(-1, K)
        gu = np.zeros(U, np.float32)
        np.add.at(gu, inv, dW)
        gVu = np.zeros((U, K), np.float32)
        np.add.at(gVu, inv, dV)
        n_new = n[uc] + gu * gu
        sigma = (np.sqrt(n_new) - np.sqrt(n[uc])) / eta
        z_new = z[uc] + gu - sigma * w[uc]
        w_new = np.where(
            np.abs(z_new) <= l1,
            0.0,
            -(z_new - np.sign(z_new) * l1) / ((beta + np.sqrt(n_new)) / eta + l2),
        )
        w[uc], z[uc], n[uc] = w_new, z_new, n_new
        nV_new = nV[uc] + gVu * gVu
        V[uc] = V[uc] - 0.01 * gVu / (np.sqrt(nV_new) + 1.0)
        nV[uc] = nV_new
    dt = time.perf_counter() - t0
    return BATCH * NP_STEPS / dt


def _probe_backend(timeout_s: float = 120.0) -> bool:
    """True when a device backend initializes in a throwaway child.

    A wedged remote TPU runtime (observed: 45 min - 2h+) hangs or errors
    at backend init; probing in a killable child costs nothing when
    healthy and detects the wedge without burning the main budget."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _run_child(budget_s: float) -> tuple[dict | None, str]:
    """Run the device benchmark in a killable subprocess.

    A wedged tunneled TPU runtime hangs EVERY op including client
    teardown (see .claude/skills/verify/SKILL.md), so no in-process
    timeout (signal/thread) can interrupt it — the work must live in a
    child the parent can kill. Returns (result_dict | None, error_note).
    """
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--device-run"],
            timeout=budget_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return None, f"device benchmark exceeded {budget_s:.0f}s budget (wedged TPU runtime?)"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout or "").strip().splitlines()[-3:]
        return None, "device benchmark failed: " + " | ".join(tail)
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "examples_per_sec" in obj:
            return obj, ""
    return None, "device benchmark produced no result line"


def main():
    import sys

    from difacto_tpu.base import tune_malloc

    tune_malloc()  # large host temporaries must not page-fault
    if "--device-run" in sys.argv:  # child: device work only
        if os.environ.get("BENCH_CPU"):  # harness testing without the TPU
            import jax

            jax.config.update("jax_platforms", "cpu")
        print(json.dumps(bench_tpu()), flush=True)
        return

    budget = float(os.environ.get("BENCH_BUDGET_S", 900))
    # extra attempts are OPT-IN: a killed/OOM'd client can wedge the
    # remote TPU runtime for ~45 min-2h+, far beyond any driver timeout,
    # so by default we report the failure immediately instead of waiting
    retries = int(os.environ.get("BENCH_HEALTH_RETRIES", 0))
    sleep_s = float(os.environ.get("BENCH_HEALTH_SLEEP", 600))
    # bounded pre-probe: when the backend is wedged at init, short probes
    # (+brief waits, BENCH_TPU_WAIT_S total wall) beat burning the 900 s
    # child budget against a hang — and stacking killed clients on a
    # wedged runtime can EXTEND the wedge (CLAUDE.md), so if the backend
    # never comes up the error JSON is emitted immediately, with no
    # child runs. BENCH_TPU_WAIT_S=0 disables the probe entirely.
    wait_cap = float(os.environ.get("BENCH_TPU_WAIT_S", 240))
    if wait_cap > 0 and not os.environ.get("BENCH_CPU"):
        t_probe = time.monotonic()
        up = _probe_backend()
        while not up and time.monotonic() - t_probe < wait_cap:
            print(
                json.dumps({
                    "note": "backend unavailable; waited "
                    f"{time.monotonic() - t_probe:.0f}s"
                }),
                file=sys.stderr, flush=True,
            )
            time.sleep(30)
            up = _probe_backend()
        if not up:
            print(
                json.dumps(
                    {
                        "metric": "fm_k16_train_examples_per_sec",
                        "value": 0,
                        "unit": "examples/s/chip",
                        "vs_baseline": 0,
                        "error": "TPU backend unavailable (wedged runtime?) "
                        f"after {time.monotonic() - t_probe:.0f}s of probing",
                    }
                ),
                flush=True,
            )
            return
    r, err = _run_child(budget)
    if r is None and "BENCH_KERNEL" not in os.environ:
        # default pairs path failed (cold Mosaic kernel cache can push a
        # first compile past the budget) — fall back to the XLA path,
        # which compiles in seconds, so a number is still captured
        print(
            json.dumps({"note": f"pairs path failed ({err}); retrying with kernel=xla"}),
            file=sys.stderr, flush=True,
        )
        os.environ["BENCH_KERNEL"] = "xla"
        # the XLA path compiles in seconds; a tighter budget keeps total
        # bench wall time bounded even after a full pairs-budget burn
        r, err = _run_child(min(budget, 600))
    for _ in range(retries):
        if r is not None:
            break
        print(json.dumps({"note": f"retrying after: {err}"}), file=sys.stderr, flush=True)
        time.sleep(sleep_s)
        r, err = _run_child(budget)
    if r is None:
        print(
            json.dumps(
                {
                    "metric": "fm_k16_train_examples_per_sec",
                    "value": 0,
                    "unit": "examples/s/chip",
                    "vs_baseline": 0,
                    "error": err,
                }
            ),
            flush=True,
        )
        return
    eps_np = 1.0 if os.environ.get("BENCH_SKIP_NUMPY") else bench_numpy()
    mode = "eval" if os.environ.get("BENCH_EVAL") else "train"
    out = {
        "metric": f"fm_k16_{mode}_examples_per_sec",
        "value": round(r["examples_per_sec"], 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(r["examples_per_sec"] / eps_np, 2),
    }
    print(json.dumps(out), flush=True)
    if os.environ.get("BENCH_DETAIL"):
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
