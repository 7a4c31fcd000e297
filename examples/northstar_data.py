"""Generate the north-star Criteo-Kaggle-scale dataset (BASELINE.md
measurement plan rows 3-4, round-2 verdict item 4).

Real Criteo cannot be downloaded in this environment (zero egress), so
the dataset is generated honestly and reproducibly by this script:
Criteo-Kaggle SHAPE (39 categorical fields per row, power-law feature
popularity, ~2.3M raw vocabulary here) with labels drawn from a fixed
ground-truth FM model (data/synthetic.py::make_ctr_data — documented
there) so time-to-target-AUC is a meaningful, convergent axis. Train
rows use per-chunk seeds; validation uses a disjoint seed; both share
the ground truth.

    python examples/northstar_data.py [out_dir] [train_rows]

writes binary CSR shards (2^18 rows each, the converter's default
granularity) and prints the paths. Default: 6M train + 512k val rows
under /tmp/northstar (~2 GB). Train with:

    python -m difacto_tpu examples/northstar.conf
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from difacto_tpu.data.synthetic import make_ctr_data  # noqa: E402

NUM_FIELDS = 39          # Criteo-Kaggle categorical field count
VOCAB_PER_FIELD = 60_000  # ~2.34M raw vocabulary, zipf popularity
ROWS_PER_SHARD = 1 << 18


def write_shards(prefix: str, total_rows: int, seed0: int) -> None:
    n_shards = (total_rows + ROWS_PER_SHARD - 1) // ROWS_PER_SHARD
    for s in range(n_shards):
        rows = min(ROWS_PER_SHARD, total_rows - s * ROWS_PER_SHARD)
        blk = make_ctr_data(
            rows, num_fields=NUM_FIELDS, vocab_per_field=VOCAB_PER_FIELD,
            seed=seed0 + s,
        )
        path = f"{prefix}.part{s:05d}.npz"
        np.savez(
            path, labels=blk.labels, indptr=blk.indptr,
            indices=blk.indices, values=blk.values,
        )
        print(path, rows, flush=True)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/northstar"
    train_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 6_000_000
    os.makedirs(out, exist_ok=True)
    write_shards(os.path.join(out, "train"), train_rows, seed0=1000)
    write_shards(os.path.join(out, "val"), 512 * 1024, seed0=9000)
    print("done")


if __name__ == "__main__":
    main()
