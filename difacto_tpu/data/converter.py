"""Offline libsvm -> binary CSR shard conversion.

The reference parses text on every epoch (dmlc-core LibSVMParser); at TPU
throughput text parsing bottlenecks the host, so we pre-convert once to
binary shards (.npz: labels/indptr/indices/values) and stream those.
This is the "libsvm -> sharded CSR pipeline" of BASELINE.json's north star.

Shard size matters: the loader reads one shard at a time, so big shards
make the prefetch pipeline bursty and starve the device (measured: 2M-row
shards sustain 84.5k examples/s end-to-end vs 177k with 256k-row shards
on the same data — hence the 2^18 default).
"""

from __future__ import annotations

import os

import numpy as np

from .libsvm import RowBlock, iter_file_chunks, parse_libsvm


def convert_file(
    src: str, out_prefix: str, rows_per_shard: int = 1 << 18, chunk_bytes: int = 64 << 20
) -> list[str]:
    """Convert one libsvm file to one or more .npz CSR shards."""
    outs: list[str] = []
    buf: list[RowBlock] = []
    buffered = 0

    def merged() -> RowBlock:
        labels = np.concatenate([b.labels for b in buf])
        values = np.concatenate([b.values for b in buf])
        indices = np.concatenate([b.indices for b in buf])
        ptrs = [np.zeros(1, np.int64)]
        off = 0
        for b in buf:
            ptrs.append(b.indptr[1:] + off)
            off += b.indptr[-1]
        return RowBlock(labels, np.concatenate(ptrs), indices, values)

    def emit(blk: RowBlock):
        path = f"{out_prefix}.part{len(outs):05d}.npz"
        np.savez(
            path,
            labels=blk.labels,
            indptr=blk.indptr,
            indices=blk.indices,
            values=blk.values,
        )
        outs.append(path)

    def flush(final: bool):
        nonlocal buf, buffered
        if not buf:
            return
        blk = merged()
        lo = 0
        while blk.num_rows - lo >= rows_per_shard or (final and lo < blk.num_rows):
            hi = min(lo + rows_per_shard, blk.num_rows)
            a, b = int(blk.indptr[lo]), int(blk.indptr[hi])
            emit(
                RowBlock(
                    blk.labels[lo:hi],
                    blk.indptr[lo : hi + 1] - blk.indptr[lo],
                    blk.indices[a:b],
                    blk.values[a:b],
                )
            )
            lo = hi
        if lo < blk.num_rows:
            a = int(blk.indptr[lo])
            buf = [
                RowBlock(
                    blk.labels[lo:],
                    blk.indptr[lo:] - blk.indptr[lo],
                    blk.indices[a:],
                    blk.values[a:],
                )
            ]
            buffered = blk.num_rows - lo
        else:
            buf, buffered = [], 0

    for chunk in iter_file_chunks(src, chunk_bytes):
        blk = parse_libsvm(chunk)
        buf.append(blk)
        buffered += blk.num_rows
        if buffered >= rows_per_shard:
            flush(final=False)
    flush(final=True)
    return outs


def load_csr_shard(path: str, part_index: int = 0, num_parts: int = 1) -> RowBlock:
    """Load a binary CSR shard, optionally a row-range part of it.
    Remote URIs stream through fsspec (data/io.py)."""
    import contextlib

    from .io import is_remote, open_uri

    with contextlib.ExitStack() as stack:
        src = path
        if is_remote(path):
            # np.load does not own (or close) an externally-passed file
            # object — close the remote handle ourselves
            src = stack.enter_context(open_uri(path, "rb"))
        with np.load(src) as z:
            labels, indptr = z["labels"], z["indptr"]
            indices, values = z["indices"], z["values"]
    n = len(labels)
    lo = n * part_index // num_parts
    hi = n * (part_index + 1) // num_parts
    if (lo, hi) != (0, n):
        labels = labels[lo:hi]
        base = indptr[lo]
        indices = indices[indptr[lo] : indptr[hi]]
        values = values[int(base) : int(indptr[hi])]
        indptr = indptr[lo : hi + 1] - base
    return RowBlock(
        labels.astype(np.float32, copy=False),
        indptr.astype(np.int64, copy=False),
        indices.astype(np.uint64, copy=False),
        values.astype(np.float32, copy=False),
    )


def main(argv: list[str]) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="convert libsvm files to binary CSR shards")
    ap.add_argument("src", nargs="+")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--rows-per-shard", type=int, default=1 << 18)
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)
    for src in args.src:
        prefix = os.path.join(args.out_dir, os.path.basename(src))
        outs = convert_file(src, prefix, args.rows_per_shard)
        print(f"{src} -> {len(outs)} shard(s)")


if __name__ == "__main__":
    import sys

    main(sys.argv[1:])
