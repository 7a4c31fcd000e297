"""Multi-host bootstrap and input sharding.

Counterpart of the reference's launch stack (SURVEY.md §3.1): dmlc
tracker scripts spawning scheduler/server/worker processes with
``DMLC_ROLE``/``DMLC_PS_ROOT_URI`` env bootstrap, plus dmlc InputSplit
assigning disjoint file parts per worker. Under SPMD there are no
roles: every host runs the same program; ``jax.distributed.initialize``
replaces the scheduler-brokered membership and the mesh spans all
processes' devices.

Environment contract (set by your launcher, one process per host):
  DIFACTO_COORDINATOR   host:port of process 0 (reference: DMLC_PS_ROOT_URI)
  DIFACTO_NUM_PROCESSES total process count     (reference: DMLC_NUM_WORKERS)
  DIFACTO_PROCESS_ID    this process's rank

Data sharding across hosts mirrors InputSplit: each process reads the
``process_index``-th of ``process_count`` byte-range parts of every file
(``BatchIter(part_index=..., num_parts=...)``), giving disjoint
coverage with no coordination.

Single-chip note: this round's hardware exposes one chip; multi-chip
layouts are validated on a virtual CPU mesh (tests/) and via the
driver's dryrun (``__graft_entry__.dryrun_multichip``).
"""

from __future__ import annotations

import logging
import os

import jax

log = logging.getLogger("difacto_tpu")


def maybe_initialize_distributed() -> tuple[int, int]:
    """Initialize multi-process JAX if the env contract is present.

    Returns (process_index, process_count). Safe to call when
    single-process (returns (0, 1))."""
    coord = os.environ.get("DIFACTO_COORDINATOR")
    nproc = int(os.environ.get("DIFACTO_NUM_PROCESSES", "0") or 0)
    pid = int(os.environ.get("DIFACTO_PROCESS_ID", "0") or 0)
    if coord and nproc > 1:
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=nproc, process_id=pid
        )
        log.info(
            "distributed: process %d/%d, %d global devices",
            jax.process_index(), jax.process_count(), len(jax.devices()),
        )
    return jax.process_index(), jax.process_count()


def global_mesh(num_shards: int = 0) -> jax.sharding.Mesh:
    """1D mesh over all global devices (the sparse-dispatch axis)."""
    devices = jax.devices()
    n = num_shards or len(devices)
    return jax.sharding.Mesh(
        __import__("numpy").asarray(devices[:n]), ("shard",)
    )


def input_part(process_index: int | None = None, process_count: int | None = None):
    """(part_index, num_parts) for this host's BatchIter — the InputSplit
    contract: every file split into record-aligned byte ranges."""
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    return process_index, process_count
