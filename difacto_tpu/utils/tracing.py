"""Profiling / tracing hooks.

Counterpart of the reference's observability story (SURVEY.md §5): the
reference has wall-clock progress rows plus ps-lite's ``PS_VERBOSE``
message dump. Here:

  * ``DIFACTO_PROFILE=<dir>`` captures a ``jax.profiler`` trace of the
    first profiled region into <dir> (viewable in TensorBoard/Perfetto) —
    the TPU-native replacement for flamegraph-less printf timing;
  * ``DIFACTO_VERBOSE=1`` turns on debug-level logging of device
    placement and per-pass shapes (the PS_VERBOSE analog — collective
    and buffer shapes instead of ZMQ messages);
  * :class:`StepTimer` measures jit-step wall time with a forcing fetch
    (``jax.block_until_ready`` is unreliable over tunneled transports —
    see .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time

log = logging.getLogger("difacto_tpu")


def verbose() -> bool:
    return os.environ.get("DIFACTO_VERBOSE", "") not in ("", "0")


@contextlib.contextmanager
def profile_region(name: str):
    """Trace a region if DIFACTO_PROFILE is set (first region wins)."""
    prof_dir = os.environ.get("DIFACTO_PROFILE")
    if not prof_dir or getattr(profile_region, "_active", False):
        yield
        return
    import jax

    profile_region._active = True
    os.makedirs(prof_dir, exist_ok=True)
    log.info("profiling %s -> %s", name, prof_dir)
    with jax.profiler.trace(prof_dir):
        yield


class StepTimer:
    """Wall-clock step timing with coarse percentile summary."""

    def __init__(self):
        self.times: list[float] = []
        self._t = None

    def start(self) -> None:
        self._t = time.perf_counter()

    def stop(self) -> None:
        if self._t is not None:
            self.times.append(time.perf_counter() - self._t)
            self._t = None

    def summary(self) -> str:
        if not self.times:
            return "no steps timed"
        ts = sorted(self.times)
        n = len(ts)
        return (
            f"{n} steps: p50 {ts[n // 2] * 1e3:.1f}ms "
            f"p90 {ts[int(n * 0.9)] * 1e3:.1f}ms mean {sum(ts) / n * 1e3:.1f}ms"
        )
