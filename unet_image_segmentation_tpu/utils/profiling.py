"""Profiling / tracing utilities.

The reference's observability is a TensorBoard callback plus ad-hoc
``time.perf_counter`` spans (SURVEY.md §5 tracing).  TPU-native
equivalents:

* :func:`trace` — ``jax.profiler`` trace capture (XLA op-level timeline,
  TensorBoard-compatible) around any code region.
* :class:`StepTimer` — wall-clock per-step statistics with a **hard
  device sync**: on tunneled/remote backends ``block_until_ready`` can
  return before execution finishes, so the timer syncs by fetching a
  scalar from the step output (the same convention ``bench.py`` uses).
* :func:`profile_train_steps` — convenience: capture a trace of the
  first N steps of an epoch (wired to ``TrainConfig.profile_dir``).
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Any, Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (view in TensorBoard).

    Degrades to a no-op (with a warning) if the backend does not support
    profiling (e.g. some remote/tunneled device plugins).
    """
    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # backend without profiler support
        print(f"Warning: profiler trace unavailable ({e}); continuing without")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:
                print(f"Warning: profiler stop failed ({e})")


def hard_sync(value: Any) -> None:
    """Force execution to complete (scalar fetch; tunnel-safe)."""
    leaves = jax.tree_util.tree_leaves(value)
    if leaves:
        jax.device_get(leaves[0])


class StepTimer:
    """Windowed per-step wall-time statistics; call :meth:`lap` after each step.

    Syncs the device at most once per ``sync_every`` laps (a window) and
    records that window's per-step average — the hot loop stays fully
    async-dispatched between windows instead of draining the pipeline
    every step. With no ``step_output`` the window boundary records
    dispatch-side wall time only (still correct in aggregate because the
    caller's epoch-end fetch syncs everything).
    """

    def __init__(self, sync_every: int = 1):
        self.times: List[float] = []  # one per-step average per window
        self.sync_every = max(1, sync_every)
        self._t0: Optional[float] = None
        self._n = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def lap(self, step_output: Any = None) -> None:
        if self._t0 is None:
            self.start()
            return
        self._n += 1
        if self._n % self.sync_every == 0:
            if step_output is not None:
                hard_sync(step_output)
            dt = (time.perf_counter() - self._t0) / self.sync_every
            self.times.append(dt)
            self._t0 = time.perf_counter()

    def summary(self) -> Dict[str, float]:
        if self._n == 0:
            return {}
        out = {"steps": float(self._n)}
        if self.times:
            ts = self.times[1:] if len(self.times) > 2 else self.times  # drop warmup
            out.update(
                mean_ms=statistics.mean(ts) * 1e3,
                p50_ms=statistics.median(ts) * 1e3,
                max_ms=max(ts) * 1e3,
            )
        return out
