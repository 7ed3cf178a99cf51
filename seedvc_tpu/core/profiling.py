"""Tracing / profiling utilities.

The reference has only ad-hoc CUDA-event timing in the realtime GUI and an
RTF print (SURVEY §5.1, ``real-time-gui.py:97-114``, ``inference.py:529``).
The TPU framework makes profiling first-class:

- :class:`StageTimer` — per-stage wall-clock accounting for pipelines
  (semantic / regulate / sample / vocode / ...), reported in ``stats``.
- :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-
  loadable trace directory (XLA op-level timeline on TPU).
- :func:`annotate` — named TraceAnnotation so pipeline stages show up as
  spans inside the device trace.

All device timings synchronise via ``np.asarray`` on request: through the
axon tunnel ``block_until_ready`` under-reports (see .claude/skills/verify).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StageTimer:
    """Accumulates wall time per named stage across a pipeline run.

    >>> timer = StageTimer()
    >>> with timer("semantic"):
    ...     pass
    >>> timer.report()  # {'semantic': {'seconds': ..., 'calls': 1}, ...}
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._acc: dict[str, float] = {}
        self._calls: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, stage: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            with annotate(stage):
                yield
        finally:
            dt = time.perf_counter() - t0
            self._acc[stage] = self._acc.get(stage, 0.0) + dt
            self._calls[stage] = self._calls.get(stage, 0) + 1

    def report(self) -> dict:
        return {stage: {"seconds": round(self._acc[stage], 4),
                        "calls": self._calls[stage]}
                for stage in self._acc}

    def total(self) -> float:
        return sum(self._acc.values())


def probe_ready(x):
    """Block until ``x``'s computation has finished, moving O(1) bytes.

    Stage attribution through the axon tunnel must not use either of the
    obvious syncs: ``block_until_ready`` can return before remote execution
    finishes (under-reports), and ``np.asarray(x)`` ships the WHOLE buffer
    over a ~50 MB/s link (a 5 MB conditioning tensor reads as ~100 ms of
    fake "compute").  Fetching a single element forces completion via data
    dependence at constant transfer cost (~10-25 ms tunnel round-trip per
    probe).  Returns ``x`` unchanged and still device-resident.
    """
    import jax

    if not isinstance(x, jax.Array):
        return x
    global _PROBE
    if _PROBE is None:
        import jax.numpy as jnp

        # one jitted fn: jit's own cache specialises per (shape, dtype)
        _PROBE = jax.jit(lambda v: jnp.ravel(v)[0])
    import numpy as np

    np.asarray(_PROBE(x))
    return x


_PROBE = None


@contextlib.contextmanager
def annotate(name: str):
    """Named span inside a device trace (no-op outside an active trace)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context; pass None to disable."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
