"""Observability: metrics logging, phase timing, on-demand jax profiling.

The reference has TensorBoard scalars + tqdm only (SURVEY §5).  Here:
- :class:`MetricsLogger` writes JSONL scalars (TensorBoard-compatible via
  a trivial converter, no TB dependency on pods);
- :func:`phase_timer` wall-clocks named pipeline phases;
- :func:`profile_trace` wraps jax.profiler for device traces.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._f = open(path, "a")
        else:
            self._f = None

    def scalars(self, step: int, values: Dict[str, float]):
        rec = {"step": int(step), "t": time.time(), **values}
        if self._f:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()

    def close(self):
        if self._f:
            self._f.close()


@contextlib.contextmanager
def phase_timer(name: str, logger: Optional[MetricsLogger] = None):
    t0 = time.time()
    try:
        yield
    finally:
        dt = time.time() - t0
        if logger is not None:
            logger.scalars(0, {f"phase/{name}_s": dt})


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """jax.profiler trace around a block (view in TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
