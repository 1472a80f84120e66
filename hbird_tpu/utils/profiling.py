"""Tracing and throughput instrumentation.

The reference has no profiling beyond tqdm (SURVEY §5); a production TPU
deployment needs phase timings and device traces:

- `PhaseTimer`: wall-clock + items/sec per named phase, queryable as a
  dict (the CLI dumps it into the JSON summary).
- `maybe_trace`: context manager that wraps a phase in a
  `jax.profiler.trace` when HBIRD_PROFILE_DIR is set (view with
  TensorBoard / xprof). Zero overhead when unset.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Optional

PROFILE_ENV = "HBIRD_PROFILE_DIR"


class PhaseTimer:
    def __init__(self) -> None:
        self.phases: Dict[str, Dict[str, float]] = {}

    @contextlib.contextmanager
    def phase(self, name: str, items: Optional[int] = None):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            dt = time.perf_counter() - t0
            rec = self.phases.setdefault(name, {"seconds": 0.0, "items": 0.0})
            rec["seconds"] += dt
            if items:
                rec["items"] += items

    def add_items(self, name: str, items: int) -> None:
        rec = self.phases.setdefault(name, {"seconds": 0.0, "items": 0.0})
        rec["items"] += items

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, rec in self.phases.items():
            entry = {"seconds": round(rec["seconds"], 3)}
            if rec["items"]:
                entry["items"] = int(rec["items"])
                entry["items_per_sec"] = round(rec["items"] / max(rec["seconds"], 1e-9), 2)
            out[name] = entry
        return out


@contextlib.contextmanager
def maybe_trace(name: str):
    """jax.profiler device trace for this phase when HBIRD_PROFILE_DIR is set."""
    trace_dir = os.environ.get(PROFILE_ENV)
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, name)):
        yield
