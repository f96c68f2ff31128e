"""Stage timing + device tracing.

The reference's only observability is ad-hoc time.time() prints
(SURVEY.md §5; reference sfm_pipeline.py:793,877, mvs_patchmatch.py:121-137).
Here: a structured per-stage timer with a report, and an optional
jax.profiler trace context that captures real device timelines viewable in
TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional, Tuple


class StageTimer:
    """Accumulates named wall-clock stage timings."""

    def __init__(self):
        self.stages: List[Tuple[str, float]] = []

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages.append((name, time.perf_counter() - t0))

    def as_dict(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, dt in self.stages:
            out[name] = out.get(name, 0.0) + dt
        return out

    def report(self):
        if not self.stages:
            return
        total = sum(dt for _, dt in self.stages)
        print("[timing]")
        for name, dt in self.stages:
            print(f"  {name:<20s} {dt:8.2f}s  ({100 * dt / max(total, 1e-9):4.1f}%)")
        print(f"  {'total':<20s} {total:8.2f}s")


@contextlib.contextmanager
def maybe_trace(trace_dir: Optional[str]):
    """jax.profiler trace over the wrapped block when trace_dir is given."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    print(f"[profile] device trace written to {trace_dir}")
