"""Lightweight per-stage timing and throughput counters.

The reference's only observability is stdout progress lines
(src/optflow.cpp:94) and debug prints (SURVEY.md §5). Here the runner
accounts decode / solve / postprocess / sink time and pairs/s, and
jax.profiler traces can be enabled around the solve for deep dives.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str):
        t = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t
            self.counts[name] += 1

    def summary(self, pairs: int = 0) -> Dict[str, float]:
        wall = time.perf_counter() - self._t0
        out = {f"{k}_s": round(v, 4) for k, v in self.totals.items()}
        out["wall_s"] = round(wall, 4)
        if pairs and wall > 0:
            out["pairs_per_s"] = round(pairs / wall, 4)
        return out


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """Wrap a block in a jax.profiler trace when log_dir is set."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
