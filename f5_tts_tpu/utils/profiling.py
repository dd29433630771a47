"""Profiling / tracing utilities (reference uses NVTX ranges + cuda profiler,
benchmark.py:114,391; TPU equivalent: jax.profiler xplane traces + phase
timers feeding the same RTF report format)."""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a TPU xplane/perfetto trace for the enclosed block."""
    import jax

    with jax.profiler.trace(log_dir):
        yield
    print(f"trace written to {log_dir}")


class PhaseTimer:
    """Named phase accumulator: preprocess / dit / vocoder / transfer split
    like the reference's DiT-vs-vocoder report (benchmark.py:461-462)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> dict:
        return {
            name: {"total_s": round(t, 4), "count": self.counts[name],
                   "mean_ms": round(t / max(self.counts[name], 1) * 1e3, 2)}
            for name, t in sorted(self.totals.items())
        }

    def dump(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)
