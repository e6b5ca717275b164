"""Per-stage timing, the host-level replacement of TensorRT's `IProfiler`
tables (`stereoDNN/sample_app/main.cpp:52-81`, `tensor_net.cpp:34-52`).

Inside one XLA program there are no per-layer hooks (fusion makes the
question ill-posed); `jax.profiler.trace` covers kernel-level analysis.
What production serving needs is per-*stage* latency (ingest, each model,
postproc, controller) with percentiles — that is what this gives, with
the same "table of layer times" reporting style the reference printed.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List


class StageProfiler:
    def __init__(self, max_samples: int = 10_000):
        self._samples: Dict[str, List[float]] = defaultdict(list)
        self.max_samples = max_samples
        self.enabled = True

    @contextmanager
    def stage(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            samples = self._samples[name]
            if len(samples) < self.max_samples:
                samples.append(dt)

    def record(self, name: str, seconds: float):
        self._samples[name].append(seconds)

    def stats(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, xs in self._samples.items():
            if not xs:
                continue
            s = sorted(xs)
            n = len(s)
            out[name] = {
                "count": n,
                "mean_ms": 1e3 * sum(s) / n,
                "p50_ms": 1e3 * s[n // 2],
                "p99_ms": 1e3 * s[min(n - 1, int(n * 0.99))],
                "max_ms": 1e3 * s[-1],
            }
        return out

    def report(self) -> str:
        """Layer-times table, same spirit as the reference's
        `Profiler::printLayerTimes`."""
        lines = [f"{'stage':<28}{'count':>8}{'mean ms':>10}{'p50 ms':>10}"
                 f"{'p99 ms':>10}{'max ms':>10}"]
        for name, st in sorted(self.stats().items()):
            lines.append(
                f"{name:<28}{st['count']:>8}{st['mean_ms']:>10.3f}"
                f"{st['p50_ms']:>10.3f}{st['p99_ms']:>10.3f}"
                f"{st['max_ms']:>10.3f}")
        return "\n".join(lines)

    def reset(self):
        self._samples.clear()
