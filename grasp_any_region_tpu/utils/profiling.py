"""Tracing / profiling subsystem.

The reference's only observability is mmengine's IterTimerHook + LoggerHook
(configs/gar_1b.py:170-187; SURVEY.md §5). Here profiling is first-class:

  * `trace(logdir)` — context manager around jax.profiler (XPlane traces,
    viewable in TensorBoard/Perfetto)
  * `annotate(name)` — TraceAnnotation for named regions inside a trace
  * `PhaseTimer` — host-side named-phase wall timing with p50/p95 summaries
    (preprocess / prefill / decode breakdowns in the serving path)
  * `device_memory_stats()` — live HBM usage per device
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    def __init__(self):
        self._samples: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        self._samples[name].append(seconds)

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for name, xs in self._samples.items():
            arr = np.asarray(xs)
            out[name] = {
                "count": int(arr.size),
                "mean_ms": float(arr.mean() * 1000),
                "p50_ms": float(np.percentile(arr, 50) * 1000),
                "p95_ms": float(np.percentile(arr, 95) * 1000),
                "total_s": float(arr.sum()),
            }
        return out

    def report(self) -> str:
        lines = [f"{'phase':<20} {'count':>6} {'mean':>9} {'p50':>9} {'p95':>9}"]
        for name, s in self.summary().items():
            lines.append(
                f"{name:<20} {s['count']:>6} {s['mean_ms']:>8.1f}ms "
                f"{s['p50_ms']:>8.1f}ms {s['p95_ms']:>8.1f}ms"
            )
        return "\n".join(lines)


def device_memory_stats() -> List[dict]:
    import jax

    out = []
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out.append(
                {
                    "device": str(d),
                    "bytes_in_use": s.get("bytes_in_use"),
                    "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                    "bytes_limit": s.get("bytes_limit"),
                }
            )
        except Exception:
            out.append({"device": str(d), "bytes_in_use": None})
    return out
