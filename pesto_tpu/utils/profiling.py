"""Tracing and stage profiling.

The reference's observability is wall-clock stage timing (profiling.py:68-119)
plus the Logger ETA helper. Here:

  - StageTimer: named stage accumulator with throughput summary;
  - device_trace: context manager around jax.profiler.trace producing a
    TensorBoard-loadable xplane trace;
  - chained_timing: honest device timing under runtimes where
    block_until_ready is unreliable (dependency-chained iterations + one
    host sync).
"""

import contextlib
import time
from collections import defaultdict
from typing import Callable, Dict

import numpy as np


class StageTimer:
    def __init__(self):
        self.times: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, dict]:
        out = {}
        for name, ts in self.times.items():
            arr = np.array(ts)
            out[name] = {
                "count": len(arr),
                "total_s": float(arr.sum()),
                "mean_ms": float(arr.mean() * 1e3),
                "median_ms": float(np.median(arr) * 1e3),
            }
        return out

    def report(self) -> str:
        return "\n".join(
            f"{name:>12}: n={s['count']:>5}  mean={s['mean_ms']:8.2f} ms  "
            f"median={s['median_ms']:8.2f} ms  total={s['total_s']:8.2f} s"
            for name, s in self.summary().items()
        )


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace (view with TensorBoard's profile plugin)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def chained_timing(fn: Callable, chain_arg, *rest, iters: int = 10, sync_overhead: float = 0.027):
    """Time `fn(chain_arg, *rest) -> (new_chain_arg, out)` by chaining the
    first argument through iterations and forcing one final host sync."""
    x, out = fn(chain_arg, *rest)
    _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        x, out = fn(x, *rest)
    _ = float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0 - sync_overhead) / iters
