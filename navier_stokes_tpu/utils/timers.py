"""Phase timing + JAX profiler integration.

The reference has NO instrumentation (SURVEY §5: no TimerOutput anywhere);
this is the framework's observability layer: wall-clock phase timers with
device synchronization, and a context manager around ``jax.profiler`` for
XPlane traces of the jitted kernels (assembly / tangent solve / output).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field

import jax

__all__ = ["PhaseTimers", "trace"]


@dataclass
class PhaseTimers:
    """Accumulating named wall-clock timers (device-synchronized)."""

    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))
    sync: bool = True

    @contextlib.contextmanager
    def __call__(self, name: str, *sync_values):
        """Time a block; pass device arrays as sync_values (or perform a host
        transfer inside the block) so async dispatch doesn't under-report."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and sync_values:
                jax.block_until_ready(sync_values)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase timings:"]
        width = max((len(k) for k in self.totals), default=0)
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"  {name:<{width}}  total {total * 1e3:9.1f} ms   "
                f"calls {n:5d}   mean {total / n * 1e3:8.2f} ms"
            )
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "calls": self.counts[k]} for k in self.totals
        }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
