"""Tracing / profiling — a first-class subsystem the reference lacks.

The reference has no profiler hooks at all (SURVEY §5: only
``sec_per_example`` prints, detection/tools/eval_utils.py:109-110). Here:

  * :class:`StageTimer` — named wall-clock accumulators with a tabulated
    report; used by the offboard driver for per-stage times and by the
    trainer for step timing. ``timer.block`` additionally calls
    ``jax.block_until_ready`` on a value so device work is attributed to
    the stage that launched it (async dispatch otherwise smears it).
  * :func:`trace` — context manager around ``jax.profiler.trace`` writing a
    TensorBoard/XPlane trace (works on CPU and TPU backends); no-ops when
    given a falsy logdir so call sites can pass the CLI flag straight in.
  * :func:`annotate` — ``jax.profiler.StepTraceAnnotation`` pass-through for
    marking steps inside a capture.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict


class StageTimer:
    """Accumulates wall-clock per named stage.

    >>> t = StageTimer()
    >>> with t("tracking"):
    ...     run_tracker()
    >>> out = t.block("detection", jitted_fn(batch))  # waits + attributes
    >>> print(t.report())
    """

    def __init__(self):
        self.totals = OrderedDict()
        self.counts = OrderedDict()

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def block(self, name: str, value):
        """Wait for device work and attribute it to `name`; returns value."""
        import jax

        with self(name):
            jax.block_until_ready(value)
        return value

    def add(self, name: str, seconds: float):
        self.totals[name] = self.totals.get(name, 0.0) + seconds
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        if not self.totals:
            return "(no stages timed)"
        total = sum(self.totals.values())
        w = max(len(k) for k in self.totals)
        lines = [f"{'stage':<{w}}  {'total_s':>9}  {'calls':>6}  "
                 f"{'mean_ms':>9}  {'share':>6}"]
        for k, v in self.totals.items():
            n = self.counts[k]
            lines.append(f"{k:<{w}}  {v:9.3f}  {n:6d}  "
                         f"{1e3 * v / max(n, 1):9.2f}  "
                         f"{100 * v / max(total, 1e-9):5.1f}%")
        return "\n".join(lines)

    def as_dict(self):
        return {k: {"total_s": self.totals[k], "calls": self.counts[k]}
                for k in self.totals}


@contextlib.contextmanager
def trace(logdir):
    """``jax.profiler.trace`` capture into `logdir` (TensorBoard XPlane
    format); no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    import jax

    with jax.profiler.trace(str(logdir)):
        yield


def annotate(name: str, **kwargs):
    """Step annotation inside an active trace (shows as a named region)."""
    import jax

    return jax.profiler.StepTraceAnnotation(name, **kwargs)
