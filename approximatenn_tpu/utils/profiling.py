"""Tracing, per-stage timing, and metrics (SURVEY.md §5).

The reference's entire observability story is the wall-clock totals of
``time_results.c`` (``/root/reference/timing.h:7-17``).  This module is the
framework-grade replacement: named stage timers with device-completion
fencing, a metrics registry, and a wrapper around ``jax.profiler`` for
XPlane traces viewable in XProf/TensorBoard.

On some remote-attached TPU runtimes ``jax.block_until_ready`` returns
without waiting for device completion; :func:`fence` therefore pulls one
scalar (device->host read), the only reliable fence there.  Stage timings
always fence, so they measure device work, not dispatch.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


def fence(tree) -> None:
    """Force completion of everything `tree` depends on (device->host read
    of one scalar; reliable where block_until_ready is not)."""
    import jax
    import jax.numpy as jnp

    leaves = [x for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        # slice ONE element first, then flatten: reshape(-1) on a large 2-D
        # array is a physical relayout copy on TPU tiled layouts (eagerly
        # materialized — fencing a 7.7 GB buffer allocated a second one and
        # OOMed the 10M pack; CLAUDE.md reshape-relayout rule)
        x = leaves[-1]
        one = x[(0,) * (x.ndim - 1)] if x.ndim else x
        float(jnp.sum(one.reshape(-1)[:1].astype(jnp.float32)))


@dataclass
class StageTimes:
    """Accumulated wall-clock per named stage."""

    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def stage(self, name: str, out=None):
        """Time a stage; pass the stage's output pytree via ``out`` (a
        one-element list the body appends to) to fence before stopping."""
        sink: list = []
        t0 = time.perf_counter()
        try:
            yield sink
        finally:
            if sink:
                fence(sink)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:28s} {t*1e3:10.2f} ms total  {t/c*1e3:9.2f} ms/call  x{c}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/ann_tpu_trace"):
    """Capture an XPlane device trace around a region (view with XProf /
    TensorBoard).  No-ops gracefully if the profiler is unavailable."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        pass
    try:
        yield logdir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name: str):
    """Named region that shows up in profiler traces
    (``jax.profiler.TraceAnnotation``)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
