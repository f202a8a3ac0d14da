"""Profiling hooks (SURVEY §5: the reference has none; we add them).

- :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable device trace for any pipeline section.
- :class:`StageTimer` — host-side wall-clock stage accounting that
  lands in the ProcessLog / the L2 ``processinfo`` tree.

Note on this project's TPU relay: ``block_until_ready`` may not
synchronize remote execution, so StageTimer numbers are dispatch-side;
for honest device timings use the scan-chain method (see bench.py).
"""

import contextlib
import time


@contextlib.contextmanager
def trace(log_dir, create_perfetto_link=False):
    """Device trace via jax.profiler (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates named stage wall-clock durations."""

    def __init__(self, mylog=None):
        self.stages = {}
        self._mylog = mylog

    @contextlib.contextmanager
    def stage(self, name):
        t0 = time.monotonic()
        try:
            yield
        finally:
            dt = time.monotonic() - t0
            self.stages[name] = self.stages.get(name, 0.0) + dt
            if self._mylog is not None:
                self._mylog.append(f"[timing] {name}: {dt * 1e3:.1f} ms\n")

    def summary(self):
        return dict(self.stages)
