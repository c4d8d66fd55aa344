"""Tracing / profiling / observability helpers.

The reference has no profiling at all (SURVEY.md section 5: only a
parameter-count print).  This module provides the TPU-native equivalents:

* :class:`StepTimer` -- wall-clock step timing with a forced device->host
  value sync (``jax.block_until_ready`` under-reports through remote-relay
  transports), rolling throughput in samples/sec/chip;
* :func:`trace` -- context manager around ``jax.profiler`` writing an
  xplane/trace.json.gz profile for op-level analysis;
* :func:`enable_nan_debugging` -- turns on ``jax_debug_nans`` (the rebuild's
  answer to the reference's total absence of numeric sanitizers).
"""

import contextlib
import time

import jax


class StepTimer:
    def __init__(self, samples_per_step: int = 1):
        self.samples_per_step = samples_per_step
        self.durations = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        """End a step; pass any device scalar to force a true sync."""
        if sync_value is not None:
            float(sync_value)
        self.durations.append(time.perf_counter() - self._t0)

    def summary(self, skip_warmup: int = 1):
        ds = self.durations[skip_warmup:] or self.durations
        if not ds:
            return {}
        n_chips = max(jax.local_device_count(), 1)
        mean = sum(ds) / len(ds)
        return {
            "steps": len(ds),
            "mean_step_s": mean,
            "min_step_s": min(ds),
            "samples_per_sec_per_chip": self.samples_per_step / mean / n_chips,
        }


@contextlib.contextmanager
def trace(log_dir: str):
    with jax.profiler.trace(log_dir):
        yield


_TRACE_ACTIVE = [False]


def start_trace(log_dir: str):
    """Whole-run profiler trace (cli/common.py ``--profile DIR``): started at
    flag-parse time, stopped atexit so trainers need no per-loop changes."""
    import atexit

    if _TRACE_ACTIVE[0]:
        return
    jax.profiler.start_trace(log_dir)
    _TRACE_ACTIVE[0] = True

    def _stop():
        if _TRACE_ACTIVE[0]:
            jax.profiler.stop_trace()
            _TRACE_ACTIVE[0] = False

    atexit.register(_stop)


def enable_nan_debugging(enable: bool = True):
    jax.config.update("jax_debug_nans", enable)
