"""Tracing / per-step timing — the observability the reference lacks
(SURVEY.md §5 'Tracing / profiling: No — add jax.profiler trace hooks').

``trace(dir)`` wraps ``jax.profiler`` (viewable in TensorBoard / Perfetto);
``StepTimer`` records wall-clock per step and reports p50/p90/mean.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace over the enclosed steps (no-op when dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with percentile summaries."""

    def __init__(self, capacity: int = 1000):
        self.capacity = capacity
        self.samples: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        if len(self.samples) >= self.capacity:
            self.samples.pop(0)
        self.samples.append(dt)

    def summary(self) -> Dict[str, float]:
        import numpy as np

        if not self.samples:
            return {}
        arr = np.asarray(self.samples)
        return {
            "step_time_ms/mean": float(arr.mean() * 1e3),
            "step_time_ms/p50": float(np.percentile(arr, 50) * 1e3),
            "step_time_ms/p90": float(np.percentile(arr, 90) * 1e3),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


def _host_fingerprint() -> str:
    """Short hash of this host's ISA surface (arch + cpuinfo feature flags).

    XLA's persistent-cache key does NOT cover CPU machine features: entries
    compiled on a host with, say, ``prefer-no-scatter``/AMX load on a lesser
    host with only a warning ("could lead to execution errors such as
    SIGILL") — observed as multi-minute stalls and a poisoned cache after
    this container migrated CPU types.  Scoping the cache directory by ISA
    fingerprint makes a host change a clean cache MISS instead.
    """
    import hashlib
    import platform

    h = hashlib.sha256(platform.machine().encode())
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    h.update(line.encode())
                    break
    except OSError:
        pass
    return h.hexdigest()[:12]


# single source of truth for the default cache root (wut-doctor reports it)
XLA_CACHE_DIR = "~/.cache/weather_unet_tpu_xla"


def enable_compilation_cache(path: str = XLA_CACHE_DIR):
    """Persistent XLA compilation cache — first-compile times on TPU are
    minutes (CLAUDE.md); caching makes restarts/resumes near-instant.

    Entries live under a per-host-ISA subdirectory (see
    :func:`_host_fingerprint`).  Idempotent; set ``WUT_COMPILE_CACHE=0`` to
    disable (e.g. hermetic CI)."""
    import os

    import jax

    if os.environ.get("WUT_COMPILE_CACHE", "1") == "0":
        return
    try:
        cache_dir = os.path.join(os.path.expanduser(path), _host_fingerprint())
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"compilation cache disabled: {e}")
