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


def _host_basis() -> Dict[str, str]:
    """The raw inputs the host fingerprint hashes (recorded in HOST.json so a
    mismatch is diagnosable and collisions purge instead of poisoning).

    XLA:CPU's AOT target-machine feature string is LLVM host detection —
    ``getHostCPUName()`` keys on vendor/family/model/stepping (tuning
    features like ``prefer-no-gather`` come from the CPU *name*, not from
    cpuid feature bits), so cpuinfo flags alone under-key the cache: two
    hosts with identical flags but different models compile different
    executables.  The jaxlib version is included because the executable ABI
    moves with it.

    Round-4 correction to the r3 narrative: the "could lead to execution
    errors such as SIGILL" warnings VERDICT r3 attributed to migrated
    containers actually fire on every SAME-HOST cache load — XLA's loader
    compares the compile-time tuning pseudo-features against a CPUID-only
    host probe (see :data:`AOT_TUNING_PSEUDO_FEATURES`).  Fingerprinting
    cannot silence a same-host false positive; the stderr guard
    (:func:`install_aot_loader_guard`) classifies and suppresses it, while
    a REAL ISA mismatch still poisons the dir.  This fingerprint remains
    the cross-machine keying layer.
    """
    import platform

    basis = {"arch": platform.machine(), "format": "v2"}
    try:
        import jaxlib.version

        basis["jaxlib"] = jaxlib.version.__version__
    except Exception:
        basis["jaxlib"] = "unknown"
    wanted = ("vendor_id", "cpu family", "model", "model name", "stepping",
              "flags", "Features", "CPU implementer", "CPU part")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in wanted and key not in basis:  # first core only
                    basis[key] = line.split(":", 1)[-1].strip()
                if line.strip() == "" and len(basis) > 3:
                    break   # one processor block is enough
    except OSError:
        pass
    return basis


def _host_fingerprint() -> str:
    """Short hash of :func:`_host_basis` — names the per-host cache subdir."""
    import hashlib
    import json

    blob = json.dumps(_host_basis(), sort_keys=True).encode()
    return hashlib.sha256(blob).hexdigest()[:12]


# single source of truth for the default cache root (wut-doctor reports it)
XLA_CACHE_DIR = "~/.cache/weather_unet_tpu_xla"


def _prune_stale_cache(root: str, keep: str):
    """Remove poisoned/legacy entries from the cache root:

    * regular files at top level (pre-round-2 flat layout),
    * subdirectories without a ``HOST.json`` manifest (round-2/3
      flags-only fingerprint format — the format that let stale XLA:CPU AOT
      executables load across container migrations),
    * subdirectories whose manifest disagrees with their own name
      (hash collision or fingerprint-function drift).

    Valid v2 dirs for *other* hosts are kept (the container may migrate
    back).  Never fatal."""
    import json
    import os
    import shutil

    try:
        entries = os.listdir(root)
    except OSError:
        return
    for name in entries:
        full = os.path.join(root, name)
        try:
            if name == keep:
                continue
            if os.path.isfile(full):
                os.unlink(full)                      # flat legacy entry
                continue
            manifest = os.path.join(full, "HOST.json")
            if not os.path.isfile(manifest):
                shutil.rmtree(full)                  # legacy fingerprint dir
                continue
            with open(manifest) as f:
                recorded = json.load(f)
            if recorded.get("fingerprint") != name:
                shutil.rmtree(full)                  # collision / drift
        except Exception:
            pass


# LLVM *tuning* pseudo-features.  XLA:CPU appends these to the compile-time
# target-machine feature string based on the CPU *model name* (e.g. Sapphire
# Rapids prefers gather/scatter-free code), but the AOT loader's host probe
# reports only CPUID feature bits — so every disk-cache load on such a CPU
# logs a "could lead to execution errors such as SIGILL" mismatch for them,
# even when the executable was compiled seconds earlier ON THE SAME HOST
# (reproduced: compile+store then reload in a fresh process, the only
# "missing" features were exactly these two).  They are code-generation
# preferences, not ISA requirements: code compiled WITH them simply avoids
# gather/scatter instructions, which every x86-64 host can run.
AOT_TUNING_PSEUDO_FEATURES = frozenset({"prefer-no-gather", "prefer-no-scatter"})

_AOT_LINE = None     # compiled lazily (re import at call time)
_guard = {"installed": False, "suppressed": 0, "real": 0, "poisoned": False,
          "cache_dir": None}


def classify_aot_mismatch_line(line: str) -> Optional[str]:
    """``"benign"`` for a cpu_aot_loader feature-mismatch line whose missing
    feature is a tuning pseudo-feature, ``"real"`` for a genuine ISA feature
    (actual SIGILL risk), ``None`` for any other line."""
    global _AOT_LINE
    if _AOT_LINE is None:
        import re

        _AOT_LINE = re.compile(
            r"cpu_aot_loader.*?Target machine feature \+([\w.\-]+) is not\b")
    m = _AOT_LINE.search(line)
    if m is None:
        return None
    return "benign" if m.group(1) in AOT_TUNING_PSEUDO_FEATURES else "real"


def aot_guard_stats() -> dict:
    """Copy of the guard's counters (``suppressed``/``real``/``installed``).

    Deep enough that callers can't mutate guard state through the view and
    ``json.dumps`` works: the live ``poisoned_dirs`` set is returned as a
    sorted list."""
    out = dict(_guard)
    if "poisoned_dirs" in out:
        out["poisoned_dirs"] = sorted(out["poisoned_dirs"])
    return out


def install_aot_loader_guard(cache_dir: str):
    """Filter XLA:CPU's AOT-loader feature-mismatch warnings on stderr.

    XLA logs one ERROR line per compile-feature the host probe lacks when it
    deserializes a disk-cached CPU executable.  Two classes, opposite
    handling:

    * missing feature in :data:`AOT_TUNING_PSEUDO_FEATURES` — an XLA false
      positive that fires on every same-host cache load (see the constant's
      comment); suppressed, counted in :func:`aot_guard_stats`.
    * any other missing feature — a REAL ISA mismatch (the executable may
      SIGILL).  The line passes through, a loud banner follows, and the
      cache dir is marked ``POISONED`` so the next
      :func:`enable_compilation_cache` wipes and rebuilds it.

    Implementation: fd 2 is replaced with a pipe drained by a daemon thread
    that classifies complete lines and forwards everything non-benign to the
    original stderr.  Installed only for CPU-platform processes (the warning
    is CPU-specific; TPU runs keep an unwrapped stderr).  ``WUT_AOT_GUARD=0``
    disables.  Idempotent per process."""
    import atexit
    import os
    import threading

    if os.environ.get("WUT_AOT_GUARD", "1") == "0":
        return
    # Track the CURRENT cache dir even when the stderr filter is already
    # installed: a later enable_compilation_cache(other_dir) (the test suite
    # re-enables with tmp roots) must poison the dir whose executable
    # actually mismatched, not the first one this process ever used.
    _guard["cache_dir"] = cache_dir
    if _guard["installed"]:
        return
    real_fd = os.dup(2)
    r_fd, w_fd = os.pipe()

    def _poison(raw: bytes):
        # Latch PER DIR, not per process: after one mismatch poisons dir A,
        # a later real mismatch against a retargeted dir B must still mark
        # B.  (Known benign race: a line emitted for dir A's executable but
        # classified after a retarget to B poisons B instead — the pump
        # cannot attribute a stderr line to a dir, and the worst case is a
        # spurious cache rebuild, never a missed real mismatch on the dir
        # in current use.)
        target = _guard["cache_dir"]
        poisoned = _guard.setdefault("poisoned_dirs", set())
        if target in poisoned:
            return
        poisoned.add(target)
        _guard["poisoned"] = True
        try:
            with open(os.path.join(target, "POISONED"), "wb") as f:
                f.write(raw)
            os.write(real_fd,
                     b"weather_unet_tpu: REAL ISA mismatch loading a cached "
                     b"XLA:CPU executable - cache dir marked POISONED; it "
                     b"will be wiped and rebuilt on next start\n")
        except OSError:
            pass

    def _handle(raw: bytes):
        try:
            verdict = classify_aot_mismatch_line(
                raw.decode("utf-8", "replace"))
        except Exception:
            verdict = None
        if verdict == "benign":
            _guard["suppressed"] += 1
            return
        if verdict == "real":
            _guard["real"] += 1
            _poison(raw)
        try:
            os.write(real_fd, raw)
        except OSError:
            pass

    def _pump():
        buf = b""
        while True:
            try:
                chunk = os.read(r_fd, 1 << 16)
            except OSError:
                break
            if not chunk:
                break
            buf += chunk
            *lines, buf = buf.split(b"\n")
            for ln in lines:
                _handle(ln + b"\n")
        if buf:
            _handle(buf)
        try:
            os.close(r_fd)
        except OSError:
            pass

    t = threading.Thread(target=_pump, daemon=True, name="wut-aot-guard")
    try:
        t.start()
    except Exception:
        # cannot start the reader: leave stderr untouched (redirecting fd 2
        # into a pipe nobody drains would block the process after ~64 KB of
        # stderr) and let the caller's never-fatal guard report it
        for fd in (r_fd, w_fd, real_fd):
            try:
                os.close(fd)
            except OSError:
                pass
        raise
    os.dup2(w_fd, 2)            # redirect only once the reader is alive
    os.close(w_fd)
    _guard["installed"] = True

    def _restore():
        # putting the real stderr back closes this process's pipe write end
        # (old fd 2) → the pump sees EOF after draining the tail and exits
        try:
            os.dup2(real_fd, 2)
        except OSError:
            return
        t.join(timeout=2.0)     # children may still hold the write end

    atexit.register(_restore)


def _cpu_platform_expected() -> bool:
    """Will this process's default JAX backend be XLA:CPU?  Decided WITHOUT
    initializing the backend (this runs before init on purpose):

    * an explicit platform request (config API — the WUT entry points set it
      — or ``JAX_PLATFORMS``) answers directly;
    * with no explicit request, the backend is CPU exactly when no PJRT
      accelerator plugin is installed (plugins register via the
      ``jax_plugins`` entry-point group / namespace package — e.g. the axon
      TPU plugin or jax-cuda); a bare CPU-only host has neither."""
    import os

    import jax

    plats = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if plats:
        # priority list ("axon,cpu" = axon preferred, cpu fallback): the
        # default backend is the FIRST entry, so only a leading "cpu"
        # makes this a CPU process (the axon sitecustomize sets
        # "axon,cpu" for every process on this host)
        return plats.split(",")[0].strip() == "cpu"
    try:
        from importlib.metadata import entry_points

        if list(entry_points(group="jax_plugins")):
            return False
        import jax_plugins  # namespace-package registration path

        return not list(getattr(jax_plugins, "__path__", []))
    except ImportError:
        return True
    except Exception:
        return False        # unsure: leave stderr unwrapped


def enable_compilation_cache(path: str = XLA_CACHE_DIR):
    """Persistent XLA compilation cache — first-compile times on TPU are
    minutes (CLAUDE.md); caching makes restarts/resumes near-instant.

    Entries live under a per-host subdirectory keyed by
    :func:`_host_fingerprint` (ISA + CPU identity + jaxlib version), with a
    ``HOST.json`` manifest; stale/legacy entries are pruned, and a dir a
    previous run marked ``POISONED`` (a real ISA mismatch seen by
    :func:`install_aot_loader_guard`) is wiped before use.  Idempotent; set
    ``WUT_COMPILE_CACHE=0`` to disable (e.g. hermetic CI)."""
    import json
    import os
    import shutil

    import jax

    if os.environ.get("WUT_COMPILE_CACHE", "1") == "0":
        return
    try:
        # parse env BEFORE touching jax.config: failing after the cache dir
        # is set would leave the cache enabled while reporting it disabled
        min_secs = float(os.environ.get("WUT_CACHE_MIN_COMPILE_SECS", "5"))
        root = os.path.expanduser(path)
        fp = _host_fingerprint()
        cache_dir = os.path.join(root, fp)
        if os.path.isfile(os.path.join(cache_dir, "POISONED")):
            shutil.rmtree(cache_dir, ignore_errors=True)
        first_time = not os.path.isdir(cache_dir)
        os.makedirs(cache_dir, exist_ok=True)
        manifest = os.path.join(cache_dir, "HOST.json")
        if not os.path.isfile(manifest):
            with open(manifest, "w") as f:
                json.dump({"fingerprint": fp, **_host_basis()}, f, indent=1)
        if first_time:
            _prune_stale_cache(root, keep=fp)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # tests set WUT_CACHE_MIN_COMPILE_SECS=1 so the many ~1-5 s tiny-shape
        # step compiles persist too — warm suite runs load them from disk
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_secs)
        # the mismatch warning only exists on the CPU backend
        if _cpu_platform_expected():
            install_aot_loader_guard(cache_dir)
    except Exception as e:  # cache is an optimization, never fatal
        import sys

        # stderr: bench.py's driver contract is ONE stdout JSON line, and
        # this function runs inside its probes (review finding, round 5)
        print(f"compilation cache disabled: {e}", file=sys.stderr)
