"""AOT executable cache: compiled XLA programs serialized to disk.

The persistent XLA compile cache does not serialize TPU executables on this
backend — every process pays the full compile (measured ~25 min for a 224^2
GAN step variant over the tunnel, and minutes for the serving forward).  This
module closes that gap with ``jax.experimental.serialize_executable``: the
first process compiles and writes the loaded executable to disk; subsequent
processes deserialize in seconds and never invoke the compiler.

No analogue exists in the reference (its CUDA kernels ship precompiled in
PyTorch wheels; ``Pipfile:10-11``) — this is the TPU-native equivalent of
that "binaries, not JIT, at startup" property.

Correctness model: a cache entry is keyed by the SHA-256 of the lowered
StableHLO text plus a backend fingerprint (platform, device kind, device
count, jax/jaxlib versions).  The lowering hash covers shapes, dtypes,
shardings, donation and the exact program, so any change — including model
architecture or a jax upgrade — misses cleanly.  Weights must be ARGUMENTS of
the cached function (not closure captures): captured arrays are baked into
the program as constants, which would both bloat the blob and key the cache
to one checkpoint.  Deserialization failures (driver/topology change, stale
format) fall back to a fresh compile and overwrite the entry.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import tempfile
import time
from typing import Any, Callable, Optional

import jax


def default_cache_dir() -> str:
    """The one default on-disk location for serialized executables.

    Shared by the trainer CLIs, benches and ``wut-doctor`` so entries
    written through any surface are visible to all of them (a hardcoded
    path in one caller would silently split the cache on hosts where
    ``$HOME`` differs)."""
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "weather_unet_tpu_aot")


def _backend_fingerprint() -> str:
    dev = jax.devices()[0]
    parts = [
        jax.__version__,
        getattr(jax, "_src").lib.version_str
        if hasattr(getattr(jax, "_src", None), "lib") else "",
        dev.platform,
        getattr(dev, "device_kind", "?"),
        str(jax.device_count()),
    ]
    if dev.platform == "cpu":
        # XLA:CPU executables bake in host machine features; a container
        # migrating CPU types must miss cleanly instead of tripping the
        # load-validate-delete fallback on every stale entry
        from weather_unet_tpu.core.profiling import _host_fingerprint

        parts.append(_host_fingerprint())
    return "|".join(parts)


class AotCache:
    """Disk cache of serialized XLA executables.

    >>> cache = AotCache("/var/cache/wut_aot")
    >>> fwd = cache.load_or_compile(step_fn, params, batch)   # compile once
    >>> out = fwd(params, batch)            # later processes: load, no compile

    ``load_or_compile`` returns a callable with the same signature as ``fn``
    (pytree args supported).  ``stats`` records hits/misses/timings for
    observability.
    """

    def __init__(self, cache_dir: str):
        self.dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        self.stats = {"hits": 0, "misses": 0, "load_s": 0.0, "compile_s": 0.0,
                      "fallbacks": 0}

    # -- key --------------------------------------------------------------

    def _key(self, lowered) -> str:
        h = hashlib.sha256()
        h.update(_backend_fingerprint().encode())
        h.update(lowered.as_text().encode())
        return h.hexdigest()[:32]

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, f"{key}.aotexe")

    # -- main entry -------------------------------------------------------

    def load_or_compile(self, fn: Callable, *args: Any,
                        jit_kwargs: Optional[dict] = None) -> Callable:
        """Return an executable for ``fn`` specialized to ``args``.

        ``args`` are example inputs (shapes/dtypes matter, values don't).
        ``jit_kwargs`` are forwarded to ``jax.jit`` (shardings, donation,
        static_argnums...).  The returned callable accepts the same tree
        structure as ``args``.
        """
        jitted = jax.jit(fn, **(jit_kwargs or {}))
        lowered = jitted.lower(*args)
        key = self._key(lowered)
        path = self._path(key)
        exe = self._try_load(path, lowered)
        if exe is not None:
            if self._validate(exe, args):
                self.stats["hits"] += 1
                return exe
            # deserialized but broken on this host (e.g. XLA:CPU AOT loader
            # machine-feature mismatch): drop the entry and recompile
            self.stats["fallbacks"] += 1
            try:
                os.unlink(path)
            except OSError:
                pass
        self.stats["misses"] += 1
        t0 = time.perf_counter()
        compiled = self._compile_fresh(lowered)
        self.stats["compile_s"] += time.perf_counter() - t0
        self._try_save(path, compiled)
        return compiled

    @staticmethod
    def _compile_fresh(lowered):
        """Compile bypassing the persistent XLA compilation cache: an
        executable the persistent cache rehydrated (an XLA:CPU "AOT result")
        re-serializes into a blob whose functions fail to resolve at load
        ("Function ... not found") — only a from-scratch compile serializes
        soundly.  (On the TPU backend the persistent cache never stores
        executables, so this is a no-op there.)

        Disabling the flag alone is NOT enough: ``is_cache_used`` memoizes
        its decision once per process, so after any earlier cached compile
        the flag flip is ignored and ``lowered.compile()`` silently
        rehydrates an AOT result anyway (observed: the supervised-step
        entry loaded from a warm persistent cache, then failed validation
        after the serialize round-trip).  ``reset_cache()`` drops that memo
        so the disable takes effect; the second reset lets later compiles
        re-initialize the cache lazily under the restored flag."""
        from jax.experimental.compilation_cache import compilation_cache as cc

        prev = jax.config.jax_enable_compilation_cache
        try:
            jax.config.update("jax_enable_compilation_cache", False)
            cc.reset_cache()
            return lowered.compile()
        finally:
            jax.config.update("jax_enable_compilation_cache", prev)
            cc.reset_cache()

    @staticmethod
    def _validate(exe, args) -> bool:
        """Execute the loaded executable once on zero-filled buffers (fresh
        allocations, so donation can't consume a caller's arrays) and force
        completion — deserialization failures on this backend surface at
        execution, not at load."""
        import jax.numpy as jnp

        try:
            dummies = jax.tree.map(jnp.zeros_like, args)
            jax.block_until_ready(exe(*dummies))
            return True
        except Exception:
            return False

    # -- serialization ----------------------------------------------------

    def _try_load(self, path: str, lowered) -> Optional[Callable]:
        if not os.path.exists(path):
            return None
        from jax.experimental import serialize_executable as se

        t0 = time.perf_counter()
        try:
            with open(path, "rb") as f:
                entry = pickle.load(f)
            # in/out treedefs are reconstructed from the (cheap) lowering
            # rather than pickled: arg pytrees like the train state carry
            # unpicklable static aux data (optax transforms hold closures)
            in_tree = jax.tree_util.tree_flatten(lowered.args_info)[1]
            # reload onto the executable's own device assignment —
            # deserialize_and_load defaults to ALL backend devices, which
            # breaks single-device executables on multi-device hosts
            by_id = {d.id: d for d in jax.devices()}
            devs = [by_id[i] for i in entry["device_ids"]]
            exe = se.deserialize_and_load(entry["blob"], in_tree,
                                          lowered.out_tree,
                                          execution_devices=devs)
        except Exception:
            # stale format / different driver / partial write: recompile
            self.stats["fallbacks"] += 1
            try:
                os.unlink(path)
            except OSError:
                pass
            return None
        self.stats["load_s"] += time.perf_counter() - t0
        return exe

    def _try_save(self, path: str, compiled) -> bool:
        from jax.experimental import serialize_executable as se

        try:
            ids = [d.id for d in
                   compiled._executable.xla_executable.local_devices()]
            blob, _, _ = se.serialize(compiled)   # treedefs NOT persisted
            payload = pickle.dumps({"blob": blob, "device_ids": ids})
        except Exception:
            self.stats["fallbacks"] += 1
            return False   # backend without serialization support
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            os.replace(tmp, path)   # atomic: readers never see partials
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            return False
        return True


class AotJit:
    """Drop-in for ``jax.jit`` that persists one executable per input shape
    through an :class:`AotCache` (``jax.jit`` caches per shape in memory;
    this adds the across-process disk tier).

    Mirrors the small part of the jit-wrapper surface the codebase relies on
    (``_cache_size``) so serving code can swap between the two.
    """

    def __init__(self, fn: Callable, cache: AotCache,
                 jit_kwargs: Optional[dict] = None):
        self._fn = fn
        self._cache = cache
        self._jit_kwargs = jit_kwargs
        self._exes: dict = {}
        # id -> (container, fragment): identity-keyed memo for container
        # args.  Serving passes the SAME variables dict on every dispatch
        # (api.BoundFn); walking its hundreds of param leaves per request
        # group is pure waste.  Only dicts are memoized (arrays are new
        # objects each call, and trainer states are fresh structs each step
        # — their per-call leaf walk measured ~0.4 ms on a ~600-leaf GAN
        # state with the dtype-name memo, noise against a ~400 ms step).
        # The strong container ref
        # pins the id; bounded FIFO eviction below keeps a caller cycling
        # through many distinct dicts from growing the memo without bound.
        # Assumes bound containers are not mutated in place (they never are
        # here: weights change only by constructing a new WeatherTransfer).
        self._frag: dict = {}
        self._frag_max = 64

    _dtype_names: dict = {}   # dtype object -> str, shared across instances

    @classmethod
    def _leaf_key(cls, tree) -> tuple:
        # str(dtype) dominates the walk (measured ~5 ms/call on a 600-leaf
        # GAN state without the memo, ~1 ms with it); dtype objects are
        # few and hashable, so their names are memoized class-wide
        names = cls._dtype_names
        out = []
        for l in jax.tree_util.tree_leaves(tree):
            d = getattr(l, "dtype", None)
            if d is None:
                out.append(((), type(l).__name__))
                continue
            n = names.get(d)
            if n is None:
                n = names[d] = str(d)
            out.append((tuple(l.shape), n))
        return tuple(out)

    def _shape_key(self, args) -> tuple:
        frags = []
        for a in args:
            if isinstance(a, dict):
                ent = self._frag.get(id(a))
                if ent is None or ent[0] is not a:
                    ent = (a, self._leaf_key(a))
                    if len(self._frag) >= self._frag_max:
                        # FIFO: dicts old enough to rotate out of 64 slots
                        # are not the steady-state bound container
                        self._frag.pop(next(iter(self._frag)))
                    self._frag[id(a)] = ent
                frags.append(ent[1])
            else:
                frags.append(self._leaf_key(a))
        return tuple(frags)

    def __call__(self, *args):
        key = self._shape_key(args)
        exe = self._exes.get(key)
        if exe is None:
            exe = self._cache.load_or_compile(self._fn, *args,
                                              jit_kwargs=self._jit_kwargs)
            self._exes[key] = exe
        return exe(*args)

    def _cache_size(self) -> int:
        return len(self._exes)


class BoundFn:
    """Bind leading arguments (typically model variables) to a jitted or
    :class:`AotJit` function while keeping the ``_cache_size`` surface both
    expose (serving code and tests introspect compiled-bucket counts)."""

    def __init__(self, fn: Callable, *bound: Any):
        self._fn = fn
        self._bound = bound

    def __call__(self, *args):
        return self._fn(*self._bound, *args)

    def _cache_size(self) -> int:
        return self._fn._cache_size()
