"""Environment diagnostics: one command answering "is this host set up to
train/serve, and what will it compile against?".

The reference's analogue is reading ``.env`` and hoping
(``sh/train_classifier.sh:3-4``); production TPU fleets need the actual
facts: backend/devices, mesh shape, distributed-contract state, native
runtime health, and which compile caches will hit.

Usage: ``python -m weather_unet_tpu.cli.doctor [--probe] [--json]``
(``wut-doctor``).  ``--probe`` additionally times a tiny device round trip
(dispatch + host read-back — the honest barrier on tunneled devices).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _init_backend(timeout_s: float) -> dict:
    """Initialize the JAX backend under a watchdog.

    ``jax.devices()`` blocks uninterruptibly while a tunneled/remote TPU
    plugin (axon) retries an unreachable backend — precisely the failure a
    diagnostics tool is run to explain.  Init runs on a daemon thread; on
    timeout the host-side report still prints and the tool exits nonzero
    instead of hanging."""
    import threading

    out: dict = {}

    def target():
        try:
            import jax

            out["devices"] = jax.devices()
        except Exception as e:
            out["error"] = repr(e)

    t = threading.Thread(target=target, daemon=True, name="wut-doctor-init")
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        out["timeout"] = timeout_s
    return out


def collect(probe: bool = False, init_timeout: float = 60.0) -> dict:
    import jax

    from weather_unet_tpu import runtime
    from weather_unet_tpu.core.profiling import XLA_CACHE_DIR, _host_fingerprint

    info: dict = {"python": sys.version.split()[0], "jax": jax.__version__}
    try:
        import jaxlib

        info["jaxlib"] = jaxlib.__version__
    except Exception:
        info["jaxlib"] = None

    backend = _init_backend(init_timeout)
    if "devices" not in backend:
        info["backend_ok"] = False
        info["backend_error"] = (
            f"backend init timed out after {init_timeout:.0f}s — remote/"
            f"tunneled TPU unreachable?" if backend.get("timeout")
            else backend.get("error"))
        info["platform"] = os.environ.get("JAX_PLATFORMS", "?")
        _collect_host_side(info, runtime, XLA_CACHE_DIR, _host_fingerprint)
        return info
    info["backend_ok"] = True
    devs = backend["devices"]
    info["platform"] = devs[0].platform
    info["devices"] = [str(d) for d in devs]
    info["device_count"] = len(devs)
    info["process_count"] = jax.process_count()
    info["process_index"] = jax.process_index()

    # default mesh the trainers would build
    from weather_unet_tpu.parallel.mesh import make_mesh

    plan = make_mesh()
    info["default_mesh"] = dict(plan.mesh.shape)

    _collect_host_side(info, runtime, XLA_CACHE_DIR, _host_fingerprint)

    if probe:
        import jax.numpy as jnp

        x = jnp.ones((256, 256), jnp.bfloat16)
        f = jax.jit(lambda a: a @ a)
        t0 = time.perf_counter()
        float(jnp.sum(f(x)))           # compile + first round trip
        info["probe_first_call_s"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        for _ in range(5):
            float(jnp.sum(f(x)))       # dispatch + host read-back
        info["probe_roundtrip_ms"] = round(
            (time.perf_counter() - t0) / 5 * 1e3, 2)
    return info


def _collect_host_side(info: dict, runtime, xla_cache_dir: str,
                       host_fingerprint) -> None:
    """Facts that need no live backend: env contract, native runtime,
    compile caches — still reported when the device is unreachable."""
    info["wut_env"] = {k: v for k, v in os.environ.items()
                       if k.startswith("WUT_")}
    info["native_runtime"] = {
        "available": runtime.native_available(),
        "so_path": getattr(runtime, "_SO", None),
        "so_built": os.path.exists(getattr(runtime, "_SO", "")),
    }
    xla_cache = os.path.join(
        os.path.expanduser(xla_cache_dir), host_fingerprint())
    info["xla_compile_cache"] = {
        "dir": xla_cache,
        "enabled": os.environ.get("WUT_COMPILE_CACHE", "1") != "0",
        "entries": len(os.listdir(xla_cache)) if os.path.isdir(xla_cache) else 0,
    }
    from weather_unet_tpu.core.aot import default_cache_dir
    aot_dir = default_cache_dir()
    info["aot_executable_cache"] = {
        "dir": aot_dir,
        "entries": len([f for f in os.listdir(aot_dir)
                        if f.endswith(".aotexe")])
        if os.path.isdir(aot_dir) else 0,
    }


def report_goldens(as_json: bool = False) -> int:
    """Enumerate the environment-blocked numeric goldens: which pretrained
    checkpoints to drop where, expected sha256s, and which currently-skipped
    tests they activate (``evaluation/goldens.py`` is the registry).  Exit 0
    when every golden is present AND sha-certified, 1 otherwise — so an
    egress-capable host can gate on ``wut-doctor --goldens``."""
    from weather_unet_tpu.evaluation.goldens import golden_status

    status = golden_status()
    if as_json:
        print(json.dumps(status, indent=2))
    else:
        for s in status:
            state = ("CERTIFIED" if s["certified"]
                     else "present, sha MISMATCH" if s["present"] else "MISSING")
            print(f"[{state}] {s['name']}")
            print(f"    file:      {s['path']}  (override: ${s['env_var']})")
            print(f"    sha256:    expect prefix {s['expected_sha256_prefix']}"
                  + (f", got {s['sha256']}" if s["sha256"] else ""))
            print(f"    source:    {s['source_url']}")
            print(f"    activates: {s['activates']}")
            print(f"    {s['note']}")
    return 0 if all(s["certified"] for s in status) else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="weather_unet_tpu environment diagnostics")
    p.add_argument("--probe", action="store_true",
                   help="time a tiny device dispatch + host read-back")
    p.add_argument("--json", action="store_true", help="machine-readable")
    p.add_argument("--goldens", action="store_true",
                   help="report the env-blocked pretrained-weight goldens "
                        "(FID/IS checkpoints): status, expected sha256, "
                        "where to drop the files, which skipped tests they "
                        "activate; exits nonzero until all are certified")
    p.add_argument("--init_timeout", type=float, default=60.0,
                   help="seconds to wait for backend init before reporting "
                        "the device unreachable (tunneled TPUs block "
                        "uninterruptibly when the link is down)")
    args = p.parse_args(argv)
    if args.goldens:
        return report_goldens(as_json=args.json)
    # honor the WUT_* env contract (WUT_CPU_DEVICES / multi-process) BEFORE
    # backend init, exactly like the training CLIs — doctor must diagnose
    # the same runtime they would see
    from weather_unet_tpu.parallel.launch import maybe_initialize

    maybe_initialize()
    info = collect(probe=args.probe, init_timeout=args.init_timeout)
    if args.json:
        print(json.dumps(info, indent=2, default=str))
    else:
        for k, v in info.items():
            print(f"{k:24s} {v}")
    return 0 if info.get("backend_ok", True) else 1


if __name__ == "__main__":
    sys.exit(main())
