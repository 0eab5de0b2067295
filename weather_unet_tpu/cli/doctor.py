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


def collect(probe: bool = False) -> dict:
    import jax

    from weather_unet_tpu import runtime
    from weather_unet_tpu.core.profiling import XLA_CACHE_DIR, _host_fingerprint

    info: dict = {"python": sys.version.split()[0], "jax": jax.__version__}
    try:
        import jaxlib

        info["jaxlib"] = jaxlib.__version__
    except Exception:
        info["jaxlib"] = None

    devs = jax.devices()
    info["platform"] = devs[0].platform
    info["devices"] = [str(d) for d in devs]
    info["device_count"] = len(devs)
    info["process_count"] = jax.process_count()
    info["process_index"] = jax.process_index()

    # default mesh the trainers would build
    from weather_unet_tpu.parallel.mesh import make_mesh

    plan = make_mesh()
    info["default_mesh"] = dict(plan.mesh.shape)

    # env contract
    info["wut_env"] = {k: v for k, v in os.environ.items()
                       if k.startswith("WUT_")}

    # native runtime
    info["native_runtime"] = {
        "available": runtime.native_available(),
        "so_path": getattr(runtime, "_SO", None),
        "so_built": os.path.exists(getattr(runtime, "_SO", "")),
    }

    # compile caches
    xla_cache = os.path.join(
        os.path.expanduser(XLA_CACHE_DIR), _host_fingerprint())
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


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        description="weather_unet_tpu environment diagnostics")
    p.add_argument("--probe", action="store_true",
                   help="time a tiny device dispatch + host read-back")
    p.add_argument("--json", action="store_true", help="machine-readable")
    args = p.parse_args(argv)
    # honor the WUT_* env contract (WUT_CPU_DEVICES / multi-process) BEFORE
    # backend init, exactly like the training CLIs — doctor must diagnose
    # the same runtime they would see
    from weather_unet_tpu.parallel.launch import maybe_initialize

    maybe_initialize()
    info = collect(probe=args.probe)
    if args.json:
        print(json.dumps(info, indent=2, default=str))
    else:
        for k, v in info.items():
            print(f"{k:24s} {v}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
