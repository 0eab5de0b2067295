"""AOT executable cache probe: does deserialize-and-run beat recompiling?

Phase ``save``: compile the flagship serving forward (256^2 B=128 bf16
cUNet), time the compile, and persist the executable through
``core.aot.AotCache``.  Phase ``load``: in a FRESH process, load the same
entry from disk and time deserialize + first dispatch + steady dispatches.

Context (v5e over the axon tunnel): the persistent XLA compile cache does
not serialize TPU executables, so every process pays the full compile.  A
small-program probe measured: deserialize 0.7 s but first dispatch 296-496 s
(vs 1.4 s fresh compile!) — the axon backend defers an expensive load/link
to first execution.  This probe decides whether that cost is ~constant
(then AOT still wins for the multi-minute serving/train compiles) or scales
with program size (then AOT loses on this backend and the cache stays a
CPU/PCIe-host feature).

Usage: python bench_aot.py save && python bench_aot.py load
"""

import json
import sys
import time

import numpy as np

CACHE_DIR = "/tmp/wut_aot_bench"


def build():
    import jax
    import jax.numpy as jnp
    from weather_unet_tpu.models import ConditionalUNet

    batch, size = 128, 256
    model = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, size, size, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    conds = jnp.asarray(
        np.eye(5, dtype=np.float32)[rng.integers(0, 5, batch)]
    ).astype(jnp.bfloat16)
    variables = model.init(jax.random.key(0), images[:1], conds[:1])

    def fwd(params, x, c):
        return model.apply({"params": params}, x, c)

    return fwd, variables["params"], images, conds


def sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x[0, 0, 0]))


def main():
    phase = sys.argv[1] if len(sys.argv) > 1 else "save"
    import jax

    from weather_unet_tpu.core.aot import AotCache

    fwd, params, images, conds = build()
    cache = AotCache(CACHE_DIR)
    t0 = time.perf_counter()
    exe = cache.load_or_compile(fwd, params, images, conds)
    t_get = time.perf_counter() - t0
    t0 = time.perf_counter()
    sync(exe(params, images, conds))
    t_first = time.perf_counter() - t0
    steady = []
    for _ in range(3):
        t0 = time.perf_counter()
        sync(exe(params, images, conds))
        steady.append(time.perf_counter() - t0)
    print(json.dumps({
        "phase": phase,
        "hits": cache.stats["hits"], "misses": cache.stats["misses"],
        "compile_s": round(cache.stats["compile_s"], 1),
        "load_s": round(cache.stats["load_s"], 2),
        "get_s": round(t_get, 1),
        "first_dispatch_s": round(t_first, 1),
        "steady_dispatch_s": [round(s, 3) for s in steady],
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
