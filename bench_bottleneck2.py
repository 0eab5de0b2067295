"""Bottleneck-fusion round 2: per-shape standalone wins + selective e2e.

bench_bottleneck.py round 1: the worst block (56^2x256) wins standalone
1.48-1.74x, but fusing EVERY identity block makes the full frozen
ResNet-101 forward 2x SLOWER (31.4 vs 17.0 ms) — layer3/4's small spatial
maps (14^2/7^2) run better as batched XLA convs, plus custom-call layout
boundaries.  This pass measures each layer's block shape standalone and the
e2e forward fusing only the layers that win.
"""

import json
import time

import numpy as np


def _time(fn, *args, reps=20):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / reps


def main(B=128):
    import jax
    import jax.numpy as jnp

    from weather_unet_tpu.core.profiling import enable_compilation_cache

    enable_compilation_cache()
    from weather_unet_tpu.kernels.bottleneck_pallas import (
        bottleneck_eval_reference, fold_bottleneck, fused_bottleneck_eval,
        fused_resnet_eval)
    from weather_unet_tpu.models.resnet import Bottleneck, ResNet101

    rng = np.random.default_rng(0)
    results = {}

    # per-layer identity-block shapes of ResNet-101 at 224^2
    shapes = {"layer1": (56, 64), "layer2": (28, 128),
              "layer3": (14, 256), "layer4": (7, 512)}
    for name, (H, P) in shapes.items():
        C = 4 * P
        m = Bottleneck(planes=P, stride=1, downsample=False)
        x = jnp.asarray(rng.standard_normal((B, H, H, C)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        v = m.init(jax.random.key(0), x[:1].astype(jnp.float32), train=False)
        bs = jax.tree.map(
            lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape), a.dtype),
            v["batch_stats"])
        w = [a.astype(jnp.bfloat16) if a.ndim > 1 else a
             for a in fold_bottleneck(v["params"], bs)]
        ref_fn = jax.jit(lambda x, w=w: bottleneck_eval_reference(x, *w))
        fused_fn = jax.jit(lambda x, w=w: fused_bottleneck_eval(x, *w))
        r = _time(ref_fn, x, reps=10)
        f = _time(fused_fn, x, reps=10)
        results[name] = {"xla_ms": round(r * 1e3, 3),
                         "fused_ms": round(f * 1e3, 3),
                         "speedup": round(r / f, 2)}

    # e2e with only the winning layers fused
    win = tuple(i + 1 for i, n in enumerate(shapes)
                if results[n]["speedup"] > 1.05)
    results["fuse_layers"] = list(win)
    net = ResNet101(num_classes=5, dtype=jnp.bfloat16)
    xin = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(np.float32)
                      ).astype(jnp.bfloat16)
    nv = net.init(jax.random.key(1), xin[:1], train=False)
    nbs = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape), a.dtype),
        nv["batch_stats"])
    nv = {"params": nv["params"], "batch_stats": nbs}
    xla_net = jax.jit(lambda x: net.apply(nv, x, train=False))
    sel_net = jax.jit(fused_resnet_eval(nv, fuse_layers=win))
    a = np.asarray(xla_net(xin), np.float32)
    b = np.asarray(sel_net(xin), np.float32)
    results["e2e_parity_mae"] = float(np.abs(a - b).mean())
    results["e2e_xla_ms"] = round(_time(xla_net, xin, reps=10) * 1e3, 2)
    results["e2e_selective_ms"] = round(_time(sel_net, xin, reps=10) * 1e3, 2)
    results["e2e_speedup"] = round(
        results["e2e_xla_ms"] / results["e2e_selective_ms"], 3)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
