"""Fused eval-mode bottleneck kernel vs XLA — the bounded Pallas experiment
on the supervised/frozen ResNet's named HBM headroom (VERDICT r3 #7).

Measures, on the worst shape (layer1 identity block: 56^2, 256ch, P=64,
B=128, bf16):
  A. the XLA chain (conv1x1+bn+relu -> conv3x3+bn+relu -> conv1x1+bn
     +residual+relu, running-stats BN as XLA sees it in the frozen model)
  B. the fused Pallas kernel (kernels/bottleneck_pallas.py)
and, if B wins standalone, the e2e frozen ResNet-101 eval forward with
layer1/layer2 identity blocks swapped to the kernel.

Timing over the tunnel forces a host read-back per rep (CLAUDE.md:
block_until_ready is not a reliable barrier here).
"""

import json
import time

import numpy as np


def _time(fn, *args, reps=20):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out))            # force full read-back barrier
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp

    from weather_unet_tpu.core.profiling import enable_compilation_cache

    enable_compilation_cache()
    from weather_unet_tpu.kernels.bottleneck_pallas import (
        bottleneck_eval_reference, fold_bottleneck, fused_bottleneck_eval)
    from weather_unet_tpu.models.resnet import Bottleneck

    rng = np.random.default_rng(0)
    results = {"platform": jax.default_backend()}

    B, H, C, P = 128, 56, 256, 64
    m = Bottleneck(planes=P, stride=1, downsample=False)
    x32 = jnp.asarray(rng.standard_normal((B, H, H, C)).astype(np.float32))
    v = m.init(jax.random.key(0), x32[:1], train=False)
    bs = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape), a.dtype),
        v["batch_stats"])
    variables = {"params": v["params"], "batch_stats": bs}

    x = x32.astype(jnp.bfloat16)
    w = [a.astype(jnp.bfloat16) if a.ndim > 1 else a
         for a in fold_bottleneck(v["params"], bs)]

    flax_fn = jax.jit(lambda x: m.apply(variables, x, train=False))
    ref_fn = jax.jit(lambda x: bottleneck_eval_reference(x, *w))
    fused_fn = jax.jit(lambda x: fused_bottleneck_eval(x, *w))

    # parity on device first (bf16 tolerance)
    a = np.asarray(ref_fn(x), np.float32)
    b = np.asarray(fused_fn(x), np.float32)
    results["parity_mae"] = float(np.abs(a - b).mean())

    results["xla_flax_ms"] = round(_time(flax_fn, x) * 1e3, 3)
    results["xla_folded_ms"] = round(_time(ref_fn, x) * 1e3, 3)
    results["fused_pallas_ms"] = round(_time(fused_fn, x) * 1e3, 3)
    results["speedup_vs_flax"] = round(
        results["xla_flax_ms"] / results["fused_pallas_ms"], 2)

    # roofline context: mandatory traffic 2 x B*H*H*C bf16
    bytes_min = 2 * B * H * H * C * 2
    results["min_traffic_ms_819GBs"] = round(bytes_min / 819e9 * 1e3, 3)

    # ---- e2e: full frozen ResNet-101 eval forward (the GAN step's 4x
    # per-step workload and the serving estimator), XLA vs fused-identity
    from weather_unet_tpu.kernels.bottleneck_pallas import fused_resnet_eval
    from weather_unet_tpu.models.resnet import ResNet101

    net = ResNet101(num_classes=5, dtype=jnp.bfloat16)
    xin = jnp.asarray(rng.standard_normal((B, 224, 224, 3)).astype(
        np.float32)).astype(jnp.bfloat16)
    nv = net.init(jax.random.key(1), xin[:1], train=False)
    nbs = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 2.0, a.shape), a.dtype),
        nv["batch_stats"])
    nv = {"params": nv["params"], "batch_stats": nbs}

    xla_net = jax.jit(lambda x: net.apply(nv, x, train=False))
    fused_net = jax.jit(fused_resnet_eval(nv))
    a = np.asarray(xla_net(xin), np.float32)
    b = np.asarray(fused_net(xin), np.float32)
    results["e2e_parity_mae"] = float(np.abs(a - b).mean())
    results["e2e_xla_ms"] = round(_time(xla_net, xin, reps=10) * 1e3, 2)
    results["e2e_fused_ms"] = round(_time(fused_net, xin, reps=10) * 1e3, 2)
    results["e2e_speedup"] = round(
        results["e2e_xla_ms"] / results["e2e_fused_ms"], 3)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
