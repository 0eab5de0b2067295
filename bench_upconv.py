"""Fused upsample+conv kernel vs XLA upsample-then-conv on the real TPU.

Measures the three cUNet decoder (upsample -> conv1-x-part) pairs standalone
(B=128 bf16, 256^2 config) and the full forward with/without
``ConditionalUNet(fuse_upconv=True)``.  One JSON line per case.

Timing follows bench_layers.py: n iterations chained inside one jit with an
input perturbation (no CSE) and a reduce carry; the final float() host read
is the only honest barrier over the axon tunnel (CLAUDE.md).
"""

import json
import time

import numpy as np


def time_fn(fn, args, n=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(i, acc):
            scale = 1 + i.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
            y = fn(a[0] * scale, *a[1:])
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(run(*args))  # compile + warm
    t0 = time.perf_counter()
    r = float(run(*args))
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(r)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from weather_unet_tpu.kernels.upconv_pallas import (
        upsample2x_conv3x3, upsample2x_conv3x3_ref)
    from weather_unet_tpu.models import ConditionalUNet

    rng = np.random.default_rng(0)
    B = 128
    blocks = [  # (H, C_up, O) — cUNet 256^2 decoder conv1 x-parts
        ("up3", 32, 512, 256),
        ("up2", 64, 256, 128),
        ("up1", 128, 128, 64),
    ]
    for name, H, C, O in blocks:
        x = jnp.asarray(
            rng.standard_normal((B, H, H, C)).astype(np.float32), jnp.bfloat16)
        k = jnp.asarray(
            0.05 * rng.standard_normal((3, 3, C, O)).astype(np.float32),
            jnp.bfloat16)
        flops = 2 * B * (2 * H) ** 2 * 9 * C * O
        for impl, fn in (("xla", upsample2x_conv3x3_ref),
                         ("fused", upsample2x_conv3x3)):
            try:
                dt = time_fn(fn, (x, k))
                err = None
                tf = flops / dt / 1e12
            except Exception as e:  # Mosaic/compile failures: record & go on
                dt, tf, err = None, None, f"{type(e).__name__}: {e}"[:300]
            print(json.dumps({"case": f"{name}/{impl}", "ms": dt and dt * 1e3,
                              "tflops": tf, "err": err}), flush=True)

    # full forward
    x = jnp.asarray(
        rng.uniform(-1, 1, (B, 256, 256, 3)).astype(np.float32), jnp.bfloat16)
    c = jnp.asarray(np.eye(5, dtype=np.float32)[rng.integers(0, 5, B)],
                    jnp.bfloat16)
    m0 = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16)
    v = m0.init(jax.random.key(0), x[:1], c[:1])
    for flag in (False, True):
        m = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16,
                            fuse_upconv=flag)
        try:
            dt = time_fn(lambda xx, cc: m.apply(v, xx, cc), (x, c))
            print(json.dumps({"case": f"forward/fuse={flag}",
                              "ms": dt * 1e3,
                              "img_per_sec": B / dt, "err": None}), flush=True)
        except Exception as e:
            print(json.dumps({"case": f"forward/fuse={flag}", "ms": None,
                              "err": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)

    # numerics on-device: fused vs XLA full forward
    try:
        y0 = m0.apply(v, x, c)
        y1 = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16,
                             fuse_upconv=True).apply(v, x, c)
        mae = float(jnp.mean(jnp.abs(
            y0.astype(jnp.float32) - y1.astype(jnp.float32))))
        print(json.dumps({"case": "forward/bf16_mae", "mae": mae}), flush=True)
    except Exception as e:
        print(json.dumps({"case": "forward/bf16_mae",
                          "err": f"{type(e).__name__}: {e}"[:300]}), flush=True)


if __name__ == "__main__":
    main()
