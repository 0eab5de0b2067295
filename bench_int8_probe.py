"""Probe: int8 vs bf16 conv throughput on this chip (v5e MXU has 2x int8
peak — 394 vs 197 TOPS).  Decides whether a quantized serving mode is worth
building: if the big decoder convs don't run ~1.5x+ faster in int8, the mode
can't pay for its dequant overhead and accuracy risk.

Shapes from bench_layers.py's survey: the big-K decoder convs dominate the
cUNet forward (84-85% MXU at bf16).

Run: python bench_int8_probe.py   (real TPU)
"""

import json
import time

import numpy as np


def time_conv(x, w, n_iter=30):
    import jax
    import jax.numpy as jnp

    acc = (jnp.int32 if x.dtype == jnp.int8 else jnp.float32)

    @jax.jit
    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc)

    out = f(x, w)
    float(jnp.sum(out[0, 0, 0].astype(jnp.float32)))  # compile + sync
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f(x, w)
    float(jnp.sum(out[0, 0, 0].astype(jnp.float32)))   # honest tunnel barrier
    dt = (time.perf_counter() - t0) / n_iter
    flops = 2 * x.shape[0] * x.shape[1] * x.shape[2] * w.shape[0] * w.shape[1] \
        * w.shape[2] * w.shape[3]
    return dt, flops / dt / 1e12


def main():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    shapes = [
        # (label, B, H, W, Cin, Cout) — cUNet hot convs at B=128 serving
        ("dec_bigK 64x64 768->256", 128, 64, 64, 768, 256),
        ("dec 128x128 384->128", 128, 128, 128, 384, 128),
        ("enc 64x64 256->512", 128, 64, 64, 256, 512),
    ]
    results = {}
    for label, b, h, w_, ci, co in shapes:
        xf = rng.standard_normal((b, h, w_, ci)).astype(np.float32)
        wf = (rng.standard_normal((3, 3, ci, co)) * 0.05).astype(np.float32)
        x_bf, w_bf = jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16)
        dt_bf, tf_bf = time_conv(x_bf, w_bf)
        xi = jnp.asarray(np.clip(xf * 30, -127, 127).astype(np.int8))
        wi = jnp.asarray(np.clip(wf * 600, -127, 127).astype(np.int8))
        dt_i8, tops_i8 = time_conv(xi, wi)
        results[label] = {
            "bf16_ms": round(dt_bf * 1e3, 3), "bf16_tflops": round(tf_bf, 1),
            "int8_ms": round(dt_i8 * 1e3, 3), "int8_tops": round(tops_i8, 1),
            "speedup": round(dt_bf / dt_i8, 2),
        }
        print(json.dumps({label: results[label]}), flush=True)
    print(json.dumps({"summary": {k: v["speedup"] for k, v in results.items()}}))


if __name__ == "__main__":
    main()
