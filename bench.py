"""Headline benchmark: translated images/sec/chip, 256x256 cUNet transfer.

Runs the flagship conditional-UNet weather-transfer forward (the demo.py /
inf_transfer_c.py serving path) on the available accelerator and prints ONE
JSON line with throughput and p50 per-image latency.

Baseline: the reference publishes no numbers (BASELINE.md).  ``vs_baseline``
is therefore measured against a documented engineering estimate of the
PyTorch-1.1/V100 fp32 reference: the cUNet forward is ~84.5 GFLOPs/image at
256^2; at a realistic 30-40% conv utilization of a V100's 15.7 TFLOP/s fp32
that is ~60 images/sec.  BASELINE.json's target is >=5x that (>=300 img/s).

The estimate is anchored by a measurement: the same forward through the
pixel-parity torch mirror on this host's CPU (eager fp32, 1 thread) runs at
0.95 img/s = ~80 GFLOP/s effective; scaling by the V100/core peak ratio and
30-40% cuDNN utilization lands on 47-63 img/s — see BASELINE.md 'Measured
reference anchor'.

Serving config: bfloat16 compute (MXU native).  The f32 parity path is
covered by tests; measured bf16-vs-f32 output drift on v5e is 9.4e-4 MAE on
the [-1, 1] scale (0.12/255 pixel, p99 0.44/255) — within the <=1e-3 pixel
MAE target even in bf16.
"""

import json
import os
import time

import numpy as np

REFERENCE_IMG_PER_SEC = 60.0  # documented estimate, see module docstring


def main():
    import jax
    import jax.numpy as jnp
    from weather_unet_tpu.models import ConditionalUNet

    batch, size = 128, 256
    model = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    # bf16 inputs: chaining output->input below must keep one compiled shape/dtype
    images = jnp.asarray(
        rng.standard_normal((batch, size, size, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    conds = jnp.asarray(
        np.eye(5, dtype=np.float32)[rng.integers(0, 5, batch)]
    ).astype(jnp.bfloat16)
    variables = model.init(jax.random.key(0), images[:1], conds[:1])

    def fwd(params, x, c):
        return model.apply({"params": params}, x, c)

    params = variables["params"]

    # AOT tier: the persistent XLA cache doesn't serialize executables on
    # this TPU backend, so a fresh bench process pays the ~60 s compile every
    # time; the serialized-executable cache (core/aot.py) cuts repeat runs to
    # a ~0.4 s deserialize (the tunnel's per-process program-load remains).
    # Any cache problem falls back to a plain jit.
    try:
        from weather_unet_tpu.core.aot import AotCache, AotJit

        cache_dir = os.path.join(
            os.path.expanduser("~"), ".cache", "weather_unet_tpu_aot")
        translate = AotJit(fwd, AotCache(cache_dir))
    except Exception:
        translate = jax.jit(fwd)

    def sync(x):
        # On the axon tunnel block_until_ready can return before remote
        # execution finishes; a host read-back is the only honest barrier.
        return float(jnp.sum(x[0, 0, 0]))

    # warmup + compile
    sync(translate(params, images, conds))

    # throughput: repeated batched translation, chained so iterations can't
    # be skipped, with a host read-back barrier at the end
    n_iter = 20
    t0 = time.perf_counter()
    out = images
    for _ in range(n_iter):
        out = translate(params, out, conds)
    sync(out)
    dt = time.perf_counter() - t0
    img_per_sec = n_iter * batch / dt

    # p50 per-image latency: batch-1 round trips (includes host sync)
    one_img, one_c = images[:1], conds[:1]
    sync(translate(params, one_img, one_c))
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        sync(translate(params, one_img, one_c))
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1e3)

    print(json.dumps({
        "metric": "translated images/sec/chip, 256x256 cUNet transfer (bf16)",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 3),
        "p50_latency_ms": round(p50_ms, 3),
        "batch": batch,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
