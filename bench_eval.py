"""Evaluation-path throughput on TPU: FID/IS InceptionV3 features and the
1-year signal sweep (BASELINE.json config 5).

The reference runs FID feature extraction batched on one GPU
(``eval/fid_score.py:234-266``, batch 50) and the year sweep frame-by-frame
(``inference/inf_1year_signals.py``).  Here both are jitted device loops:

* pool3 feature extraction at the reference's f32 B=50 and the
  TPU-friendly bf16 B=128 (random weights — throughput only; FID *values*
  need the real TF-ported checkpoint, evaluation/fid.py),
* the 1008-way IS logits head shares the trunk, so its cost == features,
* cUNet 224(2) translated frames/s for the hourly year sweep (8760 frames),
  reported with the projected sweep wall time.

Timing discipline (CLAUDE.md): one process, host read-back as the barrier,
batched steps so tunnel RTT jitter amortizes.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from weather_unet_tpu.core.profiling import enable_compilation_cache

enable_compilation_cache()


def bench_inception(batch: int, dtype_name: str, n: int = 20):
    from weather_unet_tpu.evaluation.fid import make_feature_fn

    dt = jnp.float32 if dtype_name == "f32" else jnp.bfloat16
    feature_fn = make_feature_fn(dtype=dt, allow_random=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 299, 299, 3), dtype=np.float32))
    f = feature_fn(x)
    float(jnp.sum(f))  # warm + sync (block_until_ready unreliable over tunnel)
    t0 = time.perf_counter()
    for _ in range(n):
        f = feature_fn(x)
    float(jnp.sum(f))
    dt_s = (time.perf_counter() - t0) / n
    print(f"FID pool3 features {dtype_name} B={batch}: {dt_s * 1e3:.1f} "
          f"ms/batch -> {batch / dt_s:.1f} img/s "
          f"(features {tuple(f.shape)})")
    return batch / dt_s


def bench_year_sweep(batch: int, dtype_name: str, size: int = 224,
                     n: int = 20, hours: int = 365 * 24):
    from weather_unet_tpu.models import ConditionalUNet

    dt = jnp.float32 if dtype_name == "f32" else jnp.bfloat16
    gen = ConditionalUNet(num_classes=5, dtype=dt)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, size, size, 3)), dt)
    sig = jnp.asarray(rng.standard_normal((batch, 5)), dt)
    v = gen.init(jax.random.key(0), x[:1], sig[:1])
    fwd = jax.jit(lambda x, c: gen.apply(v, x, c))
    y = fwd(x, sig)
    float(jnp.sum(y))
    t0 = time.perf_counter()
    for _ in range(n):
        y = fwd(x, sig)
    float(jnp.sum(y))
    dt_s = (time.perf_counter() - t0) / n
    fps = batch / dt_s
    print(f"1-year sweep forward {dtype_name} {size}^2 B={batch}: "
          f"{dt_s * 1e3:.1f} ms/batch -> {fps:.1f} frames/s "
          f"({hours} hourly frames in {hours / fps:.1f} s on-device)")
    return fps


if __name__ == "__main__":
    if "--smoke" in sys.argv:      # CPU correctness pass, tiny batches
        bench_inception(2, "f32", n=2)
        bench_year_sweep(2, "f32", size=64, n=2)
    else:
        bench_inception(50, "f32")     # reference fid_score.py batch default
        bench_inception(128, "bf16")
        bench_year_sweep(64, "bf16")
