"""Supervised trainer-step throughput on TPU: ResNet-101 classifier and
estimator steps as the real loop dispatches them (normalize-from-uint8 +
per-step key fold + step fused into ONE program, donated state —
``train/loops.py::train_supervised``).

Configs: the reference's f32 batch 16 (``classifier.py:115``/
``estimator.py:170`` train on a single V100 at small batch) and the
TPU-friendly bf16 batch 128 used by the GAN bench.

Timing discipline (CLAUDE.md): one process for all measurements, host
read-back (`float(...)`) as the barrier, steps batched so per-step tunnel
RTT jitter amortizes.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from weather_unet_tpu.core.profiling import enable_compilation_cache
from weather_unet_tpu.core.state import TrainState
from weather_unet_tpu.data.transforms import normalize_batch
from weather_unet_tpu.models import ResNet101
from weather_unet_tpu.train.supervised import (
    make_classifier_step, make_estimator_step,
)

enable_compilation_cache()
SIZE = 224


def run(kind: str, batch: int, dtype_name: str, n: int = 20, size: int = SIZE):
    dt = jnp.float32 if dtype_name == "f32" else jnp.bfloat16
    model = ResNet101(num_classes=5, dtype=dt)
    variables = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3), dt))
    from weather_unet_tpu.core.optim import torch_adam

    state = TrainState.create(variables["params"],
                              torch_adam(1e-4, weight_decay=1e-4),
                              extra=variables["batch_stats"])
    step = (make_classifier_step if kind == "classifier"
            else make_estimator_step)(model)

    def fused(state, x_u8, targets, base_key, stepno):
        k = jax.random.fold_in(base_key, stepno)
        del k  # augmentation is host-side in the real loop; normalize only
        return step(state, normalize_batch(x_u8, out_size=size).astype(dt),
                    targets)

    jstep = jax.jit(fused, donate_argnums=(0,))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8))
    if kind == "classifier":
        t = jnp.asarray(rng.integers(0, 5, batch).astype(np.int32))
    else:
        t = jnp.asarray(rng.standard_normal((batch, 5)).astype(np.float32))
    base_key = jax.random.key(1)
    state, m = jstep(state, x, t, base_key, np.uint32(0))
    float(m["loss"])  # warm + sync (block_until_ready unreliable over tunnel)
    t0 = time.perf_counter()
    for i in range(n):
        state, m = jstep(state, x, t, base_key, np.uint32(1 + i))
    float(m["loss"])
    dt_s = (time.perf_counter() - t0) / n
    print(f"{kind} step {dtype_name} B={batch}: {dt_s * 1e3:.1f} ms/step -> "
          f"{batch / dt_s:.1f} img/s  (loss={float(m['loss']):.3f})")


if __name__ == "__main__":
    if "--smoke" in sys.argv:      # CPU correctness pass, tiny shapes
        run("classifier", 4, "f32", n=2, size=64)
        run("estimator", 4, "f32", n=2, size=64)
    else:
        run("classifier", 16, "f32")
        run("classifier", 128, "bf16")
        run("estimator", 16, "f32")
        run("estimator", 128, "bf16")
