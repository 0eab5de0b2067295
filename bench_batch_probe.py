"""Probe: does serving throughput still plateau at B=128?  The round-1
plateau was measured before the split-concat decoder; re-check the headline
batch size at B in {128, 192, 256} (one process, chained iterations, honest
host-readback barrier)."""

import json
import time

import numpy as np


def run(batch, size=256, n_iter=12):
    import jax
    import jax.numpy as jnp
    from weather_unet_tpu.models import ConditionalUNet

    model = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.standard_normal((batch, size, size, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    conds = jnp.asarray(
        np.eye(5, dtype=np.float32)[rng.integers(0, 5, batch)]
    ).astype(jnp.bfloat16)
    variables = model.init(jax.random.key(0), images[:1], conds[:1])

    @jax.jit
    def translate(params, x, c):
        return model.apply({"params": params}, x, c)

    params = variables["params"]
    out = translate(params, images, conds)
    float(jnp.sum(out[0, 0, 0].astype(jnp.float32)))
    t0 = time.perf_counter()
    out = images
    for _ in range(n_iter):
        out = translate(params, out, conds)
    float(jnp.sum(out[0, 0, 0].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    print(json.dumps({"batch": batch, "img_per_sec": round(n_iter * batch / dt, 1)}),
          flush=True)


if __name__ == "__main__":
    for b in (128, 192, 256):
        run(b)
