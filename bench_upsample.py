"""A/B the fused Pallas 2x upsample vs the XLA two-einsum form on TPU."""

import json
import time

import numpy as np


def time_fn(fn, x, n=20):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x):
        def body(i, acc):
            y = fn(x * (1 + i.astype(x.dtype) * jnp.asarray(1e-3, x.dtype)))
            return acc + jnp.sum(y.astype(jnp.float32))
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    r = float(run(x))
    t0 = time.perf_counter()
    r = float(run(x))
    dt = (time.perf_counter() - t0) / n
    assert np.isfinite(r)
    return dt


def main():
    import jax.numpy as jnp
    import jax
    from weather_unet_tpu.ops.resize import upsample_bilinear_align_corners
    from weather_unet_tpu.kernels.upsample_pallas import upsample2x_fused

    rng = np.random.default_rng(0)
    B = 128
    for hw, c in ((32, 512), (64, 256), (128, 128)):
        x = jnp.asarray(rng.standard_normal((B, hw, hw, c)).astype(np.float32),
                        jnp.bfloat16)
        gb = (B * hw * hw * c * 5) * 2 / 1e9  # read in + write 4x out
        res = {"shape": f"{hw}x{hw}x{c}"}
        for name, fn in (
                ("xla_matmul", lambda x: upsample_bilinear_align_corners(x)),
                ("pallas_shift", lambda x: upsample2x_fused(x, "shift"))):
            try:
                # fused on-device error check (never materializes f32 copies)
                err = float(jax.jit(lambda x: jnp.max(jnp.abs(
                    upsample_bilinear_align_corners(x).astype(jnp.float32)
                    - fn(x).astype(jnp.float32))))(x))
                dt = time_fn(fn, x)
                res[name] = {"ms": round(dt * 1e3, 3),
                             "gbps": round(gb / dt, 0), "max_err": err}
            except Exception as e:
                res[name] = {"error": str(e)[:300]}
            print(json.dumps({res['shape']: {name: res[name]}}), flush=True)


if __name__ == "__main__":
    main()
