"""Measure dropout-mask bandwidth: u32 bernoulli vs native u16/u8 rng words.

The GAN-step profile (docs/PERF.md) shows the dropout-mask pipeline at
~38 ms of a 385 ms step even on hardware `rbg` keys, bound by writing and
re-reading the materialized ``u32`` random words (``jax.random.bernoulli``
draws a full 32-bit word per element).  ``jax.random.bits(..., uint16/uint8)``
on the rbg impl lowers to a SINGLE ``rng_bit_generator`` with a natively
narrow output — no unpack, no lane broadcast (the failure mode that killed
the packed-u32 variant, see ops/dropout.py) — so the words tensor shrinks
2×/4× if the TPU backend honors the narrow type.

This probe times, on the hot decoder shape ``bf16[128,224,224,128]``:
  - bernoulli: mask via jax.random.bernoulli (u32 words)      [baseline]
  - bits16:    mask via random.bits uint16 < round(keep*2^16)
  - bits8:     mask via random.bits uint8  < round(keep*2^8)
Each applied as inverted dropout and reduced to a scalar (host read-back is
the timing barrier — CLAUDE.md tunnel rules).  One process, all variants.
"""
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from weather_unet_tpu.core.rng import train_key

    shape = (128, 224, 224, 128)
    rate = 0.3
    keep = 1.0 - rate

    def bern(key, x):
        m = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(m, x / keep, jnp.zeros_like(x))

    def bits(key, x, dtype, nbits):
        t = round(keep * (1 << nbits))
        ka = t / (1 << nbits)
        m = jax.random.bits(key, x.shape, dtype=dtype) < dtype(t)
        return jnp.where(m, x * jnp.asarray(1.0 / ka, x.dtype),
                         jnp.zeros_like(x))

    variants = {
        "bernoulli_u32": bern,
        "bits16": lambda k, x: bits(k, x, jnp.uint16, 16),
        "bits8": lambda k, x: bits(k, x, jnp.uint8, 8),
    }

    x = jnp.ones(shape, jnp.bfloat16)
    x.block_until_ready()
    results = {}
    for name, fn in variants.items():
        # fold_in per call like the trainer; sum to scalar for the barrier
        f = jax.jit(lambda k, x, fn=fn: jnp.sum(
            fn(k, x).astype(jnp.float32)))
        k = train_key(0)
        float(f(k, x))  # compile + warm
        n = 30
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(n):
            acc += float(f(jax.random.fold_in(k, i), x))
        dt = (time.perf_counter() - t0) / n * 1e3
        results[name] = dt
        # sanity: E[out] == E[x] (inverted scaling with the ACTUAL keep)
        mean = acc / n / np.prod(shape)
        print(f"{name:14s} {dt:7.2f} ms/mask   mean={mean:.4f} (expect ~1.0)",
              flush=True)
    base = results["bernoulli_u32"]
    for name, dt in results.items():
        print(f"{name:14s} {base / dt:5.2f}x vs bernoulli")


if __name__ == "__main__":
    main()
