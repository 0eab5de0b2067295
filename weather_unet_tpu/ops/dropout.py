"""Bandwidth-lean dropout: 8 random bits per element instead of 32.

``jax.random.bernoulli`` draws a full u32 word per element; at the cUNet
decoder's top level that is a ``u32[128,224,224,128]`` tensor — 3.3 GB of
HBM writes *per mask* before the compare even runs.  The TPU v5e profile of
the GAN combined step (bench_gan_profile.py, docs/PERF.md) shows the mask
pipeline at ~38 ms of a 385 ms step even with the hardware ``rbg``
generator, almost all of it HBM traffic on those u32 words.

``packed_dropout`` draws ``u32[..., C//4]`` and splits each word into four
u8 lanes inside the consumer fusion, so the materialized random tensor is
4× smaller.  A u8 threshold quantizes the keep probability to 1/256 steps
(rate 0.3 → actual keep 179/256 = 0.69922, a 0.11% relative shift); the
inverted-scale uses the *actual* keep probability, so E[output] == input
exactly.  Masks are random numbers with no cross-framework parity
obligation (reference ``nn.Dropout`` in ``cunet.py:28``; the torch-mirror
parity tests run rate=0), so the quantization only perturbs which elements
drop, never the scale calibration.

Channel counts not divisible by 4 fall back to ``jax.random.bernoulli``.

VERDICT (TPU v5e, bench_gan_profile.py, 2026-08-18): REJECTED as the cUNet
default — measured e2e the GAN step got *slower* (448.4 ms/step vs 385.2
with plain ``nn.Dropout`` on rbg keys).  The trace shows why: XLA
materializes the ``u32[..., C//4, 4]`` lane broadcast at FULL size and then
pays two ~10 ms/step layout copies ``{0,2,3,1}→{3,2,1,0}`` on the expanded
u32 tensor — the shift/mask expansion never fuses into the compare, so the
4× traffic saving exists only on paper.  Same lesson as
docs/UPSAMPLE_STUDY.md: minor-dim-narrow intermediates (here C//4 = 32
lanes) invite relayouts that eat the bandwidth win.  Kept as an opt-in
utility with pinned numerics (tests/test_dropout.py); the adopted mask
optimization is the hardware-RNG key impl (core/rng.py).

``bits_dropout`` is the second, successful attempt at the same traffic
saving: ``jax.random.bits(..., uint16)`` makes the generator emit NATIVELY
narrow words — full tensor shape, same layout, half the bytes, no unpack
step for XLA to materialize (the failure mode above).  Standalone on the
hot decoder shape ``bf16[128,224,224,128]`` it masks 2.36× faster than
``bernoulli``'s u32 words (116.6 → 49.4 ms incl. consumer read,
bench_dropout_bits.py; u8 words measured slightly worse at 54.1 ms —
sub-sublane-width loads don't pay off).  A u16 threshold quantizes the
keep probability to 1/65536 steps (rate 0.3 → keep 45875/65536, a 4e-6
relative shift); the inverted scale uses the actual keep, so
E[output] == input exactly.

VERDICT (TPU v5e, bench_gan_profile.py, 2026-08-18): **ADOPTED** as the
cUNet default via :func:`make_dropout` — the 224² bf16 B=128 GAN combined
step measured 369.4 ms/step (346.5 img/s) vs 385.6 ms (331.9 img/s) with
``nn.Dropout`` on the same rbg keys, a 4.4% e2e throughput gain (both
sides 20-step steady state, AOT-cached executables, host read-back
barrier).  ``WUT_DROPOUT=torch`` restores the u32 stream for reproducing
pre-adoption runs.
"""
import os

import jax
import jax.numpy as jnp
from flax import linen as nn


def packed_dropout(key, x, rate: float):
    """Inverted dropout over the last axis using u8 random lanes."""
    if rate <= 0.0:
        return x
    c = x.shape[-1]
    if c % 4 != 0:  # odd channel count: plain 32-bit path
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
    thresh = round((1.0 - rate) * 256.0)
    if not 0 < thresh < 256:  # rate so extreme u8 can't express it
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
    keep_actual = thresh / 256.0
    words = jax.random.bits(key, x.shape[:-1] + (c // 4,), dtype=jnp.uint32)
    shifts = jnp.arange(4, dtype=jnp.uint32) * jnp.uint32(8)
    lanes = (words[..., None] >> shifts) & jnp.uint32(0xFF)   # (..., C//4, 4)
    mask = lanes.reshape(x.shape) < jnp.uint32(thresh)
    scale = jnp.asarray(1.0 / keep_actual, x.dtype)
    return jnp.where(mask, x * scale, jnp.zeros_like(x))


class PackedDropout(nn.Module):
    """Drop-in for ``nn.Dropout`` drawing 8 bits/element (rng name 'dropout')."""

    rate: float
    deterministic: bool = False

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        return packed_dropout(self.make_rng("dropout"), x, self.rate)


def bits_dropout(key, x, rate: float):
    """Inverted dropout from natively narrow u16 random words.

    Half the mask-word HBM traffic of ``jax.random.bernoulli`` with no
    unpack step (module docstring has the measurements).  Falls back to
    ``bernoulli`` when a u16 threshold cannot express the rate.
    """
    if rate <= 0.0:
        return x
    thresh = round((1.0 - rate) * 65536.0)
    if not 0 < thresh < 65536:
        keep = 1.0 - rate
        mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
    mask = jax.random.bits(key, x.shape, dtype=jnp.uint16) < jnp.uint16(thresh)
    scale = jnp.asarray(65536.0 / thresh, x.dtype)
    return jnp.where(mask, x * scale, jnp.zeros_like(x))


class BitsDropout(nn.Module):
    """Drop-in for ``nn.Dropout`` drawing 16 bits/element (rng name 'dropout')."""

    rate: float
    deterministic: bool = False

    @nn.compact
    def __call__(self, x):
        if self.deterministic or self.rate == 0.0:
            return x
        return bits_dropout(self.make_rng("dropout"), x, self.rate)


def make_dropout(rate: float, deterministic: bool) -> nn.Module:
    """The framework-default dropout module, env-overridable.

    ``WUT_DROPOUT`` selects the mask formulation: ``bits16`` (default,
    :class:`BitsDropout`) or ``torch`` (``nn.Dropout``'s u32 bernoulli —
    use to reproduce the RNG stream of runs trained before the bits16
    adoption).  Masks carry no cross-framework parity obligation (module
    docstring), so the default is chosen purely on measured step time.
    """
    impl = os.environ.get("WUT_DROPOUT", "bits16")
    if impl == "torch":
        return nn.Dropout(rate, deterministic=deterministic)
    if impl != "bits16":
        # a typo'd value silently falling through to the default would draw
        # the WRONG mask stream — the reproducibility failure this env var
        # exists to prevent (same policy as core/rng.py's WUT_PRNG_IMPL)
        raise ValueError(
            f"WUT_DROPOUT={impl!r}: expected 'bits16' or 'torch'")
    return BitsDropout(rate, deterministic=deterministic)
