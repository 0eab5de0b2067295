"""Pallas kernel parity tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from weather_unet_tpu.kernels.adain_pallas import adain_fused
from weather_unet_tpu.ops.norm import adain


def test_adain_fused_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 32)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((3, 128)).astype(np.float32))
    ref = adain(x, y)
    out = adain_fused(x, y, 1e-5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


def test_adain_fused_gradients_match(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))

    def loss_ref(x, y):
        return jnp.sum(jnp.sin(adain(x, y)))

    def loss_fused(x, y):
        return jnp.sum(jnp.sin(adain_fused(x, y, 1e-5, True)))

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, y)
    gf = jax.grad(loss_fused, argnums=(0, 1))(x, y)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(gr[1]), atol=1e-4)


def test_cunet_pallas_flag_matches(rng):
    from weather_unet_tpu.models import ConditionalUNet

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((2, 5)).astype(np.float32))
    m1 = ConditionalUNet(num_classes=5)
    v = m1.init(jax.random.key(0), x, c)
    # interpret-mode pallas path (monkeypatch the flag through bind)
    import weather_unet_tpu.kernels.adain_pallas as ap

    orig = ap.adain_fused
    try:
        ap_called = []

        def spy(xx, yy, eps=1e-5, interpret=False):
            ap_called.append(True)
            return orig(xx, yy, eps, True)

        ap.adain_fused = spy
        m2 = ConditionalUNet(num_classes=5, use_pallas=True)
        out2 = m2.apply(v, x, c)
    finally:
        ap.adain_fused = orig
    out1 = m1.apply(v, x, c)
    assert ap_called
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=1e-5)


def test_upsample_pallas_variants_match_xla(rng):
    """All Pallas upsample formulations (kept for the adopt/reject study,
    docs/UPSAMPLE_STUDY.md) are exact vs the XLA matmul path in interpret
    mode, including odd sizes and the tiny-H fallback bound."""
    import jax.numpy as jnp
    from weather_unet_tpu.kernels.upsample_pallas import upsample2x_fused
    from weather_unet_tpu.ops.resize import upsample_bilinear_align_corners

    for (h, c) in ((32, 16), (17, 8), (4, 8)):
        x = jnp.asarray(rng.standard_normal((2, h, h, c)).astype(np.float32))
        ref = upsample_bilinear_align_corners(x)
        for variant in ("einsum", "loop", "blend", "blendmm", "shift"):
            got = upsample2x_fused(x, variant, True)
            assert float(jnp.abs(ref - got).max()) < 2e-6, (h, c, variant)


def test_upsample_shift_xla_and_grad(rng):
    """upsample_x2_shift (XLA shifted-slice form) and the fused kernel's
    custom VJP both match the matmul path."""
    import jax
    import jax.numpy as jnp
    from weather_unet_tpu.kernels.upsample_pallas import upsample2x_fused
    from weather_unet_tpu.ops.resize import (
        upsample_bilinear_align_corners, upsample_x2_shift)

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
    ref = upsample_bilinear_align_corners(x)
    assert float(jnp.abs(upsample_x2_shift(x) - ref).max()) < 2e-6

    g1 = jax.grad(lambda x: jnp.sum(jnp.sin(
        upsample2x_fused(x, "shift", True))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.sin(
        upsample_bilinear_align_corners(x))))(x)
    assert float(jnp.abs(g1 - g2).max()) < 2e-5
