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
