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


def test_upconv_fused_matches_reference(rng):
    """Fused upsample+conv3x3 (kernels/upconv_pallas.py) == XLA
    upsample-then-conv across shapes incl. odd H/W and O<128."""
    from weather_unet_tpu.kernels.upconv_pallas import (
        upsample2x_conv3x3, upsample2x_conv3x3_ref)

    for (B, H, W, C, O) in ((2, 8, 8, 16, 8), (1, 16, 12, 32, 16),
                            (2, 5, 7, 8, 4)):
        x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
        k = jnp.asarray(
            0.1 * rng.standard_normal((3, 3, C, O)).astype(np.float32))
        y = upsample2x_conv3x3(x, k, interpret=True)
        ref = upsample2x_conv3x3_ref(x, k)
        assert y.shape == (B, 2 * H, 2 * W, O)
        scale = float(jnp.abs(ref).max())
        assert float(jnp.abs(y - ref).max()) < 1e-5 * max(scale, 1.0)


def test_upconv_fused_grad_matches(rng):
    """The custom VJP (XLA recompute) matches reference gradients."""
    from weather_unet_tpu.kernels.upconv_pallas import (
        upconv_fused, upsample2x_conv3x3_ref)

    x = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
    k = jnp.asarray(0.1 * rng.standard_normal((3, 3, 8, 4)).astype(np.float32))
    f1 = lambda x, k: jnp.sum(jnp.sin(upconv_fused(x, k, True)))
    f2 = lambda x, k: jnp.sum(jnp.sin(upsample2x_conv3x3_ref(x, k)))
    g1x, g1k = jax.grad(f1, argnums=(0, 1))(x, k)
    g2x, g2k = jax.grad(f2, argnums=(0, 1))(x, k)
    assert float(jnp.abs(g1x - g2x).max()) < 2e-5
    assert float(jnp.abs(g1k - g2k).max()) < 2e-5


def test_cunet_fuse_upconv_matches(rng):
    """ConditionalUNet(fuse_upconv=True) == baseline in eval mode, same
    param tree, and train=True falls back to the XLA formulation."""
    from weather_unet_tpu.models import ConditionalUNet

    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    c = jnp.asarray(np.eye(5, dtype=np.float32)[[1, 3]])
    m0 = ConditionalUNet(num_classes=5)
    m1 = ConditionalUNet(num_classes=5, fuse_upconv=True)
    v = m0.init(jax.random.key(0), x[:1], c[:1])
    assert jax.tree.structure(v) == jax.tree.structure(
        m1.init(jax.random.key(0), x[:1], c[:1]))
    y0 = m0.apply(v, x, c)
    y1 = m1.apply(v, x, c)
    assert float(jnp.abs(y0 - y1).max()) < 1e-5

    # train-mode forward keeps the XLA path (dropout sits between
    # upsample and conv there): identical to the baseline train forward
    yt0 = m0.apply(v, x, c, train=True, rngs={"dropout": jax.random.key(7)})
    yt1 = m1.apply(v, x, c, train=True, rngs={"dropout": jax.random.key(7)})
    assert float(jnp.abs(yt0 - yt1).max()) == 0.0


def test_upconv_block_fused_matches_reference(rng):
    """Fully-fused decoder block (modulate + upsample + conv + skip-add +
    relu in one kernel) == the XLA chain, incl. gradients via the VJP."""
    from weather_unet_tpu.kernels.upconv_pallas import (
        upconv_block_fused, upconv_block_ref)

    B, H, W, C, O = 2, 8, 12, 16, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    k = jnp.asarray(0.1 * rng.standard_normal((3, 3, C, O)).astype(np.float32))
    cb = jnp.asarray(
        0.1 * rng.standard_normal((B, 2 * H, 2 * W, O)).astype(np.float32))
    sc = jnp.asarray(rng.uniform(0.5, 2.0, (B, C)).astype(np.float32))
    sh = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32))
    y = upconv_block_fused(x, k, cb, sc, sh, True, True)
    ref = upconv_block_ref(x, k, cb, sc, sh, relu=True)
    assert float(jnp.abs(y - ref).max()) < 1e-5
    assert float(jnp.min(y)) >= 0.0   # relu really applied

    f1 = lambda x, k: jnp.sum(jnp.sin(upconv_block_fused(x, k, cb, sc, sh,
                                                         True, True)))
    f2 = lambda x, k: jnp.sum(jnp.sin(upconv_block_ref(x, k, cb, sc, sh)))
    g1x, g1k = jax.grad(f1, argnums=(0, 1))(x, k)
    g2x, g2k = jax.grad(f2, argnums=(0, 1))(x, k)
    # kernel grads are O(100): compare relative
    assert float(jnp.abs(g1x - g2x).max()) < 2e-5 * max(
        1.0, float(jnp.abs(g2x).max()))
    assert float(jnp.abs(g1k - g2k).max()) < 2e-5 * max(
        1.0, float(jnp.abs(g2k).max()))


def test_adain_scale_shift_matches_adain(rng):
    from weather_unet_tpu.ops.norm import adain, adain_scale_shift

    x = jnp.asarray(rng.standard_normal((3, 8, 8, 16)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32))
    sc, sh = adain_scale_shift(x, y)
    out = (x.astype(jnp.float32) * sc[:, None, None, :]
           + sh[:, None, None, :]).astype(x.dtype)
    assert float(jnp.abs(out - adain(x, y)).max()) < 1e-5


def test_fused_bottleneck_matches_flax_eval(rng):
    """Fused eval-mode bottleneck kernel == flax Bottleneck (running stats):
    BN folding + the 9-tap in-VMEM 3x3 + residual/relu epilogue, on
    non-trivial random stats (kernels/bottleneck_pallas.py)."""
    from weather_unet_tpu.kernels.bottleneck_pallas import (
        bottleneck_eval_reference, fold_bottleneck, fused_bottleneck_eval)
    from weather_unet_tpu.models.resnet import Bottleneck

    m = Bottleneck(planes=16, stride=1, downsample=False)
    x = jnp.asarray(rng.standard_normal((2, 14, 14, 64)).astype(np.float32))
    v = m.init(jax.random.key(0), x, train=False)
    bs = jax.tree.map(
        lambda a: jnp.asarray(
            np.random.default_rng(1).uniform(0.5, 2.0, a.shape), a.dtype),
        v["batch_stats"])
    want = m.apply({"params": v["params"], "batch_stats": bs}, x, train=False)
    w = fold_bottleneck(v["params"], bs)
    ref = bottleneck_eval_reference(x, *w)
    fused = fused_bottleneck_eval(x, *w, interpret=True)
    assert float(jnp.abs(want - ref).max()) < 1e-5
    assert float(jnp.abs(ref - fused).max()) < 1e-5


def test_fused_resnet_eval_full_forward_parity(rng):
    """fused_resnet_eval == ResNet.apply(train=False) on a whole tiny net:
    pins the stem/downsample/stride wiring, fuse_layers selection, fc head
    dtype semantics, AND the fused identity-block path (interpret mode) —
    not just the single-block kernel."""
    from weather_unet_tpu.kernels.bottleneck_pallas import fused_resnet_eval
    from weather_unet_tpu.models import ResNet

    counts = (2, 1, 1, 1)               # layer1 has one fused identity block
    model = ResNet(block_counts=counts, num_classes=7)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    v = model.init(jax.random.key(0), x[:1], train=False)
    # non-trivial running stats so BN folding is actually exercised
    v = dict(v, batch_stats=jax.tree.map(
        lambda a: jnp.asarray(
            np.random.default_rng(1).uniform(0.5, 2.0, a.shape), a.dtype),
        v["batch_stats"]))
    want = np.asarray(model.apply(v, x, train=False))

    got = fused_resnet_eval(v, block_counts=counts, fuse_layers=(1,),
                            interpret=True)(x)
    assert got.dtype == jnp.float32 and got.shape == (2, 7)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    # pure folded-XLA composition (no pallas) must also match
    got_xla = fused_resnet_eval(v, block_counts=counts, fuse_layers=())(x)
    np.testing.assert_allclose(np.asarray(got_xla), want, atol=2e-4)
