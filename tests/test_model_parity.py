"""End-to-end model parity vs the torch functional mirrors (identical weights).

Validates the ≤1e-3 pixel-MAE north star (BASELINE.json) far more tightly:
f32 forward agreement at ~1e-5.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weather_unet_tpu.models import ConditionalUNet, SNDisc, ResNet
from weather_unet_tpu.compat import torch_io
from tests import torch_mirror


@pytest.fixture(scope="module")
def cunet_setup():
    model = ConditionalUNet(num_classes=5)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    c = rng.standard_normal((2, 5)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(c))
    return model, variables, x, c


def test_cunet_forward_matches_torch(cunet_setup):
    model, variables, x, c = cunet_setup
    ours = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(c)))
    sd = torch_io.cunet_to_torch(variables)
    theirs = torch_mirror.cunet_forward(x, c, sd)
    assert ours.shape == theirs.shape == (2, 64, 64, 3)
    mae = np.mean(np.abs(ours - theirs))
    assert mae < 1e-5, f"pixel MAE {mae}"
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_cunet_torch_roundtrip(cunet_setup):
    model, variables, x, c = cunet_setup
    sd = torch_io.cunet_to_torch(variables)
    variables2 = torch_io.cunet_from_torch(sd)
    a = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(c)))
    b = np.asarray(model.apply(variables2, jnp.asarray(x), jnp.asarray(c)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_cunet_dropout_train_mode(cunet_setup):
    model, variables, x, c = cunet_setup
    y1 = model.apply(variables, jnp.asarray(x), jnp.asarray(c), train=True,
                     rngs={"dropout": jax.random.key(1)})
    y2 = model.apply(variables, jnp.asarray(x), jnp.asarray(c), train=True,
                     rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


@pytest.fixture(scope="module")
def disc_setup():
    model = SNDisc(num_classes=5)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    c = rng.standard_normal((2, 5)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(c))
    return model, variables, x, c


def test_sndisc_eval_forward_matches_torch(disc_setup):
    model, variables, x, c = disc_setup
    (out, feats) = model.apply(variables, jnp.asarray(x), jnp.asarray(c))
    sd = torch_io.sndisc_to_torch(variables)
    t_out, t_feats, _ = torch_mirror.sndisc_forward(x, c, sd, update=False)
    np.testing.assert_allclose(np.asarray(out), t_out, atol=2e-4)
    assert len(feats) == 4
    for f, tf in zip(feats, t_feats):
        np.testing.assert_allclose(np.asarray(f), tf, atol=1e-4)


def test_sndisc_train_forward_updates_u_like_torch(disc_setup):
    model, variables, x, c = disc_setup
    (out, _), mutated = model.apply(
        variables, jnp.asarray(x), jnp.asarray(c), update_stats=True,
        mutable=["spectral"],
    )
    sd = torch_io.sndisc_to_torch(variables)
    t_out, _, new_us = torch_mirror.sndisc_forward(x, c, sd, update=True)
    np.testing.assert_allclose(np.asarray(out), t_out, atol=2e-4)
    # u vectors advanced identically
    s = mutated["spectral"]
    np.testing.assert_allclose(
        np.asarray(s["block1"]["conv1"]["u"]), new_us["conv1.0"].numpy(), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s["linear"]["u"]), new_us["l"].numpy(), atol=1e-5
    )
    # and differ from the originals
    assert not np.allclose(
        np.asarray(s["block1"]["conv1"]["u"]),
        np.asarray(variables["spectral"]["block1"]["conv1"]["u"]),
    )


def test_sndisc_torch_roundtrip(disc_setup):
    model, variables, x, c = disc_setup
    sd = torch_io.sndisc_to_torch(variables)
    variables2 = torch_io.sndisc_from_torch(sd)
    a, _ = model.apply(variables, jnp.asarray(x), jnp.asarray(c))
    b, _ = model.apply(variables2, jnp.asarray(x), jnp.asarray(c))
    # global sum-pool amplifies magnitudes to ~1e2; transpose roundtrip changes
    # f32 summation order -> relative 1e-7-level drift only.
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-4)


def test_resnet_small_matches_torch():
    # ResNet-50-shaped but tiny depth for test speed; same block semantics.
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    sd = torch_io.resnet_to_torch(variables, block_counts=(1, 1, 1, 1))
    theirs = torch_mirror.resnet_forward(x, sd, block_counts=(1, 1, 1, 1))
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


def test_resnet_torch_roundtrip():
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x))
    sd = torch_io.resnet_to_torch(variables, block_counts=(1, 1, 1, 1))
    variables2 = torch_io.resnet_from_torch(sd, block_counts=(1, 1, 1, 1))
    a = np.asarray(model.apply(variables, jnp.asarray(x)))
    b = np.asarray(model.apply(variables2, jnp.asarray(x)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_resnet101_full_depth_smoke():
    """The real 101-layer config initializes, runs, and round-trips its
    torchvision-format state dict (23 bottlenecks in layer3 etc.)."""
    from weather_unet_tpu.models import ResNet101

    model = ResNet101(num_classes=5)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x)
    p = variables["params"]
    assert "layer3_22" in p and "layer4_2" in p and "layer3_23" not in p
    out = model.apply(variables, x)
    assert out.shape == (1, 5)
    sd = torch_io.resnet_to_torch(variables)
    assert "layer3.22.conv3.weight" in sd
    assert sd["fc.weight"].shape == (5, 2048)
    back = torch_io.resnet_from_torch(sd)
    out2 = model.apply(back, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-6)
