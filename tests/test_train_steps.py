"""Training-step tests: GAN and supervised steps run sharded on the virtual
8-device CPU mesh, losses are finite, params move, spectral state advances."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weather_unet_tpu.core.optim import torch_adam
from weather_unet_tpu.core.state import TrainState
from weather_unet_tpu.models import ResNet
from weather_unet_tpu.parallel.mesh import make_mesh
from weather_unet_tpu.train.gan import GanConfig, build_gan_state, make_gan_step
from weather_unet_tpu.train.supervised import make_classifier_step, make_estimator_step


SIZE = 32  # tiny images for test speed (must be /8 divisible)


class TinyEst:
    """Stand-in frozen estimator: a fixed linear map over pooled pixels."""

    def __init__(self, num_classes=5, seed=0):
        rng = np.random.default_rng(seed)
        self.w = jnp.asarray(rng.standard_normal((3, num_classes)).astype(np.float32))

    def __call__(self, images):
        pooled = jnp.mean(images, axis=(1, 2))
        return pooled @ self.w


@pytest.fixture(scope="module")
def gan_setup():
    cfg = GanConfig(input_size=SIZE, batch_size=8)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))
    est = TinyEst()
    step = make_gan_step(gen, disc, est, cfg)
    return cfg, gen, disc, state, step


def _batch(rng, n=8):
    images = rng.standard_normal((n, SIZE, SIZE, 3)).astype(np.float32)
    rand_images = rng.standard_normal((n, SIZE, SIZE, 3)).astype(np.float32)
    c_d = rng.integers(0, 5, n)
    c_r = rng.integers(0, 5, n)
    return (jnp.asarray(images), jnp.asarray(c_d),
            jnp.asarray(rand_images), jnp.asarray(c_r))


def test_gan_step_runs_and_updates(gan_setup, rng):
    cfg, gen, disc, state, step = gan_setup
    images, c_d, rand_images, c_r = _batch(rng)
    jstep = jax.jit(functools.partial(step, do_g=True))
    new_state, metrics = jstep(state, images, c_d, rand_images, c_r, jax.random.key(1))

    for k in ("d_loss", "g_loss", "g_loss_adv", "g_loss_w", "loss_con", "g_loss_l1"):
        assert np.isfinite(float(metrics[k])), k
    # params moved
    g0 = jax.tree.leaves(state.gen.params)[0]
    g1 = jax.tree.leaves(new_state.gen.params)[0]
    assert not np.allclose(np.asarray(g0), np.asarray(g1))
    d0 = jax.tree.leaves(state.disc.params)[0]
    d1 = jax.tree.leaves(new_state.disc.params)[0]
    assert not np.allclose(np.asarray(d0), np.asarray(d1))
    # spectral u advanced (3 forwards)
    u0 = np.asarray(state.spectral["block1"]["conv1"]["u"])
    u1 = np.asarray(new_state.spectral["block1"]["conv1"]["u"])
    assert not np.allclose(u0, u1)
    assert int(new_state.global_step) == 1


def test_gan_step_d_only(gan_setup, rng):
    cfg, gen, disc, state, step = gan_setup
    images, c_d, rand_images, c_r = _batch(rng)
    jstep = jax.jit(functools.partial(step, do_g=False))
    new_state, metrics = jstep(state, images, c_d, rand_images, c_r, jax.random.key(1))
    assert "g_loss" not in metrics
    g0 = jax.tree.leaves(state.gen.params)[0]
    g1 = jax.tree.leaves(new_state.gen.params)[0]
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_gan_step_sharded_on_mesh(gan_setup, rng):
    """Same step jitted with batch sharded over 8 CPU devices: outputs must
    match the unsharded run (SPMD psum correctness)."""
    cfg, gen, disc, state, step = gan_setup
    assert len(jax.devices()) == 8
    plan = make_mesh()
    images, c_d, rand_images, c_r = _batch(rng)

    jstep = jax.jit(functools.partial(step, do_g=True))
    ref_state, ref_metrics = jstep(state, images, c_d, rand_images, c_r, jax.random.key(2))

    bsh, rsh = plan.batch(), plan.replicated()
    state_s = jax.device_put(state, rsh)
    args_s = [jax.device_put(a, bsh) for a in (images, c_d, rand_images, c_r)]
    sstep = jax.jit(
        functools.partial(step, do_g=True),
        in_shardings=(rsh, bsh, bsh, bsh, bsh, rsh),
        out_shardings=(rsh, rsh),
    )
    sh_state, sh_metrics = sstep(state_s, *args_s, jax.device_put(jax.random.key(2), rsh))

    np.testing.assert_allclose(
        float(ref_metrics["d_loss"]), float(sh_metrics["d_loss"]), rtol=1e-4
    )
    a = np.asarray(jax.tree.leaves(ref_state.gen.params)[0])
    b = np.asarray(jax.tree.leaves(sh_state.gen.params)[0])
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_classifier_step(rng):
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    x = jnp.asarray(rng.standard_normal((8, SIZE, SIZE, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 5, 8))
    variables = model.init(jax.random.key(0), x)
    state = TrainState.create(
        variables["params"], torch_adam(1e-4, weight_decay=1e-4),
        extra=variables["batch_stats"],
    )
    step = jax.jit(make_classifier_step(model))
    new_state, metrics = step(state, x, y)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0
    # BN running stats updated
    m0 = np.asarray(state.extra["bn1"]["mean"])
    m1 = np.asarray(new_state.extra["bn1"]["mean"])
    assert not np.allclose(m0, m1)


def test_estimator_step_per_column_loss(rng):
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    x = jnp.asarray(rng.standard_normal((8, SIZE, SIZE, 3)).astype(np.float32))
    sig = jnp.asarray(rng.standard_normal((8, 5)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    state = TrainState.create(
        variables["params"], torch_adam(1e-4, weight_decay=1e-5),
        extra=variables["batch_stats"],
    )
    step = jax.jit(make_estimator_step(model))
    new_state, metrics = step(state, x, sig)
    assert np.isfinite(float(metrics["loss"]))
    # loss is the SUM of per-column means = 5x the plain MSE
    np.testing.assert_allclose(
        float(metrics["loss"]), 5 * float(metrics["mse"]), rtol=1e-5
    )


def test_torch_adam_matches_torch(rng):
    """Our optax chain vs torch.optim.Adam on identical params/grads."""
    import torch

    w0 = rng.standard_normal((4, 3)).astype(np.float32)
    steps = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(4)]
    lr, wd = 1e-3, 5e-5

    tx = torch_adam(lr, b1=0.0, b2=0.999, weight_decay=wd)
    p = jnp.asarray(w0)
    opt_state = tx.init(p)
    import optax
    for g in steps:
        upd, opt_state = tx.update(jnp.asarray(g), opt_state, p)
        p = optax.apply_updates(p, upd)
    ours = np.asarray(p)

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([wt], lr=lr, betas=(0.0, 0.999), weight_decay=wd)
    for g in steps:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()
    np.testing.assert_allclose(ours, wt.detach().numpy(), atol=1e-6)
