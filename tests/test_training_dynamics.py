"""Training-dynamics sanity checks.

Adversarial losses are not monotone over a few dozen steps (the reference's
``loss_con`` with eps=1e-7 dominates early G updates), so the GAN check
asserts what IS reliable short-horizon: the discriminator learns (hinge loss
falls) and everything stays finite.  The supervised estimator path is
deterministic and must converge on a linearly-solvable synthetic task.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from weather_unet_tpu.core.optim import torch_adam
from weather_unet_tpu.core.state import TrainState
from weather_unet_tpu.models import ResNet
from weather_unet_tpu.train.gan import GanConfig, build_gan_state, make_gan_step
from weather_unet_tpu.train.supervised import make_estimator_step


def test_gan_discriminator_learns(rng):
    size, batch = 32, 8
    cfg = GanConfig(input_size=size, batch_size=batch, lr=2e-4)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))

    w = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))

    def est_apply(images):
        return jnp.mean(images, axis=(1, 2)) @ w

    step = jax.jit(functools.partial(make_gan_step(gen, disc, est_apply, cfg),
                                     do_g=True), donate_argnums=(0,))

    zeros = jnp.zeros(batch, jnp.int32)
    d_losses, g_w = [], []
    for i in range(60):
        r = np.random.default_rng(i)
        images = jnp.asarray(r.standard_normal((batch, size, size, 3)).astype(np.float32))
        rand_images = jnp.asarray(r.standard_normal((batch, size, size, 3)).astype(np.float32))
        state, metrics = step(state, images, zeros, rand_images, zeros,
                              jax.random.key(100 + i))
        d_losses.append(float(metrics["d_loss"]))
        g_w.append(float(metrics["g_loss_w"]))

    assert all(np.isfinite(v) for v in d_losses + g_w)
    # hinge D loss reliably falls from its ~2.0 starting level
    assert np.mean(d_losses[-10:]) < np.mean(d_losses[:10])
    assert int(state.global_step) == 60


def test_estimator_training_converges(rng):
    """Supervised path: signals are a linear readout of mean color — a tiny
    ResNet must fit it; per-column MSE falls monotonically-ish."""
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    size, batch = 32, 16
    variables = model.init(jax.random.key(0), jnp.zeros((1, size, size, 3)))
    state = TrainState.create(
        variables["params"], torch_adam(1e-3), extra=variables["batch_stats"])
    step = jax.jit(make_estimator_step(model), donate_argnums=(0,))

    w = rng.standard_normal((3, 5)).astype(np.float32)
    # overfit one fixed batch — deterministic convergence check
    x = rng.standard_normal((batch, size, size, 3)).astype(np.float32)
    sig = jnp.asarray(x.mean(axis=(1, 2)) @ w)
    xj = jnp.asarray(x)
    losses = []
    for _ in range(50):
        state, metrics = step(state, xj, sig)
        losses.append(float(metrics["mse"]))
    assert losses[-1] < 0.2 * losses[0], f"no convergence: {losses[0]} -> {losses[-1]}"
