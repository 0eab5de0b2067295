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


def _smooth_synthetic_batch(rng, batch, size):
    """Smooth gradient+blob images in [-1, 1] (same family as
    examples/synthetic_weather_demo.py) — G can learn color statistics on
    these, unlike white noise."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = np.empty((batch, size, size, 3), np.float32)
    for b in range(batch):
        base = rng.uniform(-0.6, 0.6, 3).astype(np.float32)
        gdir = rng.uniform(-1, 1, (2, 3)).astype(np.float32)
        img = base + yy[..., None] * gdir[0] * 0.5 + xx[..., None] * gdir[1] * 0.5
        for _ in range(3):
            cy, cx = rng.uniform(0.2, 0.8, 2)
            rad = rng.uniform(0.05, 0.25)
            amp = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
            mask = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * rad ** 2)))
            img = img + mask[..., None] * amp
        imgs[b] = np.clip(img, -1, 1)
    return imgs


def test_gan_generator_learns_weather_transfer(rng):
    """Regression guard for the GENERATOR objective wiring (loss_adv +
    loss_con + weather consistency, reference t_est_train.py:214-259).

    Ground truth is exact: a frozen linear readout of mean color stands in
    for the estimator, so weather-transfer success is directly measurable as
    |est(G(x, c)) - c|.  A miswired step assembly that keeps losses finite
    and lets D learn (which ``test_gan_discriminator_learns`` pins) would
    NOT drive this readback down — that failure mode slipped the round-4
    suite, hence this test.  Measured on this task: untrained G reads back
    0.48, trained reaches ~0.20 by step 50; thresholds carry ~25% margin.
    Distilled from examples/synthetic_weather_demo.py (73% gain in 2000
    steps on TPU at size 64)."""
    size, batch = 32, 8
    w = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))

    def est_apply(images):
        return jnp.mean(images, axis=(1, 2)) @ w.astype(images.dtype)

    cfg = GanConfig(input_size=size, batch_size=batch, lr=2e-4)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))
    step = jax.jit(functools.partial(make_gan_step(gen, disc, est_apply, cfg),
                                     do_g=True), donate_argnums=(0,))

    @jax.jit
    def readback(params, images, conds):
        fake = gen.apply({"params": params}, images, conds)
        err = jnp.mean(jnp.abs(est_apply(fake) - conds))
        recon = jnp.mean(jnp.abs(fake - images))
        return err, recon

    data_rng = np.random.default_rng(0)
    eval_imgs = jnp.asarray(_smooth_synthetic_batch(data_rng, batch, size))
    # target conditions come from OTHER images' signals (transfer, not identity)
    eval_conds = est_apply(jnp.asarray(_smooth_synthetic_batch(data_rng, batch, size)))
    base_err = float(jnp.mean(jnp.abs(est_apply(eval_imgs) - eval_conds)))
    err_init, _ = readback(state.gen.params, eval_imgs, eval_conds)
    err_init = float(err_init)

    zeros = jnp.zeros(batch, jnp.int32)
    for i in range(1, 61):
        imgs = jnp.asarray(_smooth_synthetic_batch(data_rng, batch, size))
        rand_imgs = jnp.asarray(_smooth_synthetic_batch(data_rng, batch, size))
        state, metrics = step(state, imgs, zeros, rand_imgs, zeros,
                              jax.random.key(1000 + i))

    err, recon = readback(state.gen.params, eval_imgs, eval_conds)
    err, recon = float(err), float(recon)
    assert np.isfinite(err) and np.isfinite(recon)
    # G steers output weather toward the requested condition...
    assert err < 0.60 * err_init, (
        f"generator did not learn: |est(G(x,c))-c| {err_init:.4f} -> {err:.4f}")
    assert err < 0.45 * base_err, (
        f"no transfer vs untouched input: base {base_err:.4f}, got {err:.4f}")
    # ...without collapsing away from the input (loss_con keeps G near x)
    assert recon < 0.5, f"reconstruction degenerated: L1={recon:.4f}"


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
