"""Full combined GAN train-step parity vs a differentiable torch mirror.

The strongest training-semantics test: identical weights, batches and no
dropout; one combined D+G update in both frameworks must produce matching
updated parameters, spectral-norm state, and losses — covering hinge losses,
loss_con, grad flow through the frozen estimator, spectral-norm update
order/count, update ordering (G sees the updated D), and torch-Adam with
coupled weight decay.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from weather_unet_tpu.compat import torch_io
from weather_unet_tpu.train.gan import GanConfig, build_gan_state, make_gan_step
from tests import torch_mirror


def assert_updated_params_close(a, b, lr, steps=1, name=""):
    """Updated-parameter comparison tolerant to Adam's sign amplification:
    with beta1=0 the update is ~±lr·sign(g); where g is numerically ~0 the
    two frameworks may step in opposite directions (±2·lr·steps) on isolated
    elements.  Require: bulk agreement at 5e-5 and no element beyond the
    sign-flip bound."""
    diff = np.abs(np.asarray(a) - np.asarray(b))
    frac_loose = float((diff > 5e-5).mean())
    assert frac_loose < 5e-3, f"{name}: {frac_loose:.4%} elements loose"
    assert diff.max() <= 2.2 * lr * steps + 1e-6, f"{name}: max {diff.max()}"


def test_combined_gan_step_matches_torch(rng):
    size, batch = 16, 2
    cfg = GanConfig(input_size=size, batch_size=batch, dropout_rate=0.0)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))

    est_w = rng.standard_normal((3, 5)).astype(np.float32)

    def est_apply(images):  # NHWC mean-pool linear head
        return jnp.mean(images, axis=(1, 2)) @ jnp.asarray(est_w)

    step = jax.jit(functools.partial(make_gan_step(gen, disc, est_apply, cfg),
                                     do_g=True))

    images = rng.standard_normal((batch, size, size, 3)).astype(np.float32)
    rand_images = rng.standard_normal((batch, size, size, 3)).astype(np.float32)
    zeros = jnp.zeros(batch, jnp.int32)
    new_state, metrics = step(state, jnp.asarray(images), zeros,
                              jnp.asarray(rand_images), zeros, jax.random.key(1))

    gen_sd = torch_io.cunet_to_torch({"params": state.gen.params})
    disc_sd = torch_io.sndisc_to_torch(
        {"params": state.disc.params, "spectral": state.spectral})
    t_gen, t_disc, t_us, t_metrics = torch_mirror.torch_gan_step(
        gen_sd, disc_sd, images, rand_images, est_w, lr=cfg.lr)

    # losses agree
    for k in ("d_loss", "g_loss", "g_loss_adv", "g_loss_w", "loss_con"):
        np.testing.assert_allclose(float(metrics[k]), t_metrics[k], rtol=2e-4,
                                   err_msg=k)

    # updated generator params agree (spot-check every block)
    new_gen_sd = torch_io.cunet_to_torch({"params": new_state.gen.params})
    for k in ("dconv_down1.0.weight", "dconv_down4.2.weight",
              "adain3.l1.weight", "dconv_up1.2.bias", "conv_last.weight"):
        assert_updated_params_close(new_gen_sd[k], t_gen[k], cfg.lr, name=k)

    # updated discriminator params + spectral u agree
    new_disc_sd = torch_io.sndisc_to_torch(
        {"params": new_state.disc.params, "spectral": new_state.spectral})
    for k in ("conv1.0.weight_orig", "conv4.1.weight_orig", "l.weight_orig",
              "embed.weight_orig", "conv2.0.bias"):
        assert_updated_params_close(new_disc_sd[k], t_disc[k], cfg.lr, name=k)
    for k in ("conv1.0", "conv4.1", "l", "embed"):
        np.testing.assert_allclose(new_disc_sd[f"{k}.weight_u"], t_us[k],
                                   atol=1e-4, err_msg=f"u:{k}")


def test_multi_step_gan_stays_in_sync(rng):
    """Three consecutive combined steps against a PERSISTENT torch mirror
    (params + Adam moments + u buffers carried across steps): per-step losses
    and final parameters must stay at float-noise drift."""
    size, batch = 16, 2
    cfg = GanConfig(input_size=size, batch_size=batch, dropout_rate=0.0)
    gen, disc, state = build_gan_state(cfg, jax.random.key(3))
    est_w = rng.standard_normal((3, 5)).astype(np.float32)

    def est_apply(images):
        return jnp.mean(images, axis=(1, 2)) @ jnp.asarray(est_w)

    step = jax.jit(functools.partial(make_gan_step(gen, disc, est_apply, cfg),
                                     do_g=True))

    sim = torch_mirror.TorchGanSim(
        torch_io.cunet_to_torch({"params": state.gen.params}),
        torch_io.sndisc_to_torch(
            {"params": state.disc.params, "spectral": state.spectral}),
        est_w, lr=cfg.lr)

    zeros = jnp.zeros(batch, jnp.int32)
    for i in range(3):
        images = rng.standard_normal((batch, size, size, 3)).astype(np.float32)
        rand_images = rng.standard_normal((batch, size, size, 3)).astype(np.float32)
        state, metrics = step(state, jnp.asarray(images), zeros,
                              jnp.asarray(rand_images), zeros, jax.random.key(i))
        t_metrics = sim.step(images, rand_images)
        np.testing.assert_allclose(float(metrics["d_loss"]), t_metrics["d_loss"],
                                   rtol=5e-4, err_msg=f"d_loss step {i}")
        np.testing.assert_allclose(float(metrics["g_loss"]), t_metrics["g_loss"],
                                   rtol=5e-4, err_msg=f"g_loss step {i}")

    t_gen, t_disc, t_us = sim.export()
    new_gen_sd = torch_io.cunet_to_torch({"params": state.gen.params})
    assert_updated_params_close(new_gen_sd["conv_last.weight"],
                                t_gen["conv_last.weight"], cfg.lr, steps=3,
                                name="conv_last.weight")
    new_disc_sd = torch_io.sndisc_to_torch(
        {"params": state.disc.params, "spectral": state.spectral})
    assert_updated_params_close(new_disc_sd["l.weight_orig"],
                                t_disc["l.weight_orig"], cfg.lr, steps=3,
                                name="l.weight_orig")
    np.testing.assert_allclose(new_disc_sd["conv1.0.weight_u"], t_us["conv1.0"],
                               atol=5e-4)
