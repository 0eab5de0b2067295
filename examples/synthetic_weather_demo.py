"""End-to-end training demonstration on a synthetic weather task.

A controlled stand-in for the flickr pipeline where ground truth is exact:
the frozen "estimator" is a fixed linear readout of mean image color
(signal = W^T mean_color), so weather-transfer success is directly
measurable — after training, the estimator's readback of G(x, c) should hit
the requested c far more closely than the untouched image does, while
staying close to the input (reconstruction).

Runs the REAL training step (hinge GAN + loss_con + weather consistency,
spectral-norm discriminator, torch-Adam) on the available accelerator.

    python examples/synthetic_weather_demo.py --steps 2000 --batch 32
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_batch(rng, batch, size):
    """Smooth random images in [-1, 1]: mixture of color gradients + blobs."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = np.empty((batch, size, size, 3), np.float32)
    for b in range(batch):
        base = rng.uniform(-0.6, 0.6, 3).astype(np.float32)
        gdir = rng.uniform(-1, 1, (2, 3)).astype(np.float32)
        img = base + yy[..., None] * gdir[0] * 0.5 + xx[..., None] * gdir[1] * 0.5
        for _ in range(3):  # soft blobs
            cy, cx = rng.uniform(0.2, 0.8, 2)
            rad = rng.uniform(0.05, 0.25)
            amp = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
            mask = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * rad ** 2)))
            img = img + mask[..., None] * amp
        imgs[b] = np.clip(img, -1, 1)
    return imgs


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--report_every", type=int, default=250)
    p.add_argument("--out", type=str, default=None, help="save sample grid jpg")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from weather_unet_tpu.ops import losses
    from weather_unet_tpu.train.gan import GanConfig, build_gan_state, make_gan_step

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 5)).astype(np.float32))

    def est_apply(images):  # frozen ground-truth weather readout
        return jnp.mean(images, axis=(1, 2)) @ w.astype(images.dtype)

    cfg = GanConfig(input_size=args.size, batch_size=args.batch, lr=args.lr)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))
    step = jax.jit(functools.partial(make_gan_step(gen, disc, est_apply, cfg),
                                     do_g=True), donate_argnums=(0,))

    @jax.jit
    def readback_l1(params, images, conds):
        fake = gen.apply({"params": params}, images, conds)
        err = jnp.mean(jnp.abs(est_apply(fake) - conds))
        recon = losses.l1_loss(fake, images)
        return err, recon

    # fixed eval batch: images + conditions sampled from OTHER images' signals
    eval_imgs = jnp.asarray(synthetic_batch(rng, args.batch, args.size))
    eval_conds = est_apply(jnp.asarray(synthetic_batch(rng, args.batch, args.size)))
    base_err = float(jnp.mean(jnp.abs(est_apply(eval_imgs) - eval_conds)))
    print(f"baseline |est(x) - c| (no transfer): {base_err:.4f}")

    zeros = jnp.zeros(args.batch, jnp.int32)
    t0 = time.perf_counter()
    for i in range(1, args.steps + 1):
        imgs = jnp.asarray(synthetic_batch(rng, args.batch, args.size))
        rand_imgs = jnp.asarray(synthetic_batch(rng, args.batch, args.size))
        state, metrics = step(state, imgs, zeros, rand_imgs, zeros,
                              jax.random.key(1000 + i))
        if i % args.report_every == 0 or i == args.steps:
            err, recon = readback_l1(state.gen.params, eval_imgs, eval_conds)
            rate = i * args.batch / (time.perf_counter() - t0)
            print(f"step {i:5d}: readback|est(G(x,c))-c|={float(err):.4f} "
                  f"recon L1={float(recon):.4f} d_loss={float(metrics['d_loss']):.3f} "
                  f"g_w={float(metrics['g_loss_w']):.4f} ({rate:.0f} img/s)")

    err, recon = readback_l1(state.gen.params, eval_imgs, eval_conds)
    print(f"FINAL: weather-consistency improved {base_err:.4f} -> {float(err):.4f} "
          f"({(1 - float(err)/base_err)*100:.0f}% closer), recon L1 {float(recon):.4f}")

    if args.out:
        from weather_unet_tpu.cli.common import save_image

        fake = gen.apply({"params": state.gen.params}, eval_imgs[:8], eval_conds[:8])
        strip = np.concatenate([np.asarray(eval_imgs[:8]), np.asarray(fake)], axis=2)
        save_image(args.out, strip, nrow=1)
        print(f"sample grid: {args.out}")


if __name__ == "__main__":
    main()
