"""GIF demo: sweep each weather axis over a directory of photos.

Rebuild of reference ``demo.py:39-92``: for each batch and each
θ ∈ [-π/2, π/2], the condition on one class axis is ``sin(θ)·α`` with the
frozen estimator's predictions on all other axes; frames are tabled into a
forward+reverse looping GIF.

TPU-native: the whole (θ, axis) sweep for a batch is one jitted, vmapped
computation — ``num_frames × num_classes`` cUNet forwards batched into a
single XLA program instead of a Python loop of device round trips.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp


def build_parser():
    p = argparse.ArgumentParser(description="weather transfer GIF demo")
    p.add_argument("--gpu", type=int, default=0, help="accepted for reference parity; ignored (device selection is JAX's)")
    p.add_argument("--input_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="results")
    p.add_argument("--cp_path", type=str, required=True)
    p.add_argument("--estimator_path", type=str, required=True)
    p.add_argument("--input_size", type=int, default=244)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--num_classes", type=int, default=6)
    p.add_argument("--num_frames", type=int, default=10)
    p.add_argument("--alpha", type=int, default=2)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.input_size % 8:
        # the cUNet's three 2x2 max-pools need three even halvings or the
        # decoder's skip-concat widths mismatch.  The reference demo.py
        # ships the same broken default (244 — its torch.cat raises too);
        # fail early with a usable message instead of an opaque shape error
        raise SystemExit(
            f"--input_size {args.input_size} is not divisible by 8, which "
            f"the cUNet encoder/decoder requires (the reference demo's own "
            f"244 default is equally broken) — use e.g. 224 or 256")
    from PIL import Image

    from weather_unet_tpu.cli.common import list_images, load_estimator, load_transfer
    from weather_unet_tpu.data.datasets import ImagePathDataset
    from weather_unet_tpu.data.pipeline import BatchLoader, device_prefetch
    from weather_unet_tpu.data.transforms import normalize_batch
    from weather_unet_tpu.train.metrics import make_grid

    os.makedirs(args.output_dir, exist_ok=True)
    n_cls, nf, scale = args.num_classes, args.num_frames, float(args.alpha)

    model, variables = load_transfer(args.cp_path, num_classes=n_cls)
    est_apply = load_estimator(args.estimator_path, num_classes=n_cls)

    thetas = jnp.asarray(
        np.arange(-np.pi / 2, np.pi / 2 + np.pi / nf, np.pi / (nf - 1)),
        jnp.float32)
    eye = jnp.eye(n_cls, dtype=jnp.float32)

    @jax.jit
    def sweep(batch):
        """(B,H,W,3) -> (n_theta, n_cls, B, H, W, 3) translated frames."""
        pred = est_apply(batch)

        def per_theta(theta):
            def per_axis(axis_onehot):
                c = (jnp.sin(theta) * scale * axis_onehot)[None, :] \
                    + (1.0 - axis_onehot)[None, :] * pred
                return model.apply(variables, batch, c)
            return jax.vmap(per_axis)(eye)

        return jax.vmap(per_theta)(thetas)

    dataset = ImagePathDataset(list_images(args.input_dir), out_size=args.input_size)
    loader = BatchLoader(dataset, batch_size=args.batch_size, drop_last=True,
                         num_workers=args.num_workers)
    for i, (imgs_u8, _) in enumerate(device_prefetch(loader, device_fields=[0])):
        batch = normalize_batch(imgs_u8)
        frames = np.asarray(sweep(batch))                 # (T, C, B, H, W, 3)
        tables = []
        src_col = make_grid(np.asarray(batch), nrow=1)
        for t in range(frames.shape[0]):
            cols = [src_col]
            for a in range(n_cls):
                res = (frames[t, a] + 1.0) * 127.5        # demo.py:80 denorm
                cols.append(make_grid(res, nrow=1))
            tables.append(np.concatenate(cols, axis=1))
        pil = [Image.fromarray((tb * 255).clip(0, 255).astype(np.uint8)).convert("RGB")
               for tb in tables]
        out_path = os.path.join(args.output_dir, f"output{i}.gif")
        pil[0].save(out_path, save_all=True,
                    append_images=pil[1:] + pil[1:-1][::-1],
                    duration=1000 // nf, loop=0)
        print(f"Save gif image: {out_path}")


if __name__ == "__main__":
    main()
