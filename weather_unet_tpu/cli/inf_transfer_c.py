"""Class-conditional batch translation CLI.

Rebuild of reference ``inference/inf_transfer_c.py``: translate every test
image to each of the 5 weather classes (one-hot conditions) and save
per-image jpgs named ``{src_class}_{photo}_{dst_class}.jpg``.

TPU-native: all 5 class translations of a batch run as one vmapped jitted
program.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp

from weather_unet_tpu.data.datasets import WEATHER_CLASSES_I2W


def build_parser():
    p = argparse.ArgumentParser(description="one-hot class weather transfer")
    p.add_argument("--gpu", type=str, default="0", help="parity flag; ignored")
    p.add_argument("--image_root", type=str, required=True)
    p.add_argument("--pkl_path", type=str, default=None,
                   help="dataframe pickle (i2w path-list or flickr frame)")
    p.add_argument("--output_dir", type=str, default="results_c")
    p.add_argument("--cp_path", type=str, required=True)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--image_only", action="store_true",
                   help="translate a raw directory of images")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from weather_unet_tpu.cli.common import list_images, load_transfer, save_image
    from weather_unet_tpu.data.datasets import ClassImageDataset, ImagePathDataset
    from weather_unet_tpu.data.pipeline import BatchLoader, device_prefetch
    from weather_unet_tpu.data.transforms import normalize_batch

    os.makedirs(args.output_dir, exist_ok=True)
    classes = WEATHER_CLASSES_I2W
    n_cls = len(classes)
    model, variables = load_transfer(args.cp_path, num_classes=n_cls)

    @jax.jit
    def translate_all(batch):
        def per_class(onehot):
            c = jnp.tile(onehot[None, :], (batch.shape[0], 1))
            return model.apply(variables, batch, c)
        return jax.vmap(per_class)(jnp.eye(n_cls, dtype=batch.dtype))

    if args.image_only or args.pkl_path is None:
        dataset = ImagePathDataset(list_images(args.image_root),
                                   out_size=args.input_size, with_path=True)
        get_name = lambda meta: os.path.splitext(os.path.basename(meta))[0]
        get_src = lambda meta: "img"
    else:
        import pandas as pd

        obj = pd.read_pickle(args.pkl_path)
        if isinstance(obj, dict):  # i2w split pkl: {'train': paths, 'test': paths}
            paths = obj.get("test", next(iter(obj.values())))
        else:
            paths = list(obj)
        dataset = ClassImageDataset(paths, out_size=args.input_size, inf=True)
        get_name = lambda meta: os.path.splitext(os.path.basename(meta))[0]
        get_src = lambda meta: meta.split(os.sep)[-2]

    loader = BatchLoader(dataset, batch_size=args.batch_size, drop_last=False,
                         num_workers=args.num_workers)
    for batch in device_prefetch(loader, device_fields=[0]):
        imgs_u8, metas = batch[0], batch[-1]
        x = normalize_batch(imgs_u8)
        outs = np.asarray(translate_all(x))          # (n_cls, B, H, W, 3)
        for ci, cname in enumerate(classes):
            for bi in range(outs.shape[1]):
                meta = metas[bi]
                name = f"{get_src(meta)}_{get_name(meta)}_{cname}.jpg"
                # per-image min-max like the reference's torchvision
                # save_image(normalize=True) (inf_transfer_c.py:119-121)
                save_image(os.path.join(args.output_dir, name),
                           outs[ci, bi][None], nrow=1)
    print(f"Done: outputs in {args.output_dir}")


if __name__ == "__main__":
    main()
