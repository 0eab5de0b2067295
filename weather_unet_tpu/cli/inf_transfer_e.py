"""Soft-signal cross-product translation CLI.

Rebuild of reference ``inference/inf_transfer_e.py``: for each test batch,
every sample's estimated/true signal vector is broadcast as the condition for
the whole batch (batch x batch cross product), z-scoring against the stats of
the full dataset pickle (``inf_transfer_e.py:66-75``).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax
import jax.numpy as jnp


def build_parser():
    p = argparse.ArgumentParser(description="soft-signal weather transfer")
    p.add_argument("--gpu", type=str, default="0", help="parity flag; ignored")
    p.add_argument("--image_root", type=str, required=True)
    p.add_argument("--pkl_path", type=str, required=True)
    p.add_argument("--stats_pkl", type=str, default=None,
                   help="dataframe to z-score the signal columns AGAINST "
                        "(the reference normalizes the test pickle with a "
                        "separate without-outlier frame's mean/std — "
                        "inf_transfer_e.py:66-75; omitting this self-scores "
                        "the --pkl_path frame, which shifts conditions vs a "
                        "reference-trained checkpoint)")
    p.add_argument("--output_dir", type=str, default="results_e")
    p.add_argument("--cp_path", type=str, required=True)
    p.add_argument("--estimator_path", type=str, default=None,
                   help="when set, conditions come from the estimator instead of the dataframe")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--mode", type=str, default="test", choices=["train", "val", "test"])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from weather_unet_tpu.cli.common import (
        load_estimator, load_flickr_frame, load_transfer, save_image)
    from weather_unet_tpu.data.datasets import FlickrDataset, SIGNAL_COLUMNS
    from weather_unet_tpu.data.pipeline import BatchLoader, device_prefetch
    from weather_unet_tpu.data.transforms import normalize_batch

    os.makedirs(args.output_dir, exist_ok=True)
    model, variables = load_transfer(args.cp_path)
    est_apply = (load_estimator(args.estimator_path)
                 if args.estimator_path else None)

    df, mean, std = load_flickr_frame(args.pkl_path, stats_pkl=args.stats_pkl)
    if "mode" in df:
        df = df[df["mode"] == args.mode]
    dataset = FlickrDataset(args.image_root, df, SIGNAL_COLUMNS,
                            out_size=args.input_size)

    @jax.jit
    def cross_translate(batch, conds):
        """Each sample's condition applied to the whole batch:
        (B, H, W, 3) x (B, C) -> (B_cond, B_img, H, W, 3)."""
        def per_cond(c):
            cc = jnp.tile(c[None, :], (batch.shape[0], 1))
            return model.apply(variables, batch, cc)
        return jax.vmap(per_cond)(conds)

    loader = BatchLoader(dataset, batch_size=args.batch_size, drop_last=True,
                         num_workers=args.num_workers)
    for imgs_u8, conds, pids in device_prefetch(loader, device_fields=[0, 1]):
        x = normalize_batch(imgs_u8)
        c = est_apply(x) if est_apply is not None else jnp.asarray(conds)
        outs = np.asarray(cross_translate(x, c))
        for ci in range(outs.shape[0]):
            for bi in range(outs.shape[1]):
                name = f"{pids[bi]}_cond-{pids[ci]}.jpg"
                # torchvision save_image(normalize=True) per-image min-max,
                # like the reference (inf_transfer_e.py:141) — NOT the
                # fixed-range tanh denorm (which differs whenever the output
                # doesn't span [-1,1], skewing downstream FID/eval numbers)
                save_image(os.path.join(args.output_dir, name),
                           outs[ci, bi][None], nrow=1)
    print(f"Done: outputs in {args.output_dir}")


if __name__ == "__main__":
    main()
