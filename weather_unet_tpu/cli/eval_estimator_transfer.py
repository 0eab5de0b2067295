"""Signal-transfer consistency eval — rebuild of
``eval/eval_estimator_transfer.py``: for each reference sample, translate
the WHOLE batch to that sample's signals (bs x bs cross-conditioning,
``eval_estimator_transfer.py:48-61``) and report the estimator's per-column
SIGNED readback error (mean + std over the per-reference rows), z-scored
and de-normalized by the train-split sigma — the reference's printed
``l1``/``l1 std`` (``:129-138``)."""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="estimator-transfer consistency")
    p.add_argument("--gpu", type=str, default="0", help="parity flag; ignored")
    p.add_argument("--image_root", type=str, required=True)
    p.add_argument("--pkl_path", type=str, required=True)
    p.add_argument("--stats_pkl", type=str, default=None)
    p.add_argument("--cp_path", type=str, required=True)
    p.add_argument("--estimator_path", type=str, required=True)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--mode", type=str, default="test")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np
    import jax.numpy as jnp

    from weather_unet_tpu.cli.common import (
        load_estimator, load_flickr_frame, load_transfer)
    from weather_unet_tpu.data.datasets import FlickrDataset, SIGNAL_COLUMNS
    from weather_unet_tpu.data.pipeline import BatchLoader, device_prefetch
    from weather_unet_tpu.data.transforms import normalize_batch
    from weather_unet_tpu.evaluation.transfer import estimator_transfer_consistency

    model, variables = load_transfer(args.cp_path)
    estimate = load_estimator(args.estimator_path)
    df, mean, std = load_flickr_frame(args.pkl_path, stats_pkl=args.stats_pkl)
    if "mode" in df:
        df = df[df["mode"] == args.mode]
    ds = FlickrDataset(args.image_root, df, SIGNAL_COLUMNS,
                       out_size=args.input_size)
    loader = BatchLoader(ds, batch_size=args.batch_size, drop_last=True,
                         num_workers=args.num_workers)
    batches = ((normalize_batch(jnp.asarray(b[0])), jnp.asarray(b[1]))
               for b in device_prefetch(loader, device_fields=[0, 1]))
    out = estimator_transfer_consistency(
        model, variables, estimate, batches, sigma=np.asarray(std))
    # the reference prints the SIGNED mean/std and their denorms as
    # 'l1'/'l1 std' (eval_estimator_transfer.py:129-138); abs stats follow
    # as extra info
    for k in ("signed_mean", "signed_mean_denorm", "signed_std",
              "signed_std_denorm", "l1_mean", "l1_mean_denorm"):
        if k in out:
            vals = ", ".join(f"{c}={v:.4f}" for c, v in zip(SIGNAL_COLUMNS, out[k]))
            print(f"{k}: {vals}")
    return out


if __name__ == "__main__":
    main()
