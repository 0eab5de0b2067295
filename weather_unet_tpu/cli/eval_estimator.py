"""Estimator regression-quality eval — rebuild of ``eval/eval_estimator.py``:
per-signal signed-L1/MSE vs ground truth, de-normalized by train-split sigma,
with optional histogram plots (``eval_estimator.py:133-188``)."""

from __future__ import annotations

import argparse
import os
import pickle


def build_parser():
    p = argparse.ArgumentParser(description="estimator regression quality")
    p.add_argument("--gpu", type=str, default="0", help="parity flag; ignored")
    p.add_argument("--image_root", type=str, required=True)
    p.add_argument("--pkl_path", type=str, required=True)
    p.add_argument("--estimator_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="eval_est_out")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--mode", type=str, default="test")
    p.add_argument("--plot", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np
    import jax.numpy as jnp
    import pandas as pd

    from weather_unet_tpu.cli.common import load_estimator
    from weather_unet_tpu.data.datasets import FlickrDataset, SIGNAL_COLUMNS, zscore_columns
    from weather_unet_tpu.data.pipeline import BatchLoader, device_prefetch
    from weather_unet_tpu.data.transforms import normalize_batch
    from weather_unet_tpu.evaluation.transfer import estimator_errors

    os.makedirs(args.output_dir, exist_ok=True)
    estimate = load_estimator(args.estimator_path)
    df = pd.read_pickle(args.pkl_path)
    stats = df[df["mode"] == "train"] if "mode" in df else df
    df, mean, std = zscore_columns(df, SIGNAL_COLUMNS, stats_df=stats)
    if "mode" in df:
        df = df[df["mode"] == args.mode]
    ds = FlickrDataset(args.image_root, df, SIGNAL_COLUMNS, out_size=args.input_size)
    loader = BatchLoader(ds, batch_size=args.batch_size, drop_last=True,
                         num_workers=args.num_workers)
    batches = ((normalize_batch(jnp.asarray(b[0])), b[1])
               for b in device_prefetch(loader, device_fields=[0, 1]))
    out = estimator_errors(estimate, batches, sigma=np.asarray(std))

    # reference prints SIGNED per-column mean/std + denorms as 'l1'/'l1
    # std' (eval_estimator.py:145-147,157-177: the abs form is commented
    # out there); abs-mean and mse follow as extra info
    for k in ("signed_mean", "signed_mean_denorm", "signed_std",
              "signed_std_denorm", "l1_mean", "l1_mean_denorm", "mse_mean"):
        if k in out:
            vals = ", ".join(f"{c}={v:.4f}" for c, v in zip(SIGNAL_COLUMNS, out[k]))
            print(f"{k}: {vals}")
    with open(os.path.join(args.output_dir, "errors.pkl"), "wb") as f:
        pickle.dump(out, f)

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, len(SIGNAL_COLUMNS), figsize=(20, 3))
        for i, c in enumerate(SIGNAL_COLUMNS):
            axes[i].hist(out["signed_l1"][:, i], bins=50)
            axes[i].set_title(c)
        fig.savefig(os.path.join(args.output_dir, "hist.png"), bbox_inches="tight")
    return out


if __name__ == "__main__":
    main()
