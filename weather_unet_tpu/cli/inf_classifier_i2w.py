"""Pseudo-labeling tool: run the weather classifier over a dataset and write
the softmax predictions back as a ``w_condition`` column.

Rebuild of reference ``inference/inf_classifier_i2w.py:43-113`` (supports
flickr dataframe pickles, i2w split pickles, and raw image directories).
Unlike the reference, partial final batches are processed (the reference
hard-exits when ``len(df) % batch_size != 0``).
"""

from __future__ import annotations

import argparse

import numpy as np

from weather_unet_tpu.data.datasets import WEATHER_CLASSES_FLICKR


def build_parser():
    p = argparse.ArgumentParser(description="classifier pseudo-labeling")
    p.add_argument("--gpu", type=str, default="0", help="parity flag; ignored")
    p.add_argument("--image_root", type=str, required=True)
    p.add_argument("--pkl_path", type=str, default=None)
    p.add_argument("--output_pkl", type=str, default=None)
    p.add_argument("--classifier_path", type=str, required=True)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--dataset", type=str, default="flicker",
                   choices=["flicker", "i2w", "raw"])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.dataset == "flicker" and args.pkl_path is None:
        raise SystemExit("--pkl_path is required with --dataset flicker "
                         "(the default); use --dataset i2w/raw for "
                         "pickle-less image trees")
    from weather_unet_tpu.cli.common import list_images, load_estimator
    from weather_unet_tpu.data.datasets import (
        FlickrDataset, ImagePathDataset, SIGNAL_COLUMNS)
    from weather_unet_tpu.data.pipeline import BatchLoader, device_prefetch
    from weather_unet_tpu.data.transforms import normalize_batch

    classify = load_estimator(args.classifier_path, softmax=True)

    if args.dataset == "flicker":
        import pandas as pd

        df = pd.read_pickle(args.pkl_path)
        dataset = FlickrDataset(args.image_root, df, SIGNAL_COLUMNS,
                                out_size=args.input_size)
    else:
        paths = list_images(args.image_root)
        dataset = ImagePathDataset(paths, out_size=args.input_size, with_path=True)

    loader = BatchLoader(dataset, batch_size=args.batch_size, drop_last=False,
                         num_workers=args.num_workers)
    preds, keys = [], []
    for batch in device_prefetch(loader, device_fields=[0]):
        x = normalize_batch(batch[0])
        probs = np.asarray(classify(x))
        preds.append(probs)
        keys.extend(list(batch[-1]))
    probs = np.concatenate(preds, axis=0)
    labels = [WEATHER_CLASSES_FLICKR[i] for i in probs.argmax(axis=1)]

    if args.dataset == "flicker" and args.output_pkl:
        order = {pid: i for i, pid in enumerate(keys)}
        df = df.copy()
        df["w_condition"] = [labels[order[p]] for p in df["photo"]]
        df.to_pickle(args.output_pkl)
        print(f"wrote {args.output_pkl}")
    else:
        for k, lb, p in zip(keys, labels, probs):
            print(f"{k}\t{lb}\t{p.max():.3f}")


if __name__ == "__main__":
    main()
