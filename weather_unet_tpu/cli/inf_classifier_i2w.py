"""Pseudo-labeling tool: run the weather classifier over a dataset and write
the softmax predictions back as a ``w_condition`` column.

Rebuild of reference ``inference/inf_classifier_i2w.py:43-113``: ``flicker``
mode labels a dataframe pickle, ``i2w`` mode labels the split pickle's test
paths (reference ``--image_i2w``: ``df['test']`` through ClassImageLoader,
i2w class names), ``raw`` mode globs a flat directory (reference
``--image_only``).  Deviations: partial final batches are processed (the
reference hard-exits when ``len(df) % batch_size != 0``), and all modes use
the canonical flickr/i2w class orders from ``data/datasets.py`` — the
reference's pseudo-labeler hardcodes ``['Clear','Clouds','Rain','Snow',
'Mist']`` (``inf_classifier_i2w.py:63``), swapping Snow/Mist relative to
the order its own classifiers are trained with (``dataset.py``), which
would mislabel those two classes.
"""

from __future__ import annotations

import argparse

import numpy as np

from weather_unet_tpu.data.datasets import (WEATHER_CLASSES_FLICKR,
                                            WEATHER_CLASSES_I2W)


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
    if args.dataset in ("flicker", "i2w") and args.pkl_path is None:
        raise SystemExit(f"--pkl_path is required with --dataset "
                         f"{args.dataset} (flicker: dataframe pickle; i2w: "
                         f"train/test split pickle); use --dataset raw for "
                         f"a pickle-less image directory")
    from weather_unet_tpu.cli.common import list_images, load_estimator
    from weather_unet_tpu.data.datasets import (
        FlickrDataset, ImagePathDataset, SIGNAL_COLUMNS)
    from weather_unet_tpu.data.pipeline import BatchLoader, device_prefetch
    from weather_unet_tpu.data.transforms import normalize_batch

    classify = load_estimator(args.classifier_path, softmax=True)

    class_names = WEATHER_CLASSES_FLICKR
    if args.dataset == "flicker":
        import pandas as pd

        df = pd.read_pickle(args.pkl_path)
        dataset = FlickrDataset(args.image_root, df, SIGNAL_COLUMNS,
                                out_size=args.input_size)
    elif args.dataset == "i2w":
        # reference --image_i2w: the split pickle's TEST paths, i2w names
        # (inf_classifier_i2w.py:70-78)
        import pickle

        with open(args.pkl_path, "rb") as f:
            split = pickle.load(f)
        class_names = WEATHER_CLASSES_I2W
        dataset = ImagePathDataset(split["test"], out_size=args.input_size,
                                   with_path=True)
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
    labels = [class_names[i] for i in probs.argmax(axis=1)]

    if args.dataset == "flicker" and args.output_pkl:
        # keys -> row mapping; an unreadable photo makes FlickrDataset
        # substitute a neighboring sample (bounded skip-on-corrupt), so its
        # own id never appears in keys — label those rows None with a
        # warning instead of crashing after the whole inference pass
        order = {pid: i for i, pid in enumerate(keys)}
        df = df.copy()
        missing = [p for p in df["photo"] if p not in order]
        df["w_condition"] = [labels[order[p]] if p in order else None
                             for p in df["photo"]]
        if missing:
            print(f"warning: {len(missing)} photo(s) had no prediction "
                  f"(unreadable image substituted during loading) — "
                  f"w_condition left None: {missing[:10]}"
                  + (" ..." if len(missing) > 10 else ""), flush=True)
        df.to_pickle(args.output_pkl)
        print(f"wrote {args.output_pkl}")
    elif args.output_pkl:
        # path modes: a paths -> label table (reference writes
        # check_result.pkl with a w_condition column)
        import pandas as pd

        pd.DataFrame({"paths": keys, "w_condition": labels}).to_pickle(
            args.output_pkl)
        print(f"wrote {args.output_pkl}")
    else:
        for k, lb, p in zip(keys, labels, probs):
            print(f"{k}\t{lb}\t{p.max():.3f}")


if __name__ == "__main__":
    main()
