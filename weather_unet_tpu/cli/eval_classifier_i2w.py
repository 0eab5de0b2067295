"""Classifier accuracy eval — rebuild of ``eval/eval_classifier_i2w.py``:
classification report + confusion matrix on the i2w test split; optionally
copies misclassified images as ``{true}-true_{file}_{pred}-pred.jpg``
(``eval_classifier_i2w.py:91-114``)."""

from __future__ import annotations

import argparse
import os
import shutil


def build_parser():
    p = argparse.ArgumentParser(description="classifier i2w accuracy")
    p.add_argument("--gpu", type=str, default="0", help="parity flag; ignored")
    p.add_argument("--pkl_path", type=str, required=True)
    p.add_argument("--classifier_path", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="eval_cls_out")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--copy_misclassified", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import numpy as np
    import jax.numpy as jnp
    import pandas as pd

    from weather_unet_tpu.cli.common import load_estimator
    from weather_unet_tpu.data.datasets import ClassImageDataset, WEATHER_CLASSES_I2W
    from weather_unet_tpu.data.pipeline import BatchLoader, device_prefetch
    from weather_unet_tpu.data.transforms import normalize_batch
    from sklearn.metrics import classification_report, confusion_matrix

    os.makedirs(args.output_dir, exist_ok=True)
    classify = load_estimator(args.classifier_path)
    sep = pd.read_pickle(args.pkl_path)
    ds = ClassImageDataset(sep["test"], out_size=args.input_size, inf=True)
    loader = BatchLoader(ds, batch_size=args.batch_size, drop_last=False,
                         num_workers=args.num_workers)

    y_true, y_pred, paths = [], [], []
    for imgs_u8, targets, batch_paths in device_prefetch(loader, device_fields=[0]):
        x = normalize_batch(jnp.asarray(imgs_u8))
        p = np.asarray(jnp.argmax(classify(x), axis=1))
        y_pred.extend(p.tolist())
        y_true.extend(np.asarray(targets).astype(int).tolist())
        paths.extend(list(batch_paths))

    print(classification_report(y_true, y_pred, labels=list(range(5)),
                                target_names=WEATHER_CLASSES_I2W, zero_division=0))
    cm = confusion_matrix(y_true, y_pred, labels=list(range(5)))
    print(cm)

    if args.copy_misclassified:
        for t, pr, path in zip(y_true, y_pred, paths):
            if t != pr:
                base = os.path.basename(path)
                name = (f"{WEATHER_CLASSES_I2W[t]}-true_{base}_"
                        f"{WEATHER_CLASSES_I2W[pr]}-pred.jpg")
                shutil.copy(path, os.path.join(args.output_dir, name))
    return {"y_true": y_true, "y_pred": y_pred, "confusion_matrix": cm}


if __name__ == "__main__":
    main()
