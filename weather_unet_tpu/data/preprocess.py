"""Offline dataset preparation — rebuilds of ``preprocesses/spliter.py``,
``preprocesses/spliter_flicker.py`` and ``preprocesses/remove_gray.py``.
"""

from __future__ import annotations

import os
import pickle
import random
from glob import glob
from typing import Dict, List, Optional, Sequence


def split_i2w(root: str, test_per_class: int = 500, small_rate: float = 1.0,
              seed: int = 0) -> Dict[str, List[str]]:
    """i2w directory tree -> {'train','val','test'} path lists
    (``preprocesses/spliter.py:16-39``): per class, ``small_rate``
    subsamples FIRST (reference ``imgs[:int(len*small_rate)]`` before the
    split — applying it after would shrink the fixed-size test set and make
    eval numbers incomparable), then ``test_per_class`` images go to test
    and the remainder is halved into train/val.  Only image files are
    listed (reference globs ``*.jpg``; a bare ``*`` would sweep stray
    files/subdirs into the pickle and crash ``ClassImageDataset`` at
    load time)."""
    rng = random.Random(seed)
    out: Dict[str, List[str]] = {"train": [], "val": [], "test": []}
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)) and "z-other" not in d)
    exts = (".jpg", ".jpeg", ".png")
    for cls in classes:
        paths = sorted(p for p in glob(os.path.join(root, cls, "*"))
                       if p.lower().endswith(exts) and os.path.isfile(p))
        rng.shuffle(paths)
        if small_rate < 1.0:
            paths = paths[: int(len(paths) * small_rate)]
        test = paths[:test_per_class]
        rest = paths[test_per_class:]
        half = len(rest) // 2
        out["test"].extend(test)
        out["train"].extend(rest[:half])
        out["val"].extend(rest[half:])
    return out


def split_flickr(df, per_class: Sequence[int] = (40, 40, 20),
                 ent_th: Optional[float] = None, class_col: str = "condition2",
                 seed: int = 0):
    """Assign a ``mode`` column train/val/test per class in the given
    percentage ratios, optionally dropping high-entropy rows first
    (``preprocesses/spliter_flicker.py:10-41``)."""
    import numpy as np

    df = df.copy()
    if ent_th is not None and "ent_label" in df:
        df = df[df["ent_label"] < ent_th]
    rng = np.random.default_rng(seed)
    modes = np.empty(len(df), dtype=object)
    labels = df[class_col].to_numpy()
    for cls in np.unique(labels):
        idx = np.flatnonzero(labels == cls)
        rng.shuffle(idx)
        n = len(idx)
        n_train = n * per_class[0] // 100
        n_val = n * per_class[1] // 100
        modes[idx[:n_train]] = "train"
        modes[idx[n_train:n_train + n_val]] = "val"
        modes[idx[n_train + n_val:]] = "test"
    df["mode"] = modes
    return df


def remove_gray(df, image_root: str, photo_col: str = "photo",
                sample_px: int = 64):
    """Drop grayscale photos (R==G==B) from the frame
    (``preprocesses/remove_gray.py:9-29``); decodes with PIL at reduced size
    for speed."""
    import numpy as np
    from PIL import Image

    from weather_unet_tpu.data import datasets

    keep = []
    for pid in df[photo_col]:
        path = datasets.flickr_image_path(image_root, pid)
        try:
            with Image.open(path) as im:
                im = im.convert("RGB").resize((sample_px, sample_px))
                arr = np.asarray(im, dtype=np.int16)
            gray = bool(np.all(arr[..., 0] == arr[..., 1])
                        and np.all(arr[..., 1] == arr[..., 2]))
        except Exception:
            gray = True  # unreadable counts as dropped
        keep.append(not gray)
    return df[keep]


def save_split_pickle(split: Dict[str, List[str]], path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(split, f)
