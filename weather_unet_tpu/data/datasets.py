"""Host-side datasets mirroring the reference's loaders (``dataset.py``).

Design: datasets are plain indexable objects returning numpy records; decode
(PIL) happens in the loader's thread pool; all augmentation beyond
decode+resize runs batched on device (``data/transforms.py``) — the TPU-native
replacement for torchvision's per-sample CPU transform stacks
(``t_est_train.py:76-103``).

Behavioral notes vs reference:
* unreadable images: the reference retries the same index forever
  (``dataset.py:62-66``); here corrupt files raise after a bounded number of
  fallback attempts to the next index (SURVEY.md §5 — keep skip-on-corrupt,
  bounded).
* ``FlickrDataset`` keeps the three return arities keyed on
  ``class_id in {None, True, False}`` (``dataset.py:72-79``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

WEATHER_CLASSES_I2W = ["sunny", "cloudy", "rain", "snow", "foggy"]
WEATHER_CLASSES_FLICKR = ["Clear", "Clouds", "Rain", "Mist", "Snow"]
SIGNAL_COLUMNS = ["clouds", "temp", "humidity", "pressure", "windspeed"]

_MAX_BAD_FILES = 16


def class_id_from_string(name: str) -> int:
    """i2w class name -> id (``dataset.py:20-24``)."""
    return WEATHER_CLASSES_I2W.index(name)


def zscore_columns(df, columns, stats_df=None):
    """Z-score ``columns`` of ``df`` in place using ``stats_df``'s (or the
    train split's) mean/std — the reference normalizes against the
    without-outlier frame (``t_est_train.py:126-131``) or the train split
    (``estimator.py:103-106``).  Returns (df, mean, std)."""
    src = (stats_df if stats_df is not None else df)
    ref = src.loc[:, columns].fillna(0)
    mean, std = ref.mean(), ref.std()
    df = df.copy()
    df.loc[:, columns] = (df.loc[:, columns].fillna(0) - mean) / std
    return df, mean, std


def _decode(path: str, out_size: Optional[int],
            prefer_native: Optional[bool] = None) -> np.ndarray:
    """JPEG decode + optional square resize -> uint8 HWC.

    Set ``WUT_NATIVE_DECODE=1`` (with the C++ runtime built,
    ``make -C weather_unet_tpu/runtime``) to decode via the native
    libjpeg loader — GIL-free, thread-scalable on multi-core hosts.  The
    native resize is plain bilinear (no PIL antialiasing), fine for training;
    parity-sensitive eval paths keep PIL by default.  ``prefer_native``
    overrides the env gate (the decode cache passes True: its fill is the
    decode-heavy stage and feeds training only).
    """
    if prefer_native is None:
        prefer_native = os.environ.get("WUT_NATIVE_DECODE") == "1"
    if (out_size is not None and prefer_native
            and path.lower().endswith((".jpg", ".jpeg"))):
        from weather_unet_tpu import runtime

        if runtime.native_available():
            img = runtime.decode_file(path, out_size)
            if img is not None:
                return img
            raise IOError(f"native decode failed for {path}")

    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        if out_size is not None:
            im = im.resize((out_size, out_size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def _load(path: str, out_size: Optional[int], transform) -> np.ndarray:
    """Decode + transform one sample, using the transform's fused
    decode-augment fast path (``transforms.NativeAugment.from_path``, one
    GIL-free C++ call) when it offers one and the file is a JPEG."""
    if (transform is not None and hasattr(transform, "from_path")
            and (path.lower().endswith((".jpg", ".jpeg"))
                 or getattr(transform, "from_path_any", False))):
        # jpg gating exists for the libjpeg-fused NativeAugment; transforms
        # that can ingest any extension (the decode cache) opt in via
        # ``from_path_any``
        return transform.from_path(path)
    image = _decode(path, out_size)
    if transform is not None:
        # prefer the schedule-independent per-path RNG stream when the
        # transform offers one (transforms._KeyedRngMixin)
        keyed = getattr(transform, "augment_keyed", None)
        image = keyed(image, path) if keyed is not None else transform(image)
    return image


def with_transform(dataset, transform):
    """Shallow view of ``dataset`` with a different ``transform`` — shares
    the path/label arrays; used to give a second loader over the same data
    an independent keyed-RNG stream (``transforms.fork_stream``)."""
    import copy

    d = copy.copy(dataset)
    d.transform = transform
    return d


def flickr_image_path(image_root: str, photo_id) -> str:
    """Path of one Flickr photo id under ``image_root``.

    Single definition of the ``<root>/<photo>.jpg`` scheme — the decode-cache
    CLIs build their path lists with this, so they can never drift from what
    :class:`FlickrDataset` actually loads (a drifted list would silently
    degrade every lookup to a passthrough decode)."""
    return os.path.join(image_root, str(photo_id) + ".jpg")


class FlickrDataset:
    """Flickr weather-DB dataset (``dataset.py:27-79``).

    Items come from a pandas dataframe with a ``photo`` column (image id), the
    z-scored signal columns, and a class column (``condition2``, or
    ``w_condition`` when ``imbalance``).
    """

    def __init__(self, image_root: str, df, columns: Sequence[str],
                 out_size: Optional[int] = None, class_id: Optional[bool] = None,
                 imbalance: bool = False, transform=None):
        self.root = image_root
        self.transform = transform
        self.columns = list(columns)
        self.photo_ids = df["photo"].to_list()
        self.conditions = df.loc[:, self.columns].fillna(0).to_numpy(np.float32)
        label_col = "w_condition" if imbalance else "condition2"
        self.labels = df[label_col].to_list() if label_col in df else None
        self.class_id = class_id
        self.num_classes = len(self.columns)
        self.out_size = out_size

    def __len__(self):
        return len(self.photo_ids)

    def get_class(self, idx: int) -> int:
        return WEATHER_CLASSES_FLICKR.index(self.labels[idx])

    def get_condition(self, idx: int) -> np.ndarray:
        return self.conditions[idx]

    def __getitem__(self, idx: int):
        for attempt in range(_MAX_BAD_FILES):
            i = (idx + attempt) % len(self)
            path = flickr_image_path(self.root, self.photo_ids[i])
            try:
                image = _load(path, self.out_size, self.transform)
                break
            except Exception:
                continue
        else:
            raise IOError(f"more than {_MAX_BAD_FILES} consecutive unreadable images at {idx}")
        cond = self.get_condition(i)
        if self.class_id is None:
            return image, cond, self.photo_ids[i]
        if self.class_id:
            return image, cond, self.get_class(i), self.photo_ids[i]
        return image, self.get_class(i)


class ImagePathDataset:
    """Plain path-list dataset (reference ``ImageLoader``, ``dataset.py:81-102``)."""

    def __init__(self, paths: Sequence[str], out_size: Optional[int] = None,
                 with_path: bool = False, transform=None):
        self.paths = list(paths)
        self.out_size = out_size
        self.with_path = with_path
        self.transform = transform

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, idx: int):
        for attempt in range(_MAX_BAD_FILES):
            i = (idx + attempt) % len(self)
            try:
                image = _load(self.paths[i], self.out_size, self.transform)
                break
            except Exception:
                continue
        else:
            raise IOError(f"more than {_MAX_BAD_FILES} consecutive unreadable images at {idx}")
        if self.with_path:
            return image, self.paths[i]
        return image, True


def filter_i2w_paths(paths: Sequence[str]) -> list:
    """Drop the reference's skipped ``z-other`` class (``dataset.py:115``).

    Single definition of the rule: :class:`ClassImageDataset` applies it to
    what it serves, and the decode-cache CLIs apply it to their path lists
    so the cache doesn't reserve rows for images the dataset never loads."""
    return [p for p in paths if "z-other" not in p]


class ClassImageDataset:
    """i2w dataset: class = parent directory name, fixed class list, skips
    ``z-other`` (reference ``ClassImageLoader``, ``dataset.py:105-136``)."""

    def __init__(self, paths: Sequence[str], out_size: Optional[int] = None,
                 inf: bool = False, transform=None):
        self.transform = transform
        self.paths = filter_i2w_paths(paths)
        self.classes = WEATHER_CLASSES_I2W
        self.num_classes = len(self.classes)
        self.out_size = out_size
        self.inf = inf

    def __len__(self):
        return len(self.paths)

    def get_class(self, idx: int) -> int:
        return class_id_from_string(self.paths[idx].split(os.sep)[-2])

    def __getitem__(self, idx: int):
        image = _load(self.paths[idx], self.out_size, self.transform)
        target = self.get_class(idx)
        if self.inf:
            return image, target, self.paths[idx]
        return image, target


class OneYearWeatherSignals:
    """One fixed photo x a year of hourly signals for one station
    (reference ``dataset.py:155-203``): dedup on ``s_unixtime``, sorted
    descending; items are ``(image, signal_vector, unixtime)``."""

    def __init__(self, image_root: str, df, columns: Sequence[str],
                 photo_id: str, out_size: Optional[int] = None,
                 name: Optional[str] = None):
        self.columns = list(columns)
        self.num_classes = len(self.columns)
        self.photo_id = photo_id
        if name is None:
            name = df[df["photo"] == photo_id]["name"].to_list()[0]
        self.name = name

        sdf = df[df["name"] == name].drop_duplicates(subset=["s_unixtime"])
        sdf = sdf.sort_values("s_unixtime", ascending=False).reset_index()
        self.s_times = sdf["s_unixtime"].to_numpy()
        self.conditions = sdf.loc[:, self.columns].fillna(0).to_numpy(np.float32)

        self.image = _decode(flickr_image_path(image_root, photo_id), out_size)

    def __len__(self):
        return len(self.conditions)

    def __getitem__(self, idx: int):
        return self.image, self.conditions[idx], self.s_times[idx]


# Reference ``ImageFolder`` (``dataset.py:139-152``) is a thin jpg
# DatasetFolder whose behavior ClassImageDataset reproduces (class = parent
# directory, RGB convert, transform); exposed under the reference name.
ImageFolder = ClassImageDataset
