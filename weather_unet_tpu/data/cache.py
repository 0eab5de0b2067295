"""Decoded-image cache: decode each source image ONCE, augment every epoch.

The reference pipeline re-decodes every JPEG every epoch in DataLoader
workers (``t_est_train.py:176-196``).  On hosts where decode dominates the
input pipeline (this container has ONE core: fused decode+augment measured
~2x slower than augment alone — ``bench_input_pipeline.py``), a GAN step
consumes 2 x batch images (content + random streams) and the loader becomes
the trainer bottleneck.  Caching the *decoded, base-sized* uint8 image in a
memory-mapped file removes the decode from every epoch after the first,
while augmentation (the part that must be random per epoch) still runs
per-sample.

Layout under ``cache_dir``:

    index.json   {"base_size", "entries": {path: {"row", "mtime", "size"}}}
    data.npy     uint8 memmap (N, base, base, 3)
    present.npy  uint8 flags — row filled markers (crash-safe lazy fill)

Rows fill lazily on first access (the first epoch pays decode exactly like
the uncached path; later epochs read at page-cache speed).  Stale entries
(mtime/size changed) re-decode in place.  Concurrent loader threads may
race on the same unfilled row — both write identical bytes, so the race is
benign; the ``present`` flag is set after the pixel write.

Usage (any dataset transform seam)::

    aug = make_train_augment(224, ...)
    cached = CachedAugment(DecodedCache(cache_dir, base_size=257, paths=paths), aug)
    ds = ImagePathDataset(paths, out_size=257, transform=cached)
"""

from __future__ import annotations

import json
import os
import threading
from typing import Optional, Sequence

import numpy as np


class DecodedCache:
    """Lazily-filled memmap of decoded base-size images, keyed by path."""

    def __init__(self, cache_dir: str, base_size: int, paths: Sequence[str]):
        self.dir = os.path.expanduser(cache_dir)
        self.base = int(base_size)
        os.makedirs(self.dir, exist_ok=True)
        self._lock = threading.Lock()
        self._index_path = os.path.join(self.dir, "index.json")
        self._data_path = os.path.join(self.dir, "data.npy")
        self._present_path = os.path.join(self.dir, "present.npy")

        paths = [os.path.abspath(p) for p in dict.fromkeys(paths)]
        old = self._load_index()
        entries = {}
        reusable = (old is not None and old.get("base_size") == self.base
                    and os.path.exists(self._data_path))
        old_entries = old["entries"] if reusable else {}
        for row, p in enumerate(paths):
            st = self._stat(p)
            prev = old_entries.get(p)
            fresh = (reusable and prev is not None and prev["row"] == row
                     and prev["mtime"] == st[0] and prev["size"] == st[1])
            entries[p] = {"row": row, "mtime": st[0], "size": st[1],
                          "_fresh": fresh}
        self._rows = {p: e["row"] for p, e in entries.items()}

        shape = (len(paths), self.base, self.base, 3)
        mode = "r+" if (reusable and self._shape_matches(shape)) else "w+"
        self.data = np.lib.format.open_memmap(
            self._data_path, mode=mode, dtype=np.uint8, shape=shape)
        if mode == "w+":
            self.present = np.lib.format.open_memmap(
                self._present_path, mode="w+", dtype=np.uint8,
                shape=(len(paths),))
            self.present[:] = 0
        else:
            self.present = np.lib.format.open_memmap(self._present_path,
                                                     mode="r+")
            for p, e in entries.items():   # invalidate stale/moved rows
                if not e.pop("_fresh"):
                    self.present[e["row"]] = 0
        for e in entries.values():
            e.pop("_fresh", None)
        with open(self._index_path + ".tmp", "w") as f:
            json.dump({"base_size": self.base, "entries": entries}, f)
        os.replace(self._index_path + ".tmp", self._index_path)
        self.hits = 0
        self.misses = 0

    def _stat(self, p):
        try:
            st = os.stat(p)
            return (st.st_mtime_ns, st.st_size)
        except OSError:
            return (0, -1)

    def _load_index(self) -> Optional[dict]:
        try:
            with open(self._index_path) as f:
                return json.load(f)
        except Exception:
            return None

    def _shape_matches(self, shape) -> bool:
        try:
            return np.lib.format.open_memmap(self._data_path,
                                             mode="r").shape == shape
        except Exception:
            return False

    def _decode(self, path: str) -> np.ndarray:
        from weather_unet_tpu import runtime

        if runtime.native_available() and path.lower().endswith(
                (".jpg", ".jpeg")):
            img = runtime.decode_file(path, self.base)
            if img is not None:
                return img
            raise IOError(f"native decode failed for {path}")
        from PIL import Image

        with Image.open(path) as im:
            im = im.convert("RGB").resize((self.base, self.base),
                                          Image.BILINEAR)
            return np.asarray(im, dtype=np.uint8)

    def get(self, path: str) -> np.ndarray:
        """Decoded base-size uint8 HWC image; decodes and fills on miss."""
        row = self._rows.get(os.path.abspath(path))
        if row is None:
            return self._decode(path)   # not in the cached set: passthrough
        if self.present[row]:
            self.hits += 1
            return np.asarray(self.data[row])
        img = self._decode(path)
        self.data[row] = img
        self.present[row] = 1           # flag AFTER pixels (crash safety)
        self.misses += 1
        return img

    def populate(self):
        """Eagerly fill every missing row (one-time warm, optional)."""
        for p, row in self._rows.items():
            if not self.present[row]:
                self.get(p)


class CachedAugment:
    """Transform adapter: decoded-cache lookup + per-sample augmentation.

    Exposes the same surface the datasets' ``_load`` seam dispatches on —
    ``from_path`` (replaces the fused decode+augment call with cache read +
    augment) and ``__call__`` (augment an already-decoded image)."""

    def __init__(self, cache: DecodedCache, augment=None):
        self.cache = cache
        self.augment = augment

    def from_path(self, path: str) -> np.ndarray:
        img = self.cache.get(path)
        return self.augment(img) if self.augment is not None else img

    def __call__(self, image_u8: np.ndarray) -> np.ndarray:
        return (self.augment(image_u8) if self.augment is not None
                else image_u8)
