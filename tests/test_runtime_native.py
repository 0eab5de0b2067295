"""Native C++ JPEG loader tests (skipped when the library isn't built)."""

import os

import numpy as np
import pytest

from weather_unet_tpu import runtime


@pytest.fixture(scope="module")
def built():
    if not runtime.native_available():
        if not runtime.build():
            pytest.skip("native loader could not be built")
    return True


@pytest.fixture
def jpgs(tmp_path, rng):
    from PIL import Image

    paths = []
    for i in range(6):
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)).save(p, quality=95)
        paths.append(str(p))
    return paths


def test_decode_bytes_matches_file(built, jpgs):
    """The memory-source decode (HTTP uploads) is bit-identical to the
    file-source decode, and rejects non-JPEG bytes."""
    with open(jpgs[0], "rb") as f:
        data = f.read()
    a = runtime.decode_bytes(data, 64)
    b = runtime.decode_file(jpgs[0], 64)
    assert a is not None and b is not None
    np.testing.assert_array_equal(a, b)
    assert runtime.decode_bytes(b"definitely not a jpeg", 64) is None


def test_decode_file(built, jpgs):
    img = runtime.decode_file(jpgs[0], 64)
    assert img is not None and img.shape == (64, 64, 3) and img.dtype == np.uint8
    from PIL import Image

    with Image.open(jpgs[0]) as im:
        ref = np.asarray(im.convert("RGB").resize((64, 64), Image.BILINEAR))
    # decode itself is exact; resize filters differ (no antialias) -> loose
    assert np.abs(img.astype(int) - ref.astype(int)).mean() < 40


def test_decode_batch_and_failures(built, jpgs):
    batch, ok = runtime.decode_batch(jpgs + ["/does/not/exist.jpg"], 48)
    assert batch.shape == (7, 48, 48, 3)
    assert ok[:6] == [True] * 6 and ok[6] is False
    assert batch[6].sum() == 0  # failed slot zero-filled
    assert batch[0].sum() > 0


def test_dataset_native_path(built, jpgs, tmp_path, monkeypatch):
    from weather_unet_tpu.data.datasets import ImagePathDataset

    monkeypatch.setenv("WUT_NATIVE_DECODE", "1")
    ds = ImagePathDataset(jpgs, out_size=32)
    img, flag = ds[0]
    assert img.shape == (32, 32, 3)
    monkeypatch.delenv("WUT_NATIVE_DECODE")
