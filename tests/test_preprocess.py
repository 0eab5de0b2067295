"""Offline preprocessing tests (split-i2w, split-flickr, remove-gray)."""

import os

import numpy as np
import pytest

from weather_unet_tpu.data import preprocess as pp

pd = pytest.importorskip("pandas")


def test_split_i2w(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in ["sunny", "rain", "z-other"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(10):
            Image.fromarray(rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(
                d / f"{i}.jpg")
    split = pp.split_i2w(str(tmp_path), test_per_class=4)
    # z-other excluded; 2 classes x (4 test + 3 train + 3 val)
    assert len(split["test"]) == 8
    assert len(split["train"]) == 6
    assert len(split["val"]) == 6
    assert not any("z-other" in p for v in split.values() for p in v)

    out = tmp_path / "split.pkl"
    pp.save_split_pickle(split, str(out))
    assert os.path.exists(out)


def test_split_i2w_ignores_non_images_and_subsamples_before_split(tmp_path):
    """Stray non-image files/subdirs must not enter the split pickle (they
    would crash ClassImageDataset at load time), and small_rate subsamples
    BEFORE the test split like the reference (spliter.py:26-30: test keeps
    its full size under small_rate until the class runs out) — review
    findings, round 5."""
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in ["sunny", "rain"]:
        d = tmp_path / cls
        d.mkdir()
        for i in range(20):
            Image.fromarray(
                rng.integers(0, 255, (8, 8, 3), dtype=np.uint8)).save(
                    d / f"{i}.jpg")
        (d / "Thumbs.db").write_bytes(b"not an image")
        (d / "notes.txt").write_text("stray")
        (d / "subdir").mkdir()
    split = pp.split_i2w(str(tmp_path), test_per_class=4, small_rate=0.5)
    paths = [p for v in split.values() for p in v]
    assert all(p.lower().endswith(".jpg") for p in paths)
    # small_rate FIRST: 20 -> 10 per class, then 4 test + 3 train + 3 val
    assert len(split["test"]) == 8          # test keeps its full size
    assert len(split["train"]) == 6 and len(split["val"]) == 6


def test_split_flickr_ratios():
    df = pd.DataFrame({
        "photo": [f"p{i}" for i in range(200)],
        "condition2": ["Clear"] * 100 + ["Rain"] * 100,
        "ent_label": np.linspace(0, 1, 200),
    })
    out = pp.split_flickr(df, per_class=(40, 40, 20))
    counts = out["mode"].value_counts()
    assert counts["train"] == 80 and counts["val"] == 80 and counts["test"] == 40

    filtered = pp.split_flickr(df, per_class=(40, 40, 20), ent_th=0.5)
    assert len(filtered) < len(df)


def test_remove_gray(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    color = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    gray = np.repeat(rng.integers(0, 255, (16, 16, 1), dtype=np.uint8), 3, axis=2)
    Image.fromarray(color).save(tmp_path / "c.jpg")
    Image.fromarray(gray).save(tmp_path / "g.jpg", quality=100, subsampling=0)
    df = pd.DataFrame({"photo": ["c", "g", "missing"]})
    out = pp.remove_gray(df, str(tmp_path))
    assert "c" in out["photo"].to_list()
    assert "missing" not in out["photo"].to_list()
