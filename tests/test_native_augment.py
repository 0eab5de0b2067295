"""Native fused augmentation (runtime/augment.cc) vs the JAX device kernel.

The C++ path is the host twin of ``data/transforms.py``'s one-affine-pass
augment: ``wut_make_affine`` must reproduce ``affine_from_uniforms`` given the
same uniforms, and ``wut_augment_u8`` must reproduce ``_affine_sample`` +
fixed-order ``_color_jitter`` within u8 rounding.  Skipped when the native
runtime isn't built (``make -C weather_unet_tpu/runtime``).
"""

import numpy as np
import pytest

from weather_unet_tpu import runtime
from weather_unet_tpu.data.transforms import (
    AugmentConfig, NativeAugment, affine_from_uniforms, _affine_sample,
    make_train_augment,
)

pytestmark = pytest.mark.skipif(
    not (runtime.native_available() or runtime.build()),
    reason="native runtime not built")


def _cfg(out=48, crop=True):
    return AugmentConfig(out_size=out, degrees=10.0, hflip=True,
                         resized_crop=crop, brightness=0.5, contrast=0.3,
                         saturation=0.3)


def _native_affine(h, w, u, cfg):
    return runtime.make_affine(
        h, w, u, degrees=cfg.degrees, resized_crop=cfg.resized_crop,
        crop_scale=cfg.crop_scale, crop_ratio=cfg.crop_ratio, hflip=cfg.hflip,
        out_size=cfg.out_size)


def test_affine_matches_jax(rng):
    import jax.numpy as jnp

    for crop in (False, True):
        cfg = _cfg(crop=crop)
        for _ in range(8):
            h, w = int(rng.integers(30, 200)), int(rng.integers(30, 200))
            u = rng.random(6).astype(np.float32)
            mat_j = np.asarray(affine_from_uniforms(jnp.asarray(u), h, w, cfg))
            mat_c = _native_affine(h, w, u, cfg)
            # translation entries are O(image size); compare relative to that
            np.testing.assert_allclose(mat_c, mat_j, atol=2e-3)


def test_augment_matches_device_kernel(rng):
    """Same affine + jitter factors -> C++ u8 output equals the JAX float
    kernel within one u8 quantization step."""
    import jax.numpy as jnp

    cfg = _cfg()
    h, w = 90, 120
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    u = rng.random(6).astype(np.float32)
    mat = _native_affine(h, w, u, cfg)
    jit = np.array([0.7, 1.1, 0.9], np.float32)

    out_c = runtime.augment_u8(img, mat, jit, cfg.out_size)
    assert out_c.shape == (cfg.out_size, cfg.out_size, 3)

    x = jnp.asarray(img, jnp.float32) / 255.0
    y = _affine_sample(x, jnp.asarray(mat), cfg.out_size)
    y = y * jit[0]  # brightness first; contrast mean is of the brightened image
    gm = jnp.mean(0.299 * y[..., 0] + 0.587 * y[..., 1] + 0.114 * y[..., 2])
    y = jit[1] * y + (1 - jit[1]) * gm
    gray = (0.299 * y[..., 0] + 0.587 * y[..., 1] + 0.114 * y[..., 2])[..., None]
    y = jnp.clip(jit[2] * y + (1 - jit[2]) * gray, 0.0, 1.0)

    d = np.abs(out_c.astype(np.float32) / 255.0 - np.asarray(y))
    assert d.max() <= 1.0 / 255.0 + 1e-3, d.max()


def test_augment_extreme_affines_safe(rng):
    """Degenerate/extreme affine matrices (interval entirely past the row,
    near-zero derivatives, inf/nan) must produce zero-fill, never write out
    of bounds (regression: the interior-range clamp; found by ASan fuzz)."""
    img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
    mats = [
        np.asarray([0.0, 0.0, 1e9, 0.0, 0.0, 1e9], np.float32),
        np.asarray([1e-30, 0.0, -5.0, 0.0, 1e-30, -5.0], np.float32),
        np.asarray([1e30, -1e30, 0.0, -1e30, 1e30, 0.0], np.float32),
        np.asarray([np.inf, 0.0, np.nan, 0.0, -np.inf, 0.0], np.float32),
        np.asarray([0.0, 0.0, 20.0, 0.0, 0.0, 20.0], np.float32),  # l>out
    ]
    for mat in mats:
        out = runtime.augment_u8(img, mat, np.full(3, -1.0, np.float32), 24)
        assert out.shape == (24, 24, 3)
        out2 = runtime.augment_u8(img, mat, np.asarray([1.2, 0.8, 1.1],
                                                       np.float32), 24)
        assert out2.shape == (24, 24, 3)


def test_augment_identity_no_jitter(rng):
    """degrees=0, no crop, no flip, out == in -> exact passthrough."""
    cfg = AugmentConfig(out_size=40, degrees=0.0, hflip=False)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    u = np.full(6, 0.25, np.float32)
    mat = _native_affine(40, 40, u, cfg)
    out = runtime.augment_u8(img, mat, np.full(3, -1.0, np.float32), 40)
    np.testing.assert_array_equal(out, img)


def test_decode_augment_file_matches_two_step(tmp_path, rng):
    """Fused decode->augment == decode_file -> augment_u8 with the same
    parameters (same DCT-scaled source, same affine)."""
    from PIL import Image

    h, w = 80, 100
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    p = tmp_path / "img.jpg"
    Image.fromarray(arr).save(p, quality=95)

    cfg = _cfg(out=48)
    u = rng.random(6).astype(np.float32)
    jit = np.array([0.8, -1.0, 1.2], np.float32)
    fused = runtime.decode_augment_file(
        str(p), u, jit, degrees=cfg.degrees, resized_crop=cfg.resized_crop,
        crop_scale=cfg.crop_scale, crop_ratio=cfg.crop_ratio, hflip=cfg.hflip,
        out_size=cfg.out_size)
    assert fused is not None

    # two-step on the same decoded pixels: decode at native size (no DCT
    # scaling kicks in for an 80x100 source at out=48)
    import PIL.Image as PILImage

    with PILImage.open(p) as im:
        src = np.asarray(im.convert("RGB"), np.uint8)
    mat = _native_affine(src.shape[0], src.shape[1], u, cfg)
    two = runtime.augment_u8(src, mat, jit, cfg.out_size)
    # libjpeg vs PIL decode may differ by a few u8 steps on some pixels
    d = np.abs(fused.astype(np.int32) - two.astype(np.int32))
    assert d.mean() < 1.5 and d.max() <= 16, (d.mean(), d.max())


def test_decode_augment_file_bad_file(tmp_path):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg")
    out = runtime.decode_augment_file(
        str(bad), np.zeros(6, np.float32), np.full(3, -1.0, np.float32),
        degrees=10.0, resized_crop=False, crop_scale=(0.08, 1.0),
        crop_ratio=(0.75, 4 / 3), hflip=True, out_size=32)
    assert out is None


def test_native_augment_transform(tmp_path, rng):
    """NativeAugment: deterministic per-seed, from_path == __call__ given the
    same stream position, and datasets use the fused path."""
    from PIL import Image

    arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    p = tmp_path / "a.jpg"
    Image.fromarray(arr).save(p, quality=95)

    a1 = NativeAugment(32, seed=7, resized_crop=True, brightness=0.5,
                       contrast=0.3, saturation=0.3)
    a2 = NativeAugment(32, seed=7, resized_crop=True, brightness=0.5,
                       contrast=0.3, saturation=0.3)
    o1 = a1.from_path(str(p))
    o2 = a2.from_path(str(p))
    np.testing.assert_array_equal(o1, o2)
    assert o1.shape == (32, 32, 3)

    # bad file raises IOError so dataset retry loops engage
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"nope")
    with pytest.raises(IOError):
        a1.from_path(str(bad))

    # __call__ fallback on decoded arrays works and is deterministic per seed
    b1 = NativeAugment(32, seed=3)(arr)
    b2 = NativeAugment(32, seed=3)(arr)
    np.testing.assert_array_equal(b1, b2)


def test_dataset_uses_from_path(tmp_path, rng):
    """ImagePathDataset routes JPEGs through transform.from_path."""
    from PIL import Image

    from weather_unet_tpu.data.datasets import ImagePathDataset

    paths = []
    for i in range(3):
        arr = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(arr).save(p)
        paths.append(str(p))

    calls = []

    class Spy(NativeAugment):
        def from_path(self, path):
            calls.append(path)
            return super().from_path(path)

    ds = ImagePathDataset(paths, out_size=64, transform=Spy(24, seed=0))
    img, flag = ds[1]
    assert img.shape == (24, 24, 3)
    assert calls == [paths[1]]


def test_keyed_streams_schedule_independent(tmp_path, rng):
    """Identically-seeded runs must produce identical augmented batches even
    with a multi-worker loader: the per-image RNG stream is keyed
    ``(seed, epoch, path, draw#)``, not a shared counter whose assignment
    depends on thread scheduling (review finding, round 5)."""
    from PIL import Image

    from weather_unet_tpu.data.datasets import ImagePathDataset
    from weather_unet_tpu.data.pipeline import BatchLoader

    paths = []
    for i in range(8):
        arr = rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        p = tmp_path / f"{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))

    def one_pass(epoch):
        aug = NativeAugment(32, seed=11, resized_crop=True, brightness=0.4)
        ds = ImagePathDataset(paths, out_size=48, transform=aug)
        ld = BatchLoader(ds, batch_size=4, shuffle=False, num_workers=4)
        ld.set_epoch(epoch)
        return np.concatenate([b[0] for b in ld])

    a, b = one_pass(0), one_pass(0)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, one_pass(1))  # fresh draws each epoch

    # repeated draws of the SAME path within an epoch (with-replacement
    # samplers) still get distinct streams; set_epoch resets the k counter
    aug = NativeAugment(32, seed=11, resized_crop=True, brightness=0.4)
    d0, d1 = aug.from_path(paths[0]), aug.from_path(paths[0])
    assert not np.array_equal(d0, d1)
    aug.set_epoch(0)
    np.testing.assert_array_equal(d0, aug.from_path(paths[0]))

    # the PIL twin rides the same keyed protocol
    from weather_unet_tpu.data.transforms import HostAugment

    h = HostAugment(32, seed=5, brightness=0.4)
    arr0 = np.asarray(Image.open(paths[0]).convert("RGB"))
    k1 = h.augment_keyed(arr0, paths[0])
    h2 = HostAugment(32, seed=5, brightness=0.4)
    np.testing.assert_array_equal(k1, h2.augment_keyed(arr0, paths[0]))


def test_make_train_augment_selects(monkeypatch):
    from weather_unet_tpu.data.transforms import HostAugment

    aug = make_train_augment(32)
    assert isinstance(aug, NativeAugment)
    monkeypatch.setenv("WUT_NATIVE_AUGMENT", "0")
    aug = make_train_augment(32)
    assert isinstance(aug, HostAugment)
    aug = make_train_augment(32, prefer_native=False)
    assert isinstance(aug, HostAugment)


def test_stale_so_falls_back_to_pil(monkeypatch):
    """A stale pre-augment .so (decode entries only) must degrade cleanly:
    make_train_augment falls back to HostAugment instead of crashing, and
    NativeAugment refuses with a clear error (ADVICE r2: unguarded augment
    bindings used to raise AttributeError out of runtime.load())."""
    from weather_unet_tpu.data.transforms import HostAugment

    monkeypatch.setattr(runtime, "augment_available", lambda: False)
    assert runtime.native_available()        # decode path still fine
    aug = make_train_augment(32)
    assert isinstance(aug, HostAugment)
    with pytest.raises(RuntimeError, match="stale"):
        NativeAugment(32)
    with pytest.raises(RuntimeError, match="stale"):
        runtime.augment_u8(np.zeros((8, 8, 3), np.uint8),
                           np.eye(2, 3, dtype=np.float32),
                           np.full(3, -1.0, np.float32), 8)


def test_native_vs_pil_distribution(tmp_path, rng):
    """Sanity: native and PIL augment outputs of the same photo are close in
    distribution (mean/std within a few u8 levels) — guards against gross
    convention mismatches (e.g. x/y swap, degree sign) without requiring
    resampler equality."""
    from PIL import Image

    from weather_unet_tpu.data.transforms import HostAugment

    # smooth gradient image: misorientation would show up strongly
    y, x = np.mgrid[0:96, 0:96]
    arr = np.stack([x * 2, y * 2, (x + y)], -1).astype(np.uint8)
    p = tmp_path / "g.jpg"
    Image.fromarray(arr).save(p, quality=95)

    nat = NativeAugment(48, seed=1)
    pil = HostAugment(48, seed=1)
    outs_n = np.stack([nat.from_path(str(p)) for _ in range(16)]).astype(np.float32)
    outs_p = np.stack([pil(arr) for _ in range(16)]).astype(np.float32)
    assert abs(outs_n.mean() - outs_p.mean()) < 6.0
    assert abs(outs_n.std() - outs_p.std()) < 8.0


def test_fork_stream_independent_draws(tmp_path, rng):
    """fork_stream gives the GAN trainers' random loader an independent
    keyed-RNG stream: a shared transform would make the per-path draw
    counter k race between the two zipped loaders (review finding,
    round 5).  The fork draws differently from the original for the same
    path, draws on either side don't advance the other's counters, and a
    cache-wrapped fork shares the SAME DecodedCache."""
    from PIL import Image

    from weather_unet_tpu.data.cache import CachedAugment, DecodedCache
    from weather_unet_tpu.data.transforms import fork_stream

    p = str(tmp_path / "a.jpg")
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
        p, quality=95)
    a = NativeAugment(32, seed=9, resized_crop=True, brightness=0.4)
    b = fork_stream(a)
    d_a0 = a.from_path(p)
    d_b0 = b.from_path(p)
    assert not np.array_equal(d_a0, d_b0)        # independent streams
    # interleaving draws on b must not advance a's counters: a's second
    # draw equals what a fresh original would produce at k=1
    ref = NativeAugment(32, seed=9, resized_crop=True, brightness=0.4)
    ref.from_path(p)
    np.testing.assert_array_equal(a.from_path(p), ref.from_path(p))

    cache = DecodedCache(str(tmp_path / "c"), base_size=48, paths=[p])
    wrapped = CachedAugment(cache, a)
    forked = fork_stream(wrapped)
    assert forked.cache is cache                 # shared cache, new stream
    assert forked.augment.seed == a.seed + 1
