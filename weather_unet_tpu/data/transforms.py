"""On-device batched augmentation — the TPU-native replacement for the
reference's torchvision CPU transform stacks.

The reference applies per-sample CPU transforms in DataLoader workers
(``t_est_train.py:76-103``): train = [Resize, RandomRotation(10), HFlip] or
with ``--augmentation`` [RandomRotation(10), RandomResizedCrop, HFlip,
ColorJitter(0.5, 0.3, 0.3, 0)], then ToTensor + Normalize(0.5, 0.5).

Here the host only decodes + resizes to a base size; rotation, crop, flip are
composed into ONE inverse affine map per image and executed as a single
batched bilinear gather on device, followed by fused elementwise color jitter
and normalization — one kernel pass instead of four CPU passes per image.

Distributional notes (documented deviations, identical in spirit):
* RandomResizedCrop: torchvision rejection-samples (10 tries) then falls back
  to center crop; we sample scale/log-ratio once and clamp the crop box to the
  image — same support, slightly different tail distribution.
* ColorJitter applies brightness->contrast->saturation in fixed order
  (torchvision shuffles the order per sample).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    out_size: int = 224
    degrees: float = 10.0          # RandomRotation(10)
    hflip: bool = True
    resized_crop: bool = False     # --augmentation branch
    crop_scale: tuple = (0.08, 1.0)
    crop_ratio: tuple = (3.0 / 4.0, 4.0 / 3.0)
    brightness: float = 0.0        # 0.5 in --augmentation branch
    contrast: float = 0.0          # 0.3
    saturation: float = 0.0        # 0.3
    mean: float = 0.5
    std: float = 0.5


def _affine_sample(img, mat, out_size: int):
    """Bilinear-sample ``img`` (H, W, C) at coords ``mat @ (x_out, y_out, 1)``
    with zero fill outside — matches torchvision rotate/crop conventions
    (center-based coordinates)."""
    h, w, _ = img.shape
    ys = jnp.arange(out_size, dtype=jnp.float32)
    xs = jnp.arange(out_size, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(grid_x)
    coords = jnp.stack([grid_x, grid_y, ones], axis=-1)      # (O, O, 3)
    src = coords @ mat.T                                      # (O, O, 2) -> x, y
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[yc, xc]                                    # (O, O, C)
        return vals * inb[..., None]

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


def affine_from_uniforms(u, in_h, in_w, cfg: AugmentConfig):
    """Inverse affine map out-pixel -> source-pixel from 6 uniform draws
    ``u = [rot, scale, log-ratio, pos-x, pos-y, flip]`` in [0, 1): composition
    of (resize-from-crop) o (rotation about center) o (optional hflip).

    Single source of the affine construction; the native runtime's
    ``wut_make_affine`` (runtime/augment.cc) mirrors this formula exactly and
    tests/test_native_augment.py pins the two against each other.
    """
    # crop box in source coordinates
    if cfg.resized_crop:
        area = in_h * in_w
        scale = cfg.crop_scale[0] + u[1] * (cfg.crop_scale[1] - cfg.crop_scale[0])
        log_ratio = (math.log(cfg.crop_ratio[0])
                     + u[2] * (math.log(cfg.crop_ratio[1])
                               - math.log(cfg.crop_ratio[0])))
        ratio = jnp.exp(log_ratio)
        cw = jnp.clip(jnp.sqrt(area * scale * ratio), 1.0, in_w)
        ch = jnp.clip(jnp.sqrt(area * scale / ratio), 1.0, in_h)
        cx0 = u[3] * (in_w - cw)
        cy0 = u[4] * (in_h - ch)
    else:
        cw, ch = float(in_w), float(in_h)
        cx0 = cy0 = 0.0

    # out pixel -> crop coords (scale), crop coords -> source (translate)
    sx = cw / cfg.out_size
    sy = ch / cfg.out_size

    # rotation about the image center (inverse map: rotate by +theta)
    theta = -cfg.degrees + u[0] * (2.0 * cfg.degrees)
    t = theta * (math.pi / 180.0)
    cos, sin = jnp.cos(t), jnp.sin(t)
    cx = (in_w - 1) / 2.0
    cy = (in_h - 1) / 2.0

    # hflip in output space
    flip = (u[5] < 0.5) if cfg.hflip else jnp.asarray(False)
    fsign = jnp.where(flip, -1.0, 1.0)
    foff = jnp.where(flip, cfg.out_size - 1.0, 0.0)

    # compose: p_out -> hflip -> scale+translate into crop -> rotate about center
    # affine rows map (x, y, 1) -> (x_src, y_src)
    a11 = cos * fsign * sx
    a12 = -sin * sy
    a13 = cos * (foff * sx + cx0 - cx) - sin * (cy0 - cy) + cx
    a21 = sin * fsign * sx
    a22 = cos * sy
    a23 = sin * (foff * sx + cx0 - cx) + cos * (cy0 - cy) + cy
    return jnp.asarray([[a11, a12, a13], [a21, a22, a23]])


def _one_affine(key, in_h, in_w, cfg: AugmentConfig):
    """Sample one inverse affine map (uniform draws -> affine_from_uniforms)."""
    k_rot, k_scale, k_ratio, k_pos, k_flip = jax.random.split(key, 5)
    u_pos = jax.random.uniform(k_pos, (2,))
    u = jnp.stack([
        jax.random.uniform(k_rot, ()),
        jax.random.uniform(k_scale, ()),
        jax.random.uniform(k_ratio, ()),
        u_pos[0], u_pos[1],
        jax.random.uniform(k_flip, ()),
    ])
    return affine_from_uniforms(u, in_h, in_w, cfg)


def _color_jitter(key, img, cfg: AugmentConfig):
    """torchvision ColorJitter factors: U(max(0, 1-j), 1+j); gray = ITU-R 601
    luma as in torchvision ``rgb_to_grayscale``."""
    k_b, k_c, k_s = jax.random.split(key, 3)
    if cfg.brightness:
        f = jax.random.uniform(k_b, (), minval=max(0.0, 1 - cfg.brightness),
                               maxval=1 + cfg.brightness)
        img = img * f
    if cfg.contrast:
        f = jax.random.uniform(k_c, (), minval=max(0.0, 1 - cfg.contrast),
                               maxval=1 + cfg.contrast)
        gray_mean = jnp.mean(
            0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
        img = f * img + (1 - f) * gray_mean
    if cfg.saturation:
        f = jax.random.uniform(k_s, (), minval=max(0.0, 1 - cfg.saturation),
                               maxval=1 + cfg.saturation)
        gray = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2])[..., None]
        img = f * img + (1 - f) * gray
    return jnp.clip(img, 0.0, 1.0)


class _KeyedRngMixin:
    """Per-sample RNG streams for loader-thread transforms.

    Bare ``__call__`` draws come from a lock-guarded ``(seed, counter)``
    stream — thread-safe, but under ``num_workers>1`` the stream→image
    assignment depends on thread scheduling, so two identically-seeded runs
    can augment the same image differently (review finding, round 5).  The
    datasets' ``_load`` seam therefore uses the KEYED path
    (``augment_keyed``/``from_path``): stream ``(seed, epoch, crc32(path),
    k)`` where ``k`` counts prior draws of that path this epoch.  For
    without-replacement sampling (every path once per epoch, the shuffle
    default) this is fully schedule-independent — exact replay across runs
    and resumes; under a with-replacement sampler (``ImbalancedSampler``)
    the per-epoch (image, augmentation) MULTISET is deterministic, with
    only the batch position of repeated draws scheduling-dependent.
    ``BatchLoader.set_epoch`` propagates here through the dataset's
    transform.
    """

    def _rng_init(self, seed: int):
        import threading

        self.seed = seed
        self._lock = threading.Lock()
        self._counter = 0
        self._epoch = 0
        self._path_counts = {}

    def set_epoch(self, epoch: int):
        with self._lock:
            self._epoch = int(epoch)
            self._path_counts.clear()

    def _rng(self):
        import numpy as _np

        with self._lock:
            self._counter += 1
            n = self._counter
        return _np.random.default_rng((self.seed, n))

    def _rng_keyed(self, path: str):
        import hashlib

        import numpy as _np

        with self._lock:
            k = self._path_counts.get(path, 0)
            self._path_counts[path] = k + 1
            e = self._epoch
        # 128-bit path hash: a 32-bit key (crc32) gives ~1 expected
        # colliding pair per 100k-image corpus whose augmentations would be
        # perfectly correlated all run (review finding, round 5)
        h = int.from_bytes(hashlib.blake2b(
            path.encode("utf-8", "replace"), digest_size=16).digest(),
            "little")
        return _np.random.default_rng((self.seed, e, h, k))


class HostAugment(_KeyedRngMixin):
    """Reference-faithful CPU augmentation for the loader threads
    (``t_cls_train.py:81-102``: RandomRotation(10) -> RandomResizedCrop |
    Resize -> RandomHorizontalFlip -> optional ColorJitter).

    Runs inside ``BatchLoader`` worker threads and overlaps with device
    compute via ``device_prefetch`` — the reference's CPU-worker design.
    Host augmentation is the train default because the on-device
    ``augment_batch`` warp is a 4-tap gather, measured at 253 ms for a 224^2
    B=128 batch on v5e (gathers are slow on TPU), i.e. more than the train
    step itself.  ``make_train_augment`` prefers the fused native C++ twin
    (``NativeAugment``, 3.0x faster per core); this PIL path is the
    reference-faithful fallback (``WUT_NATIVE_AUGMENT=0``).

    RNG streams: see :class:`_KeyedRngMixin`.
    """

    def __init__(self, out_size: int, *, degrees: float = 10.0,
                 hflip: bool = True, resized_crop: bool = False,
                 crop_scale=(0.08, 1.0), crop_ratio=(3.0 / 4.0, 4.0 / 3.0),
                 brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0, seed: int = 0):
        self.out_size = out_size
        self.degrees = degrees
        self.hflip = hflip
        self.resized_crop = resized_crop
        self.crop_scale = crop_scale
        self.crop_ratio = crop_ratio
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self._rng_init(seed)

    def _sample_crop(self, rng, w, h):
        """torchvision RandomResizedCrop.get_params: 10 rejection attempts,
        then center-crop fallback."""
        area = w * h
        for _ in range(10):
            target = area * rng.uniform(*self.crop_scale)
            ar = math.exp(rng.uniform(math.log(self.crop_ratio[0]),
                                      math.log(self.crop_ratio[1])))
            cw = int(round(math.sqrt(target * ar)))
            ch = int(round(math.sqrt(target / ar)))
            if 0 < cw <= w and 0 < ch <= h:
                x0 = int(rng.integers(0, w - cw + 1))
                y0 = int(rng.integers(0, h - ch + 1))
                return x0, y0, cw, ch
        in_ratio = w / h
        if in_ratio < self.crop_ratio[0]:
            cw, ch = w, int(round(w / self.crop_ratio[0]))
        elif in_ratio > self.crop_ratio[1]:
            cw, ch = int(round(h * self.crop_ratio[1])), h
        else:
            cw, ch = w, h
        return (w - cw) // 2, (h - ch) // 2, cw, ch

    def __call__(self, image_u8):
        """uint8 HWC -> augmented uint8 HWC at ``out_size`` (counter
        stream)."""
        return self._apply(image_u8, self._rng())

    def augment_keyed(self, image_u8, path: str):
        """Same, but on the schedule-independent ``(seed, epoch, path, k)``
        stream — the datasets' ``_load`` seam calls this."""
        return self._apply(image_u8, self._rng_keyed(path))

    def _apply(self, image_u8, rng):
        from PIL import Image, ImageEnhance
        import numpy as _np

        im = Image.fromarray(image_u8)
        if self.degrees:
            angle = rng.uniform(-self.degrees, self.degrees)
            im = im.rotate(angle, resample=Image.BILINEAR)
        if self.resized_crop:
            x0, y0, cw, ch = self._sample_crop(rng, im.width, im.height)
            im = im.resize((self.out_size, self.out_size), Image.BILINEAR,
                           box=(x0, y0, x0 + cw, y0 + ch))
        elif im.size != (self.out_size, self.out_size):
            im = im.resize((self.out_size, self.out_size), Image.BILINEAR)
        if self.hflip and rng.random() < 0.5:
            im = im.transpose(Image.FLIP_LEFT_RIGHT)
        jitters = []
        if self.brightness:
            f = rng.uniform(max(0.0, 1 - self.brightness), 1 + self.brightness)
            jitters.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast:
            f = rng.uniform(max(0.0, 1 - self.contrast), 1 + self.contrast)
            jitters.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
        if self.saturation:
            f = rng.uniform(max(0.0, 1 - self.saturation), 1 + self.saturation)
            jitters.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
        rng.shuffle(jitters)        # torchvision shuffles the jitter order
        for j in jitters:
            im = j(im)
        return _np.asarray(im, dtype=_np.uint8)


class NativeAugment(_KeyedRngMixin):
    """Fused native train augmentation: JPEG decode -> one composed affine
    resample (rotation o resized-crop o hflip) -> color jitter, in one
    GIL-free C++ call per image (``runtime/augment.cc``).

    Host twin of the on-device ``augment_batch`` kernel — same single
    inverse-affine map (``affine_from_uniforms``), same jitter formulas —
    rather than the reference's three sequential PIL resamplings
    (``t_cls_train.py:81-102``).  Documented deviations from torchvision
    (same as the device path): single-pass affine means no PIL antialiasing
    on downscale and rotation/crop are composed instead of sequential;
    jitter order is fixed brightness -> contrast -> saturation.

    Randomness: numpy streams per :class:`_KeyedRngMixin` (``from_path`` and
    ``augment_keyed`` ride the schedule-independent keyed streams; bare
    ``__call__`` the legacy counter); the drawn uniforms parameterize the C
    affine so runs are deterministic.
    """

    def __init__(self, out_size: int, *, degrees: float = 10.0,
                 hflip: bool = True, resized_crop: bool = False,
                 crop_scale=(0.08, 1.0), crop_ratio=(3.0 / 4.0, 4.0 / 3.0),
                 brightness: float = 0.0, contrast: float = 0.0,
                 saturation: float = 0.0, seed: int = 0):
        from weather_unet_tpu import runtime

        if not runtime.augment_available():
            raise RuntimeError(
                "native augment runtime not built or stale "
                "(make -C weather_unet_tpu/runtime)")
        self._runtime = runtime
        self.out_size = out_size
        self.degrees = degrees
        self.hflip = hflip
        self.resized_crop = resized_crop
        self.crop_scale = crop_scale
        self.crop_ratio = crop_ratio
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self._rng_init(seed)

    def _draw(self, rng):
        """(uniforms[6], jitter factors[3]); factor -1 disables a jitter."""
        import numpy as _np

        u = rng.random(6).astype(_np.float32)
        fs = []
        for j in (self.brightness, self.contrast, self.saturation):
            fs.append(rng.uniform(max(0.0, 1 - j), 1 + j) if j else -1.0)
        return u, _np.asarray(fs, dtype=_np.float32)

    def _cfg_kwargs(self):
        return dict(degrees=self.degrees, resized_crop=self.resized_crop,
                    crop_scale=self.crop_scale, crop_ratio=self.crop_ratio,
                    hflip=self.hflip, out_size=self.out_size)

    def from_path(self, path: str):
        """Fused decode+augment on the keyed stream; raises IOError on a bad
        file so dataset skip-on-corrupt retry loops engage."""
        u, jit = self._draw(self._rng_keyed(path))
        out = self._runtime.decode_augment_file(path, u, jit,
                                                **self._cfg_kwargs())
        if out is None:
            raise IOError(f"native decode failed for {path}")
        return out

    def __call__(self, image_u8):
        """Augment an already-decoded uint8 HWC image (non-JPEG fallback,
        counter stream)."""
        return self._augment_arr(image_u8, self._rng())

    def augment_keyed(self, image_u8, path: str):
        """Augment a decoded image on the keyed stream (decode-cache and
        non-JPEG ``_load`` paths)."""
        return self._augment_arr(image_u8, self._rng_keyed(path))

    def _augment_arr(self, image_u8, rng):
        u, jit = self._draw(rng)
        h, w = image_u8.shape[:2]
        mat = self._runtime.make_affine(h, w, u, **self._cfg_kwargs())
        return self._runtime.augment_u8(image_u8, mat, jit, self.out_size)


def fork_stream(transform, offset: int = 1):
    """Clone a (possibly decode-cache-wrapped) train transform onto an
    INDEPENDENT keyed-RNG stream (``seed + offset``).

    The GAN trainers zip TWO loaders over one dataset (content + random
    streams); if both share one transform, a path in flight in both loaders
    races for the per-path draw counter ``k`` and the stream→image
    assignment becomes thread-scheduling-dependent again (review finding,
    round 5).  Give the second loader a forked dataset view
    (``datasets.with_transform``) carrying this clone; a cache wrapper is
    re-wrapped around the SAME shared cache."""
    import copy

    from weather_unet_tpu.data.cache import CachedAugment

    if isinstance(transform, CachedAugment):
        return CachedAugment(transform.cache,
                             fork_stream(transform.augment, offset))
    if isinstance(transform, _KeyedRngMixin):
        t = copy.copy(transform)
        t._rng_init(transform.seed + offset)
        return t
    return transform


def make_train_augment(out_size: int, *, resized_crop: bool = False,
                       brightness: float = 0.0, contrast: float = 0.0,
                       saturation: float = 0.0, seed: int = 0,
                       prefer_native: Optional[bool] = None):
    """Train-path augmentation factory: fused native C++ when the runtime is
    built (decode+augment in one GIL-free call — the fast path on this
    1-core host), PIL ``HostAugment`` otherwise.

    ``prefer_native=None`` auto-selects; set ``WUT_NATIVE_AUGMENT=0`` to force
    the reference-faithful PIL path (sequential torchvision-style resamples).
    """
    import os

    from weather_unet_tpu import runtime

    if prefer_native is None:
        prefer_native = (os.environ.get("WUT_NATIVE_AUGMENT", "1") != "0"
                         and runtime.augment_available())
    kw = dict(resized_crop=resized_crop, brightness=brightness,
              contrast=contrast, saturation=saturation, seed=seed)
    if prefer_native:
        return NativeAugment(out_size, **kw)
    return HostAugment(out_size, **kw)


def augment_batch(key, images_u8, cfg: AugmentConfig):
    """uint8 NHWC batch -> augmented, normalized float NHWC in [-1, 1]."""
    n, h, w, _ = images_u8.shape
    imgs = images_u8.astype(jnp.float32) / 255.0
    keys = jax.random.split(key, n * 2).reshape(n, 2)

    def one(img, ks):
        mat = _one_affine(ks[0], h, w, cfg)
        out = _affine_sample(img, mat, cfg.out_size)
        out = _color_jitter(ks[1], out, cfg)
        return out

    out = jax.vmap(one)(imgs, keys)
    return (out - cfg.mean) / cfg.std


def normalize_batch(images_u8, out_size: Optional[int] = None,
                    mean: float = 0.5, std: float = 0.5):
    """Test-path transform: optional resize + Normalize(0.5, 0.5)
    (``t_est_train.py:99-103``)."""
    from weather_unet_tpu.ops.resize import resize_bilinear_torch

    imgs = images_u8.astype(jnp.float32) / 255.0
    if out_size is not None and imgs.shape[1] != out_size:
        imgs = resize_bilinear_torch(imgs, out_size, out_size)
    return (imgs - mean) / std
