"""Host input-pipeline decomposition: what can this host actually feed?

VERDICT r3 weak #1: every trainer bench was synthetic-fed; the real-data
path had never been measured.  This harness builds a reusable JPEG corpus
(semi-realistic content: low-frequency fields + photo-like noise — pure
noise JPEGs maximize DCT coefficients and overstate decode cost) and
measures each candidate host pipeline per stage, so the trainer default is
chosen from data (see bench_trainer_loop.py --real-data for the end-to-end
TPU number):

  A. fused native decode+augment (the current train default)
  B. native decode only, at the augment base size (device_augment input)
  C. augment only, from pre-decoded in-memory u8 (decoded-cache scenario)
  D. memmap decoded-cache read + native augment (cache epoch steady state)
  E. PIL decode+augment (reference-faithful fallback)

Run: python bench_input_pipeline.py  (host-only; no TPU needed)
"""

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

CORPUS_DIR = os.path.expanduser("~/.cache/wut_bench_corpus")
CORPUS_N = 512            # enough files that the page cache isn't the story
SRC_H, SRC_W = 480, 640   # typical flickr source ahead of 224^2 crops


def ensure_corpus(n=CORPUS_N, directory=CORPUS_DIR):
    """Idempotent synthetic photo corpus (gradients + shapes + mild noise)."""
    from PIL import Image

    os.makedirs(directory, exist_ok=True)
    existing = sorted(
        os.path.join(directory, f) for f in os.listdir(directory)
        if f.endswith(".jpg"))
    if len(existing) >= n:
        return existing[:n]
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:SRC_H, 0:SRC_W].astype(np.float32)
    paths = []
    for i in range(n):
        # smooth low-frequency field per channel + blocks + mild sensor noise
        img = np.zeros((SRC_H, SRC_W, 3), np.float32)
        for ch in range(3):
            fx, fy = rng.uniform(0.5, 3.0, 2)
            ph = rng.uniform(0, 2 * np.pi, 2)
            img[..., ch] = (
                0.5 + 0.25 * np.sin(2 * np.pi * fx * xx / SRC_W + ph[0])
                + 0.25 * np.cos(2 * np.pi * fy * yy / SRC_H + ph[1]))
        for _ in range(6):   # a few hard-edged rectangles (foreground-ish)
            y0, x0 = rng.integers(0, SRC_H - 60), rng.integers(0, SRC_W - 80)
            img[y0:y0 + 60, x0:x0 + 80] = rng.uniform(0, 1, 3)
        img += rng.normal(0, 0.02, img.shape).astype(np.float32)
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        p = os.path.join(directory, f"{i:05d}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    return paths


def _rate(fn, items, n_iter=2, pool=None):
    fn(items[0])   # warmup
    t0 = time.perf_counter()
    for _ in range(n_iter):
        if pool is None:
            for p in items:
                fn(p)
        else:
            list(pool.map(fn, items))
    return n_iter * len(items) / (time.perf_counter() - t0)


def main():
    from PIL import Image

    from weather_unet_tpu import runtime
    from weather_unet_tpu.data.transforms import HostAugment, NativeAugment

    if not runtime.native_available() and not runtime.build():
        raise SystemExit("native runtime not built")

    paths = ensure_corpus()
    sample = paths[:192]
    out, base = 224, int(224 * 1.15)   # train crop and pre-augment base
    kw = dict(resized_crop=True, brightness=0.5, contrast=0.3, saturation=0.3)
    nat = NativeAugment(out, **kw)
    pil = HostAugment(out, **kw)

    results = {}

    # A. fused decode+augment (current default)
    results["A_decode_augment"] = _rate(nat.from_path, sample)

    # B. decode only at base size (what device_augment would consume)
    results["B_decode_only_base"] = _rate(
        lambda p: runtime.decode_file(p, base), sample)
    results["B2_decode_only_224"] = _rate(
        lambda p: runtime.decode_file(p, out), sample)

    # C. augment only from in-memory pre-decoded u8 (cache steady state)
    decoded = [runtime.decode_file(p, base) for p in sample[:64]]
    results["C_augment_only_base"] = _rate(nat, decoded)
    decoded_full = [np.asarray(Image.open(p).convert("RGB")) for p in sample[:32]]
    results["C2_augment_only_full"] = _rate(nat, decoded_full)

    # D. memmap cache read + augment (epoch steady state of a decoded cache)
    cache = np.lib.format.open_memmap(
        "/tmp/wut_cache_bench.npy", mode="w+",
        dtype=np.uint8, shape=(len(sample), base, base, 3))
    for i, p in enumerate(sample):
        cache[i] = runtime.decode_file(p, base)
    cache.flush()
    ro = np.lib.format.open_memmap("/tmp/wut_cache_bench.npy", mode="r")
    results["D_cache_read_augment"] = _rate(
        lambda i: nat(np.asarray(ro[i])), list(range(len(sample))))

    # E. reference-faithful PIL decode+augment
    def pil_one(p):
        with Image.open(p) as im:
            return pil(np.asarray(im.convert("RGB"), np.uint8))

    results["E_pil_decode_augment"] = _rate(pil_one, sample[:64])

    # thread-pool variants (1-core host: expect little; real hosts scale)
    with ThreadPoolExecutor(8) as tp:
        results["A_pool8"] = _rate(nat.from_path, sample, pool=tp)
        results["D_pool8"] = _rate(
            lambda i: nat(np.asarray(ro[i])), list(range(len(sample))), pool=tp)

    ncpu = os.cpu_count()
    print(json.dumps({k: round(v, 1) for k, v in results.items()}
                     | {"host_cores": ncpu}))


if __name__ == "__main__":
    main()
