"""Host input-pipeline bench: PIL vs native fused decode+augment.

Measures per-image host cost of the train-path transform stack
(decode -> rotate/crop/flip -> jitter -> u8), the work the reference does in
DataLoader worker processes (t_cls_train.py:81-102) and we do in BatchLoader
threads.  The native path (runtime/augment.cc) fuses JPEG decode with ONE
composed inverse-affine resample and the jitter epilogue in a single GIL-free
C++ call; PIL runs three sequential resamples plus enhance passes.

Run: python bench_host_augment.py  (host-only; no TPU needed)
"""

import json
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def main():
    from PIL import Image

    from weather_unet_tpu import runtime
    from weather_unet_tpu.data.transforms import HostAugment, NativeAugment

    if not runtime.native_available() and not runtime.build():
        raise SystemExit("native runtime not built")

    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="wut_bench_aug_")
    paths = []
    # typical flickr source size ahead of 224^2 training crops
    for i in range(32):
        arr = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
        p = f"{tmp}/{i}.jpg"
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)

    out = 224
    kw = dict(resized_crop=True, brightness=0.5, contrast=0.3, saturation=0.3)
    pil = HostAugment(out, **kw)
    nat = NativeAugment(out, **kw)

    def pil_one(p):
        with Image.open(p) as im:
            return pil(np.asarray(im.convert("RGB"), np.uint8))

    def nat_one(p):
        return nat.from_path(p)

    def bench(fn, n_iter=4, pool=None):
        # warmup
        fn(paths[0])
        t0 = time.perf_counter()
        for _ in range(n_iter):
            if pool is None:
                for p in paths:
                    fn(p)
            else:
                list(pool.map(fn, paths))
        dt = time.perf_counter() - t0
        return n_iter * len(paths) / dt

    results = {
        "pil_img_per_s": round(bench(pil_one), 1),
        "native_img_per_s": round(bench(nat_one), 1),
    }
    with ThreadPoolExecutor(8) as pool:
        results["pil_pool8_img_per_s"] = round(bench(pil_one, pool=pool), 1)
        results["native_pool8_img_per_s"] = round(bench(nat_one, pool=pool), 1)
    results["speedup_1thread"] = round(
        results["native_img_per_s"] / results["pil_img_per_s"], 2)
    results["speedup_pool8"] = round(
        results["native_pool8_img_per_s"] / results["pil_pool8_img_per_s"], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
