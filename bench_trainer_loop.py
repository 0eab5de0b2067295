"""Trainer-LOOP throughput on TPU (VERDICT r1 item 2 'done' criterion).

Runs the actual ``WeatherTransferTrainer`` epoch loop — fused one-dispatch
steps, host-side bookkeeping, device_prefetch, summary cadence — over
synthetic in-memory uint8 batches, and reports images/sec from the loop's own
summary-window accounting.  The claim under test: with metrics kept on device
between summaries and the whole step (normalize + keys + GAN update) in one
dispatch, the real trainer tracks bench_train.py's step-only number.

Measured (v5e via the axon tunnel, rbg keys, data pre-staged): bf16 B=128
336.7 img/s (two runs: 336.6/336.9) = 99% of the 340 img/s fused-step bound
(bench_trainer_isolate.py phase A; the fused step includes uint8
normalize).  Round 2's '282 img/s = 92%' was the staging artifact, not loop
overhead.  The f32 B=8 config is
tunnel-RTT-bound at its 45 ms step granularity — identical code measured
28-175 img/s across runs as tunnel latency wandered; treat small-batch
numbers from this harness as a measure of the link, not the loop
(see bench_trainer_diag.py).
"""

import json
import time

import numpy as np


class SyntheticLoader:
    """Pre-staged DEVICE batches: isolates loop/dispatch overhead from the
    tunnel's H2D bandwidth (bench_train.py's step-only number also has its
    data pre-staged, so this is the like-for-like comparison; device_prefetch
    passes jax arrays through untouched)."""

    def __init__(self, batch, size, n_batches, seed=0):
        import jax

        rng = np.random.default_rng(seed)
        self.batches = [
            tuple(jax.device_put(a) for a in
                  (rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8),
                   rng.standard_normal((batch, 5)).astype(np.float32)))
            for _ in range(4)]
        self.n = n_batches

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            yield self.batches[i % len(self.batches)]


class RealLoader:
    """Real input pipeline: JPEG corpus on disk -> BatchLoader worker threads
    running the native fused decode+augment (or decoded-cache + augment) ->
    the trainer's own device_prefetch.  This is the pipeline a real training
    run pays, measured end-to-end against the TPU (VERDICT r3 weak #1: every
    prior trainer bench was synthetic-fed)."""

    def __init__(self, paths, batch, size, *, seed=0, cache_dir=None,
                 num_workers=4):
        import numpy as np

        from weather_unet_tpu.data.pipeline import BatchLoader
        from weather_unet_tpu.data.transforms import make_train_augment

        base = int(size * 1.15)
        aug = make_train_augment(size, resized_crop=True, seed=seed)
        if cache_dir:
            from weather_unet_tpu.data.cache import CachedAugment, DecodedCache

            aug = CachedAugment(
                DecodedCache(cache_dir, base_size=base, paths=paths), aug)
        conds = np.random.default_rng(seed).standard_normal(
            (len(paths), 5)).astype(np.float32)

        outer = self

        class _DS:
            def __len__(self):
                return len(paths)

            def __getitem__(self, i):
                return outer._aug.from_path(paths[i]), conds[i]

        self._aug = aug
        self._loader = BatchLoader(_DS(), batch_size=batch, shuffle=True,
                                   num_workers=num_workers, seed=seed)

    def __len__(self):
        return len(self._loader)

    def set_epoch(self, e):
        self._loader.set_epoch(e)

    def __iter__(self):
        return iter(self._loader)


def run(batch, dtype_name, n_steps=40, real_data=False, cache_dir=None,
        corpus_n=3072, quiet=False):
    """Measure the trainer loop; returns the result dict.  ``quiet=True``
    suppresses the JSON print (bench.py embeds the result in its own
    one-line driver contract)."""
    import jax
    import jax.numpy as jnp

    from weather_unet_tpu.core.aot import default_cache_dir
    from weather_unet_tpu.core.profiling import enable_compilation_cache

    enable_compilation_cache()
    from weather_unet_tpu.models import ResNet101
    from weather_unet_tpu.train.gan import GanConfig
    from weather_unet_tpu.train.loops import WeatherTransferTrainer

    dt = jnp.float32 if dtype_name == "f32" else jnp.bfloat16
    size = 224
    cfg = GanConfig(input_size=size, batch_size=batch, dtype=dt, num_epoch=1)
    est = ResNet101(num_classes=5, dtype=dt)
    est_vars = est.init(jax.random.key(1), jnp.zeros((1, size, size, 3), dt))
    est_apply = lambda imgs: est.apply(est_vars, imgs, train=False)

    import tempfile
    tmp = tempfile.mkdtemp()
    tr = WeatherTransferTrainer(cfg, est_apply, save_dir=tmp, name="bench",
                                log_dir=tmp,
                                aot_cache=default_cache_dir())
    # warm-up epoch compiles both step variants + augment
    tr.train_epoch(SyntheticLoader(batch, size, 3), SyntheticLoader(batch, size, 3))
    # measured epoch: the loop's own summary window gives img/s; also wrap
    # wall-clock around the epoch with a forced host read at the end
    tr.DISPLAY_PER_STEP = 10 ** 9   # don't fire mid-epoch
    tr.EVAL_PER_STEP = 10 ** 9

    if real_data:
        from bench_input_pipeline import ensure_corpus

        paths = ensure_corpus(n=corpus_n)   # 3072 -> 24 B=128 steps/epoch
        # content + random streams each decode+augment a full batch per step
        # (the reference zips two DataLoaders, t_est_train.py:362) — 2B
        # host images per step, the honest load.  Both streams share one
        # decoded cache (same source images, different shuffles/augments).
        train_ld = RealLoader(paths, batch, size, seed=1, cache_dir=cache_dir)
        rand_ld = RealLoader(paths, batch, size, seed=2, cache_dir=cache_dir)

        # honor --steps here too (an epoch of the default corpus is 24
        # steps; without this cap the flag was silently ignored in
        # real-data mode)
        class _Limit:
            def __init__(self, ld, n):
                self.ld, self.n = ld, n

            def __len__(self):
                return min(len(self.ld), self.n)

            def __iter__(self):
                import itertools

                return itertools.islice(iter(self.ld), self.n)

        if cache_dir:
            # warm epoch: fill the decode cache over the FULL corpus (the
            # loaders reshuffle per __iter__, so a --steps-capped warm pass
            # would leave the timed epoch paying decode misses on whichever
            # images the next shuffle draws)
            t_fill = time.perf_counter()
            for ld in (train_ld, rand_ld):
                for _ in ld:
                    pass
            fill_s = time.perf_counter() - t_fill
        train_ld = _Limit(train_ld, n_steps)
        rand_ld = _Limit(rand_ld, n_steps)
        tr._window_t0 = None
        tr._window_steps = 0
        t0 = time.perf_counter()
        tr.train_epoch(train_ld, rand_ld)
        tr.update_summary()
        wall = time.perf_counter() - t0
        steps = len(train_ld)
        out = {
            "config": (f"trainer loop {dtype_name} B={batch} REAL DATA "
                       + ("decoded-cache" if cache_dir else "fused decode+augment")),
            "images_per_sec": round(tr.scalar_dict.get("perf/images_per_sec", 0.0), 1),
            "wall_images_per_sec": round(steps * batch / wall, 1),
            "steps": steps,
            "corpus": len(paths),
        }
        if cache_dir:
            out["cache_fill_sec"] = round(fill_s, 1)
        if not quiet:
            print(json.dumps(out), flush=True)
        return out
    # Pre-stage the synthetic batches BEFORE the timed window.  Loader
    # construction device_puts ~77 MB per loader; over the tunnel's
    # 40-110 MB/s H2D (it wobbles) that is 1.5-4 s *inside* the window if
    # constructed inline — which mismeasured the loop at 138-282 img/s
    # across identical runs (bench_trainer_isolate.py phases A/B/C).
    # bench_train.py's step-only number has its data pre-staged, so this is
    # the like-for-like loop-overhead measurement; real (non-tunneled) TPU
    # hosts stage batches over PCIe/DMA where this term is noise.
    import jax
    train_ld = SyntheticLoader(batch, size, n_steps)
    rand_ld = SyntheticLoader(batch, size, n_steps)
    for ld in (train_ld, rand_ld):
        for arrs in ld.batches:
            jax.block_until_ready(arrs)
    tr._window_t0 = None
    tr._window_steps = 0
    t0 = time.perf_counter()
    tr.train_epoch(train_ld, rand_ld)
    tr.update_summary()            # sync point: reads metrics back
    wall = time.perf_counter() - t0
    ips_window = tr.scalar_dict.get("perf/images_per_sec", 0.0)
    out = {
        "config": f"trainer loop {dtype_name} B={batch}",
        "images_per_sec": round(ips_window, 1),
        "wall_images_per_sec": round(n_steps * batch / wall, 1),
        "steps": n_steps,
    }
    if not quiet:
        print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--real-data", action="store_true",
                    help="feed the trainer from a JPEG corpus through the "
                         "real BatchLoader pipeline instead of pre-staged "
                         "synthetic device arrays")
    ap.add_argument("--cache", type=str, default=None,
                    help="decoded-image cache dir (real-data mode): decode "
                         "once, augment per epoch")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", type=str, default="bf16")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--corpus", type=int, default=3072)
    args = ap.parse_args()
    if args.real_data:
        run(args.batch, args.dtype, n_steps=args.steps, real_data=True,
            cache_dir=args.cache, corpus_n=args.corpus)
    else:
        run(8, "f32", n_steps=args.steps)
        run(args.batch, args.dtype, n_steps=args.steps)
