"""Why does the real-data trainer epoch run ~121 img/s when the loader alone
does 368-1226 img/s, H2D measures ~1.3 GB/s, and the step-only bound is
~340 img/s?  One process, same trainer, three feeds:

  C1: device-staged synthetic batches (the round-3 harness) — loop floor
  C2: in-memory NUMPY batches (no decode/augment work, but the per-step
      device_put path the real pipeline pays)
  C3: the real cached loader (memmap read + native augment)

If C2 << C1 throughput, the numpy->device staging path inside
device_prefetch (sharded device_put through the tunnel while steps
dispatch) is the bottleneck, not host decode/augment.
"""

import json
import time

import numpy as np

from bench_trainer_loop import RealLoader, SyntheticLoader


class NumpyLoader:
    """Pre-built in-memory numpy batches: zero host image work, real H2D."""

    def __init__(self, batch, size, n_batches, seed=0):
        rng = np.random.default_rng(seed)
        self.batches = [
            (rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8),
             rng.standard_normal((batch, 5)).astype(np.float32))
            for _ in range(4)]
        self.n = n_batches

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            yield self.batches[i % len(self.batches)]


def main(batch=128, size=224, n=24):
    import jax
    import jax.numpy as jnp

    from weather_unet_tpu.core.aot import default_cache_dir
    from weather_unet_tpu.core.profiling import enable_compilation_cache

    enable_compilation_cache()
    from bench_input_pipeline import ensure_corpus
    from weather_unet_tpu.models import ResNet101
    from weather_unet_tpu.train.gan import GanConfig
    from weather_unet_tpu.train.loops import WeatherTransferTrainer

    dt = jnp.bfloat16
    cfg = GanConfig(input_size=size, batch_size=batch, dtype=dt, num_epoch=1)
    est = ResNet101(num_classes=5, dtype=dt)
    est_vars = est.init(jax.random.key(1), jnp.zeros((1, size, size, 3), dt))
    est_apply = lambda imgs: est.apply(est_vars, imgs, train=False)

    import tempfile
    tmp = tempfile.mkdtemp()
    tr = WeatherTransferTrainer(cfg, est_apply, save_dir=tmp, name="diag",
                                log_dir=tmp, aot_cache=default_cache_dir())
    tr.train_epoch(SyntheticLoader(batch, size, 3),
                   SyntheticLoader(batch, size, 3))
    tr.DISPLAY_PER_STEP = 10 ** 9
    tr.EVAL_PER_STEP = 10 ** 9

    def epoch(mk):
        tl, rl = mk(1), mk(2)
        tr._window_t0 = None
        tr._window_steps = 0
        t0 = time.perf_counter()
        tr.train_epoch(tl, rl)
        tr.update_summary()
        wall = time.perf_counter() - t0
        return round(len(tl) * batch / wall, 1)

    paths = ensure_corpus(n=3072)
    results = {}
    results["C1_device_staged"] = epoch(
        lambda s: SyntheticLoader(batch, size, n, seed=s))
    results["C2_numpy_staged"] = epoch(
        lambda s: NumpyLoader(batch, size, n, seed=s))
    results["C3_real_cached"] = epoch(
        lambda s: RealLoader(paths, batch, size, seed=s,
                             cache_dir="/tmp/wut_dcache"))
    results["C1_again"] = epoch(
        lambda s: SyntheticLoader(batch, size, n, seed=s))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
