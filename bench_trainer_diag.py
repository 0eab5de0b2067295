"""Trainer-loop overhead breakdown on TPU (f32 B=8, the reference config).

History: the pre-fusion trainer issued ~7 tunnel dispatches per step (rng
split + indexing, 2 augment/normalize calls, the step); measured overhead over
the 39 ms raw step ranged from +11 ms/step (quiet tunnel) to +370 ms/step
(RTT spikes).  The fused trainer ships ONE dispatch per step — normalize/
augment and per-step key fold_in run inside the jitted step; conditions and
the uint32 step counter travel with the call.

Variants (cumulative, one process):
  raw : the fused step in a tight loop, fixed pre-staged uint8 device inputs
  feed: + batch cycling through device_prefetch (trainer's input path)
  full: tr.train_epoch over SyntheticLoader (everything: bookkeeping, window
        accounting, gd-ratio branch)
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from weather_unet_tpu.core.profiling import enable_compilation_cache
    from weather_unet_tpu.data.pipeline import device_prefetch
    from weather_unet_tpu.models import ResNet101
    from weather_unet_tpu.train.gan import GanConfig
    from weather_unet_tpu.train.loops import WeatherTransferTrainer
    from bench_trainer_loop import SyntheticLoader

    enable_compilation_cache()
    batch, size = 8, 224
    cfg = GanConfig(input_size=size, batch_size=batch, num_epoch=1)
    est = ResNet101(num_classes=5)
    est_vars = est.init(jax.random.key(1), jnp.zeros((1, size, size, 3)))
    est_apply = lambda imgs: est.apply(est_vars, imgs, train=False)
    import tempfile
    tmp = tempfile.mkdtemp()
    tr = WeatherTransferTrainer(cfg, est_apply, save_dir=tmp, name="diag",
                                log_dir=tmp)
    tr.DISPLAY_PER_STEP = tr.EVAL_PER_STEP = 10 ** 9

    rng = np.random.default_rng(0)
    u8 = jax.device_put(
        rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8))
    zeros = jnp.zeros(batch, jnp.int32)
    base = tr._base_key

    n = 20

    def timed(label, fn):
        fn()  # warm (compile)
        float(tr._last_metrics["g_loss"])
        t0 = time.perf_counter()
        fn()
        float(tr._last_metrics["g_loss"])  # honest tunnel barrier
        dt = (time.perf_counter() - t0) / n
        print(f"{label}: {dt*1e3:.1f} ms/step -> {batch/dt:.1f} img/s",
              flush=True)

    def raw():
        for i in range(n):
            tr.state, tr._last_metrics = tr._step_dg(
                tr.state, u8, zeros, u8, zeros, base, np.uint32(i))

    def feed():
        bsh = tr.plan.batch()
        zipped = zip(
            device_prefetch(SyntheticLoader(batch, size, n), sharding=bsh,
                            device_fields=[0]),
            device_prefetch(SyntheticLoader(batch, size, n), sharding=bsh,
                            device_fields=[0]))
        for i, (data, rand_data) in enumerate(zipped):
            tr.state, tr._last_metrics = tr._step_dg(
                tr.state, data[0], zeros, rand_data[0], zeros, base,
                np.uint32(1000 + i))

    def full():
        tr.train_epoch(SyntheticLoader(batch, size, n),
                       SyntheticLoader(batch, size, n))

    timed("raw ", raw)
    timed("feed", feed)
    timed("full", full)


if __name__ == "__main__":
    main()
