"""Isolate trainer-loop overhead: step dispatch vs prefetch pipeline.

bench_gan_profile.py's bare step measures a stable 385 ms (bf16 B=128) while
bench_trainer_loop.py's full epoch wobbles at 470-930 ms/step on the same
chip minutes apart.  This harness times, in ONE process:

  A. the trainer's own jitted fused step (``tr._step_dg``) called in a tight
     loop on fixed device-resident args — the loop's floor;
  B. iterating the ``device_prefetch``-wrapped synthetic loaders alone
     (no step) — the data-path overhead;
  C. the real ``train_epoch`` — the number bench_trainer_loop reports.

If C >> A + B/step, the interaction (e.g. re-sharding device_put staging
through the host tunnel while steps dispatch) is the problem, not either
half alone.
"""
import json
import time

import numpy as np

from bench_trainer_loop import SyntheticLoader


def main(batch=128, dtype_name="bf16", n=40):
    import jax
    import jax.numpy as jnp

    from weather_unet_tpu.core.aot import default_cache_dir
    from weather_unet_tpu.core.profiling import enable_compilation_cache

    enable_compilation_cache()
    from weather_unet_tpu.data.pipeline import device_prefetch
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
    tr = WeatherTransferTrainer(cfg, est_apply, save_dir=tmp, name="iso",
                                log_dir=tmp,
                                aot_cache=default_cache_dir())
    tr.train_epoch(SyntheticLoader(batch, size, 3), SyntheticLoader(batch, size, 3))
    tr.DISPLAY_PER_STEP = 10 ** 9
    tr.EVAL_PER_STEP = 10 ** 9

    # A: bare fused-step dispatch loop on fixed device args
    bsh = tr.plan.batch()
    ld = SyntheticLoader(batch, size, 1)
    (img, _), = list(ld)
    img = jax.device_put(img, bsh)
    zeros = jax.device_put(np.zeros(batch, np.int32), bsh)
    key = tr._base_key
    state = tr.state
    state, m = tr._step_dg(state, img, zeros, img, zeros, key, np.uint32(1))
    float(m["g_loss"])
    t0 = time.perf_counter()
    for i in range(n):
        state, m = tr._step_dg(state, img, zeros, img, zeros, key,
                               np.uint32(2 + i))
    float(m["g_loss"])
    a = (time.perf_counter() - t0) / n
    print(json.dumps({"phase": "A bare fused step", "ms_per_step":
                      round(a * 1e3, 1), "img_per_s": round(batch / a, 1)}),
          flush=True)
    tr.state = state   # keep donation bookkeeping consistent

    # B: prefetch pipeline alone (no step)
    fields = [0]
    t0 = time.perf_counter()
    cnt = 0
    for data, rand in zip(
            device_prefetch(SyntheticLoader(batch, size, n), sharding=bsh,
                            device_fields=fields),
            device_prefetch(SyntheticLoader(batch, size, n), sharding=bsh,
                            device_fields=fields)):
        jax.block_until_ready(data[0])
        cnt += 1
    b = (time.perf_counter() - t0) / max(cnt, 1)
    print(json.dumps({"phase": "B prefetch only", "ms_per_batch":
                      round(b * 1e3, 1)}), flush=True)

    # C: the real epoch
    tr._window_t0 = None
    tr._window_steps = 0
    t0 = time.perf_counter()
    tr.train_epoch(SyntheticLoader(batch, size, n),
                   SyntheticLoader(batch, size, n))
    tr.update_summary()
    wall = time.perf_counter() - t0
    print(json.dumps({"phase": "C full epoch", "ms_per_step":
                      round(wall / n * 1e3, 1),
                      "img_per_s": round(n * batch / wall, 1)}), flush=True)


if __name__ == "__main__":
    main()
