"""Headline benchmark: translated images/sec/chip, 256x256 cUNet transfer.

Runs the flagship conditional-UNet weather-transfer forward (the demo.py /
inf_transfer_c.py serving path) on the available accelerator and prints ONE
JSON line with throughput and p50 per-image latency.

Baseline: the reference publishes no numbers (BASELINE.md).  ``vs_baseline``
is therefore measured against a documented engineering estimate of the
PyTorch-1.1/V100 fp32 reference: the cUNet forward is ~84.5 GFLOPs/image at
256^2; at a realistic 30-40% conv utilization of a V100's 15.7 TFLOP/s fp32
that is ~60 images/sec.  BASELINE.json's target is >=5x that (>=300 img/s).

The estimate is anchored by a measurement: the same forward through the
pixel-parity torch mirror on this host's CPU (eager fp32, 1 thread) runs at
0.95 img/s = ~80 GFLOP/s effective; scaling by the V100/core peak ratio and
30-40% cuDNN utilization lands on 47-63 img/s — see BASELINE.md 'Measured
reference anchor'.

Serving config: bfloat16 compute (MXU native).  The f32 parity path is
covered by tests; measured bf16-vs-f32 output drift on v5e is 9.4e-4 MAE on
the [-1, 1] scale (0.12/255 pixel, p99 0.44/255) — within the <=1e-3 pixel
MAE target even in bf16.
"""

import json
import os
import time

import numpy as np

REFERENCE_IMG_PER_SEC = 60.0  # documented estimate, see module docstring


def train_probe(n_steps: int = 6):
    """GAN combined-step training throughput (224² bf16 B=128, the measured
    production config — docs/PERF.md).  Goes through the AOT executable
    cache shared with bench_gan_profile.py (identical HLO), so the usual
    cost here is a ~20 s deserialize, not a compile.  Soft-fails to None:
    the headline serving metric must survive any train-probe breakage.
    Skip with WUT_BENCH_TRAIN=0 (e.g. on a very slow link)."""
    if os.environ.get("WUT_BENCH_TRAIN", "1") == "0":
        return None
    try:
        import jax
        import jax.numpy as jnp
        from bench_gan_profile import build_flagship_step
        from weather_unet_tpu.core.aot import AotCache, default_cache_dir
        from weather_unet_tpu.core.rng import train_key

        step_fn, state, est_vars = build_flagship_step(128, "bf16", 224)
        rng = np.random.default_rng(0)
        shp = (128, 224, 224, 3)
        x = jnp.asarray(rng.standard_normal(shp).astype(np.float32)
                        ).astype(jnp.bfloat16)
        rx = jnp.asarray(rng.standard_normal(shp).astype(np.float32)
                         ).astype(jnp.bfloat16)
        zeros = jnp.zeros(128, jnp.int32)
        cache = AotCache(default_cache_dir())
        step = cache.load_or_compile(
            step_fn, state, est_vars, x, zeros, rx, zeros, train_key(2),
            jit_kwargs={"donate_argnums": (0,)})
        state, m = step(state, est_vars, x, zeros, rx, zeros, train_key(2))
        float(m["g_loss"])  # warm + honest barrier
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, m = step(state, est_vars, x, zeros, rx, zeros,
                            train_key(3 + i))
        float(m["g_loss"])
        return round(n_steps * 128 / (time.perf_counter() - t0), 2)
    except Exception as e:  # noqa: BLE001 — never break the headline metric
        import sys

        print(f"train probe skipped: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        return None


def train_real_probe(n_steps: int = 12):
    """REAL-data GAN training throughput: JPEG corpus on disk -> decoded-image
    cache (``--decode_cache``) -> BatchLoader worker threads -> the actual
    trainer epoch loop (VERDICT r4 weak #5: the driver-facing line carried
    only the synthetic step-bound number).  In this tunneled environment the
    result is dominated by the link's H2D weather (measured 107-162 img/s
    across sessions vs the ~346 img/s step bound — docs/INPUT_PIPELINE.md);
    the key makes the headline self-honest about synthetic vs real feed.
    Soft-fails to None; skip with WUT_BENCH_TRAIN_REAL=0."""
    if os.environ.get("WUT_BENCH_TRAIN_REAL", "1") == "0":
        return None
    try:
        import bench_trainer_loop

        out = bench_trainer_loop.run(
            128, "bf16", n_steps=n_steps, real_data=True,
            cache_dir=os.path.expanduser("~/.cache/wut_bench_dcache"),
            corpus_n=1536, quiet=True)
        return out["wall_images_per_sec"]
    except Exception as e:  # noqa: BLE001 — never break the headline metric
        import sys

        print(f"real-data train probe skipped: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)
        return None


def main():
    # HARD stdout shield for the driver contract (exactly ONE JSON line):
    # library code reached by the probes legitimately prints progress /
    # warnings (trainer NaN notice, cache-disabled note, resume lines) —
    # route EVERYTHING to stderr and print the record on the real stdout
    # at the end (review finding, round 5).
    import contextlib
    import sys

    real_stdout = sys.stdout
    with contextlib.redirect_stdout(sys.stderr):
        record = _measure()
    print(json.dumps(record), file=real_stdout, flush=True)


def _measure() -> dict:
    import jax
    import jax.numpy as jnp
    from weather_unet_tpu.models import ConditionalUNet

    batch, size = 128, 256
    model = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    # bf16 inputs: chaining output->input below must keep one compiled shape/dtype
    images = jnp.asarray(
        rng.standard_normal((batch, size, size, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    conds = jnp.asarray(
        np.eye(5, dtype=np.float32)[rng.integers(0, 5, batch)]
    ).astype(jnp.bfloat16)
    variables = model.init(jax.random.key(0), images[:1], conds[:1])

    def fwd(params, x, c):
        return model.apply({"params": params}, x, c)

    params = variables["params"]

    # AOT tier: the persistent XLA cache doesn't serialize executables on
    # this TPU backend, so a fresh bench process pays the ~60 s compile every
    # time; the serialized-executable cache (core/aot.py) cuts repeat runs to
    # a ~0.4 s deserialize (the tunnel's per-process program-load remains).
    # Any cache problem falls back to a plain jit.
    try:
        from weather_unet_tpu.core.aot import AotCache, AotJit, default_cache_dir

        translate = AotJit(fwd, AotCache(default_cache_dir()))
    except Exception:
        translate = jax.jit(fwd)

    def sync(x):
        # On the axon tunnel block_until_ready can return before remote
        # execution finishes; a host read-back is the only honest barrier.
        return float(jnp.sum(x[0, 0, 0]))

    # warmup + compile
    sync(translate(params, images, conds))

    # throughput: repeated batched translation, chained so iterations can't
    # be skipped, with a host read-back barrier at the end
    n_iter = 20
    t0 = time.perf_counter()
    out = images
    for _ in range(n_iter):
        out = translate(params, out, conds)
    sync(out)
    dt = time.perf_counter() - t0
    img_per_sec = n_iter * batch / dt

    # p50 per-image latency: batch-1 round trips (includes host sync)
    one_img, one_c = images[:1], conds[:1]
    sync(translate(params, one_img, one_c))
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        sync(translate(params, one_img, one_c))
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1e3)

    record = {
        "metric": "translated images/sec/chip, 256x256 cUNet transfer (bf16)",
        "value": round(img_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_IMG_PER_SEC, 3),
        "p50_latency_ms": round(p50_ms, 3),
        "batch": batch,
        "device": str(jax.devices()[0]),
    }
    train_ips = train_probe()
    if train_ips is not None:
        # full GAN combined train step (224² bf16 B=128, hardware-RNG keys)
        record["train_img_per_sec"] = train_ips
    real_ips = train_real_probe()
    if real_ips is not None:
        # same trainer fed by the REAL input pipeline (disk JPEGs through the
        # decoded-image cache); tunnel-H2D-bound here, step-bound on PCIe
        # hosts — docs/INPUT_PIPELINE.md
        record["train_real_img_per_sec"] = real_ips
    return record


if __name__ == "__main__":
    main()
