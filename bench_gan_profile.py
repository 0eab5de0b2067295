"""Profile the fused GAN combined train step (bf16 B=128 224^2) on TPU.

Runs the flagship training step (2 G fwd + G bwd + 3 D fwd + D bwd + 4
frozen ResNet-101 fwd, reference loop ``t_est_train.py:214-283``), captures a
jax.profiler trace of a few steady-state steps, and leaves the xplane file
under --trace_dir for offline analysis (tools/parse_xplane.py).

The step executable goes through the AOT cache (core/aot.py) so later
processes skip the ~25 min tunnel compile.
"""
import argparse
import functools
import os
import time

import numpy as np




def build_flagship_step(batch: int, dtype_name: str, size: int):
    """The flagship GAN combined step + fresh train state, shared with
    bench.py's train probe so both lower to identical HLO (one AOT cache
    entry serves profiler and headline bench)."""
    import jax
    import jax.numpy as jnp
    from weather_unet_tpu.models import ResNet101
    from weather_unet_tpu.train.gan import (GanConfig, build_gan_state,
                                            make_gan_step)

    dt = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    cfg = GanConfig(input_size=size, batch_size=batch, dtype=dt)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))
    est = ResNet101(num_classes=5, dtype=dt)
    est_vars = est.init(jax.random.key(1), jnp.zeros((1, size, size, 3), dt))

    def step_fn(state, est_vars, x, xl, rx, rl, key):
        est_apply = lambda imgs: est.apply(est_vars, imgs, train=False)
        fn = functools.partial(make_gan_step(gen, disc, est_apply, cfg),
                               do_g=True)
        return fn(state, x, xl, rx, rl, key)

    return step_fn, state, est_vars


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--trace_steps", type=int, default=3)
    ap.add_argument("--trace_dir", default="/tmp/gan_profile")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke-testing the script)")
    ap.add_argument("--dump_hlo", default=None,
                    help="also write the executable's optimized HLO text "
                         "here (feeds tools/parse_xplane.py --hlo, which "
                         "classifies anonymous fusions by body)")
    ap.add_argument("--prng", default="rbg",
                    choices=["threefry2x32", "rbg", "unsafe_rbg"],
                    help="impl for the per-step key (dropout masks); rbg = "
                         "hardware RNG, the trainer default (core/rng.py)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        # the axon TPU plugin ignores JAX_PLATFORMS; the config API works
        jax.config.update("jax_platforms", "cpu")
    step_fn, state, est_vars = build_flagship_step(args.batch, args.dtype,
                                                   args.size)
    import jax.numpy as jnp
    from weather_unet_tpu.core.aot import AotCache, default_cache_dir

    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    key = lambda s: jax.random.key(s, impl=args.prng)
    rng = np.random.default_rng(0)
    shp = (args.batch, args.size, args.size, 3)
    x = jnp.asarray(rng.standard_normal(shp).astype(np.float32)).astype(dt)
    rx = jnp.asarray(rng.standard_normal(shp).astype(np.float32)).astype(dt)
    zeros = jnp.zeros(args.batch, jnp.int32)

    cache = AotCache(default_cache_dir())
    t0 = time.perf_counter()
    step = cache.load_or_compile(
        step_fn, state, est_vars, x, zeros, rx, zeros, key(2),
        jit_kwargs={"donate_argnums": (0,)})
    print(f"executable ready in {time.perf_counter()-t0:.1f}s "
          f"(hits={cache.stats['hits']} misses={cache.stats['misses']})",
          flush=True)
    if args.dump_hlo:
        try:
            with open(args.dump_hlo, "w") as f:
                f.write(step.as_text())
            print(f"optimized HLO -> {args.dump_hlo}", flush=True)
        except Exception as e:  # deserialized executables may not carry HLO
            print(f"HLO dump unavailable: {e}", flush=True)

    # first dispatch pays the per-process program load (minutes on tunnel)
    t0 = time.perf_counter()
    state, m = step(state, est_vars, x, zeros, rx, zeros, key(2))
    print(f"first dispatch {time.perf_counter()-t0:.1f}s "
          f"g_loss={float(m['g_loss']):.3f}", flush=True)

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step(state, est_vars, x, zeros, rx, zeros,
                        key(3 + i))
    float(m["g_loss"])  # host read-back: the honest barrier on the tunnel
    dt_s = (time.perf_counter() - t0) / args.steps
    print(f"steady state: {dt_s*1e3:.1f} ms/step -> "
          f"{args.batch/dt_s:.1f} img/s", flush=True)

    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    for i in range(args.trace_steps):
        state, m = step(state, est_vars, x, zeros, rx, zeros,
                        key(100 + i))
    float(m["g_loss"])
    jax.profiler.stop_trace()
    print(f"trace written under {args.trace_dir}", flush=True)


if __name__ == "__main__":
    main()
