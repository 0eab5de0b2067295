"""Training-step throughput on TPU: full semi-supervised GAN combined step
(2 G fwd + G bwd + 3 D fwd + D bwd + 4 frozen ResNet-101 fwd) at the
reference config (224^2, batch 8) and a TPU-friendly config (batch 128).

Step keys use the trainer default impl (core/rng.py, hardware rbg): the
threefry dropout masks it replaces measured ~42 ms of the 427 ms bf16
B=128 step (427->385 ms, 300->332 img/s, bench_gan_profile.py)."""
import functools, time
import numpy as np, jax, jax.numpy as jnp
from weather_unet_tpu.models import ResNet101
from weather_unet_tpu.core.rng import train_key
from weather_unet_tpu.train.gan import GanConfig, build_gan_state, make_gan_step

def run(batch, dtype_name):
    dt = jnp.float32 if dtype_name == "f32" else jnp.bfloat16
    cfg = GanConfig(input_size=224, batch_size=batch, dtype=dt)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))
    est = ResNet101(num_classes=5, dtype=dt)
    est_vars = est.init(jax.random.key(1), jnp.zeros((1, 224, 224, 3), dt))
    est_apply = lambda imgs: est.apply(est_vars, imgs, train=False)
    step = jax.jit(functools.partial(make_gan_step(gen, disc, est_apply, cfg), do_g=True),
                   donate_argnums=(0,))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch,224,224,3)).astype(np.float32)).astype(dt)
    rx = jnp.asarray(rng.standard_normal((batch,224,224,3)).astype(np.float32)).astype(dt)
    zeros = jnp.zeros(batch, jnp.int32)
    state, m = step(state, x, zeros, rx, zeros, train_key(2))
    float(m["g_loss"])  # sync
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        state, m = step(state, x, zeros, rx, zeros, train_key(3+i))
    float(m["g_loss"])
    dt_s = (time.perf_counter()-t0)/n
    print(f"train step {dtype_name} B={batch}: {dt_s*1e3:.1f} ms/step -> {batch/dt_s:.1f} img/s  (g_loss={float(m['g_loss']):.3f})")

if __name__ == "__main__":
    run(8, "f32")
    run(128, "bf16")
