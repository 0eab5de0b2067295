import time, functools, numpy as np, jax, jax.numpy as jnp
from weather_unet_tpu.models import ResNet101
from weather_unet_tpu.train.gan import GanConfig, build_gan_state, make_gan_step

def run_train(batch, dt, name):
    cfg = GanConfig(input_size=224, batch_size=batch, dtype=dt)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))
    est = ResNet101(num_classes=5, dtype=dt)
    ev = est.init(jax.random.key(1), jnp.zeros((1,224,224,3), dt))
    est_apply = lambda imgs: est.apply(ev, imgs, train=False)
    step = jax.jit(functools.partial(make_gan_step(gen, disc, est_apply, cfg), do_g=True), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch,224,224,3)).astype(np.float32)).astype(dt)
    rx = jnp.asarray(rng.standard_normal((batch,224,224,3)).astype(np.float32)).astype(dt)
    z = jnp.zeros(batch, jnp.int32)
    state, m = step(state, x, z, rx, z, jax.random.key(2)); float(m["g_loss"])
    n=10; t0=time.perf_counter()
    for i in range(n): state, m = step(state, x, z, rx, z, jax.random.key(3+i))
    float(m["g_loss"])
    dts=(time.perf_counter()-t0)/n
    print(f"train {name} B={batch}: {dts*1e3:.1f} ms -> {batch/dts:.1f} img/s")

run_train(64, jnp.bfloat16, "bf16")
run_train(128, jnp.bfloat16, "bf16")
