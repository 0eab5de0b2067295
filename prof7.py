import time, functools, numpy as np, jax, jax.numpy as jnp
from weather_unet_tpu.models import ConditionalUNet, ResNet101
from weather_unet_tpu.train.gan import GanConfig, build_gan_state, make_gan_step

def timeit(f, *args, n=15):
    r = f(*args); float(jnp.sum(r.reshape(-1)[0:1]))
    t0=time.perf_counter()
    for _ in range(n): r=f(*args)
    float(jnp.sum(r.reshape(-1)[0:1]))
    return (time.perf_counter()-t0)/n

# inference batch sweep
for B in (32, 64, 128):
    model = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16)
    x = jnp.ones((B,256,256,3), jnp.bfloat16); c = jnp.ones((B,5), jnp.bfloat16)
    v = model.init(jax.random.key(0), x[:1], c[:1])
    f = jax.jit(lambda v,x,c: model.apply(v,x,c))
    t = timeit(f, v, x, c)
    print(f"inference B={B}: {t*1e3:.1f} ms -> {B/t:.0f} img/s")

# training step with split-concat model
def run_train(batch, dt):
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
    dt_s=(time.perf_counter()-t0)/n
    print(f"train {dt.__name__ if hasattr(dt,'__name__') else dt} B={batch}: {dt_s*1e3:.1f} ms -> {batch/dt_s:.1f} img/s")

run_train(8, jnp.float32)
run_train(32, jnp.bfloat16)
