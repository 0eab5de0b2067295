import time, numpy as np, jax, jax.numpy as jnp
from weather_unet_tpu.models import ConditionalUNet

def timeit(f, *args, n=20):
    r = f(*args); float(jnp.sum(r.reshape(-1)[0:1]))
    t0=time.perf_counter()
    for _ in range(n): r=f(*args)
    float(jnp.sum(r.reshape(-1)[0:1]))
    return (time.perf_counter()-t0)/n

B=32
x = jnp.ones((B,256,256,3), jnp.bfloat16); c = jnp.ones((B,5), jnp.bfloat16)
for pall in (False, True):
    model = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16, use_pallas=pall)
    v = model.init(jax.random.key(0), x[:1], c[:1])
    f = jax.jit(lambda v,x,c: model.apply(v,x,c))
    t = timeit(f, v, x, c)
    print(f"use_pallas={pall}: {t*1e3:.1f} ms/batch -> {B/t:.0f} img/s")
