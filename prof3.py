import time, numpy as np, jax, jax.numpy as jnp
from weather_unet_tpu.models import ConditionalUNet

for B in (8, 16, 32, 64):
    model = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16)
    x = jnp.ones((B,256,256,3), jnp.bfloat16)
    c = jnp.ones((B,5), jnp.bfloat16)
    v = model.init(jax.random.key(0), x[:1], c[:1])
    f = jax.jit(lambda v,x,c: model.apply(v,x,c))
    r = f(v,x,c); float(jnp.sum(r[0,0,0]))
    t0=time.perf_counter()
    out = x
    n=20
    for _ in range(n): out=f(v,out,c)
    float(jnp.sum(out[0,0,0]))
    dt=(time.perf_counter()-t0)/n
    print(f"B={B}: {dt*1e3:.1f} ms/batch -> {B/dt:.0f} img/s")
