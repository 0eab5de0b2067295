import time, numpy as np, jax, jax.numpy as jnp
from weather_unet_tpu.models import ConditionalUNet
from weather_unet_tpu.ops.resize import upsample_x2_gather, resize_bilinear_torch

def timeit(f, *args, n=20):
    r = f(*args); float(jnp.sum(r.reshape(-1)[0:1]))
    t0=time.perf_counter()
    for _ in range(n): r=f(*args)
    float(jnp.sum(r.reshape(-1)[0:1]))
    return (time.perf_counter()-t0)/n

B=32
for (h, ch) in [(32,512),(64,256),(128,128)]:
    xu = jnp.ones((B,h,h,ch), jnp.bfloat16)
    t1 = timeit(jax.jit(upsample_x2_gather), xu)
    t2 = timeit(jax.jit(lambda x: resize_bilinear_torch(x, 2*x.shape[1], 2*x.shape[2])), xu)
    print(f"up {h}->{2*h} C={ch}: gather {t1*1e3:.2f} ms | matmul {t2*1e3:.2f} ms")

model = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16)  # now uses gather impl
x = jnp.ones((B,256,256,3), jnp.bfloat16); c = jnp.ones((B,5), jnp.bfloat16)
v = model.init(jax.random.key(0), x[:1], c[:1])
f = jax.jit(lambda v,x,c: model.apply(v,x,c))
t = timeit(f, v, x, c); print(f"full cunet (gather up): {t*1e3:.1f} ms/batch -> {B/t:.0f} img/s")
