import time, numpy as np, jax, jax.numpy as jnp
import flax.linen as nn
from weather_unet_tpu.models import ConditionalUNet
from weather_unet_tpu.ops.resize import upsample_bilinear_align_corners

def timeit(f, *args, n=10):
    r = f(*args); float(jnp.sum(r.reshape(-1)[0:1]))
    t0=time.perf_counter()
    for _ in range(n): r=f(*args)
    float(jnp.sum(r.reshape(-1)[0:1]))
    return (time.perf_counter()-t0)/n

B,S=16,256
x = jnp.ones((B,S,S,3), jnp.bfloat16)
c = jnp.ones((B,5), jnp.bfloat16)

model = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16)
v = model.init(jax.random.key(0), x[:1], c[:1])
f_full = jax.jit(lambda v,x,c: model.apply(v,x,c))
t = timeit(f_full, v, x, c); print(f"full cunet: {t*1e3:.1f} ms/batch -> {B/t:.0f} img/s")

# upsample microbenches at the 3 decoder resolutions
for (h, ch) in [(32,512),(64,256),(128,128)]:
    xu = jnp.ones((B,h,h,ch), jnp.bfloat16)
    up = jax.jit(upsample_bilinear_align_corners)
    t = timeit(up, xu); print(f"einsum upsample {h}->{2*h} C={ch}: {t*1e3:.2f} ms")
    # nearest via repeat for comparison
    nearest = jax.jit(lambda x: jnp.repeat(jnp.repeat(x,2,axis=1),2,axis=2))
    t = timeit(nearest, xu); print(f"  nearest repeat: {t*1e3:.2f} ms")

# adain microbench
from weather_unet_tpu.ops.norm import adain
xa = jnp.ones((B,32,32,512), jnp.bfloat16)
ya = jnp.ones((B,2048), jnp.bfloat16)
t = timeit(jax.jit(adain), xa, ya); print(f"adain 32x32x512: {t*1e3:.2f} ms")

# maxpool microbench
from weather_unet_tpu.ops.convs import max_pool_2x2
xm = jnp.ones((B,256,256,64), jnp.bfloat16)
t = timeit(jax.jit(max_pool_2x2), xm); print(f"maxpool 256 C=64: {t*1e3:.2f} ms")

# all 8 encoder+decoder convs together, no adain/upsample: replace with simple model
class ConvOnly(nn.Module):
    @nn.compact
    def __call__(self, x):
        from weather_unet_tpu.models.cunet import RDoubleConv
        from weather_unet_tpu.ops.convs import max_pool_2x2
        c1 = RDoubleConv(64, dtype=jnp.bfloat16)(x); h = max_pool_2x2(c1)
        c2 = RDoubleConv(128, dtype=jnp.bfloat16)(h); h = max_pool_2x2(c2)
        c3 = RDoubleConv(256, dtype=jnp.bfloat16)(h); h = max_pool_2x2(c3)
        h = RDoubleConv(512, dtype=jnp.bfloat16)(h)
        h = jnp.repeat(jnp.repeat(h,2,axis=1),2,axis=2)
        h = RDoubleConv(256, dtype=jnp.bfloat16)(jnp.concatenate([h,c3],-1))
        h = jnp.repeat(jnp.repeat(h,2,axis=1),2,axis=2)
        h = RDoubleConv(128, dtype=jnp.bfloat16)(jnp.concatenate([h,c2],-1))
        h = jnp.repeat(jnp.repeat(h,2,axis=1),2,axis=2)
        h = RDoubleConv(64, dtype=jnp.bfloat16)(jnp.concatenate([h,c1],-1))
        return h
co = ConvOnly()
vco = co.init(jax.random.key(0), x[:1])
t = timeit(jax.jit(lambda v,x: co.apply(v,x)), vco, x)
print(f"convs+nearest-up (no adain): {t*1e3:.1f} ms/batch -> {B/t:.0f} img/s")
