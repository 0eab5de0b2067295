import numpy as np, jax, jax.numpy as jnp
from weather_unet_tpu.models import ConditionalUNet

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((4,256,256,3)).astype(np.float32)).clip(-1,1)
c = jnp.asarray(np.eye(5, dtype=np.float32)[rng.integers(0,5,4)])

m32 = ConditionalUNet(num_classes=5, dtype=jnp.float32)
v = m32.init(jax.random.key(0), x[:1], c[:1])
m16 = ConditionalUNet(num_classes=5, dtype=jnp.bfloat16)

y32 = np.asarray(jax.jit(lambda v,x,c: m32.apply(v,x,c))(v, x, c))
y16 = np.asarray(jax.jit(lambda v,x,c: m16.apply(v,x,c))(v, x, c)).astype(np.float32)
mae = np.abs(y32 - y16).mean()
px = np.abs((y32+1)*127.5 - (y16+1)*127.5)
print(f"bf16 vs f32: MAE={mae:.5f} ([-1,1] scale), pixel MAE={px.mean():.3f}/255, p99={np.percentile(px,99):.2f}")
