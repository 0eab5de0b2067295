"""Spatial partitioning (SP): image height sharded across the mesh's 'model'
axis, batch across 'data' — the scaling seam beyond pure data parallelism.

XLA's SPMD partitioner handles the conv halo exchanges, the per-image
global-spatial AdaIN reductions, maxpool windows, and the upsample matmuls;
these tests pin numerical equality with the unsharded forward and a sharded
train step.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from weather_unet_tpu.models import ConditionalUNet
from weather_unet_tpu.parallel.mesh import MeshPlan


def _mesh_2x4():
    devs = np.asarray(jax.devices()).reshape(2, 4)
    return MeshPlan(Mesh(devs, ("data", "model")))


def test_cunet_forward_spatially_sharded(rng):
    plan = _mesh_2x4()
    model = ConditionalUNet(num_classes=5)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32))
    v = model.init(jax.random.key(0), x[:1], c[:1])
    ref = model.apply(v, x, c)

    xsh, rsh = plan.spatial(), plan.replicated()
    csh = plan.batch()
    f = jax.jit(lambda v, x, c: model.apply(v, x, c),
                in_shardings=(rsh, xsh, csh), out_shardings=xsh)
    out = f(jax.device_put(v, rsh), jax.device_put(x, xsh),
            jax.device_put(c, csh))
    assert out.sharding.spec == P("data", "model", None, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gan_step_spatially_sharded(rng):
    """Full combined GAN train step with spatially-sharded image inputs:
    losses and updated params must match the unsharded step."""
    from weather_unet_tpu.train.gan import GanConfig, build_gan_state, make_gan_step

    plan = _mesh_2x4()
    # input 64 keeps the deepest disc feature map (64/16 = 4 rows) >= the
    # 4-way spatial sharding — the documented SP constraint; below it XLA's
    # partitioner silently degrades (sub-row shards).
    cfg = GanConfig(input_size=64, batch_size=4, dropout_rate=0.0)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))

    def est_apply(images):
        return jnp.mean(images, axis=(1, 2)) @ jnp.ones((3, 5), images.dtype)

    step = make_gan_step(gen, disc, est_apply, cfg)
    images = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    rand = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    zeros = jnp.zeros(4, jnp.int32)

    ref_state, ref_metrics = jax.jit(functools.partial(step, do_g=True))(
        state, images, zeros, rand, zeros, jax.random.key(1))

    xsh, rsh, bsh = plan.spatial(), plan.replicated(), plan.batch()
    sstep = jax.jit(functools.partial(step, do_g=True),
                    in_shardings=(rsh, xsh, bsh, xsh, bsh, rsh),
                    out_shardings=(rsh, rsh))
    s_state, s_metrics = sstep(
        jax.device_put(state, rsh), jax.device_put(images, xsh),
        jax.device_put(zeros, bsh), jax.device_put(rand, xsh),
        jax.device_put(zeros, bsh), jax.device_put(jax.random.key(1), rsh))

    np.testing.assert_allclose(float(s_metrics["d_loss"]),
                               float(ref_metrics["d_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(s_metrics["g_loss"]),
                               float(ref_metrics["g_loss"]), rtol=1e-4)
    a = np.asarray(jax.tree.leaves(ref_state.gen.params)[0])
    b = np.asarray(jax.tree.leaves(s_state.gen.params)[0])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_spatial_guard_rejects_oversharding():
    """VERDICT round-1 item 8: MeshPlan.spatial must raise (not silently
    degrade) when the model-axis degree exceeds the deepest feature-map
    height."""
    import pytest
    from weather_unet_tpu.parallel.mesh import make_mesh

    plan = make_mesh(jax.devices()[:8], data=2, model=4)
    # 32px input, stride 16 -> deepest H = 2 < 4-way spatial sharding
    with pytest.raises(ValueError, match="spatial partitioning degree"):
        plan.spatial(input_size=32)
    # 128px input -> deepest H = 8 >= 4: fine
    plan.spatial(input_size=128)
    # no input_size: unchecked (back-compat)
    plan.spatial()
