"""Library API tests + exact-resume correctness."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from weather_unet_tpu.api import WeatherTransfer
from weather_unet_tpu.train import checkpoint as ckpt
from weather_unet_tpu.train.gan import GanConfig, build_gan_state, make_gan_step


def test_api_roundtrip(tmp_path, rng):
    cfg = GanConfig(input_size=32)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))
    cp = str(tmp_path / "g.pt")
    ckpt.export_torch_gan(cp, {"params": state.gen.params},
                          {"params": state.disc.params,
                           "spectral": state.spectral}, 0, 0)

    wt = WeatherTransfer.load(cp)
    u8 = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    x = wt.preprocess(u8)
    out = wt.translate(x, jnp.eye(5)[:2])
    assert out.shape == (2, 32, 32, 3)
    assert float(jnp.abs(out).max()) <= 1.0

    alls = wt.translate_to_classes(x)
    assert alls.shape == (5, 2, 32, 32, 3)
    # class-0 row of the vmapped sweep equals the direct translation
    direct = wt.translate(x, jnp.tile(jnp.eye(5)[0][None], (2, 1)))
    np.testing.assert_allclose(np.asarray(alls[0]), np.asarray(direct), atol=1e-6)

    frames = wt.sweep(x, lambda imgs: jnp.mean(imgs, axis=(1, 2)) @ jnp.ones((3, 5)),
                      num_frames=3)
    assert frames.shape == (3, 5, 2, 32, 32, 3)
    # repeat sweeps reuse ONE jitted function (a per-call closure would
    # recompile the full T x classes forward every call — review finding,
    # round 5); a changed alpha must not add a trace either (traced scalar)
    jit_fn = wt._sweep_jit
    assert jit_fn is not None
    wt.sweep(x, lambda imgs: jnp.mean(imgs, axis=(1, 2)) @ jnp.ones((3, 5)),
             num_frames=3, alpha=1.5)
    assert wt._sweep_jit is jit_fn
    cache_size = getattr(jit_fn, "_cache_size", None)
    if cache_size is not None:
        assert cache_size() == 1

    img8 = wt.to_uint8(out)
    assert img8.dtype == np.uint8 and img8.max() <= 255

    # uint8-wire fast path == preprocess -> translate -> to_uint8 (f32 exact)
    c2 = jnp.eye(5)[:2]
    ref = wt.to_uint8(wt.translate(wt.preprocess(u8), c2))
    fast = np.asarray(wt.translate_u8(u8, c2))
    assert fast.dtype == np.uint8
    np.testing.assert_array_equal(fast, ref)


def test_translate_batch_bucketing(tmp_path, rng):
    """Ragged serving batches share one executable per power-of-two bucket,
    and padded dispatch returns exactly the unpadded rows (AdaIN stats are
    per-sample, so zero padding rows cannot leak into real outputs)."""
    cfg = GanConfig(input_size=32)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))
    cp = str(tmp_path / "g.pt")
    ckpt.export_torch_gan(cp, {"params": state.gen.params},
                          {"params": state.disc.params,
                           "spectral": state.spectral}, 0, 0)
    wt = WeatherTransfer.load(cp)

    x4 = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    c4 = jnp.eye(5, dtype=jnp.float32)[np.array([0, 1, 2, 3])]

    exact = wt.translate(x4[:3], c4[:3], bucket=False)
    bucketed = wt.translate(x4[:3], c4[:3])
    assert bucketed.shape == (3, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(bucketed), np.asarray(exact))

    n0 = wt._translate._cache_size()
    wt.translate(x4[:4], c4[:4])          # same bucket (4) as the b=3 call
    assert wt._translate._cache_size() == n0
    wt.translate(x4[:1], c4[:1])          # bucket 1 -> new executable
    assert wt._translate._cache_size() == n0 + 1


def test_api_mesh_serving(tmp_path, rng):
    """Data-parallel serving over the virtual 8-device mesh matches the
    single-device forward, including through the bucketing pad path."""
    from weather_unet_tpu.parallel.mesh import make_mesh

    cfg = GanConfig(input_size=32)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))
    cp = str(tmp_path / "g.pt")
    ckpt.export_torch_gan(cp, {"params": state.gen.params},
                          {"params": state.disc.params,
                           "spectral": state.spectral}, 0, 0)

    plan = make_mesh(data=8)
    wt_mesh = WeatherTransfer.load(cp, plan=plan)
    wt_one = WeatherTransfer.load(cp)

    x = jnp.asarray(rng.standard_normal((8, 32, 32, 3)).astype(np.float32))
    c = jnp.eye(5, dtype=jnp.float32)[np.array([0, 1, 2, 3, 4, 0, 1, 2])]
    np.testing.assert_allclose(
        np.asarray(wt_mesh.translate(x, c)), np.asarray(wt_one.translate(x, c)),
        atol=1e-5)

    # ragged batch (5) pads to a multiple of the data axis (8) and slices back
    out5 = wt_mesh.translate(x[:5], c[:5])
    assert out5.shape == (5, 32, 32, 3)
    np.testing.assert_allclose(
        np.asarray(out5), np.asarray(wt_one.translate(x[:5], c[:5])), atol=1e-5)

    alls = wt_mesh.translate_to_classes(x)
    assert alls.shape == (5, 8, 32, 32, 3)


def test_resume_is_exact(tmp_path, rng):
    """Checkpoint mid-training and resume: final state must equal the
    uninterrupted run bit-for-bit (optimizer moments + spectral state are in
    the checkpoint; the reference loses optimizer state — SURVEY.md §5)."""
    cfg = GanConfig(input_size=32, batch_size=4)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))

    def est_apply(images):
        return jnp.mean(images, axis=(1, 2)) @ jnp.ones((3, 5), images.dtype)

    step = jax.jit(functools.partial(make_gan_step(gen, disc, est_apply, cfg),
                                     do_g=True))
    zeros = jnp.zeros(4, jnp.int32)

    def batch(i):
        r = np.random.default_rng(i)
        return (jnp.asarray(r.standard_normal((4, 32, 32, 3)).astype(np.float32)),
                jnp.asarray(r.standard_normal((4, 32, 32, 3)).astype(np.float32)))

    # uninterrupted: 4 steps
    s_full = state
    for i in range(4):
        a, b = batch(i)
        s_full, _ = step(s_full, a, zeros, b, zeros, jax.random.key(i))

    # interrupted: 2 steps, save, restore into a FRESH state, 2 more steps
    s_half = state
    for i in range(2):
        a, b = batch(i)
        s_half, _ = step(s_half, a, zeros, b, zeros, jax.random.key(i))
    path = ckpt.save_checkpoint(str(tmp_path), "run", 2, s_half)

    _, _, fresh = build_gan_state(cfg, jax.random.key(99))  # different init
    s_res = ckpt.restore_checkpoint(path, fresh)
    for i in range(2, 4):
        a, b = batch(i)
        s_res, _ = step(s_res, a, zeros, b, zeros, jax.random.key(i))

    for a, b in zip(jax.tree.leaves(s_full.gen.params),
                    jax.tree.leaves(s_res.gen.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s_full.disc.opt_state),
                    jax.tree.leaves(s_res.disc.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s_full.spectral),
                    jax.tree.leaves(s_res.spectral)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_api_fuse_upconv(tmp_path, rng):
    """fuse_upconv serving path: explicit opt-in matches the XLA decoder
    output; 'auto' resolves off-CPU/off-mesh; mesh + fused model is refused
    (the Pallas call has no SPMD partitioning rules)."""
    import pytest
    from weather_unet_tpu.parallel.mesh import make_mesh

    cfg = GanConfig(input_size=32)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))
    cp = str(tmp_path / "g.pt")
    ckpt.export_torch_gan(cp, {"params": state.gen.params},
                          {"params": state.disc.params,
                           "spectral": state.spectral}, 0, 0)

    wt_ref = WeatherTransfer.load(cp)                      # auto -> False on CPU
    assert wt_ref.model.fuse_upconv is False
    wt_fused = WeatherTransfer.load(cp, fuse_upconv=True)
    assert wt_fused.model.fuse_upconv is True

    x = wt_ref.preprocess(rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8))
    c = jnp.eye(5)[:2]
    np.testing.assert_allclose(np.asarray(wt_fused.translate(x, c)),
                               np.asarray(wt_ref.translate(x, c)), atol=1e-5)

    plan = make_mesh(batch_size=8)
    with pytest.raises(ValueError, match="fuse_upconv"):
        WeatherTransfer.load(cp, plan=plan, fuse_upconv=True)
    # auto + mesh silently keeps the XLA decoder
    assert WeatherTransfer.load(cp, plan=plan).model.fuse_upconv is False
