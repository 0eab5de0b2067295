"""Tensor parallelism (TP): conv channels sharded across the mesh 'model'
axis (Megatron column/row split on the double-conv pairs — parallel/tp.py).

These tests pin numerical equality of the channel-sharded forward and the
full GAN train step against their unsharded counterparts on the virtual
8-device CPU mesh, and the sharding-rule assignments themselves.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from weather_unet_tpu.models import ConditionalUNet, SNDisc
from weather_unet_tpu.parallel.mesh import MeshPlan
from weather_unet_tpu.parallel.tp import tp_specs, tp_shardings


def _mesh(data: int, model: int) -> MeshPlan:
    devs = np.asarray(jax.devices()[: data * model]).reshape(data, model)
    return MeshPlan(Mesh(devs, ("data", "model")))


def test_tp_spec_rules():
    """conv1 -> column (O) shard, conv2 -> row (I) shard, everything else
    replicated; indivisible dims stay replicated."""
    model = ConditionalUNet(num_classes=5)
    x = jnp.zeros((1, 32, 32, 3))
    c = jnp.zeros((1, 5))
    params = model.init(jax.random.key(0), x, c)["params"]
    specs = tp_specs(params, 2)
    assert specs["down1"]["conv1"]["kernel"] == P(None, None, None, "model")
    assert specs["down1"]["conv1"]["bias"] == P("model")
    assert specs["down1"]["conv2"]["kernel"] == P(None, None, "model", None)
    assert specs["down1"]["conv2"]["bias"] == P()
    assert specs["adain1"]["proj"]["kernel"] == P()
    # conv_last (1x1 to 3 channels): O=3 not divisible -> replicated
    assert specs["conv_last"]["kernel"] == P()
    # n_shard=1 means no sharding at all
    flat = jax.tree.leaves(tp_specs(params, 1),
                           is_leaf=lambda s: isinstance(s, P))
    assert all(s == P() for s in flat)


def test_tp_specs_cover_gan_state():
    """Applied to the whole GanTrainState, Adam moments mirror their param's
    spec and the spectral 'u' vectors follow their conv's column sharding."""
    from weather_unet_tpu.train.gan import GanConfig, build_gan_state

    cfg = GanConfig(input_size=32, batch_size=2, dropout_rate=0.0)
    _, _, state = build_gan_state(cfg, jax.random.key(0))
    specs = tp_specs(state, 2)
    assert (specs.gen.params["down2"]["conv1"]["kernel"]
            == P(None, None, None, "model"))
    # optax ScaleByAdamState mu/nu reuse the param tree structure
    mu_specs = [s for s in jax.tree.leaves(
        specs.gen.opt_state, is_leaf=lambda x: isinstance(x, P))]
    assert P(None, None, None, "model") in mu_specs
    # spectral u of an SN conv1 (length O) shards with its kernel; block1's
    # conv1 is 3->3 channels (O=3 indivisible) so it correctly stays
    # replicated, as do all conv2 u vectors (their output is psum-ed full
    # width) and the dense heads
    assert specs.spectral["block1"]["conv1"]["u"] == P()
    assert specs.spectral["block2"]["conv1"]["u"] == P("model")
    assert specs.spectral["block2"]["conv2"]["u"] == P()
    assert specs.spectral["linear"]["u"] == P()


def test_cunet_forward_tensor_parallel(rng):
    plan = _mesh(data=2, model=4)
    model = ConditionalUNet(num_classes=5)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32))
    v = model.init(jax.random.key(0), x[:1], c[:1])
    ref = model.apply(v, x, c)

    vsh = tp_shardings(plan, v)
    bsh, _ = plan.batch(), plan.replicated()
    f = jax.jit(lambda v, x, c: model.apply(v, x, c),
                in_shardings=(vsh, bsh, bsh), out_shardings=bsh)
    out = f(jax.device_put(v, vsh), jax.device_put(x, bsh),
            jax.device_put(c, bsh))
    # weights really are distributed: a column-sharded kernel's per-device
    # shard holds 1/4 of the output channels
    placed = jax.device_put(v, vsh)
    shard = placed["params"]["down1"]["conv1"]["kernel"].addressable_shards[0]
    assert shard.data.shape[3] == 64 // 4
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sndisc_forward_tensor_parallel(rng):
    """Spectral-norm power iteration under column-sharded kernels: sigma is a
    global contraction (psum inserted by GSPMD) — outputs and the advanced u
    vectors must match the unsharded forward."""
    plan = _mesh(data=2, model=2)
    model = SNDisc(num_classes=5)
    x = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((4, 5)).astype(np.float32))
    v = model.init(jax.random.key(0), x[:1], c[:1])
    (ref_out, _), ref_upd = model.apply(v, x, c, update_stats=True,
                                        mutable=["spectral"])

    vsh = tp_shardings(plan, v)
    bsh = plan.batch()

    def fwd(v, x, c):
        (out, _), upd = model.apply(v, x, c, update_stats=True,
                                    mutable=["spectral"])
        return out, upd

    f = jax.jit(fwd, in_shardings=(vsh, bsh, bsh))
    out, upd = f(jax.device_put(v, vsh), jax.device_put(x, bsh),
                 jax.device_put(c, bsh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4)
    a = np.asarray(ref_upd["spectral"]["block3"]["conv1"]["u"])
    b = np.asarray(upd["spectral"]["block3"]["conv1"]["u"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_gan_step_tensor_parallel(rng):
    """Full combined GAN train step with the ENTIRE state (params, Adam
    moments, spectral u) channel-sharded 2-way: losses and updated params
    match the unsharded step."""
    from weather_unet_tpu.train.gan import GanConfig, build_gan_state, make_gan_step

    plan = _mesh(data=4, model=2)
    cfg = GanConfig(input_size=32, batch_size=4, dropout_rate=0.0)
    gen, disc, state = build_gan_state(cfg, jax.random.key(0))

    def est_apply(images):
        return jnp.mean(images, axis=(1, 2)) @ jnp.ones((3, 5), images.dtype)

    step = make_gan_step(gen, disc, est_apply, cfg)
    images = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    rand = jnp.asarray(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))
    zeros = jnp.zeros(4, jnp.int32)

    ref_state, ref_metrics = jax.jit(functools.partial(step, do_g=True))(
        state, images, zeros, rand, zeros, jax.random.key(1))

    ssh = tp_shardings(plan, state)
    bsh, rsh = plan.batch(), plan.replicated()
    sstep = jax.jit(functools.partial(step, do_g=True),
                    in_shardings=(ssh, bsh, bsh, bsh, bsh, rsh),
                    out_shardings=(ssh, rsh))
    s_state, s_metrics = sstep(
        jax.device_put(state, ssh), jax.device_put(images, bsh),
        jax.device_put(zeros, bsh), jax.device_put(rand, bsh),
        jax.device_put(zeros, bsh), jax.device_put(jax.random.key(1), rsh))

    np.testing.assert_allclose(float(s_metrics["d_loss"]),
                               float(ref_metrics["d_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(s_metrics["g_loss"]),
                               float(ref_metrics["g_loss"]), rtol=1e-4)
    # Param tolerance: gan_adam has beta1=0, so the first-step update is
    # ~lr * g/|g| — a reduction-order flip of a NEAR-ZERO gradient element
    # legitimately moves that param by up to ~2*lr (1e-4).  Bound the max by
    # that mechanism and the bulk drift much tighter.
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(ref_state.gen.params),
                        jax.tree.leaves(s_state.gen.params))])
    assert diffs.max() <= 3 * cfg.lr
    assert np.mean(diffs) < 1e-6
    # updated state keeps its TP placement (no gather back to replicated)
    k = s_state.gen.params["down1"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")


def test_tp_forward_collective_count():
    """The communication cost claim, pinned at the HLO level: the TP cUNet
    forward contains EXACTLY one all-reduce per sharded double-conv block
    (7: down1-4 + up1-3) and no resharding collectives — conv1's
    column-sharded output feeds conv2's row-sharded contraction directly."""
    import re

    plan = _mesh(data=2, model=2)
    model = ConditionalUNet(num_classes=5)
    x = jnp.zeros((4, 64, 64, 3))
    c = jnp.zeros((4, 5))
    v = model.init(jax.random.key(0), x[:1], c[:1])
    vsh = tp_shardings(plan, v)
    bsh = plan.batch()
    f = jax.jit(lambda v, x, c: model.apply(v, x, c),
                in_shardings=(vsh, bsh, bsh), out_shardings=bsh)
    hlo = f.lower(v, x, c).compile().as_text()

    def count(op):
        return len(re.findall(rf"\b{op}(?:-start)?\(", hlo))

    assert count("all-reduce") == 7
    for op in ("all-gather", "all-to-all", "reduce-scatter",
               "collective-permute"):
        assert count(op) == 0, op


def test_make_mesh_refuses_oversized_model_axis():
    """model axis > device count must be a clear error, not an empty mesh
    surfacing later as jit's 'empty NamedSharding' (found driving the CLI
    on a 1-device backend with --tensor_parallel 2)."""
    import pytest
    from weather_unet_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="model axis"):
        make_mesh(jax.devices()[:1], model=2, batch_size=8)
    with pytest.raises(ValueError, match="does not fit"):
        make_mesh(jax.devices()[:4], data=3, model=2)


def test_trainer_tensor_parallel(tmp_path):
    """WeatherTransferTrainer(tensor_parallel=True): the whole train state
    lives channel-sharded through fit(), matches the unsharded trainer's
    trained params, and the cadence checkpoint restores back into the TP
    placement."""
    from weather_unet_tpu.parallel.mesh import make_mesh
    from weather_unet_tpu.train import checkpoint as ckpt
    from weather_unet_tpu.train.gan import GanConfig
    from weather_unet_tpu.train.loops import WeatherTransferTrainer

    def make_loader():
        rng = np.random.default_rng(7)

        class FakeLoader:
            def __iter__(self):
                for _ in range(2):
                    yield (rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8),
                           rng.standard_normal((8, 5)).astype(np.float32))
        return FakeLoader()

    def est_apply(images):
        return jnp.mean(images, axis=(1, 2)) @ jnp.ones((3, 5), images.dtype)

    cfg = GanConfig(input_size=32, batch_size=8, num_epoch=1,
                    dropout_rate=0.0)
    ref = WeatherTransferTrainer(
        cfg, est_apply, save_dir=str(tmp_path / "ref"), name="r",
        log_dir=str(tmp_path / "runs"))
    ref.EVAL_PER_STEP = 2
    ref.DISPLAY_PER_STEP = 2
    ref.fit(make_loader, make_loader)

    plan = make_mesh(model=2, batch_size=8)
    tr = WeatherTransferTrainer(
        cfg, est_apply, save_dir=str(tmp_path / "tp"), name="t",
        log_dir=str(tmp_path / "runs"), plan=plan, tensor_parallel=True)
    tr.EVAL_PER_STEP = 2
    tr.DISPLAY_PER_STEP = 2
    # state is genuinely distributed before and after training
    k = tr.state.gen.params["down1"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
    tr.fit(make_loader, make_loader)
    k = tr.state.gen.params["down1"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
    assert k.addressable_shards[0].data.shape[3] == 64 // 2

    # same data, same seeds: TP training tracks the unsharded trainer (see
    # test_gan_step_tensor_parallel for the beta1=0 near-zero-grad bound)
    diffs = np.concatenate([
        np.abs(np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree.leaves(ref.state.gen.params),
                        jax.tree.leaves(tr.state.gen.params))])
    assert diffs.max() <= 2 * 3 * cfg.lr   # 2 optimizer steps
    assert np.mean(diffs) < 1e-5

    # the cadence checkpoint restores into the TP placement
    assert ckpt.latest_checkpoint(str(tmp_path / "tp"), "t") is not None
    tr2 = WeatherTransferTrainer(
        cfg, est_apply, save_dir=str(tmp_path / "tp"), name="t",
        log_dir=str(tmp_path / "runs"), plan=plan, tensor_parallel=True)
    assert int(tr2.state.global_step) == 2
    k2 = tr2.state.gen.params["down1"]["conv1"]["kernel"]
    assert k2.sharding.spec == P(None, None, None, "model")

    # misuse guard: TP on a model-axis-1 mesh is refused
    import pytest
    with pytest.raises(ValueError, match="tensor_parallel"):
        WeatherTransferTrainer(
            cfg, est_apply, save_dir=str(tmp_path / "x"), name="x",
            log_dir=str(tmp_path / "runs"), tensor_parallel=True)


def test_api_tensor_parallel_serving(tmp_path, rng):
    """WeatherTransfer(tensor_parallel=True) matches the single-device API
    byte-for-byte on the uint8 wire (modulo one rounding step)."""
    from weather_unet_tpu.api import WeatherTransfer
    from weather_unet_tpu.parallel.mesh import make_mesh
    from weather_unet_tpu.train import checkpoint as ckpt
    from weather_unet_tpu.train.gan import GanConfig, build_gan_state

    cfg = GanConfig(input_size=32)
    _, _, state = build_gan_state(cfg, jax.random.key(0))
    path = str(tmp_path / "g.pt")
    ckpt.export_torch_gan(path, {"params": state.gen.params},
                          {"params": state.disc.params,
                           "spectral": state.spectral}, 0, 0)

    ref = WeatherTransfer.load(path)
    plan = make_mesh(jax.devices()[:4], data=2, model=2)
    wt = WeatherTransfer.load(path, plan=plan, tensor_parallel=True)
    k = wt.variables["params"]["down1"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")

    imgs = rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8)
    conds = np.eye(5, dtype=np.float32)[rng.integers(0, 5, 4)]
    a = np.asarray(ref.translate_u8(imgs, conds)).astype(np.int16)
    b = np.asarray(wt.translate_u8(imgs, conds)).astype(np.int16)
    assert np.abs(a - b).max() <= 1

    # misuse guard: TP without a model axis is refused
    import pytest
    with pytest.raises(ValueError, match="tensor_parallel"):
        WeatherTransfer.load(path, tensor_parallel=True)


def test_tp_shardings_refuses_nondividing_degree():
    """A TP degree that divides no conv channel width must raise, not
    silently replicate everything (a no-op claiming K-way TP)."""
    import pytest
    from weather_unet_tpu.parallel.mesh import make_mesh
    from weather_unet_tpu.parallel.tp import tp_shardings
    from weather_unet_tpu.train.gan import GanConfig, build_gan_state

    cfg = GanConfig(input_size=32, batch_size=7)
    _, _, state = build_gan_state(cfg, jax.random.key(0))
    # 7 divides no conv width in either net; 3 would legitimately shard the
    # disc's width-96 block, which is a valid partial layout
    plan = make_mesh(jax.devices()[:7], data=1, model=7)
    with pytest.raises(ValueError, match="NO leaf"):
        tp_shardings(plan, state)


def test_tp_checkpoint_portability_across_mesh_shapes(tmp_path):
    """Checkpoints are device-layout-free (train/checkpoint.py gathers to
    host numpy): a state trained and saved under TP=2 must restore bitwise
    on (a) a SINGLE-device mesh and (b) a DIFFERENT TP degree (4), and a
    continued run on either topology must track the never-sharded 4-step
    reference — the reference's ``.pt`` flow supports exactly this
    train-sharded -> serve/train-anywhere path (t_est_train.py:151-163)."""
    from weather_unet_tpu.parallel.mesh import make_mesh
    from weather_unet_tpu.train.gan import GanConfig
    from weather_unet_tpu.train.loops import WeatherTransferTrainer

    r = np.random.default_rng(7)
    batches = [(r.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8),
                r.standard_normal((8, 5)).astype(np.float32))
               for _ in range(8)]

    class L:
        def __init__(self, items):
            self.items = items

        def __iter__(self):
            return iter(self.items)

    def est_apply(images):
        return jnp.mean(images, axis=(1, 2)) @ jnp.ones((3, 5), images.dtype)

    cfg = GanConfig(input_size=32, batch_size=8, num_epoch=1,
                    dropout_rate=0.0)

    def mk(save, plan=None, tp=False):
        return WeatherTransferTrainer(
            cfg, est_apply, save_dir=str(tmp_path / save), name="p",
            log_dir=str(tmp_path / "runs"), plan=plan, tensor_parallel=tp)

    # never-sharded reference: 4 steps (content batches 0-3, rand 4-7)
    ref = mk("ref")
    ref.train_epoch(L(batches[:4]), L(batches[4:]))

    # TP=2 run: 2 steps, then checkpoint (async save joined)
    tp2 = mk("tp", plan=make_mesh(model=2, batch_size=8), tp=True)
    tp2.train_epoch(L(batches[:2]), L(batches[4:6]))
    tp2._save()
    tp2._ckpt.wait()
    saved = jax.device_get(tp2.state)

    def host(tree):
        return jax.tree.leaves(jax.tree.map(np.asarray, tree))

    def continuation(tag, plan, tp):
        tr = mk("tp", plan=plan, tp=tp)         # resumes from the TP=2 save
        assert int(tr.state.global_step) == 2
        # restore is BITWISE: the msgpack bytes came from host numpy, so no
        # trace of the TP=2 device layout survives into any topology
        for a, b in zip(host(saved), host(tr.state)):
            np.testing.assert_array_equal(a, b, err_msg=tag)
        # the restored generator serves on this topology as-is
        out = tr.gen.apply({"params": tr.state.gen.params},
                           jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 5)))
        assert np.isfinite(np.asarray(out)).all()
        tr.train_epoch(L(batches[2:4]), L(batches[6:]))  # steps 3-4
        assert int(tr.state.global_step) == 4
        # same per-step fold_in keys + same data => tracks the unsharded
        # reference within the TP reduction-order bound (see
        # test_gan_step_tensor_parallel: ~3*lr per near-zero-grad element
        # per optimizer step with beta1=0)
        diffs = np.concatenate([
            np.abs(np.asarray(a) - np.asarray(b)).ravel()
            for a, b in zip(jax.tree.leaves(ref.state.gen.params),
                            jax.tree.leaves(tr.state.gen.params))])
        assert diffs.max() <= 4 * 3 * cfg.lr, tag
        # bulk drift: ~1.2e-5 measured over the 4 accumulated steps (2 TP +
        # 2 amplified); 2.5x margin
        assert np.mean(diffs) < 3e-5, tag
        return tr

    # (a) single device — the train-sharded -> serve-unsharded deployment
    continuation("single-device", make_mesh(jax.devices()[:1], batch_size=8),
                 tp=False)
    # (b) different TP degree (4-way), state genuinely re-sharded
    tr4 = continuation("tp4", make_mesh(model=4, batch_size=8), tp=True)
    k = tr4.state.gen.params["down1"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")
    assert k.addressable_shards[0].data.shape[3] == 64 // 4
    # (c) and back onto the default data-parallel mesh
    continuation("default-mesh", None, tp=False)
