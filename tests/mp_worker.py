"""Worker program for tests/test_multiprocess.py.

Runs under ``weather_unet_tpu.parallel.launch`` env contract: joins the
distributed runtime, builds the global mesh, loads ONLY this process's rows
of a deterministic global batch, assembles the global array shard-wise, runs
a jitted Adam regression step (params replicated, batch sharded — XLA
inserts the cross-host gradient psum over gloo), and writes
``loss`` + a param checksum to ``$WUT_TEST_OUT/rank<i>.json``.

The parent test runs the identical computation single-process on its own
8-device mesh and requires bitwise-close agreement — proving the multi-host
input seam + collective path computes the same global step.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_unet_tpu.parallel import launch  # noqa: E402


def global_batch():
    import numpy as np

    rng = np.random.default_rng(1234)
    x = rng.standard_normal((16, 12)).astype(np.float32)
    y = rng.standard_normal((16, 5)).astype(np.float32)
    return x, y


def run_step(plan, x_arr, y_arr):
    """One Adam step of a linear regressor; returns (loss, new params)."""
    import jax
    import jax.numpy as jnp
    import optax

    w0 = jnp.ones((12, 5), jnp.float32) * 0.01
    b0 = jnp.zeros((5,), jnp.float32)
    params = {"w": w0, "b": b0}
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred = x @ p["w"] + p["b"]
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return loss, optax.apply_updates(params, updates), opt_state

    rsh = plan.replicated()
    params = jax.device_put(params, rsh)
    opt_state = jax.device_put(opt_state, rsh)
    jstep = jax.jit(step, in_shardings=(rsh, rsh, plan.batch(), plan.batch()),
                    out_shardings=(rsh, rsh, rsh))
    loss, params, _ = jstep(params, opt_state, x_arr, y_arr)
    return loss, params


def run_gan_trainer(out_dir):
    """2 tiny steps of the REAL WeatherTransferTrainer across processes:
    process-sharded loaders -> global batch assembly -> fused GAN step with
    cross-host gradient psum -> replicated metrics on every controller."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weather_unet_tpu.core.profiling import enable_compilation_cache
    from weather_unet_tpu.data.pipeline import BatchLoader
    from weather_unet_tpu.train.gan import GanConfig
    from weather_unet_tpu.train.loops import WeatherTransferTrainer

    enable_compilation_cache()

    class Ds:
        """8 deterministic samples (every process builds the same table)."""

        def __init__(self):
            r = np.random.default_rng(7)
            self.x = r.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8)
            self.c = r.standard_normal((16, 5)).astype(np.float32)

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return self.x[i], self.c[i]

    def est_apply(images):
        return jnp.mean(images, axis=(1, 2)) @ jnp.ones((3, 5), images.dtype)

    cfg = GanConfig(input_size=32, batch_size=8, num_epoch=1)
    save = os.path.join(out_dir, "cp")     # shared across ranks: fine, rank
    # 0 and 1 write identical bytes at the cadence (never fires here)
    tr = WeatherTransferTrainer(
        cfg, est_apply, save_dir=save, name=f"g{jax.process_index()}",
        log_dir=os.path.join(out_dir, f"runs{jax.process_index()}"))
    mk = lambda seed: BatchLoader(Ds(), batch_size=8, shuffle=True, seed=seed,
                                  num_workers=2, process_shard=True)
    tr.train_epoch(mk(0), mk(1))
    assert int(tr.state.global_step) == 2
    m = {k: float(v) for k, v in tr._last_metrics.items()}
    assert all(np.isfinite(v) for v in m.values()), m
    return m


def run_gan_cached(out_dir, img_dir):
    """The advertised multi-host + ``--decode_cache`` topology for real: both
    ranks concurrently construct :class:`DecodedCache` over ONE shared dir
    (the constructor flock's actual design point, ``data/cache.py:52-66``)
    and train the REAL GAN trainer through ``ImagePathDataset`` +
    ``CachedAugment`` with process-sharded loaders — then re-run warm (must
    be all-hits with identical metrics) and uncached via the same native
    decode (must match bitwise).  Returns a report the parent cross-checks
    between ranks."""
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from weather_unet_tpu.core.profiling import enable_compilation_cache
    from weather_unet_tpu.data.cache import CachedAugment, DecodedCache
    from weather_unet_tpu.data.datasets import ImagePathDataset
    from weather_unet_tpu.data.pipeline import BatchLoader
    from weather_unet_tpu.train.gan import GanConfig
    from weather_unet_tpu.train.loops import WeatherTransferTrainer

    enable_compilation_cache()
    paths = sorted(glob.glob(os.path.join(img_dir, "*.jpg")))
    assert len(paths) == 16, paths
    cache_dir = os.path.join(out_dir, "dcache")     # SHARED between ranks

    def est_apply(images):
        return jnp.mean(images, axis=(1, 2)) @ jnp.ones((3, 5), images.dtype)

    cfg = GanConfig(input_size=32, batch_size=8, num_epoch=1)

    def one_epoch(tag, transform):
        ds = ImagePathDataset(paths, out_size=32, transform=transform)
        tr = WeatherTransferTrainer(
            cfg, est_apply,
            save_dir=os.path.join(out_dir, f"{tag}{jax.process_index()}"),
            name=tag,
            log_dir=os.path.join(out_dir, f"runs-{tag}{jax.process_index()}"))
        mk = lambda seed: BatchLoader(          # noqa: E731
            ds, batch_size=8, shuffle=True, seed=seed, num_workers=2,
            process_shard=True)
        tr.train_epoch(mk(0), mk(1))
        assert int(tr.state.global_step) == 2
        m = {k: float(v) for k, v in tr._last_metrics.items()}
        assert all(np.isfinite(v) for v in m.values()), (tag, m)
        return m

    # cold: both ranks race the constructor flock, then lazily fill their
    # own process shard's rows
    cold_cache = DecodedCache(cache_dir, base_size=32, paths=paths)
    cold = one_epoch("dc-cold", CachedAugment(cold_cache))
    assert cold_cache.misses > 0            # this rank really filled rows

    # warm: a FRESH mapping (fresh-process emulation) must serve this rank's
    # shard entirely from the shared memmap — rows its peer filled may still
    # be in flight, but this rank's shard is its own deterministic slice
    warm_cache = DecodedCache(cache_dir, base_size=32, paths=paths)
    warm = one_epoch("dc-warm", CachedAugment(warm_cache))
    assert warm_cache.misses == 0, warm_cache.misses
    assert warm_cache.hits > 0

    # uncached reference: same pixels via the same native decode the cache
    # fill used (data/cache.py::_decode passes prefer_native=True)
    os.environ["WUT_NATIVE_DECODE"] = "1"
    try:
        uncached = one_epoch("dc-ref", None)
    finally:
        os.environ.pop("WUT_NATIVE_DECODE", None)

    for k in cold:
        assert cold[k] == warm[k] == uncached[k], (
            k, cold[k], warm[k], uncached[k])
    return {"metrics": cold, "cold_misses": cold_cache.misses,
            "warm_hits": warm_cache.hits}


def run_supervised(out_dir):
    """A tiny REAL ``train_supervised`` run across processes: exercises the
    lockstep-compiled step/eval jits (pre-lockstep, concurrent first-call
    compiles skewed ranks past gloo's ~30 s connect window and wedged the
    2-proc classifier CLI), state donation, host-sharded loaders, and the
    cross-host eval sweep.  Returns the final param checksum (replicated —
    must agree across controllers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weather_unet_tpu.core.optim import torch_adam
    from weather_unet_tpu.core.profiling import enable_compilation_cache
    from weather_unet_tpu.core.state import TrainState
    from weather_unet_tpu.data.pipeline import BatchLoader
    from weather_unet_tpu.data.transforms import AugmentConfig
    from weather_unet_tpu.models import ResNet
    from weather_unet_tpu.train.loops import train_supervised
    from weather_unet_tpu.train.supervised import (
        make_classifier_step, make_eval_metrics)

    enable_compilation_cache()

    class Ds:
        """Deterministic labeled samples (every process builds the same)."""

        def __init__(self):
            r = np.random.default_rng(11)
            self.x = r.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8)
            self.y = r.integers(0, 5, 16).astype(np.int64)

        def __len__(self):
            return 16

        def __getitem__(self, i):
            return self.x[i], self.y[i]

    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    state = TrainState.create(
        variables["params"], torch_adam(1e-4, weight_decay=1e-4),
        extra=variables["batch_stats"])
    mk = lambda seed: (lambda: BatchLoader(     # noqa: E731
        Ds(), batch_size=8, shuffle=True, seed=seed, num_workers=2,
        process_shard=True))
    out_state = train_supervised(
        model, make_classifier_step(model), make_eval_metrics(model, "classifier"),
        mk(0), mk(1), state=state, num_epoch=1, writer=None,
        augment_cfg=AugmentConfig(out_size=32),
        save_dir=os.path.join(out_dir, f"sup{jax.process_index()}"),
        name="cls", eval_per_iter=2, save_per_epoch=1,
        target_dtype=jnp.int32)
    assert int(out_state.step) == 2
    return float(np.asarray(
        jax.device_get(jax.tree.leaves(out_state.params)[0])).sum())


def main():
    assert launch.maybe_initialize(), "worker must run under the env contract"
    import jax
    import numpy as np

    from weather_unet_tpu.data.pipeline import assemble_global_batch
    from weather_unet_tpu.parallel.mesh import make_mesh

    plan = make_mesh()          # all processes' devices, data-parallel
    x, y = global_batch()
    sl = launch.process_slice(len(x))       # host-sharded input: local rows
    bsh = plan.batch()
    x_arr = assemble_global_batch(bsh, x[sl])
    y_arr = assemble_global_batch(bsh, y[sl])
    assert x_arr.shape == x.shape           # global shape, local shards

    loss, params = run_step(plan, x_arr, y_arr)
    out = {
        "rank": jax.process_index(),
        "n_processes": jax.process_count(),
        "n_devices": jax.device_count(),
        "loss": float(loss),
        "w_sum": float(np.asarray(jax.device_get(params["w"])).sum()),
    }
    if os.environ.get("WUT_TEST_GAN") == "1":
        out["gan_metrics"] = run_gan_trainer(os.environ["WUT_TEST_OUT"])
    if os.environ.get("WUT_TEST_SUP") == "1":
        out["sup_param_sum"] = run_supervised(os.environ["WUT_TEST_OUT"])
    if os.environ.get("WUT_TEST_CACHE") == "1":
        out["cache"] = run_gan_cached(os.environ["WUT_TEST_OUT"],
                                      os.environ["WUT_TEST_IMGDIR"])
    path = os.path.join(os.environ["WUT_TEST_OUT"],
                        f"rank{jax.process_index()}.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print(f"mp_worker rank {out['rank']}: loss={out['loss']:.6f}", flush=True)


if __name__ == "__main__":
    main()
