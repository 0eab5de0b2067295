"""AOT executable cache (core/aot.py): compile once, reload across processes.

The reference ships precompiled CUDA kernels inside PyTorch wheels; on this
backend the analogous property (no compiler in the serving startup path) has
to be built — the persistent XLA compile cache does not serialize TPU
executables.  These tests pin the disk round-trip, corruption fallback,
per-shape bucketing, and numerical equality with the plain jit path, on the
CPU backend (conftest forces an 8-device virtual mesh).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from weather_unet_tpu.core.aot import AotCache, AotJit, BoundFn


def _fn(w, x):
    return jnp.tanh(x @ w) * 2.0


def test_roundtrip_and_disk_hit(tmp_path):
    cache = AotCache(str(tmp_path))
    w = np.ones((16, 16), np.float32)
    x = np.arange(64, dtype=np.float32).reshape(4, 16)
    exe = cache.load_or_compile(_fn, w, x)
    out = np.asarray(exe(w, x))
    np.testing.assert_allclose(out, np.tanh(x @ w) * 2, rtol=1e-6)
    assert cache.stats["misses"] == 1 and cache.stats["hits"] == 0
    assert len(list(tmp_path.glob("*.aotexe"))) == 1

    # a fresh cache object (≈ a restarted process) must load from disk
    cache2 = AotCache(str(tmp_path))
    exe2 = cache2.load_or_compile(_fn, w, x)
    np.testing.assert_array_equal(np.asarray(exe2(w, x)), out)
    assert cache2.stats["hits"] == 1 and cache2.stats["misses"] == 0
    assert cache2.stats["compile_s"] == 0.0


def test_key_covers_shapes_and_program(tmp_path):
    cache = AotCache(str(tmp_path))
    w = np.ones((16, 16), np.float32)
    cache.load_or_compile(_fn, w, np.ones((4, 16), np.float32))
    cache.load_or_compile(_fn, w, np.ones((8, 16), np.float32))   # new shape
    cache.load_or_compile(lambda w, x: x @ w, w,
                          np.ones((4, 16), np.float32))           # new program
    assert cache.stats["misses"] == 3
    assert len(list(tmp_path.glob("*.aotexe"))) == 3


def test_corrupt_entry_recompiles(tmp_path):
    cache = AotCache(str(tmp_path))
    w = np.ones((8, 8), np.float32)
    x = np.ones((2, 8), np.float32)
    cache.load_or_compile(_fn, w, x)
    (path,) = tmp_path.glob("*.aotexe")
    path.write_bytes(b"garbage")   # partial write / stale format
    cache2 = AotCache(str(tmp_path))
    exe = cache2.load_or_compile(_fn, w, x)
    np.testing.assert_allclose(np.asarray(exe(w, x)), np.tanh(x @ w) * 2,
                               rtol=1e-6)
    assert cache2.stats["fallbacks"] == 1 and cache2.stats["misses"] == 1
    # the bad entry was replaced by a good one
    cache3 = AotCache(str(tmp_path))
    cache3.load_or_compile(_fn, w, x)
    assert cache3.stats["hits"] == 1


def test_aotjit_per_shape_buckets(tmp_path):
    cache = AotCache(str(tmp_path))
    aj = AotJit(_fn, cache)
    w = np.ones((8, 8), np.float32)
    aj(w, np.ones((1, 8), np.float32))
    aj(w, np.ones((2, 8), np.float32))
    aj(w, np.ones((2, 8), np.float32))   # same shape: in-memory, no relookup
    assert aj._cache_size() == 2
    assert cache.stats["misses"] == 2

    bound = BoundFn(aj, w)
    out = np.asarray(bound(np.ones((2, 8), np.float32)))
    assert bound._cache_size() == 2
    np.testing.assert_allclose(out, np.tanh(np.ones((2, 8)) @ w) * 2,
                               rtol=1e-6)


def test_aotjit_dict_memo_bounded(tmp_path):
    """The identity-keyed container memo must not grow without bound when a
    caller cycles through many distinct dicts (each pinned by the memo's
    strong ref) — FIFO eviction caps it at _frag_max entries."""
    aj = AotJit(_fn, AotCache(str(tmp_path)))
    w = np.ones((8, 8), np.float32)
    x = np.ones((1, 8), np.float32)
    aj(w, x)   # compile once; later dicts reuse the executable
    for _ in range(3 * aj._frag_max):
        aj._shape_key(({"w": w}, x))
    assert len(aj._frag) <= aj._frag_max
    # the steady-state container keeps hitting the memo after evictions
    d = {"w": w}
    k1 = aj._shape_key((d, x))
    assert aj._shape_key((d, x)) == k1
    assert id(d) in aj._frag


@pytest.fixture(scope="module")
def gan_cp(tmp_path_factory):
    from weather_unet_tpu.train import checkpoint as ckpt
    from weather_unet_tpu.train.gan import GanConfig, build_gan_state

    cfg = GanConfig(input_size=32)
    _, _, state = build_gan_state(cfg, jax.random.key(0))
    path = str(tmp_path_factory.mktemp("aot") / "g.pt")
    ckpt.export_torch_gan(path, {"params": state.gen.params},
                          {"params": state.disc.params,
                           "spectral": state.spectral}, 0, 0)
    return path


def test_api_aot_matches_plain(gan_cp, tmp_path, rng):
    from weather_unet_tpu.api import WeatherTransfer

    imgs = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
    conds = np.eye(5, dtype=np.float32)[[0, 2, 4]]
    plain = WeatherTransfer.load(gan_cp)
    aot = WeatherTransfer.load(gan_cp, aot_cache=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(aot.translate_u8(imgs, conds)),
                                  np.asarray(plain.translate_u8(imgs, conds)))
    assert aot.aot.stats["misses"] >= 1

    # restart: same checkpoint, fresh process-equivalent -> pure disk hits
    aot2 = WeatherTransfer.load(gan_cp, aot_cache=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(aot2.translate_u8(imgs, conds)),
                                  np.asarray(plain.translate_u8(imgs, conds)))
    assert aot2.aot.stats["misses"] == 0 and aot2.aot.stats["hits"] >= 1


def test_api_aot_reused_across_checkpoints(gan_cp, tmp_path, rng):
    """Weights are arguments, not baked constants: a different checkpoint of
    the same architecture reuses the cached executable (and computes its own
    numbers with it)."""
    from weather_unet_tpu.api import WeatherTransfer
    from weather_unet_tpu.train import checkpoint as ckpt
    from weather_unet_tpu.train.gan import GanConfig, build_gan_state

    cfg = GanConfig(input_size=32)
    _, _, state = build_gan_state(cfg, jax.random.key(123))
    cp2 = str(tmp_path / "g2.pt")
    ckpt.export_torch_gan(cp2, {"params": state.gen.params},
                          {"params": state.disc.params,
                           "spectral": state.spectral}, 0, 0)

    cdir = str(tmp_path / "cache")
    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    conds = np.eye(5, dtype=np.float32)[[1, 3]]
    a = WeatherTransfer.load(gan_cp, aot_cache=cdir)
    out_a = np.asarray(a.translate_u8(imgs, conds))
    b = WeatherTransfer.load(cp2, aot_cache=cdir)
    out_b = np.asarray(b.translate_u8(imgs, conds))
    assert b.aot.stats["misses"] == 0 and b.aot.stats["hits"] >= 1
    assert not np.array_equal(out_a, out_b)   # different weights, real compute


def test_api_aot_data_parallel(gan_cp, tmp_path, rng):
    """AOT + mesh: sharded executables serialize/deserialize and match the
    plain sharded path on the virtual 8-device mesh."""
    from weather_unet_tpu.api import WeatherTransfer
    from weather_unet_tpu.parallel.mesh import make_mesh

    imgs = rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8)
    conds = np.eye(5, dtype=np.float32)[rng.integers(0, 5, 8)]
    plain = WeatherTransfer.load(gan_cp, plan=make_mesh())
    aot = WeatherTransfer.load(gan_cp, plan=make_mesh(),
                               aot_cache=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(aot.translate_u8(imgs, conds)),
                                  np.asarray(plain.translate_u8(imgs, conds)))
    aot2 = WeatherTransfer.load(gan_cp, plan=make_mesh(),
                                aot_cache=str(tmp_path))
    np.testing.assert_array_equal(np.asarray(aot2.translate_u8(imgs, conds)),
                                  np.asarray(plain.translate_u8(imgs, conds)))
    assert aot2.aot.stats["misses"] == 0 and aot2.aot.stats["hits"] >= 1


def test_trainer_aot_cache(tmp_path):
    """GAN trainer with aot_cache: donated-buffer step executables serialize,
    and a restarted trainer loads them from disk (misses == 0) — the
    ~25-minute step compile is the dominant training cold-start cost on the
    tunneled TPU (bench_aot.py)."""
    import numpy as np
    from weather_unet_tpu.train.gan import GanConfig
    from weather_unet_tpu.train.loops import WeatherTransferTrainer

    rng = np.random.default_rng(0)

    class FakeLoader:
        def __iter__(self):
            for _ in range(2):
                yield (rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
                       rng.standard_normal((4, 5)).astype(np.float32))

    def est_apply(images):
        return jnp.mean(images, axis=(1, 2)) @ jnp.ones((3, 5), images.dtype)

    # gd_train_ratio=2 exercises BOTH step programs (d-only on odd steps,
    # d+g on even ones)
    cfg = GanConfig(input_size=32, batch_size=4, num_epoch=1,
                    gd_train_ratio=2)
    cdir = str(tmp_path / "aot")
    tr = WeatherTransferTrainer(
        cfg, est_apply, save_dir=str(tmp_path / "cp"), name="a",
        log_dir=str(tmp_path / "runs"), aot_cache=cdir)
    tr.train_epoch(FakeLoader(), FakeLoader())
    assert int(tr.state.global_step) == 2
    assert tr.aot.stats["misses"] == 2          # d-only and d+g programs
    assert tr.aot.stats["hits"] == 0
    g_after = np.asarray(jax.tree.leaves(tr.state.gen.params)[0]).copy()

    # "restart": fresh trainer, same cache dir — resumes AND loads from disk
    tr2 = WeatherTransferTrainer(
        cfg, est_apply, save_dir=str(tmp_path / "cp"), name="a",
        log_dir=str(tmp_path / "runs"), aot_cache=cdir)
    tr2.train_epoch(FakeLoader(), FakeLoader())
    assert tr2.aot.stats["misses"] == 0
    assert tr2.aot.stats["hits"] >= 2
    g2 = np.asarray(jax.tree.leaves(tr2.state.gen.params)[0])
    assert not np.array_equal(g_after, g2)      # real training happened


def test_supervised_aot_cache(tmp_path, rng):
    """train_supervised with aot_cache: second run loads the step executable
    from disk (classifier/estimator CLIs expose --aot_cache)."""
    from weather_unet_tpu.core.aot import AotCache
    from weather_unet_tpu.core.optim import torch_adam
    from weather_unet_tpu.core.state import TrainState
    from weather_unet_tpu.models import ResNet
    from weather_unet_tpu.train.loops import train_supervised
    from weather_unet_tpu.train.supervised import (
        make_classifier_step, make_eval_metrics)

    class FakeLoader:
        def __iter__(self):
            for _ in range(2):
                yield (rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
                       rng.integers(0, 5, 4))

    def run(cache, name):
        # distinct run names: auto-resume would otherwise skip the second
        # run's (completed) epoch entirely and never request the executable
        model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        state = TrainState.create(
            variables["params"], torch_adam(1e-4, weight_decay=1e-4),
            extra=variables["batch_stats"])
        return train_supervised(
            model, make_classifier_step(model),
            make_eval_metrics(model, "classifier"),
            lambda: FakeLoader(), lambda: FakeLoader(),
            state=state, num_epoch=1, save_dir=str(tmp_path), name=name,
            batch_size=4, eval_per_iter=100, target_dtype=jnp.int32,
            input_size=32, aot_cache=cache)

    c1 = AotCache(str(tmp_path / "aot"))
    run(c1, "c1")
    assert c1.stats["misses"] == 1 and c1.stats["hits"] == 0
    c2 = AotCache(str(tmp_path / "aot"))
    run(c2, "c2")
    assert c2.stats["misses"] == 0 and c2.stats["hits"] == 1


def test_serve_aot_flag(gan_cp, tmp_path):
    """--aot_cache: a server restart re-warms every bucket from disk."""
    from weather_unet_tpu.cli.serve import build_parser, build_server

    cdir = str(tmp_path / "srv")
    argv = ["--cp_path", gan_cp, "--host", "127.0.0.1", "--port", "0",
            "--input_size", "32", "--max_batch", "4", "--aot_cache", cdir]
    s1 = build_server(build_parser().parse_args(argv))
    try:
        assert s1.transfer._translate_u8._cache_size() == 3   # 1, 2, 4
        assert s1.transfer.aot.stats["misses"] == 3
    finally:
        s1.server_close()
    s2 = build_server(build_parser().parse_args(argv))
    try:
        assert s2.transfer._translate_u8._cache_size() == 3
        assert s2.transfer.aot.stats["misses"] == 0
        assert s2.transfer.aot.stats["hits"] == 3
    finally:
        s2.server_close()
