"""Smoke test of the shared supervised training loop (classifier/estimator
drivers) with checkpointing and eval sweeps on synthetic batches."""

import numpy as np
import jax
import jax.numpy as jnp

from weather_unet_tpu.core.optim import torch_adam
from weather_unet_tpu.core.state import TrainState
from weather_unet_tpu.data.transforms import AugmentConfig
from weather_unet_tpu.models import ResNet
from weather_unet_tpu.train import checkpoint as ckpt
from weather_unet_tpu.train.loops import train_supervised
from weather_unet_tpu.train.metrics import SummaryWriter
from weather_unet_tpu.train.supervised import (
    make_classifier_step, make_eval_metrics, resnet_pretrained_mask)


class FakeLoader:
    def __init__(self, rng, n_batches=2, bs=8, size=32, classes=5):
        self.rng, self.n, self.bs, self.size, self.classes = rng, n_batches, bs, size, classes

    def __iter__(self):
        for _ in range(self.n):
            yield (self.rng.integers(0, 255, (self.bs, self.size, self.size, 3),
                                     dtype=np.uint8),
                   self.rng.integers(0, self.classes, self.bs))


def test_train_supervised_classifier(tmp_path, rng):
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    state = TrainState.create(
        variables["params"], torch_adam(1e-4, weight_decay=1e-4),
        extra=variables["batch_stats"])
    writer = SummaryWriter(log_dir=str(tmp_path / "runs"), comment="_t")

    out_state = train_supervised(
        model, make_classifier_step(model), make_eval_metrics(model, "classifier"),
        lambda: FakeLoader(rng), lambda: FakeLoader(rng, n_batches=1),
        state=state, num_epoch=2, writer=writer,
        augment_cfg=AugmentConfig(out_size=32),
        save_dir=str(tmp_path), name="cls", eval_per_iter=2,
        save_per_epoch=1, target_dtype=jnp.int32)
    assert int(out_state.step) == 4
    assert ckpt.latest_checkpoint(str(tmp_path), "cls") is not None
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(out_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_train_supervised_auto_resume(tmp_path, rng, capsys):
    """A relaunch restores the newest checkpoint — params, batch stats, AND
    optimizer moments — and skips completed epochs (the reference's
    ``classifier.py`` restarts cold every launch; auto-resume matches the
    GAN trainer's semantics, ``t_est_train.py:151-163``)."""
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    mk_state = lambda: TrainState.create(
        variables["params"], torch_adam(1e-4, weight_decay=1e-4),
        extra=variables["batch_stats"])
    run = lambda num_epoch: train_supervised(
        model, make_classifier_step(model), make_eval_metrics(model, "classifier"),
        lambda: FakeLoader(rng), lambda: FakeLoader(rng, n_batches=1),
        state=mk_state(), num_epoch=num_epoch, writer=None,
        augment_cfg=AugmentConfig(out_size=32),
        save_dir=str(tmp_path), name="res", eval_per_iter=10,
        save_per_epoch=1, target_dtype=jnp.int32)

    first = run(2)            # epochs 0,1; cadence save stores epoch=2
    capsys.readouterr()
    second = run(3)           # must resume at epoch 2 and run exactly one
    out = capsys.readouterr().out
    assert "resumed from" in out and "at step 4" in out
    assert int(second.step) - 0 == 2       # fresh state object: 1 epoch x 2 steps
    # the resumed run continued from the first run's weights, not from init
    cp = ckpt.latest_checkpoint(str(tmp_path), "res")
    restored = ckpt.restore_checkpoint(cp, None)
    assert int(restored["global_step"]) == 6 and int(restored["epoch"]) == 3
    assert "opt_state" in restored          # Adam moments survive relaunches
    # re-running with everything already done is a no-op resume
    third = run(3)
    out = capsys.readouterr().out
    assert "resumed from" in out
    assert int(third.step) == 0             # range(3, 3): no epochs left


class RecordingWriter:
    """Writer stand-in capturing add_scalars calls (TB event files are not
    readable back in-process)."""

    def __init__(self):
        self.records = []

    def add_scalars(self, scalars, step):
        self.records.append((step, dict(scalars)))

    def add_image_grid(self, *a, **k):
        pass

    def flush(self):
        pass

    def close(self):
        pass


def test_eval_sweep_keeps_partial_test_tail(tmp_path, rng):
    """A test split smaller than the batch size must still be evaluated —
    padded to a shardable size and weight-masked — and its metrics must
    EQUAL the plain eval on the real rows alone (review finding, round 5:
    BatchLoader's drop_last default silently dropped the tail, and an empty
    test sweep suppressed ALL metric logging)."""
    from weather_unet_tpu.data.transforms import normalize_batch

    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    state = TrainState.create(
        variables["params"], torch_adam(1e-4, weight_decay=1e-4),
        extra=variables["batch_stats"])
    x3 = rng.integers(0, 255, (3, 32, 32, 3), dtype=np.uint8)
    t3 = rng.integers(0, 5, 3)

    class OneBatch:
        def __iter__(self):
            yield (x3, t3)

    rec = RecordingWriter()
    eval_fn = make_eval_metrics(model, "classifier")
    out_state = train_supervised(
        model, make_classifier_step(model), eval_fn,
        lambda: FakeLoader(rng, n_batches=1), OneBatch,
        state=state, num_epoch=1, writer=rec, input_size=32,
        save_dir=str(tmp_path), name="tail", eval_per_iter=1,
        save_per_epoch=1, target_dtype=jnp.int32)

    assert rec.records, "eval cadence wrote nothing"
    _, scalars = rec.records[0]
    assert "loss/train" in scalars and "accuracy/test" in scalars
    # weighted-masked metrics == plain eval on just the 3 real rows
    expect = eval_fn(out_state.params, out_state.extra,
                     normalize_batch(jnp.asarray(x3), out_size=32),
                     jnp.asarray(t3, jnp.int32))
    assert np.isclose(scalars["accuracy/test"],
                      float(expect["accuracy"]), atol=1e-5)
    assert np.isclose(scalars["loss/test"], float(expect["loss"]), atol=1e-4)


def test_eval_sweep_empty_test_split_still_logs_train(tmp_path, rng, capsys):
    """Zero test batches must not suppress train-metric logging, and the
    loop must say loudly that test metrics are being skipped."""

    class Empty:
        def __iter__(self):
            return iter(())

    rec = RecordingWriter()
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    state = TrainState.create(
        variables["params"], torch_adam(1e-4, weight_decay=1e-4),
        extra=variables["batch_stats"])
    train_supervised(
        model, make_classifier_step(model),
        make_eval_metrics(model, "classifier"),
        lambda: FakeLoader(rng, n_batches=1), Empty,
        state=state, num_epoch=1, writer=rec, input_size=32,
        save_dir=str(tmp_path), name="empty", eval_per_iter=1,
        save_per_epoch=1, target_dtype=jnp.int32)
    assert rec.records and "loss/train" in rec.records[0][1]
    assert not any(k.endswith("/test") for k in rec.records[0][1])
    assert "test metrics will be skipped" in capsys.readouterr().out


def test_pretrained_mask_freezes_backbone(rng):
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    mask = resnet_pretrained_mask(variables["params"])
    # conv1 and layer1 frozen, layer4 + fc trainable
    assert float(jax.tree.leaves(mask["conv1"])[0].sum()) == 0.0
    assert float(jax.tree.leaves(mask["layer1_0"])[0].sum()) == 0.0
    assert float(jax.tree.leaves(mask["fc"])[0].sum()) > 0
    assert float(jax.tree.leaves(mask["layer4_0"])[0].sum()) > 0


def test_train_supervised_terminal_save(tmp_path, rng):
    """With save_per_epoch > num_epoch the per-epoch cadence only fires at
    epoch 0; the terminal save must still persist the run's final state."""
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    state = TrainState.create(
        variables["params"], torch_adam(1e-4, weight_decay=1e-4),
        extra=variables["batch_stats"])

    out_state = train_supervised(
        model, make_classifier_step(model), make_eval_metrics(model, "classifier"),
        lambda: FakeLoader(rng), lambda: FakeLoader(rng, n_batches=1),
        state=state, num_epoch=2, writer=None,
        augment_cfg=AugmentConfig(out_size=32),
        save_dir=str(tmp_path), name="cls", eval_per_iter=100,
        save_per_epoch=5, target_dtype=jnp.int32)
    path = ckpt.latest_checkpoint(str(tmp_path), "cls")
    assert path is not None and path.endswith("ckpt_s0000000004.msgpack")
    restored = ckpt.restore_checkpoint(
        path, {"params": out_state.params, "batch_stats": out_state.extra,
               "opt_state": out_state.opt_state, "epoch": 0,
               "global_step": 0, "epoch_step": 0})
    assert restored["global_step"] == 4
    assert restored["epoch"] == 2       # resume trains 0 further epochs


def test_train_supervised_resumes_oldest_checkpoint_layout(tmp_path, rng, capsys):
    """Params-only checkpoints (pre-round-3) stored 'epoch' as the
    just-COMPLETED epoch; every later layout stores the first epoch still to
    run. Resume must add +1 for the old layout or it re-trains a finished
    epoch."""
    model = ResNet(block_counts=(1, 1, 1, 1), num_classes=5)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    mk_state = lambda: TrainState.create(
        variables["params"], torch_adam(1e-4, weight_decay=1e-4),
        extra=variables["batch_stats"])

    # old-layout checkpoint written after COMPLETING epoch 1 (of 2)
    ckpt.save_checkpoint(str(tmp_path), "old", 4,
                         {"params": variables["params"],
                          "batch_stats": variables["batch_stats"],
                          "epoch": 1, "global_step": 4})

    epochs_run = []

    def train_loader_fn():
        epochs_run.append(1)
        return FakeLoader(rng)

    train_supervised(
        model, make_classifier_step(model), make_eval_metrics(model, "classifier"),
        train_loader_fn, lambda: FakeLoader(rng, n_batches=1),
        state=mk_state(), num_epoch=2, writer=None,
        augment_cfg=AugmentConfig(out_size=32),
        save_dir=str(tmp_path), name="old", eval_per_iter=100,
        save_per_epoch=1, target_dtype=jnp.int32)
    # epoch 1 was already complete -> zero epochs re-trained
    assert epochs_run == []
    assert "resumed from" in capsys.readouterr().out


def test_padded_eval_refuses_weightless_eval_fn():
    """_padded_eval_batches(allow_pad=False) must refuse a partial batch
    instead of padding it: a 4-arg eval_fn (weights dropped by the wrapper)
    would average the duplicated pad rows into its metrics (review
    finding, round 5)."""
    import pytest

    from weather_unet_tpu.train.loops import _padded_eval_batches

    full = (np.zeros((8, 4, 4, 3), np.uint8), np.zeros(8, np.int32))
    tail = (np.zeros((3, 4, 4, 3), np.uint8), np.zeros(3, np.int32))
    counts = []
    ok = list(_padded_eval_batches(iter([full]), 8, counts, allow_pad=False))
    assert len(ok) == 1 and counts == [8]
    with pytest.raises(ValueError, match="no weights argument"):
        list(_padded_eval_batches(iter([full, tail]), 8, [],
                                  allow_pad=False))
