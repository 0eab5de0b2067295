"""Preemption-safe shutdown: SIGTERM mid-training checkpoints and exits."""

import os
import signal

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from weather_unet_tpu.train import checkpoint as ckpt
from weather_unet_tpu.train.gan import GanConfig
from weather_unet_tpu.train.preemption import GracefulShutdown


def test_graceful_shutdown_flag():
    with GracefulShutdown(signals=(signal.SIGUSR1,)) as stop:
        assert not stop.requested
        os.kill(os.getpid(), signal.SIGUSR1)
        assert stop.requested
        assert stop.signum == signal.SIGUSR1
    # restored afterwards: the default SIGUSR1 action would kill us in the
    # handler's absence, so just verify the handler is no longer ours
    assert signal.getsignal(signal.SIGUSR1) != stop._handler


def test_graceful_shutdown_second_signal_raises():
    with GracefulShutdown(signals=(signal.SIGUSR1,)) as stop:
        os.kill(os.getpid(), signal.SIGUSR1)
        assert stop.requested
        with pytest.raises(KeyboardInterrupt):
            os.kill(os.getpid(), signal.SIGUSR1)
    signal.signal(signal.SIGUSR1, signal.SIG_DFL)


def _est_apply(images):
    return jnp.mean(images, axis=(1, 2)) @ jnp.ones((3, 5), images.dtype)


class SignalingLoader:
    """Yields small GAN batches forever; sends SIGTERM to self after
    ``fire_after`` batches (simulating the platform's preemption notice)."""

    drop_last = True   # every yielded batch is full-size (fast-forward contract)

    def __init__(self, fire_after=None, n=64):
        self.fire_after = fire_after
        self.n = n
        self._rng = np.random.default_rng(0)

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            if self.fire_after is not None and i == self.fire_after:
                os.kill(os.getpid(), signal.SIGTERM)
            yield (self._rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
                   self._rng.standard_normal((4, 5)).astype(np.float32))


def test_trainer_preemption_checkpoints_and_stops(tmp_path):
    from weather_unet_tpu.train.loops import WeatherTransferTrainer

    cfg = GanConfig(input_size=32, batch_size=4, num_epoch=3)
    tr = WeatherTransferTrainer(
        cfg, _est_apply, save_dir=str(tmp_path), name="g",
        log_dir=str(tmp_path / "runs"))
    tr.EVAL_PER_STEP = 1000      # ordinary cadence never fires in this test
    tr.DISPLAY_PER_STEP = 1000
    tr.fit(lambda: SignalingLoader(fire_after=3),
           lambda: SignalingLoader())
    # stopped early (3 epochs x 64 steps never ran) and saved at the stop
    assert int(tr.state.global_step) < 10
    path = ckpt.latest_checkpoint(str(tmp_path), "g")
    assert path is not None
    restored = ckpt.restore_checkpoint(path, tr.state)
    assert int(restored.global_step) == int(tr.state.global_step)
    # handler was restored on exit
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler)


def test_trainer_resume_trains_exactly_the_remaining_steps(tmp_path):
    """A preempted-then-relaunched run must finish with EXACTLY
    num_epoch * steps_per_epoch training steps: fit() loops on the absolute
    epoch (not num_epoch more epochs) and _epoch_skip fast-forwards the
    batches the interrupted epoch already trained on."""
    from weather_unet_tpu.train.loops import WeatherTransferTrainer

    cfg = GanConfig(input_size=32, batch_size=4, num_epoch=2)
    kw = dict(save_dir=str(tmp_path), name="r", log_dir=str(tmp_path / "runs"))
    tr = WeatherTransferTrainer(cfg, _est_apply, **kw)
    tr.fit(lambda: SignalingLoader(fire_after=3, n=6),
           lambda: SignalingLoader(n=6))
    # preempted somewhere inside epoch 0 (the prefetch lookahead means the
    # signal can land a step or two before batch 3 reaches the train loop)
    n1 = int(jax.device_get(tr.state.global_step))
    assert 0 <= n1 < 6 and int(jax.device_get(tr.state.epoch)) == 0

    tr2 = WeatherTransferTrainer(cfg, _est_apply, **kw)      # auto-resumes
    assert tr2._gstep == n1
    tr2.fit(lambda: SignalingLoader(n=6), lambda: SignalingLoader(n=6))
    # 2 epochs x 6 steps total — the resume must neither run num_epoch MORE
    # epochs nor re-train the interrupted epoch's already-trained head
    assert int(jax.device_get(tr2.state.global_step)) == 12
    assert int(jax.device_get(tr2.state.epoch)) == 2


def test_supervised_resume_trains_exactly_the_remaining_steps(tmp_path):
    """The preemption checkpoint stores the in-epoch position (epoch_step)
    and the resumed run fast-forwards it, finishing with exactly
    num_epoch * steps_per_epoch optimizer steps."""
    import optax
    from flax import linen as nn

    from weather_unet_tpu.core.state import TrainState
    from weather_unet_tpu.train.loops import train_supervised

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(5)(x.mean(axis=(1, 2)))

    model = Tiny()

    def fresh_state():
        params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
        return TrainState.create(params, optax.adam(1e-3), extra={})

    def step_fn(state, x, y):
        def loss_fn(p):
            pred = model.apply({"params": p}, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    def eval_fn(params, extra, x, y):
        pred = model.apply({"params": params}, x)
        return {"loss": jnp.mean((pred - y) ** 2)}

    class Loader:
        def __init__(self, fire_after=None, n=6):
            self.fire_after = fire_after
            self.n = n
            self._rng = np.random.default_rng(0)

        def __iter__(self):
            for i in range(self.n):
                if self.fire_after is not None and i == self.fire_after:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield (self._rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
                       self._rng.standard_normal((4, 5)).astype(np.float32))

    kw = dict(state=None, batch_size=4, num_epoch=2, input_size=32,
              save_dir=str(tmp_path), name="supr", eval_per_iter=1000)
    kw["state"] = fresh_state()
    out = train_supervised(model, step_fn, eval_fn,
                           lambda: Loader(fire_after=3), lambda: Loader(),
                           **kw)
    n1 = int(jax.device_get(out.step))
    assert 0 <= n1 < 6   # preempted inside epoch 0 (prefetch lookahead)

    kw["state"] = fresh_state()   # resumed from the checkpoint inside
    out2 = train_supervised(model, step_fn, eval_fn,
                            lambda: Loader(), lambda: Loader(), **kw)
    # state.step counts THIS run's optimizer steps (it is not checkpointed):
    # the resumed run must train exactly the 12 - n1 remaining batches —
    # fast-forwarding the n1 already trained, not replaying epoch 0's head
    assert int(jax.device_get(out2.step)) == 12 - n1


def test_supervised_preemption_checkpoints_and_stops(tmp_path):
    import optax
    from flax import linen as nn

    from weather_unet_tpu.core.state import TrainState
    from weather_unet_tpu.train.loops import train_supervised

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(5)(x.mean(axis=(1, 2)))

    model = Tiny()
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    state = TrainState.create(params, optax.adam(1e-3), extra={})

    def step_fn(state, x, y):
        def loss_fn(p):
            pred = model.apply({"params": p}, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), {"loss": loss}

    def eval_fn(params, extra, x, y):
        pred = model.apply({"params": params}, x)
        return {"loss": jnp.mean((pred - y) ** 2)}

    class Loader:
        def __init__(self, fire_after=None):
            self.fire_after = fire_after
            self._rng = np.random.default_rng(0)

        def __iter__(self):
            for i in range(64):
                if self.fire_after is not None and i == self.fire_after:
                    os.kill(os.getpid(), signal.SIGTERM)
                yield (self._rng.integers(0, 255, (4, 32, 32, 3), dtype=np.uint8),
                       self._rng.standard_normal((4, 5)).astype(np.float32))

    out = train_supervised(
        model, step_fn, eval_fn,
        lambda: Loader(fire_after=3), lambda: Loader(),
        state=state, batch_size=4, num_epoch=3, input_size=32,
        save_dir=str(tmp_path), name="sup", eval_per_iter=1000)
    assert int(out.step) < 10   # stopped early: 3 epochs x 64 steps never ran
    assert ckpt.latest_checkpoint(str(tmp_path), "sup") is not None
