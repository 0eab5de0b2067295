"""core/rng.py: hardware-RNG training keys.

Trainers default to the ``rbg`` PRNG because threefry dropout-mask
generation measured ~16% of the GAN combined step on TPU v5e
(bench_gan_profile.py).  These tests pin the impl selection contract and
that the derived-key operations the trainers rely on (fold_in, split,
bernoulli under jit) work on rbg keys.
"""
import os

import jax
import jax.numpy as jnp
import pytest

from weather_unet_tpu.core import rng as wrng


def test_default_impl_is_rbg():
    assert os.environ.get("WUT_PRNG_IMPL") is None
    assert wrng.default_impl() == "rbg"


def test_env_override(monkeypatch):
    monkeypatch.setenv("WUT_PRNG_IMPL", "threefry2x32")
    assert wrng.default_impl() == "threefry2x32"
    monkeypatch.setenv("WUT_PRNG_IMPL", "philox")  # not a jax impl we allow
    with pytest.raises(ValueError):
        wrng.default_impl()


def test_train_key_impl_and_derivation():
    k = wrng.train_key(0)
    assert str(jax.random.key_impl(k)) == "rbg"
    # the trainer's fused step derives per-step keys this way (loops.py)
    k1 = jax.random.fold_in(k, 7)
    a, b = jax.random.split(k1)
    mask = jax.jit(lambda kk: jax.random.bernoulli(kk, 0.3, (64, 64)))(a)
    frac = float(jnp.mean(mask))
    assert 0.1 < frac < 0.5 and mask.shape == (64, 64)
    # distinct derivations give distinct streams
    assert not jnp.array_equal(jax.random.key_data(a), jax.random.key_data(b))


def test_explicit_impl_wins():
    k = wrng.train_key(0, impl="threefry2x32")
    assert str(jax.random.key_impl(k)) == "threefry2x32"
