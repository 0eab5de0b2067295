"""ops/dropout.py: packed (8-bit-lane) dropout.

Statistical contract (drop rate, unbiased scale), determinism, gradient
shape, and the odd-channel fallback.  The quantized keep probability is
thresh/256 with thresh = round(keep*256); assertions below use the actual
value, mirroring the scale the implementation applies.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weather_unet_tpu.ops.dropout import PackedDropout, packed_dropout


def test_drop_rate_and_scale():
    key = jax.random.key(0)
    x = jnp.ones((64, 32, 32, 64), jnp.float32)
    y = packed_dropout(key, x, 0.3)
    thresh = round(0.7 * 256)           # 179
    keep_actual = thresh / 256.0
    zeros = float(jnp.mean(y == 0.0))
    assert abs(zeros - (1 - keep_actual)) < 5e-3
    kept = np.asarray(y[y != 0.0])
    np.testing.assert_allclose(kept, 1.0 / keep_actual, rtol=1e-6)
    # unbiased in expectation
    assert abs(float(jnp.mean(y)) - 1.0) < 5e-3


def test_deterministic_given_key_and_distinct_across_keys():
    x = jnp.arange(4 * 8 * 8 * 16, dtype=jnp.float32).reshape(4, 8, 8, 16)
    a = packed_dropout(jax.random.key(1), x, 0.3)
    b = packed_dropout(jax.random.key(1), x, 0.3)
    c = packed_dropout(jax.random.key(2), x, 0.3)
    assert jnp.array_equal(a, b)
    assert not jnp.array_equal(a, c)


def test_rbg_keys_and_jit():
    # the trainers feed rbg keys (core/rng.py); must jit cleanly
    key = jax.random.key(3, impl="rbg")
    x = jnp.ones((8, 16, 16, 32), jnp.bfloat16)
    y = jax.jit(lambda k, v: packed_dropout(k, v, 0.3))(key, x)
    assert y.dtype == jnp.bfloat16 and 0.0 < float(jnp.mean(y == 0)) < 0.6


def test_odd_channels_fallback_matches_rate():
    key = jax.random.key(4)
    x = jnp.ones((64, 16, 16, 3), jnp.float32)   # 3 % 4 != 0 -> bernoulli path
    y = packed_dropout(key, x, 0.3)
    assert abs(float(jnp.mean(y == 0.0)) - 0.3) < 2e-2
    kept = np.asarray(y[y != 0.0])
    np.testing.assert_allclose(kept, 1.0 / 0.7, rtol=1e-5)


def test_extreme_rate_fallback():
    key = jax.random.key(5)
    x = jnp.ones((32, 8, 8, 8), jnp.float32)
    y = packed_dropout(key, x, 0.999)   # thresh rounds to 0 -> bernoulli path
    assert float(jnp.mean(y == 0.0)) > 0.99


def test_gradient_is_mask_times_scale():
    key = jax.random.key(6)
    x = jnp.ones((2, 4, 4, 8), jnp.float32)
    g = jax.grad(lambda v: jnp.sum(packed_dropout(key, v, 0.3)))(x)
    y = packed_dropout(key, x, 0.3)
    np.testing.assert_allclose(np.asarray(g), np.asarray(y), rtol=1e-6)


def test_module_rate_zero_and_deterministic_identity():
    x = jnp.ones((2, 4, 4, 8))
    m = PackedDropout(0.0)
    y = m.apply({}, x, rngs={"dropout": jax.random.key(0)})
    assert jnp.array_equal(x, y)
    m = PackedDropout(0.3, deterministic=True)
    assert jnp.array_equal(m.apply({}, x), x)


@pytest.mark.parametrize("rate", [0.1, 0.3, 0.5])
def test_mean_preserved_various_rates(rate):
    key = jax.random.key(7)
    x = jax.random.normal(jax.random.key(8), (32, 16, 16, 32))
    y = packed_dropout(key, x, rate)
    # E[y] == E[x]; tolerance scales with mask variance over ~2.6e5 samples
    assert abs(float(jnp.mean(y)) - float(jnp.mean(x))) < 2e-2


# ---- bits_dropout (u16 words; the framework default via make_dropout) ----


def test_bits_drop_rate_and_scale():
    from weather_unet_tpu.ops.dropout import bits_dropout

    key = jax.random.key(10)
    x = jnp.ones((64, 32, 32, 64), jnp.float32)
    y = bits_dropout(key, x, 0.3)
    thresh = round(0.7 * 65536)          # 45875
    keep_actual = thresh / 65536.0
    zeros = float(jnp.mean(y == 0.0))
    assert abs(zeros - (1 - keep_actual)) < 5e-3
    kept = np.asarray(y[y != 0.0])
    np.testing.assert_allclose(kept, 1.0 / keep_actual, rtol=1e-6)
    assert abs(float(jnp.mean(y)) - 1.0) < 5e-3


def test_bits_deterministic_rate0_grad_and_extreme_fallback():
    from weather_unet_tpu.ops.dropout import bits_dropout

    x = jnp.arange(4 * 8 * 8 * 16, dtype=jnp.float32).reshape(4, 8, 8, 16)
    a = bits_dropout(jax.random.key(1), x, 0.3)
    assert jnp.array_equal(a, bits_dropout(jax.random.key(1), x, 0.3))
    assert not jnp.array_equal(a, bits_dropout(jax.random.key(2), x, 0.3))
    assert bits_dropout(jax.random.key(1), x, 0.0) is x
    g = jax.grad(lambda v: jnp.sum(bits_dropout(jax.random.key(1), v, 0.3)))(x)
    ones = jnp.ones_like(x)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(bits_dropout(jax.random.key(1), ones, 0.3)),
        rtol=1e-6)
    y = bits_dropout(jax.random.key(5), ones, 1.0 - 1e-7)  # thresh -> 0
    assert float(jnp.mean(y == 0.0)) > 0.99


def test_bits_rbg_keys_and_jit():
    from weather_unet_tpu.ops.dropout import bits_dropout

    key = jax.random.key(3, impl="rbg")
    x = jnp.ones((8, 16, 16, 32), jnp.bfloat16)
    y = jax.jit(lambda k, v: bits_dropout(k, v, 0.3))(key, x)
    assert y.dtype == jnp.bfloat16 and 0.0 < float(jnp.mean(y == 0)) < 0.6


def test_make_dropout_env_switch(monkeypatch):
    from flax import linen as nn

    from weather_unet_tpu.ops.dropout import BitsDropout, make_dropout

    monkeypatch.delenv("WUT_DROPOUT", raising=False)
    assert isinstance(make_dropout(0.3, False), BitsDropout)
    monkeypatch.setenv("WUT_DROPOUT", "torch")
    assert isinstance(make_dropout(0.3, False), nn.Dropout)
    x = jnp.ones((2, 4, 4, 8))
    for env in ("bits16", "torch"):
        monkeypatch.setenv("WUT_DROPOUT", env)
        m = make_dropout(0.3, True)      # deterministic: identity either way
        assert jnp.array_equal(m.apply({}, x), x)


def test_cunet_train_forward_uses_bits_dropout(monkeypatch):
    """The model's training forward must draw u16 mask words by default and
    reproduce the old nn.Dropout stream under WUT_DROPOUT=torch (same param
    tree, same rng collection, different masks)."""
    from weather_unet_tpu.models import ConditionalUNet

    gen = ConditionalUNet(num_classes=5)
    x = jnp.zeros((2, 32, 32, 3))
    c = jnp.eye(5)[jnp.asarray([0, 1])]
    v = gen.init(jax.random.key(0), x, c)
    args = dict(rngs={"dropout": jax.random.key(7)}, train=True)
    xr = jax.random.normal(jax.random.key(1), x.shape)

    monkeypatch.delenv("WUT_DROPOUT", raising=False)
    y_bits = gen.apply(v, xr, c, **args)
    assert jnp.array_equal(y_bits, gen.apply(v, xr, c, **args))
    monkeypatch.setenv("WUT_DROPOUT", "torch")
    y_torch = gen.apply(v, xr, c, **args)
    assert y_bits.shape == y_torch.shape
    assert not jnp.array_equal(y_bits, y_torch)   # different mask streams
    # eval forward is impl-independent (dropout identity)
    monkeypatch.delenv("WUT_DROPOUT", raising=False)
    e1 = gen.apply(v, xr, c)
    monkeypatch.setenv("WUT_DROPOUT", "torch")
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(gen.apply(v, xr, c)))


def test_make_dropout_rejects_unknown_impl(monkeypatch):
    """A typo'd WUT_DROPOUT must fail loudly, not silently draw the default
    mask stream (the reproducibility failure the env var exists to prevent)."""
    import pytest

    from weather_unet_tpu.ops.dropout import make_dropout

    monkeypatch.setenv("WUT_DROPOUT", "torch32")
    with pytest.raises(ValueError, match="WUT_DROPOUT"):
        make_dropout(0.3, False)
