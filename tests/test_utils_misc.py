"""Tests for the small reference-utility ops."""

import numpy as np
import jax
import jax.numpy as jnp

from weather_unet_tpu.ops import utils_misc as um


def test_make_one_hot_global_argmax():
    x = jnp.asarray([[0.1, 0.9], [0.2, 0.3]])
    out = um.make_one_hot(x, 4)
    assert out.shape == (4,)
    assert int(jnp.argmax(out)) == 1  # flat argmax


def test_vector_to_one_hot(rng):
    v = jnp.asarray(rng.standard_normal(5).astype(np.float32))
    out = um.vector_to_one_hot(v)
    assert float(out.sum()) == 1.0
    assert int(jnp.argmax(out)) == int(jnp.argmax(v))


def test_half_dropout_only_first_half(rng):
    x = jnp.ones((2, 4, 4, 8))
    out = um.half_dropout(jax.random.key(0), x, rate=0.5)
    back = np.asarray(out[..., 4:])
    np.testing.assert_array_equal(back, np.ones_like(back))  # second half untouched
    front = np.asarray(out[..., :4])
    assert (front == 0).any() and (front == 2.0).any()  # dropped + rescaled
    same = um.half_dropout(jax.random.key(0), x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))


def test_denormalize_clamps(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 3)).astype(np.float32))
    out = um.denormalize(x, 0.5, 0.5)
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0


def test_sequential_labels():
    oh = um.get_sequential_labels(5, 8, one_hot=True)
    assert oh.shape == (8, 5)
    np.testing.assert_array_equal(np.asarray(oh[:5]), np.eye(5))
    np.testing.assert_array_equal(np.asarray(oh[5]), np.eye(5)[0])
    ints = um.get_sequential_labels(5, 8, one_hot=False)
    np.testing.assert_array_equal(np.asarray(ints), [0, 1, 2, 3, 4, 0, 1, 2])


def test_rand_labels_and_const():
    lb = um.get_rand_labels(jax.random.key(0), 5, 8)
    assert lb.shape == (8, 5)
    assert float(lb.min()) >= -1.0 and float(lb.max()) <= 1.0
    cb = um.const_batch(1.0, 4)
    np.testing.assert_array_equal(np.asarray(cb), np.ones((4, 1)))


def test_lmda_ramp():
    assert um.lmda_ramp(50, 100) == 0.5
    assert um.lmda_ramp(50, 100, fixed=0.3) == 0.3


def test_image_table_matches_make_table_img():
    """train.metrics.image_table == reference ops.make_table_img semantics
    (ops.py:77-84): torch.cat([images] + results, dim=2) on NCHW, i.e. the
    input batch stacked ABOVE each result batch along HEIGHT (review
    finding, round 5: this used to concat along WIDTH)."""
    import torch

    from weather_unet_tpu.train.metrics import image_table

    rng = np.random.default_rng(0)
    imgs = rng.random((2, 4, 6, 3)).astype(np.float32)
    r1 = rng.random((2, 4, 6, 3)).astype(np.float32)
    r2 = rng.random((2, 4, 6, 3)).astype(np.float32)
    ours = image_table(imgs, [r1, r2])
    nchw = lambda a: torch.from_numpy(a).permute(0, 3, 1, 2)
    ref = torch.cat([nchw(imgs), nchw(r1), nchw(r2)], dim=2)
    np.testing.assert_array_equal(ours, ref.permute(0, 2, 3, 1).numpy())
    # single-result call stays supported
    assert image_table(imgs, r1).shape == (2, 8, 6, 3)
