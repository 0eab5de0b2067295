"""Small utilities from the reference's ``utils.py`` / ``ops.py`` inventory.

Some are unused by the reference's own forward paths (SURVEY.md §2.1) but are
part of the public surface; kept here for drop-in completeness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_one_hot(x, num_classes: int):
    """Global argmax -> one-hot (reference ``MakeOneHot``, ``utils.py:74-81``;
    note the reference takes the argmax over the *whole* tensor)."""
    ind = jnp.argmax(x)
    return jax.nn.one_hot(ind, num_classes, dtype=jnp.int32)


def vector_to_one_hot(vec):
    """Per-vector argmax -> one-hot float (reference ``ops.py:50-54``)."""
    ind = jnp.argmax(vec, axis=0)
    return jax.nn.one_hot(ind, vec.shape[0], dtype=vec.dtype)


def half_dropout(key, x, rate: float = 0.3, deterministic: bool = False):
    """Dropout on the first half of the channels only (reference
    ``HalfDropout``, ``utils.py:84-95``; channels-last here)."""
    if deterministic or rate == 0.0:
        return x
    ch = x.shape[-1]
    a, b = x[..., : ch // 2], x[..., ch // 2:]
    keep = jax.random.bernoulli(key, 1.0 - rate, a.shape)
    a = jnp.where(keep, a / (1.0 - rate), 0.0)
    return jnp.concatenate([a, b], axis=-1)


def denormalize(x, mean, std):
    """Invert Normalize(mean, std) and clamp to [0, 1] (reference
    ``Denormalize``, ``utils.py:98-109``).  NHWC."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return jnp.clip(x * std + mean, 0.0, 1.0)


def get_rand_labels(key, num_classes: int, batch_size: int):
    """U(-1, 1) random condition batch (reference ``ops.py:56-60``; its
    ``one_hot`` branch crashes in torch and is omitted)."""
    return jax.random.uniform(key, (batch_size, num_classes),
                              minval=-1.0, maxval=1.0)


def get_sequential_labels(num_classes: int, batch_size: int,
                          one_hot: bool = False):
    """Cycling label batch (reference ``ops.py:62-71``)."""
    rep = batch_size // num_classes + 1
    if one_hot:
        eye = jnp.eye(num_classes, dtype=jnp.float32)
        return jnp.tile(eye, (rep, 1))[:batch_size]
    arr = jnp.arange(num_classes, dtype=jnp.float32)
    return jnp.tile(arr, rep)[:batch_size]


def const_batch(value: float, batch_size: int):
    """Constant (B, 1) tensor — real/fake targets (reference
    ``Variable_Float``, ``ops.py:73-74``)."""
    return jnp.full((batch_size, 1), value, jnp.float32)


def lmda_ramp(global_step, all_step, fixed=None):
    """The reference's linear lambda ramp (``t_est_train.py:376-379``)."""
    if fixed:
        return fixed
    return global_step / max(all_step, 1)
