"""Convolution / pooling primitives in NHWC layout with PyTorch-equivalent numerics.

TPU-first notes: NHWC is the native TPU layout; kernels are HWIO so XLA maps
convs straight onto the MXU.  The PyTorch reference keeps NCHW/OIHW
(``nets.py:18-33`` in the reference) — the compat layer transposes on import.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def conv2d(x, kernel, bias=None, *, stride=1, padding=1, preferred_dtype=None):
    """2-D convolution, NHWC input, HWIO kernel.

    Matches ``torch.nn.Conv2d(k, stride=stride, padding=padding)``
    (cross-correlation, symmetric zero padding).
    """
    strides = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = [tuple(p) for p in padding]
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=strides,
        padding=pad,
        dimension_numbers=_DIMSPEC,
        preferred_element_type=preferred_dtype,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def max_pool_2x2(x):
    """MaxPool2d(kernel=2, stride=2), floor mode — reference ``cunet.py:27``."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def max_pool(x, window, stride, padding=0):
    """General max pool (used by ResNet's 3x3/2 pool with padding 1)."""
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pad,
    )


def global_sum_pool(x):
    """Sum over spatial dims: NHWC -> NC.  Reference ``disc.py:32``."""
    return jnp.sum(x, axis=(1, 2))


def global_avg_pool(x):
    """Mean over spatial dims: NHWC -> NC (torch AdaptiveAvgPool2d(1))."""
    return jnp.mean(x, axis=(1, 2))
