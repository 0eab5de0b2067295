"""Parameter initializers reproducing PyTorch defaults.

Training-dynamics parity requires starting from the same init *distributions*
as the reference:

* ``nn.Conv2d`` / ``nn.Linear`` default: kaiming_uniform(a=sqrt(5)) on the
  weight and U(-1/sqrt(fan_in), 1/sqrt(fan_in)) on the bias — both reduce to
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
* The discriminator applies ``xavier_uniform_`` with gain sqrt(2) to conv
  weights and gain 1 to the linear heads (``disc.py:16-25``).

Kernels here are HWIO (conv) / (in, out) (dense, flax convention).
"""

from __future__ import annotations

import math

import jax


def _fan_in_out(shape):
    if len(shape) == 4:  # HWIO
        rf = shape[0] * shape[1]
        return shape[2] * rf, shape[3] * rf
    if len(shape) == 2:  # (in, out)
        return shape[0], shape[1]
    raise ValueError(f"unsupported shape {shape}")


def torch_kernel_init(key, shape, dtype):
    """PyTorch default Conv2d/Linear weight init: U(-1/sqrt(fan_in), +)."""
    fan_in, _ = _fan_in_out(shape)
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init_for(fan_in: int):
    """PyTorch default bias init given the layer's fan_in."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform(gain: float = 1.0):
    """torch ``nn.init.xavier_uniform_`` with gain."""

    def init(key, shape, dtype):
        fan_in, fan_out = _fan_in_out(shape)
        bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_unit(key, shape, dtype):
    """N(0, 1) — spectral-norm ``u`` vectors are initialized this way then
    l2-normalized."""
    v = jax.random.normal(key, shape, dtype)
    import jax.numpy as jnp

    return v / (jnp.linalg.norm(v) + 1e-12)
