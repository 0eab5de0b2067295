"""Spectral-norm projection discriminator — rebuild of reference ``disc.py:8-38``.

Four ``sn_double_conv`` stages (spectral-norm conv3x3 stride1 → spectral-norm
conv3x3 stride2 → LeakyReLU(0.2); note: no activation between the two convs,
``nets.py:26-33``) at 3→64→128→256→512, global *sum* pool, spectral-norm
linear 512→1, and projection-cGAN conditioning
``out += sum(embed(c) * phi(x))`` (``disc.py:32-36``).

Conv weights use xavier_uniform(gain=sqrt(2)); the two linear heads use
xavier_uniform(gain=1) (``disc.py:16-25``).  Power-iteration ``u`` vectors
live in the ``'spectral'`` collection and advance once per training-mode
forward, matching torch's update cadence (3 D-forwards per combined GAN step).

Returns ``(out, [c1, c2, c3, c4])`` — the per-stage feature maps the reference
exposes for feature-matching losses.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from weather_unet_tpu.models.common import SNConv, SNDense
from weather_unet_tpu.ops.convs import global_sum_pool
from weather_unet_tpu.ops.inits import xavier_uniform


class SNDoubleConv(nn.Module):
    """sn_double_conv: SN-conv3x3 s1 (C→C) → SN-conv3x3 s2 (C→F) → LeakyReLU(0.2)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_ch = x.shape[-1]
        gain = math.sqrt(2.0)
        x = SNConv(in_ch, kernel_size=3, stride=1, padding=1,
                   kernel_init=xavier_uniform(gain), dtype=self.dtype, name="conv1")(x, update_stats)
        x = SNConv(self.features, kernel_size=3, stride=2, padding=1,
                   kernel_init=xavier_uniform(gain), dtype=self.dtype, name="conv2")(x, update_stats)
        return nn.leaky_relu(x, negative_slope=0.2)


class SNDisc(nn.Module):
    """Projection discriminator with hidden-state-free spectral norm."""

    num_classes: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, c, *, update_stats: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        c1 = SNDoubleConv(64, dtype=dt, name="block1")(x, update_stats)
        c2 = SNDoubleConv(128, dtype=dt, name="block2")(c1, update_stats)
        c3 = SNDoubleConv(256, dtype=dt, name="block3")(c2, update_stats)
        c4 = SNDoubleConv(512, dtype=dt, name="block4")(c3, update_stats)
        feat = global_sum_pool(c4)  # (B, 512)
        out = SNDense(1, kernel_init=xavier_uniform(1.0), dtype=dt, name="linear")(
            feat, update_stats
        )
        e_c = SNDense(512, kernel_init=xavier_uniform(1.0), dtype=dt, name="embed")(
            c.astype(dt), update_stats
        )
        out = out + jnp.sum(e_c * feat, axis=1, keepdims=True)
        return out, [c1, c2, c3, c4]
