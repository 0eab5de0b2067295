"""ResNet (torchvision-compatible) — the reference's weather estimator and
classifier backbone (``classifier.py:104-114``, ``estimator.py:142-157`` use
``torchvision.models.resnet101``).

Layout matches torchvision's ResNet v1.5 exactly (stride on the 3×3 conv of
each bottleneck) so PyTorch checkpoints convert 1:1 via ``compat.torch_io``:
conv7×7/2 → BN → ReLU → maxpool3×3/2 → layers [3, 4, 23, 3] of bottlenecks →
global average pool → fc.

Conv weights use torchvision's kaiming_normal(fan_out) init; BN is the exact
torch BatchNorm2d in ``models/common.py``.  For the *frozen* estimator in the
GAN loop the model runs with ``train=False`` (running stats), which XLA folds
into the convolutions.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from weather_unet_tpu.models.common import BatchNorm2d, TorchConv, TorchDense
from weather_unet_tpu.ops.convs import max_pool


def kaiming_normal_fan_out(key, shape, dtype):
    """torch ``kaiming_normal_(mode='fan_out', nonlinearity='relu')`` for HWIO."""
    fan_out = shape[3] * shape[0] * shape[1]
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, dtype)


class Bottleneck(nn.Module):
    """torchvision Bottleneck (expansion 4, stride on the 3×3 conv)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool):
        dt = self.dtype
        identity = x
        out = TorchConv(self.planes, kernel_size=1, padding=0, use_bias=False,
                        kernel_init=kaiming_normal_fan_out, dtype=dt, name="conv1")(x)
        out = BatchNorm2d(dtype=dt, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.planes, kernel_size=3, stride=self.stride, padding=1,
                        use_bias=False, kernel_init=kaiming_normal_fan_out, dtype=dt,
                        name="conv2")(out)
        out = BatchNorm2d(dtype=dt, name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = TorchConv(self.planes * 4, kernel_size=1, padding=0, use_bias=False,
                        kernel_init=kaiming_normal_fan_out, dtype=dt, name="conv3")(out)
        out = BatchNorm2d(dtype=dt, name="bn3")(out, use_running_average=not train)
        if self.downsample:
            identity = TorchConv(self.planes * 4, kernel_size=1, stride=self.stride,
                                 padding=0, use_bias=False,
                                 kernel_init=kaiming_normal_fan_out, dtype=dt,
                                 name="downsample_conv")(x)
            identity = BatchNorm2d(dtype=dt, name="downsample_bn")(
                identity, use_running_average=not train
            )
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Generic torchvision-style bottleneck ResNet."""

    block_counts: Sequence[int] = (3, 4, 23, 3)  # ResNet-101
    num_classes: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False, features_only: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        x = TorchConv(64, kernel_size=7, stride=2, padding=3, use_bias=False,
                      kernel_init=kaiming_normal_fan_out, dtype=dt, name="conv1")(x)
        x = BatchNorm2d(dtype=dt, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = max_pool(x, window=3, stride=2, padding=1)

        planes = 64
        for li, n_blocks in enumerate(self.block_counts):
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    dtype=dt,
                    name=f"layer{li + 1}_{bi}",
                )(x, train=train)
            planes *= 2

        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool (1,1)
        if features_only:
            return x
        return TorchDense(self.num_classes, dtype=dt, name="fc")(x)


def ResNet101(num_classes: int = 5, dtype: Any = jnp.float32) -> ResNet:
    """ResNet-101, the reference's estimator/classifier backbone."""
    return ResNet(block_counts=(3, 4, 23, 3), num_classes=num_classes, dtype=dtype)


def ResNet50(num_classes: int = 5, dtype: Any = jnp.float32) -> ResNet:
    return ResNet(block_counts=(3, 4, 6, 3), num_classes=num_classes, dtype=dtype)
