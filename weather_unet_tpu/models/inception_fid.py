"""FID InceptionV3 — TPU rebuild of the TTUR/pytorch-fid Inception network.

The reference FID pipeline (``eval/inception.py``) uses a *patched*
torchvision InceptionV3 matching the original TF FID implementation:

* InceptionA/C pool branches use average pooling with
  ``count_include_pad=False`` (``eval/inception.py:193-310``),
* the final block Mixed_7c (``FIDInceptionE_2``) uses a *max* pool branch
  where torchvision uses average (``eval/inception.py:292-310``),
* inputs are optionally bilinear-resized to 299x299 and rescaled from [0,1]
  to [-1,1] inside forward (``eval/inception.py:146-153``),
* features are the 2048-d pool3 activations.

Weights are the TF-ported ``pt_inception-2015-12-05`` checkpoint (the
reference downloads it at run time — ``eval/inception.py:13``); this
environment has no egress, so ``compat.torch_io.inception_from_torch``
converts a locally provided ``.pth``.  Shapes/structure are verified against
a torch functional mirror in tests.

All convs are bias-free + BatchNorm(eps=0.001) + ReLU (``BasicConv2d``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from weather_unet_tpu.models.common import BatchNorm2d, TorchConv
from weather_unet_tpu.ops.convs import max_pool
from weather_unet_tpu.ops.resize import resize_bilinear_torch


def avg_pool_3x3_s1(x, count_include_pad: bool):
    """3x3 stride-1 pad-1 average pool; ``count_include_pad=False`` divides by
    the number of *valid* (non-padding) window elements (TF semantics)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    if count_include_pad:
        return summed / 9.0
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


class BasicConv2d(nn.Module):
    features: int
    kernel_size: Any = 3
    stride: int = 1
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = TorchConv(self.features, kernel_size=self.kernel_size,
                      stride=self.stride, padding=self.padding, use_bias=False,
                      dtype=self.dtype, name="conv")(x)
        x = BatchNorm2d(eps=0.001, dtype=self.dtype, name="bn")(
            x, use_running_average=not train)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int
    tf_variant: bool = True   # False: stock torchvision (count_include_pad)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        b1 = BasicConv2d(64, 1, dtype=dt, name="branch1x1")(x, train=train)
        b5 = BasicConv2d(48, 1, dtype=dt, name="branch5x5_1")(x, train=train)
        b5 = BasicConv2d(64, 5, padding=2, dtype=dt, name="branch5x5_2")(b5, train=train)
        b3 = BasicConv2d(64, 1, dtype=dt, name="branch3x3dbl_1")(x, train=train)
        b3 = BasicConv2d(96, 3, padding=1, dtype=dt, name="branch3x3dbl_2")(b3, train=train)
        b3 = BasicConv2d(96, 3, padding=1, dtype=dt, name="branch3x3dbl_3")(b3, train=train)
        bp = avg_pool_3x3_s1(x, count_include_pad=not self.tf_variant)  # FID patch
        bp = BasicConv2d(self.pool_features, 1, dtype=dt, name="branch_pool")(bp, train=train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        b3 = BasicConv2d(384, 3, stride=2, dtype=dt, name="branch3x3")(x, train=train)
        bd = BasicConv2d(64, 1, dtype=dt, name="branch3x3dbl_1")(x, train=train)
        bd = BasicConv2d(96, 3, padding=1, dtype=dt, name="branch3x3dbl_2")(bd, train=train)
        bd = BasicConv2d(96, 3, stride=2, dtype=dt, name="branch3x3dbl_3")(bd, train=train)
        bp = max_pool(x, 3, 2, 0)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    tf_variant: bool = True   # False: stock torchvision (count_include_pad)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, 1, dtype=dt, name="branch1x1")(x, train=train)
        b7 = BasicConv2d(c7, 1, dtype=dt, name="branch7x7_1")(x, train=train)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=dt, name="branch7x7_2")(b7, train=train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=dt, name="branch7x7_3")(b7, train=train)
        bd = BasicConv2d(c7, 1, dtype=dt, name="branch7x7dbl_1")(x, train=train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=dt, name="branch7x7dbl_2")(bd, train=train)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=dt, name="branch7x7dbl_3")(bd, train=train)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=dt, name="branch7x7dbl_4")(bd, train=train)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=dt, name="branch7x7dbl_5")(bd, train=train)
        bp = avg_pool_3x3_s1(x, count_include_pad=not self.tf_variant)  # FID patch
        bp = BasicConv2d(192, 1, dtype=dt, name="branch_pool")(bp, train=train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        b3 = BasicConv2d(192, 1, dtype=dt, name="branch3x3_1")(x, train=train)
        b3 = BasicConv2d(320, 3, stride=2, dtype=dt, name="branch3x3_2")(b3, train=train)
        b7 = BasicConv2d(192, 1, dtype=dt, name="branch7x7x3_1")(x, train=train)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=dt, name="branch7x7x3_2")(b7, train=train)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=dt, name="branch7x7x3_3")(b7, train=train)
        b7 = BasicConv2d(192, 3, stride=2, dtype=dt, name="branch7x7x3_4")(b7, train=train)
        bp = max_pool(x, 3, 2, 0)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"   # 'avg' (Mixed_7b, FIDInceptionE_1) | 'max' (Mixed_7c, E_2)
    tf_variant: bool = True   # False: stock torchvision (count_include_pad)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        b1 = BasicConv2d(320, 1, dtype=dt, name="branch1x1")(x, train=train)
        b3 = BasicConv2d(384, 1, dtype=dt, name="branch3x3_1")(x, train=train)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=dt, name="branch3x3_2a")(b3, train=train),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=dt, name="branch3x3_2b")(b3, train=train),
        ], axis=-1)
        bd = BasicConv2d(448, 1, dtype=dt, name="branch3x3dbl_1")(x, train=train)
        bd = BasicConv2d(384, 3, padding=1, dtype=dt, name="branch3x3dbl_2")(bd, train=train)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=dt, name="branch3x3dbl_3a")(bd, train=train),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=dt, name="branch3x3dbl_3b")(bd, train=train),
        ], axis=-1)
        if self.pool_kind == "avg":
            bp = avg_pool_3x3_s1(x, count_include_pad=not self.tf_variant)
        else:   # FIDInceptionE_2: max pool (eval/inception.py:292-310)
            bp = max_pool(x, 3, 1, 1)
        bp = BasicConv2d(192, 1, dtype=dt, name="branch_pool")(bp, train=train)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """Pool3 (2048-d) feature extractor; ``with_logits=True`` adds the
    1008-way fc head carried by the TF-ported FID checkpoint (used for
    Inception Score when real weights are supplied).

    ``tf_variant=False`` is *stock torchvision* ``inception_v3``
    (``transform_input=False``): all pool branches use
    ``count_include_pad=True`` average pooling, Mixed_7c pools with *avg*
    instead of the FID patch's max, and the natural head is the 1000-way
    ImageNet fc — the network the reference Inception Score uses
    (``eval/inception_score.py:29,64``)."""

    resize_input: bool = True
    normalize_input: bool = True
    with_logits: bool = False
    num_logits: int = 1008
    tf_variant: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dt = self.dtype
        tf = self.tf_variant
        if self.resize_input and (x.shape[1], x.shape[2]) != (299, 299):
            # reference uses align_corners=False here (eval/inception.py:146-150)
            x = resize_bilinear_torch(x, 299, 299, align_corners=False)
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = x.astype(dt)

        x = BasicConv2d(32, 3, stride=2, dtype=dt, name="Conv2d_1a_3x3")(x, train=train)
        x = BasicConv2d(32, 3, dtype=dt, name="Conv2d_2a_3x3")(x, train=train)
        x = BasicConv2d(64, 3, padding=1, dtype=dt, name="Conv2d_2b_3x3")(x, train=train)
        x = max_pool(x, 3, 2, 0)
        x = BasicConv2d(80, 1, dtype=dt, name="Conv2d_3b_1x1")(x, train=train)
        x = BasicConv2d(192, 3, dtype=dt, name="Conv2d_4a_3x3")(x, train=train)
        x = max_pool(x, 3, 2, 0)
        x = InceptionA(32, tf_variant=tf, dtype=dt, name="Mixed_5b")(x, train=train)
        x = InceptionA(64, tf_variant=tf, dtype=dt, name="Mixed_5c")(x, train=train)
        x = InceptionA(64, tf_variant=tf, dtype=dt, name="Mixed_5d")(x, train=train)
        x = InceptionB(dtype=dt, name="Mixed_6a")(x, train=train)
        x = InceptionC(128, tf_variant=tf, dtype=dt, name="Mixed_6b")(x, train=train)
        x = InceptionC(160, tf_variant=tf, dtype=dt, name="Mixed_6c")(x, train=train)
        x = InceptionC(160, tf_variant=tf, dtype=dt, name="Mixed_6d")(x, train=train)
        x = InceptionC(192, tf_variant=tf, dtype=dt, name="Mixed_6e")(x, train=train)
        x = InceptionD(dtype=dt, name="Mixed_7a")(x, train=train)
        x = InceptionE("avg", tf_variant=tf, dtype=dt, name="Mixed_7b")(x, train=train)
        x = InceptionE("max" if tf else "avg", tf_variant=tf, dtype=dt,
                       name="Mixed_7c")(x, train=train)
        feats = jnp.mean(x, axis=(1, 2))   # adaptive avg pool -> (B, 2048)
        if self.with_logits:
            from weather_unet_tpu.models.common import TorchDense

            return TorchDense(self.num_logits, dtype=dt, name="fc")(feats)
        return feats
