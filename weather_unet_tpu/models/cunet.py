"""Conditional U-Net generator — TPU-native rebuild of reference ``cunet.py:7-82``.

Architecture (pixel-parity with the PyTorch reference):

* encoder: 4 × ``r_double_conv`` (conv3x3+ReLU ×2) at 3→64→128→256→512 with
  2×2 max-pool between stages (``cunet.py:21-27,45-54``),
* bottleneck and each decoder stage: AdaIN conditioned on the weather vector,
  bilinear ×2 upsample (align_corners=True), dropout(0.3), skip-concat in
  ``[x, skip]`` order, then ``r_double_conv`` (``cunet.py:59-78``),
* 1×1 conv to 3 channels + tanh (``cunet.py:39-40,80-82``).

TPU-first choices: NHWC layout, the align_corners upsample is two MXU matmuls
(`ops/resize.py`), AdaIN stats are fused by XLA into neighbouring elementwise
work, and the whole forward is shape-static so it jits once per resolution.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from weather_unet_tpu.models.common import TorchConv, TorchDense
from weather_unet_tpu.ops.convs import max_pool_2x2
from weather_unet_tpu.ops.norm import adain
from weather_unet_tpu.ops.resize import upsample_bilinear_align_corners


class RDoubleConv(nn.Module):
    """(conv3x3 → ReLU) ×2, padding 1, no norm — reference ``nets.py:18-24``.

    Called with a ``skip`` tensor, the first conv runs in split-concat form
    (see ``TorchConv.__call__``): identical math to conv(concat(x, skip))
    without materializing the concat — +24% cUNet throughput on v5e.  The
    parameter tree is identical either way (one full-width ``conv1`` kernel,
    input channels ordered [x, skip] like the reference's ``cat([x, conv], 1)``).
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, fused_upsample: bool = False, mod=None):
        if fused_upsample:
            # one Pallas call: modulate + upsample + conv1 + skip-add + relu
            x = TorchConv(self.features, kernel_size=3, padding=1,
                          dtype=self.dtype, name="conv1")(
                              x, skip, fused_upsample=True, mod=mod,
                              fused_relu=True)
        else:
            x = TorchConv(self.features, kernel_size=3, padding=1,
                          dtype=self.dtype, name="conv1")(x, skip)
            x = nn.relu(x)
        x = TorchConv(self.features, kernel_size=3, padding=1, dtype=self.dtype, name="conv2")(x)
        x = nn.relu(x)
        return x


class DoubleConvDown(nn.Module):
    """Reference ``double_conv`` (``nets.py:10-16``): conv3x3 → conv3x3
    stride-2 → affine-less BN → LeakyReLU(0.2).  Unused by the reference's
    own forward paths; provided for API completeness."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from weather_unet_tpu.models.common import BatchNorm2d

        in_ch = x.shape[-1]
        x = TorchConv(in_ch, kernel_size=3, padding=1, dtype=self.dtype,
                      name="conv1")(x)
        x = TorchConv(self.features, kernel_size=3, stride=2, padding=1,
                      dtype=self.dtype, name="conv2")(x)
        x = BatchNorm2d(affine=False, dtype=self.dtype, name="bn")(
            x, use_running_average=not train)
        return nn.leaky_relu(x, negative_slope=0.2)


class UpsampleBox(nn.Module):
    """Reference ``upsample_box`` (``nets.py:4-8``): bilinear ×2
    (align_corners) → affine-less BN.  Unused variant, kept for completeness."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from weather_unet_tpu.models.common import BatchNorm2d

        x = upsample_bilinear_align_corners(x)
        return BatchNorm2d(affine=False, dtype=self.dtype, name="bn")(
            x, use_running_average=not train)


class AdaINBlock(nn.Module):
    """AdaIN conditioned on the weather vector — reference ``utils.py:26-51``.

    Projects the condition through ``Dense(num_classes → C*4)`` and modulates
    per-channel instance statistics; style stats are computed over the 4
    projected values per channel with unbiased variance (the reference quirk).
    The reference also allocates an ``nn.Embedding(num_classes, num_classes)``
    that is never used in forward (``utils.py:32``) — omitted here; the compat
    importer drops it.
    """

    channels: int
    eps: float = 1e-5
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, c, return_scale_shift: bool = False):
        y = TorchDense(self.channels * 4, dtype=self.dtype, name="proj")(c)
        if return_scale_shift:
            # factored form for fused consumers (kernels/upconv_pallas.py):
            # stats here (one read of x), modulate inside the consumer
            from weather_unet_tpu.ops.norm import adain_scale_shift

            return adain_scale_shift(x, y, eps=self.eps)
        if self.use_pallas:
            from weather_unet_tpu.kernels.adain_pallas import adain_fused

            return adain_fused(x, y, self.eps)
        return adain(x, y, eps=self.eps)


class ConditionalUNet(nn.Module):
    """4-down/3-up conditional U-Net (reference ``cunet.py``)."""

    num_classes: int = 5
    dropout_rate: float = 0.3
    dtype: Any = jnp.float32
    use_pallas: bool = False   # fused AdaIN kernel (TPU serving fast path)
    # Fused Pallas upsample+conv decoder (kernels/upconv_pallas.py): the
    # upsampled tensor is never materialized.  Identical math & param tree;
    # eval-mode calls only (dropout between upsample and conv is identity
    # there) — training forwards keep the XLA formulation.  ``True`` fuses
    # every decoder level; a tuple of level indices (3=coarsest .. 1=finest)
    # fuses a subset.
    fuse_upconv: Any = False

    @nn.compact
    def __call__(self, x, c, *, train: bool = False):
        """Args:
          x: images NHWC in [-1, 1].
          c: condition vectors (B, num_classes) — one-hot class or soft signals.
          train: enables dropout (the reference's training-time evaluation also
            keeps dropout active — ``t_est_train.py:299-308`` — callers choose).
        """
        dt = self.dtype
        x = x.astype(dt)
        c = c.astype(dt)
        # framework-default dropout (ops/dropout.py::make_dropout): natively
        # narrow u16 mask words, half the HBM traffic of nn.Dropout's u32
        # bernoulli; WUT_DROPOUT=torch restores the old RNG stream
        from weather_unet_tpu.ops.dropout import make_dropout
        drop = lambda h: make_dropout(self.dropout_rate, not train)(h)

        conv1 = RDoubleConv(64, dtype=dt, name="down1")(x)
        h = max_pool_2x2(conv1)
        conv2 = RDoubleConv(128, dtype=dt, name="down2")(h)
        h = max_pool_2x2(conv2)
        conv3 = RDoubleConv(256, dtype=dt, name="down3")(h)
        h = max_pool_2x2(conv3)
        h = RDoubleConv(512, dtype=dt, name="down4")(h)

        # dropout is identity in eval; training keeps the XLA formulation
        levels = (self.fuse_upconv if isinstance(self.fuse_upconv, tuple)
                  else ((1, 2, 3) if self.fuse_upconv else ()))
        fuse_levels = () if train else levels

        def up_block(h, feats, skip, adain_ch, idx):
            blk = AdaINBlock(adain_ch, dtype=dt, use_pallas=self.use_pallas,
                             name=f"adain{idx}")
            if idx in fuse_levels:
                mod = blk(h, c, return_scale_shift=True)
                return RDoubleConv(feats, dtype=dt, name=f"up{idx}")(
                    h, skip=skip, fused_upsample=True, mod=mod)
            h = blk(h, c)
            h = upsample_bilinear_align_corners(h)
            h = drop(h)
            return RDoubleConv(feats, dtype=dt, name=f"up{idx}")(h, skip=skip)

        h = up_block(h, 256, conv3, 512, 3)
        h = up_block(h, 128, conv2, 256, 2)
        h = up_block(h, 64, conv1, 128, 1)

        out = TorchConv(3, kernel_size=1, padding=0, dtype=dt, name="conv_last")(h)
        return jnp.tanh(out)
