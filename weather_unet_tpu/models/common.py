"""Shared Flax building blocks with PyTorch-equivalent numerics.

These wrap the functional ops in ``weather_unet_tpu.ops`` as linen modules so
parameters/state live in standard collections:

* ``params``       — kernels/biases (kernels HWIO; dense kernels (in, out))
* ``spectral``     — spectral-norm power-iteration ``u`` vectors
* ``batch_stats``  — BatchNorm running mean/var
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from weather_unet_tpu.ops import convs
from weather_unet_tpu.ops import inits
from weather_unet_tpu.ops.spectral import spectral_normalize

Dtype = Any


class TorchConv(nn.Module):
    """Conv2d with PyTorch default init (U(-1/sqrt(fan_in), +)) and NHWC/HWIO
    layout.  ``kernel_init=None`` selects the torch default.
    ``kernel_size``/``padding`` accept an int or an (h, w) pair (asymmetric
    kernels like Inception's 1x7/7x1)."""

    features: int
    kernel_size: Any = 3
    stride: int = 1
    padding: Any = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, fused_upsample: bool = False,
                 mod=None, fused_relu: bool = False):
        """``skip`` enables split-concat form: the kernel is declared over
        ``Cx + Cskip`` input channels and applied as ``conv(x, W[:Cx]) +
        conv(skip, W[Cx:])`` — identical to ``conv(concat(x, skip))`` without
        materializing the concat (a large HBM round trip per decoder stage;
        +24% cUNet throughput measured on v5e).

        ``fused_upsample`` (requires ``skip``, 3x3/pad-1/stride-1): ``x`` is
        the LOW-RES pre-upsample map and the whole decoder block runs
        through the fused Pallas kernel (``kernels/upconv_pallas.py``) —
        identical math to ``conv(concat(upsample_2x(x*mod), skip))`` without
        materializing the upsampled (or modulated) tensor.  ``mod`` is an
        optional ``(scale, shift)`` per-(sample, channel) affine applied to
        ``x`` inside the kernel (``ops.norm.adain_scale_shift``);
        ``fused_relu`` additionally applies the block activation in-kernel
        (the return value is then POST-activation — the caller must not
        re-apply it)."""
        in_ch = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        kh, kw = ((self.kernel_size,) * 2 if isinstance(self.kernel_size, int)
                  else tuple(self.kernel_size))
        pad = (self.padding if isinstance(self.padding, int)
               else [(p, p) for p in self.padding])
        shape = (kh, kw, in_ch, self.features)
        kinit = self.kernel_init or inits.torch_kernel_init
        kernel = self.param("kernel", kinit, shape, self.param_dtype)
        bias = None
        if self.use_bias:
            fan_in = in_ch * kh * kw
            bias = self.param(
                "bias", inits.torch_bias_init_for(fan_in), (self.features,), self.param_dtype
            )
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        if skip is None:
            return convs.conv2d(x, kernel, bias, stride=self.stride, padding=pad)
        cx = x.shape[-1]
        if fused_upsample:
            if (kh, kw) != (3, 3) or self.stride != 1 or pad != 1:
                raise ValueError("fused_upsample requires a 3x3/stride-1/"
                                 "pad-1 conv")
            from weather_unet_tpu.kernels.upconv_pallas import (
                upconv_block_fused)

            interpret = jax.devices()[0].platform != "tpu"
            cb = convs.conv2d(skip.astype(self.dtype), kernel[:, :, cx:],
                              bias, stride=1, padding=1)
            scale, shift = mod if mod is not None else (
                jnp.ones((x.shape[0], cx), jnp.float32),
                jnp.zeros((x.shape[0], cx), jnp.float32))
            return upconv_block_fused(x, kernel[:, :, :cx], cb, scale,
                                      shift, fused_relu, interpret)
        # bias rides the x-part conv (NOT the skip part): f32 addition is
        # non-associative and this preserves bit-exact outputs vs releases
        # predating the fused path (which necessarily carries bias on the
        # skip conv instead)
        out = convs.conv2d(x, kernel[:, :, :cx], bias,
                           stride=self.stride, padding=pad)
        out = out + convs.conv2d(skip.astype(self.dtype), kernel[:, :, cx:],
                                 None, stride=self.stride, padding=pad)
        return out


class TorchDense(nn.Module):
    """Linear with PyTorch default init.  Kernel stored (in, out)."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kinit = self.kernel_init or inits.torch_kernel_init
        kernel = self.param("kernel", kinit, (in_f, self.features), self.param_dtype)
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", inits.torch_bias_init_for(in_f), (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class SNConv(nn.Module):
    """Spectral-normalized Conv2d (reference ``nets.py:26-33``).

    ``update_stats=True`` advances the power-iteration ``u`` (training-mode
    forward in torch); the updated vector is written to the ``'spectral'``
    collection.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kinit = self.kernel_init or inits.torch_kernel_init
        kernel = self.param(
            "kernel", kinit, (k, k, in_ch, self.features), self.param_dtype
        )
        fan_in = in_ch * k * k
        bias = self.param(
            "bias", inits.torch_bias_init_for(fan_in), (self.features,), self.param_dtype
        )
        u = self.variable(
            "spectral", "u",
            lambda: inits.normal_unit(self.make_rng("params"), (self.features,), jnp.float32),
        )
        kernel_bar, new_u = spectral_normalize(
            kernel.astype(jnp.float32), u.value, update=update_stats
        )
        if update_stats and not self.is_initializing():
            u.value = new_u
        return convs.conv2d(
            x.astype(self.dtype), kernel_bar.astype(self.dtype), bias.astype(self.dtype),
            stride=self.stride, padding=self.padding,
        )


class SNDense(nn.Module):
    """Spectral-normalized Linear (reference ``disc.py:21-25``)."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        in_f = x.shape[-1]
        kinit = self.kernel_init or inits.torch_kernel_init
        kernel = self.param("kernel", kinit, (in_f, self.features), self.param_dtype)
        u = self.variable(
            "spectral", "u",
            lambda: inits.normal_unit(self.make_rng("params"), (self.features,), jnp.float32),
        )
        kernel_bar, new_u = spectral_normalize(
            kernel.astype(jnp.float32), u.value, update=update_stats
        )
        if update_stats and not self.is_initializing():
            u.value = new_u
        y = x.astype(self.dtype) @ kernel_bar.astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", inits.torch_bias_init_for(in_f), (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class BatchNorm2d(nn.Module):
    """BatchNorm2d with exact torch semantics.

    Train mode normalizes with the *biased* batch variance but updates the
    running variance with the *unbiased* one; running stats blend with
    ``momentum=0.1`` (torch convention: new = (1-m)*old + m*batch).
    """

    momentum: float = 0.1
    eps: float = 1e-5
    affine: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            n = x.shape[0] * x.shape[1] * x.shape[2]
            mean = jnp.mean(xf, axis=(0, 1, 2))
            # two-pass variance: E[(x-mean)^2], NOT E[x^2]-mean^2 — the
            # one-pass form cancels catastrophically for near-constant
            # channels with large mean (var can go below -eps -> rsqrt
            # NaN); same rationale as ops/norm.py:16-24 (review finding,
            # round 5)
            var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        inv = jax.lax.rsqrt(var + self.eps)
        y = (x.astype(jnp.float32) - mean) * inv
        if self.affine:
            gamma = self.param("scale", lambda _k: jnp.ones(c, self.param_dtype))
            beta = self.param("bias", lambda _k: jnp.zeros(c, self.param_dtype))
            y = y * gamma + beta
        return y.astype(self.dtype)


class ConditionalNorm(nn.Module):
    """Class-conditional BatchNorm (reference ``utils.py:7-23``): affine-less
    BN2d followed by per-class gamma/beta from an embedding table
    (gamma rows init 1, beta rows init 0).  Defined-but-unused in the
    reference forward paths; provided for API completeness."""

    num_classes: int = 5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, class_id, *, train: bool = False):
        c = x.shape[-1]
        out = BatchNorm2d(affine=False, dtype=self.dtype, name="bn")(
            x, use_running_average=not train)
        embed = self.param(
            "embed",
            lambda _k: jnp.concatenate(
                [jnp.ones((self.num_classes, c)), jnp.zeros((self.num_classes, c))],
                axis=1,
            ).astype(self.param_dtype),
        )
        gb = jnp.take(embed, class_id, axis=0)      # (B, 2C)
        gamma, beta = gb[:, :c], gb[:, c:]
        return (gamma[:, None, None, :] * out + beta[:, None, None, :]).astype(self.dtype)
