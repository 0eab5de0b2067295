"""Fused AdaIN Pallas kernel.

AdaIN (reference ``utils.py:26-51``) is instance statistics + affine
modulation.  Under plain XLA this costs several HBM round trips (reduce for
mean, reduce for var, then the elementwise modulate re-reads x); this kernel
does ONE read of the feature map in VMEM, computes the per-channel moments in
f32, and writes the modulated output — per batch element (grid=B), feature
map resident in VMEM (largest cUNet AdaIN block at 256^2 inputs is
128x128x128 bf16 = 4 MB, within the ~16 MB/core budget).

The tiny style statistics (4 projected values per channel, unbiased variance
— the reference quirk) are precomputed in XLA and passed in as per-channel
scale/shift, avoiding sub-lane reshapes in the kernel.

Training uses a custom VJP that recomputes the backward through the XLA
reference implementation (numerically identical).

Measured on v5e (full 256^2 U-Net, batch 32, bf16): 746 img/s with this
kernel vs 795 img/s with the plain XLA AdaIN — XLA already fuses the
modulate into the neighbouring upsample matmul, so the kernel is kept as
opt-in (``ConditionalUNet(use_pallas=True)``) rather than default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weather_unet_tpu.ops.norm import _mean_var_unbiased, adain as adain_xla


def _adain_kernel(x_ref, ys_ref, ym_ref, o_ref, *, eps: float):
    # Row-chunked f32 accumulation: never materializes an f32 copy of the
    # whole block (which blows the ~16 MB VMEM budget at 128x128x128).
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    hw = h * w

    # Two-pass stats (mean first, then E[(x-mean)^2]): the one-pass
    # E[x^2]-mean^2 form cancels catastrophically for near-constant
    # channels with large mean (var+eps can go negative -> rsqrt NaN), the
    # exact bug class ops/norm.py:16-24 was rewritten to avoid (review
    # finding, round 5).  Costs one extra read pass over the block; this
    # kernel is opt-in (~6% slower than XLA's fusion anyway).
    zero = jnp.zeros((c,), jnp.float32)

    def sum_row(i, s):
        return s + jnp.sum(x_ref[0, i].astype(jnp.float32), axis=0)

    mean = jax.lax.fori_loop(0, h, sum_row, zero) / hw

    def var_row(i, vs):
        d = x_ref[0, i].astype(jnp.float32) - mean
        return vs + jnp.sum(d * d, axis=0)

    var = jax.lax.fori_loop(0, h, var_row, zero) / max(hw - 1, 1)  # unbiased (torch .var())
    inv = jax.lax.rsqrt(var + eps)
    ys = ys_ref[...].astype(jnp.float32)            # (1, 1, C)
    ym = ym_ref[...].astype(jnp.float32)
    scale = inv * ys[0, 0]
    shift = ym[0, 0] - mean * scale

    def mod_row(i, _):
        row = x_ref[0, i].astype(jnp.float32)
        o_ref[0, i] = (row * scale + shift).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h, mod_row, 0)


def _adain_pallas_impl(x, y_scale, y_mean, eps: float, interpret: bool):
    b, h, w, c = x.shape
    kernel = functools.partial(_adain_kernel, eps=eps)
    ms = pl.ANY if interpret else pltpu.VMEM
    # style tensors carried as (B, 1, C) so the (1, 1, C) block satisfies the
    # Mosaic last-two-dims tiling rule (C % 128 == 0 at every AdaIN site)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0), memory_space=ms),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=ms),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=ms),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, y_scale[:, None, :], y_mean[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def adain_fused(x, y_proj, eps: float = 1e-5, interpret: bool = False):
    """Drop-in fused replacement for ``ops.norm.adain`` (same semantics)."""
    b, _, _, c = x.shape
    y = y_proj.astype(jnp.float32).reshape(b, c, 4)
    y_mean, y_var = _mean_var_unbiased(y, axis=2)
    y_scale = jnp.sqrt(y_var + eps)
    return _adain_pallas_impl(x, y_scale.astype(x.dtype),
                              y_mean.astype(x.dtype), eps, interpret)


def _fwd(x, y_proj, eps, interpret):
    return adain_fused(x, y_proj, eps, interpret), (x, y_proj)


def _bwd(eps, interpret, res, g):
    x, y_proj = res
    _, vjp = jax.vjp(lambda xx, yy: adain_xla(xx, yy, eps=eps), x, y_proj)
    return vjp(g)


adain_fused.defvjp(_fwd, _bwd)
