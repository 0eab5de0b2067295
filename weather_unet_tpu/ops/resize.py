"""Bilinear resize with PyTorch ``align_corners=True`` semantics, as matmuls.

The reference U-Net upsamples with ``nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True)`` (``cunet.py:26``).  ``jax.image.resize``
uses the half-pixel convention, which does NOT match.  Instead we express the
separable interpolation as two small dense matmuls — for align_corners the
source coordinate of output row ``i`` is ``i * (H_in - 1) / (H_out - 1)``, so a
fixed ``(H_out, H_in)`` matrix applied along H and an analogous one along W
reproduce PyTorch exactly, and both land on the MXU (much faster than gathers
on TPU).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _interp_matrix_np(n_out: int, n_in: int,
                      align_corners: bool = True) -> np.ndarray:
    """(n_out, n_in) row-stochastic bilinear weights.

    ``align_corners=True``: src = i*(n_in-1)/(n_out-1) (torch Upsample in the
    generator).  ``align_corners=False``: half-pixel src = (i+0.5)*s - 0.5
    clamped (torch F.interpolate default; the FID input resize —
    ``eval/inception.py:146-150``)."""
    m = np.zeros((n_out, n_in), dtype=np.float64)
    if align_corners:
        if n_out == 1 or n_in == 1:
            src = np.zeros(n_out)
        else:
            src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        scale = n_in / n_out
        src = np.clip((np.arange(n_out) + 0.5) * scale - 0.5, 0.0, n_in - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, n_in - 1)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    frac = src - i0
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0), 1.0 - frac)
    np.add.at(m, (rows, i1), frac)
    return m.astype(np.float32)


def resize_bilinear_torch(x, out_h: int, out_w: int, *,
                          align_corners: bool = True):
    """NHWC bilinear resize matching ``F.interpolate`` (both conventions)."""
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    dt = x.dtype
    mh = jnp.asarray(_interp_matrix_np(out_h, h, align_corners), dtype=dt)
    mw = jnp.asarray(_interp_matrix_np(out_w, w, align_corners), dtype=dt)
    # (O_h, H) x (N, H, W, C) -> (N, O_h, W, C); then along W.
    y = jnp.einsum("oh,nhwc->nowc", mh, x, preferred_element_type=dt)
    y = jnp.einsum("pw,nowc->nopc", mw, y, preferred_element_type=dt)
    return y


@functools.lru_cache(maxsize=64)
def _x2_taps(n_in: int):
    """Static gather indices + blend weights for exact 2x align_corners."""
    n_out = 2 * n_in
    if n_in == 1:
        src = np.zeros(n_out)
    else:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    i0 = np.clip(np.floor(src).astype(np.int32), 0, n_in - 1)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    f = (src - i0).astype(np.float32)
    return i0, i1, f


def upsample_x2_gather(x):
    """Exact 2x align_corners upsample as two static gathers + blend per axis.

    Bandwidth-minimal (~2 reads/output) but on TPU the gathers lose to the
    MXU matmul form by 2-3x (measured on v5e); kept for CPU and as the
    reference formulation."""
    n, h, w, c = x.shape
    dt = x.dtype
    i0, i1, f = _x2_taps(h)
    fh = jnp.asarray(f, dt)[None, :, None, None]
    y = jnp.take(x, jnp.asarray(i0), axis=1) * (1 - fh) \
        + jnp.take(x, jnp.asarray(i1), axis=1) * fh
    j0, j1, g = _x2_taps(w)
    gw = jnp.asarray(g, dt)[None, None, :, None]
    y = jnp.take(y, jnp.asarray(j0), axis=2) * (1 - gw) \
        + jnp.take(y, jnp.asarray(j1), axis=2) * gw
    return y


@functools.lru_cache(maxsize=64)
def _x2_shift_weights(n_in: int):
    """Even/odd decomposition of exact 2x align_corners taps.

    src(p) = p*(n-1)/(2n-1).  Even outputs p=2m blend x[m-1] (weight
    a=m/(2n-1)) with x[m]; odd outputs p=2m+1 blend x[m] with x[m+1]
    (weight b=(n-1-m)/(2n-1)).  Boundary weights are exactly 0, so clamped
    shifts are exact."""
    m = np.arange(n_in, dtype=np.float64)
    a = m / (2 * n_in - 1)
    b = (n_in - 1 - m) / (2 * n_in - 1)
    return a.astype(np.float32), b.astype(np.float32)


def upsample_x2_shift(x):
    """Exact 2x align_corners upsample as shifted-slice blends + free
    row-major interleave reshapes — no gathers, no dense matmuls.

    Per axis: out_even = shift_prev(x)*a + x*(1-a); out_odd = x*(1-b) +
    shift_next(x)*b; stack on a new trailing-adjacent axis and reshape
    (row-major merge, layout-free).  2-tap traffic at elementwise speed."""
    n, h, w, c = x.shape
    dt = x.dtype

    def axis_pass(t, axis, size):
        a_np, b_np = _x2_shift_weights(size)
        shape = [1, 1, 1, 1]
        shape[axis] = size
        a = jnp.asarray(a_np, jnp.float32).reshape(shape)
        b = jnp.asarray(b_np, jnp.float32).reshape(shape)
        tf = t.astype(jnp.float32)
        prev = jnp.concatenate([
            jax.lax.slice_in_dim(tf, 0, 1, axis=axis),
            jax.lax.slice_in_dim(tf, 0, size - 1, axis=axis)], axis=axis)
        nxt = jnp.concatenate([
            jax.lax.slice_in_dim(tf, 1, size, axis=axis),
            jax.lax.slice_in_dim(tf, size - 1, size, axis=axis)], axis=axis)
        even = prev * a + tf * (1.0 - a)
        odd = tf * (1.0 - b) + nxt * b
        inter = jnp.stack([even, odd], axis=axis + 1)   # (..., size, 2, ...)
        out_shape = list(t.shape)
        out_shape[axis] = 2 * size
        return inter.reshape(out_shape).astype(dt)

    y = axis_pass(x, 1, h)
    return axis_pass(y, 2, w)


def upsample_bilinear_align_corners(x, scale: int = 2, *, impl: str = "matmul"):
    """scale_factor upsample, align_corners=True (reference ``cunet.py:26``).

    ``impl='matmul'`` (default) uses the dense interpolation-matrix einsum —
    on TPU the MXU makes this 2-3x FASTER than the 2-tap gather form despite
    the extra FLOPs (measured on v5e: 128->256 C=128 B=32: matmul 5.8 ms vs
    gather 18.6 ms; full U-Net 800 vs 640 img/s).  ``impl='gather'`` keeps the
    bandwidth-minimal variant for CPU/debug.  Both are exact.
    """
    n, h, w, c = x.shape
    if scale == 2 and impl == "gather":
        return upsample_x2_gather(x)
    if scale == 2 and impl == "shift":
        return upsample_x2_shift(x)
    return resize_bilinear_torch(x, h * scale, w * scale)
