"""Fused 2x align-corners upsample + 3x3 conv Pallas kernel.

The three decoder ``upsample -> conv1`` pairs are the one data-identified
headroom left in the cUNet forward: the XLA interp-matrix upsample costs
~21 ms of the ~100 ms 256^2 B=128 bf16 forward at only ~230 GB/s because its
*output* must be written interleaved (docs/UPSAMPLE_STUDY.md — 8 prior
formulations all lost to that relayout).  This kernel never materializes the
upsampled tensor at all: it consumes the LOW-RES feature map and produces the
following conv's partial sums directly (reference semantics:
``nn.Upsample(align_corners=True)`` then conv3x3 — ``cunet.py:26,59-78``).

Layout idea (what the 8 rejected formulations lacked):

* H-interp stays a matmul — output rows are the matmul's M dim, no relayout.
  A zero-padded interp matrix doubles as the conv's H zero-padding.
* W-interp is decomposed into even/odd column phases (``ops/resize.py::
  _x2_shift_weights``): each phase is a 2-tap *banded* blend of neighbouring
  low-res columns — pure VPU shifts/multiplies, channels stay in lanes.
* The 3x3 conv contracts (C -> O) per tap with C in lanes: 12 MXU matmuls on
  the phase tensors (even/odd output columns need {D(m-1), E(m), D(m)} /
  {E(m), D(m), E(m+1)} respectively); pairs of taps that read the same phase
  tensor share one matmul with lane-concatenated kernels (C, 2*O).
* The kernel writes ``(rows, W, 2*O)`` with lanes ``[even_O | odd_O]``; the
  row-major reshape to ``(rows, 2W, O)`` outside the kernel is FREE
  (flat index ``m*2O + phase*O + o == (2m+phase)*O + o``).  The interleave
  that bound every previous attempt never exists in memory.

FLOPs are identical to the conv it replaces; the upsampled tensor's HBM
round trip (write + conv re-read) disappears, and the conv reads the
low-res map (1/4 the bytes).

Forward-only (serving path): training keeps the XLA formulation via a
custom VJP that recomputes through the reference ops.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weather_unet_tpu.ops.resize import (
    _interp_matrix_np, _x2_shift_weights, upsample_bilinear_align_corners,
)


def _pick_row_tile(h2: int) -> int:
    """Largest output-row tile <= 32 dividing 2H (keeps VMEM bounded)."""
    for t in (32, 16, 8, 4, 2):
        if h2 % t == 0 and t <= h2:
            return t
    return h2


def _upconv_kernel(x_ref, ap_ref, wa_ref, wb_ref, ke_ref, kd_ref,
                   kl_ref, kr_ref, *rest, H, W, C, O, T2,
                   has_cb, has_mod, do_relu):
    """One (batch, row-tile) grid cell: T2 output rows x 2W output cols.

    Optional fusions (the measured in-context killers — an op XLA would have
    fused into a conv epilogue costs a full extra HBM round trip when left
    outside a custom call):
      * ``has_mod``: AdaIN modulate folded into the H-interp output —
        ``A @ (x*s + t) == (A @ x)*s + rowsum(A)*t`` and the interp matrix is
        row-stochastic (rowsum 1; 0 on the zero-pad halo rows, which is
        exactly the conv's zero padding of the modulated tensor).
      * ``has_cb``: the skip-path conv output (viewed (rows, W, 2O), a free
        bitcast of NHWC) is added to the accumulator before the single write.
      * ``do_relu``: the block activation applied in-register.
    """
    rest = list(rest)
    cb_ref = rest.pop(0) if has_cb else None
    sc_ref = rest.pop(0) if has_mod else None
    sh_ref = rest.pop(0) if has_mod else None
    out_ref = rest.pop(0)
    jt = pl.program_id(1)
    j0 = pl.multiple_of(jt * T2, T2)

    # H-interp: padded interp rows [j0, j0+T2+2) cover output rows
    # [j0-1, j0+T2+1) incl. the conv halo; the all-zero first/last padded
    # rows ARE the conv's H zero-padding.
    a = ap_ref[pl.ds(j0, T2 + 2), :]                       # (T2+2, H)
    x2d = x_ref[0].reshape(H, W * C)
    t = jnp.dot(a.astype(x2d.dtype), x2d,
                preferred_element_type=jnp.float32)        # (T2+2, W*C)
    t = t.reshape(T2 + 2, W, C)
    if has_mod:
        rs = jnp.sum(a, axis=1).reshape(T2 + 2, 1, 1).astype(jnp.float32)
        sc = sc_ref[0].reshape(1, 1, C).astype(jnp.float32)
        sh = sh_ref[0].reshape(1, 1, C).astype(jnp.float32)
        t = t * sc + rs * sh

    # W-interp phases (exact 2-tap align-corners decomposition): boundary
    # weights are exactly 0 so the clamped edge shifts are exact.
    wa = wa_ref[:].reshape(1, W, 1)                        # f32 (1, W, 1)
    wb = wb_ref[:].reshape(1, W, 1)
    prev = jnp.concatenate([t[:, :1], t[:, :W - 1]], axis=1)
    nxt = jnp.concatenate([t[:, 1:], t[:, W - 1:]], axis=1)
    cdt = x_ref.dtype
    E = (wa * prev + (1.0 - wa) * t).astype(cdt)           # even cols
    D = ((1.0 - wb) * t + wb * nxt).astype(cdt)            # odd cols
    zcol = jnp.zeros((T2 + 2, 1, C), cdt)                  # conv W zero-pad
    Dm1 = jnp.concatenate([zcol, D[:, :W - 1]], axis=1)    # D(m-1)
    Ep1 = jnp.concatenate([E[:, 1:], zcol], axis=1)        # E(m+1)

    # Conv: accumulate all taps in f32, output lanes = [even_O | odd_O].
    acc = jnp.zeros((T2 * W, 2 * O), jnp.float32)
    for dh in range(3):
        rows = lambda M: M[dh:dh + T2].reshape(T2 * W, C)
        acc = acc + jnp.dot(rows(E), ke_ref[dh],
                            preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(rows(D), kd_ref[dh],
                            preferred_element_type=jnp.float32)
        accL = jnp.dot(rows(Dm1), kl_ref[dh],
                       preferred_element_type=jnp.float32)
        accR = jnp.dot(rows(Ep1), kr_ref[dh],
                       preferred_element_type=jnp.float32)
        acc = acc + jnp.concatenate([accL, accR], axis=1)
    if has_cb:
        acc = acc + cb_ref[0].reshape(T2 * W, 2 * O).astype(jnp.float32)
    if do_relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.reshape(T2, W, 2 * O).astype(out_ref.dtype)


def _phase_kernels(kernel):
    """Lane-concatenated per-phase kernels from the HWIO (3,3,C,O) conv.

    even output col 2m   reads up cols {2m-1, 2m, 2m+1} = {D(m-1), E(m), D(m)}
    odd  output col 2m+1 reads up cols {2m, 2m+1, 2m+2} = {E(m), D(m), E(m+1)}
    so E(m) carries taps (even,dw=1)+(odd,dw=0), D(m) carries
    (even,dw=2)+(odd,dw=1), and the shifted phases carry one tap each.
    """
    k_e = jnp.concatenate([kernel[:, 1], kernel[:, 0]], axis=-1)  # (3, C, 2O)
    k_d = jnp.concatenate([kernel[:, 2], kernel[:, 1]], axis=-1)
    k_l = kernel[:, 0]                                            # (3, C, O)
    k_r = kernel[:, 2]
    return k_e, k_d, k_l, k_r


def upsample2x_conv3x3(x, kernel, *, cb=None, scale=None, shift=None,
                       relu: bool = False, interpret: bool = False):
    """``conv3x3(pad=1)(upsample_2x_align_corners(x))`` without the upsample.

    Args:
      x: (B, H, W, C) NHWC low-res feature map.
      kernel: (3, 3, C, O) HWIO conv weights (no bias — it rides on the
        skip-path conv, matching the split-concat decoder form in
        ``models/common.py``).
      cb: optional (B, 2H, 2W, O) NHWC tensor added before the write (the
        skip-path conv output incl. bias) — fused into the kernel because a
        standalone add costs a full extra HBM round trip of the output.
      scale, shift: optional (B, C) per-(sample, channel) affine applied to
        ``x`` (``ops.norm.adain_scale_shift``) — folded into the H-interp
        matmul output, so the modulated tensor never exists either.  On
        TPU this requires C % 128 == 0 (all cUNet decoder sites qualify).
      relu: apply the block activation in-register before the write.

    Returns (B, 2H, 2W, O) in ``x.dtype``.  Forward-only: gradients go
    through :func:`upconv_fused` / :func:`upconv_block_fused` (XLA
    recompute VJP).
    """
    B, H, W, C = x.shape
    O = kernel.shape[-1]
    H2 = 2 * H
    T2 = _pick_row_tile(H2)

    a_np = _interp_matrix_np(H2, H, True)
    ap = np.zeros((H2 + 2, H), np.float32)
    ap[1:-1] = a_np
    wa_np, wb_np = _x2_shift_weights(W)

    kernel = kernel.astype(x.dtype)
    k_e, k_d, k_l, k_r = _phase_kernels(kernel)

    ms = pl.ANY if interpret else pltpu.VMEM
    body = functools.partial(_upconv_kernel, H=H, W=W, C=C, O=O, T2=T2,
                             has_cb=cb is not None,
                             has_mod=scale is not None, do_relu=relu)
    full = lambda *s: pl.BlockSpec(s, lambda b, j: (0,) * len(s),
                                   memory_space=ms)
    in_specs = [
        pl.BlockSpec((1, H, W, C), lambda b, j: (b, 0, 0, 0),
                     memory_space=ms),
        full(H2 + 2, H),
        full(W, 1),
        full(W, 1),
        full(3, C, 2 * O),
        full(3, C, 2 * O),
        full(3, C, O),
        full(3, C, O),
    ]
    operands = [x, jnp.asarray(ap), jnp.asarray(wa_np).reshape(W, 1),
                jnp.asarray(wb_np).reshape(W, 1), k_e, k_d, k_l, k_r]
    if cb is not None:
        # free bitcast: NHWC (B, 2H, 2W, O) == (B, 2H, W, 2O) row-major
        operands.append(cb.reshape(B, H2, W, 2 * O))
        in_specs.append(pl.BlockSpec((1, T2, W, 2 * O),
                                     lambda b, j: (b, j, 0, 0),
                                     memory_space=ms))
    if scale is not None:
        for t in (scale, shift):
            operands.append(jnp.asarray(t, jnp.float32).reshape(B, 1, C))
            in_specs.append(pl.BlockSpec((1, 1, C), lambda b, j: (b, 0, 0),
                                         memory_space=ms))
    # Mosaic's default VMEM budget rejects the largest decoder block (the
    # double-buffered low-res input is the floor); v5e has 128 MB VMEM —
    # request what the working set actually needs (measured: up1 T2=32
    # compiles at 100 MB and runs 16.9 ms vs 27.8 ms XLA; T2=16 fits the
    # default budget but costs 20.2 ms).
    s = x.dtype.itemsize
    need = (2 * H * W * C * s            # input block, double-buffered
            + (T2 + 2) * W * C * (4 + 4 * s)   # t (f32) + 4 phase tensors
            + T2 * W * 2 * O * (4 + 2 * s)     # f32 acc + out double-buffer
            + (2 * T2 * W * 2 * O * s if cb is not None else 0)
            + 24 * C * O * s + (H2 + 2) * H * 4)
    extra = {} if interpret else dict(compiler_params=pltpu.CompilerParams(
        vmem_limit_bytes=min(max(int(need * 2), 64 << 20), 120 << 20)))
    y = pl.pallas_call(
        body,
        grid=(B, H2 // T2),
        **extra,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T2, W, 2 * O),
                               lambda b, j: (b, j, 0, 0), memory_space=ms),
        out_shape=jax.ShapeDtypeStruct((B, H2, W, 2 * O), x.dtype),
        interpret=interpret,
    )(*operands)
    # free: flat (m, phase, o) == ((2m+phase), o) row-major
    return y.reshape(B, H2, 2 * W, O)


def upsample2x_conv3x3_ref(x, kernel):
    """XLA reference formulation (upsample matmuls + conv), same contract."""
    from weather_unet_tpu.ops import convs

    up = upsample_bilinear_align_corners(x)
    return convs.conv2d(up, kernel.astype(x.dtype), None, stride=1, padding=1)


def upconv_block_ref(x, kernel, cb, scale, shift, relu: bool = True):
    """XLA reference for the fully-fused decoder block entry (modulate ->
    upsample -> conv + skip-conv output -> activation)."""
    xm = (x.astype(jnp.float32) * scale[:, None, None, :]
          + shift[:, None, None, :]).astype(x.dtype)
    y = upsample2x_conv3x3_ref(xm, kernel) + cb
    return jax.nn.relu(y) if relu else y


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def upconv_block_fused(x, kernel, cb, scale, shift, relu: bool = True,
                       interpret: bool = False):
    """Fused decoder block (modulate + upsample + conv + add + activation);
    gradients recompute through the XLA reference path."""
    return upsample2x_conv3x3(x, kernel, cb=cb, scale=scale, shift=shift,
                              relu=relu, interpret=interpret)


def _block_fwd(x, kernel, cb, scale, shift, relu, interpret):
    return (upconv_block_fused(x, kernel, cb, scale, shift, relu, interpret),
            (x, kernel, cb, scale, shift))


def _block_bwd(relu, interpret, res, g):
    x, kernel, cb, scale, shift = res
    _, vjp = jax.vjp(
        lambda *a: upconv_block_ref(*a, relu=relu), x, kernel, cb, scale,
        shift)
    return vjp(g)


upconv_block_fused.defvjp(_block_fwd, _block_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def upconv_fused(x, kernel, interpret: bool = False):
    """Fused upsample+conv with gradients via the XLA reference path."""
    return upsample2x_conv3x3(x, kernel, interpret=interpret)


def _fwd(x, kernel, interpret):
    return upconv_fused(x, kernel, interpret), (x, kernel)


def _bwd(interpret, res, g):
    x, kernel = res
    _, vjp = jax.vjp(upsample2x_conv3x3_ref, x, kernel)
    return vjp(g)


upconv_fused.defvjp(_fwd, _bwd)
