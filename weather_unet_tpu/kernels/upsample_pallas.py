"""Fused 2x align_corners bilinear upsample as a single Pallas kernel.

Motivation (measured on v5e, bench_layers.py, B=128 bf16): the XLA two-einsum
upsample (ops/resize.py) materializes the half-upsampled intermediate in HBM
and runs at only ~220-240 GB/s — the three decoder upsamples cost ~21 ms of
the ~100 ms cUNet forward.  Minimum traffic (read input once, write output
once) is ~5.7 ms at HBM peak.  This kernel keeps both interpolation matmuls
in VMEM: grid over (batch, output-row blocks), the full input feature map
resident per batch element, f32 accumulation on the MXU, bf16 in/out.

Numerics match ops/resize.py exactly in structure: interpolation matrices are
cast to the input dtype (bf16 weights in the serving path, like the XLA
einsum), contractions accumulate in f32.

Reference semantics: ``nn.Upsample(scale_factor=2, mode='bilinear',
align_corners=True)`` (reference ``cunet.py:26``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weather_unet_tpu.ops.resize import _interp_matrix_np


def _kernel_einsum(mh_ref, mw_ref, x_ref, o_ref):
    """H then W contraction via dot_general on the MXU (3D lowering left to
    Mosaic)."""
    x = x_ref[0]                                   # (H, W, C)
    # (H2b, H) . (H, W, C) -> (H2b, W, C)
    t = jax.lax.dot_general(
        mh_ref[:], x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # (W2, W) . (H2b, W, C) -> contract W: (H2b, W2, C)
    o = jax.lax.dot_general(
        t, mw_ref[:].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # (H2b, C, W2)
    o_ref[0] = jnp.transpose(o, (0, 2, 1)).astype(o_ref.dtype)


def _kernel_loop(mh_ref, mw_ref, x_ref, o_ref, t_ref):
    """2D-matmul formulation: fori_loop over W planes for the H pass, then
    over output rows for the W pass (all operands 2D on the MXU)."""
    w = x_ref.shape[2]
    h2b = o_ref.shape[1]

    def h_step(i, _):
        plane = x_ref[0, :, i, :]                  # (H, C)
        t_ref[:, i, :] = jnp.dot(mh_ref[:], plane,
                                 preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, w, h_step, 0)

    def w_step(o, _):
        row = t_ref[o]                             # (W, C) f32
        o_ref[0, o] = jnp.dot(mw_ref[:].astype(jnp.float32), row,
                              preferred_element_type=jnp.float32
                              ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h2b, w_step, 0)


def _kernel_blend(i0_ref, i1_ref, f_ref, j0_ref, j1_ref, g_ref, x_ref, o_ref):
    """Traffic-optimal 2-tap form, all VPU: per output row, blend the two
    source rows (dynamic leading-dim reads, row taps in SMEM), then blend
    columns via a sublane gather with the tap-index vectors.  The
    dense-matmul form wastes 64x FLOPs (2 of >=64 weights per row are
    nonzero) — measured compute-bound at ~36 TFLOP/s in XLA."""
    h2b = o_ref.shape[1]
    base = pl.program_id(1) * h2b
    j0 = j0_ref[0]                                  # (W2,)
    j1 = j1_ref[0]
    g = g_ref[0].astype(jnp.float32)[:, None]       # (W2, 1)

    def row(o, _):
        oo = base + o
        fr = f_ref[oo]
        r0 = x_ref[0, i0_ref[oo]].astype(jnp.float32)   # (W, C)
        r1 = x_ref[0, i1_ref[oo]].astype(jnp.float32)
        r = r0 * (1.0 - fr) + r1 * fr                   # (W, C)
        c0 = jnp.take(r, j0, axis=0)                    # (W2, C)
        c1 = jnp.take(r, j1, axis=0)
        o_ref[0, o] = (c0 * (1.0 - g) + c1 * g).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h2b, row, 0)


def _kernel_blendmm(i0_ref, i1_ref, f_ref, mw_ref, x_ref, o_ref):
    """Row blend on the VPU + W-axis as a per-row 2D MXU matmul (fallback if
    sublane gathers lower poorly)."""
    h2b = o_ref.shape[1]
    base = pl.program_id(1) * h2b
    mw = mw_ref[:]

    def row(o, _):
        oo = base + o
        fr = f_ref[oo]
        r0 = x_ref[0, i0_ref[oo]].astype(jnp.float32)
        r1 = x_ref[0, i1_ref[oo]].astype(jnp.float32)
        r = (r0 * (1.0 - fr) + r1 * fr).astype(mw.dtype)
        o_ref[0, o] = jnp.dot(mw, r,
                              preferred_element_type=jnp.float32
                              ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h2b, row, 0)


def _kernel_shift(ah_ref, bh_ref, aw_ref, bw_ref, x_ref, o_ref):
    """Fully vectorized 2-tap form: even/odd output rows are shifted-slice
    blends of a haloed input window (leading-dim interleave is free); the W
    axis uses static sublane shifts and one sublane interleave.  No loops,
    gathers or matmuls — bandwidth-bound by construction.

    Boundary exactness: the clamped halo rows/columns only ever multiply
    weights that are exactly 0 (a[0] = b[n-1] = 0 in _x2_shift_weights), so
    clamping is not an approximation."""
    h2b = o_ref.shape[1]
    hb2 = h2b // 2
    h, w, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    j = pl.program_id(1)
    nblk = pl.num_programs(1)
    m0 = j * hb2
    cur = x_ref[0, pl.ds(m0, hb2)].astype(jnp.float32)       # (hb2, W, C)
    # halo reads (clamped starts are only USED on interior blocks where the
    # clamp is inactive; edge blocks take the in-block shifted forms below)
    prv_in = x_ref[0, pl.ds(jnp.maximum(m0 - 1, 0), hb2)].astype(jnp.float32)
    nxt_in = x_ref[0, pl.ds(jnp.minimum(m0 + 1, h - hb2), hb2)].astype(jnp.float32)
    prv = jnp.where(j == 0,
                    jnp.concatenate([cur[:1], cur[:-1]], axis=0), prv_in)
    nxt = jnp.where(j == nblk - 1,
                    jnp.concatenate([cur[1:], cur[-1:]], axis=0), nxt_in)
    a = ah_ref[:][:, :, None]                                # (hb2, 1, 1)
    b = bh_ref[:][:, :, None]
    even = prv * a + cur * (1.0 - a)
    odd = cur * (1.0 - b) + nxt * b
    t = jnp.stack([even, odd], axis=1).reshape(h2b, w, c)    # free interleave

    prw = jnp.concatenate([t[:, :1], t[:, :-1]], axis=1)
    nxw = jnp.concatenate([t[:, 1:], t[:, -1:]], axis=1)
    aw = aw_ref[0][None, :, None]                            # (1, W, 1)
    bw = bw_ref[0][None, :, None]
    evw = prw * aw + t * (1.0 - aw)
    odw = t * (1.0 - bw) + nxw * bw
    o = jnp.stack([evw, odw], axis=2).reshape(h2b, 2 * w, c)
    o_ref[0] = o.astype(o_ref.dtype)


def _row_block(h_out: int, w: int, w_out: int, c: int, x_bytes: int) -> int:
    """Largest output-row block (divisor of h_out) within ~10 MB of VMEM."""
    budget = 10 * 2 ** 20 - x_bytes
    blk = h_out
    while blk > 8:
        need = 2 * blk * w_out * c * 2 + blk * w * c * 4   # dbl-buf out + f32 mid
        if need <= budget and h_out % blk == 0:
            return blk
        blk //= 2
    return max(blk, 1)


@functools.partial(jax.jit, static_argnames=("variant", "interpret"))
def _upsample2x_impl(x, mh, mw, *, variant: str, interpret: bool):
    n, h, w, c = x.shape
    h2, w2 = 2 * h, 2 * w
    h2b = _row_block(h2, w, w2, c, h * w * c * x.dtype.itemsize)
    grid = (n, h2 // h2b)
    kwargs = dict(
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
        grid=grid,
        out_specs=pl.BlockSpec((1, h2b, w2, c), lambda i, j: (i, j, 0, 0)),
        interpret=interpret,
    )
    in_specs = [
        pl.BlockSpec((h2b, h), lambda i, j: (j, 0)),      # mh row block
        pl.BlockSpec((w2, w), lambda i, j: (0, 0)),       # mw (constant)
        pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0)),  # full x per n
    ]
    if variant == "einsum":
        return pl.pallas_call(_kernel_einsum, in_specs=in_specs, **kwargs)(
            mh, mw, x)
    if variant == "loop":
        return pl.pallas_call(
            _kernel_loop, in_specs=in_specs,
            scratch_shapes=[pltpu.VMEM((h2b, w, c), jnp.float32)], **kwargs)(
            mh, mw, x)

    from weather_unet_tpu.ops.resize import _x2_taps

    i0, i1, f = (jnp.asarray(a) for a in _x2_taps(h))
    x_spec = pl.BlockSpec((1, h, w, c), lambda i, j: (i, 0, 0, 0))
    smem = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
    if variant == "blend":
        j0, j1, g = _x2_taps(w)
        vec = lambda a: jnp.asarray(a)[None, :]
        vspec = pl.BlockSpec((1, w2), lambda i, j: (0, 0))
        return pl.pallas_call(
            _kernel_blend, in_specs=smem + [vspec] * 3 + [x_spec], **kwargs)(
            i0, i1, f, vec(j0), vec(j1), vec(g), x)
    if variant == "blendmm":
        return pl.pallas_call(
            _kernel_blendmm,
            in_specs=smem + [pl.BlockSpec((w2, w), lambda i, j: (0, 0)),
                             x_spec], **kwargs)(i0, i1, f, mw, x)
    if variant == "shift":
        from weather_unet_tpu.ops.resize import _x2_shift_weights

        # halo window needs h2b//2 + 2 <= H; shrink to the largest even
        # divisor of h2 that fits
        while h2b > 2 and (h2b % 2 or h2b // 2 + 2 > h or h2 % h2b):
            h2b -= 2
        if h2b < 2 or h2b // 2 + 2 > h:
            raise ValueError(
                f"shift variant needs H >= 4 (H={h}); use the XLA matmul "
                f"path for tiny inputs")
        kwargs["grid"] = (n, h2 // h2b)
        kwargs["out_specs"] = pl.BlockSpec((1, h2b, w2, c),
                                           lambda i, j: (i, j, 0, 0))
        hb2 = h2b // 2
        ah_np, bh_np = _x2_shift_weights(h)
        aw_np, bw_np = _x2_shift_weights(w)
        col = lambda v: jnp.asarray(v)[:, None]
        rowv = lambda v: jnp.asarray(v)[None, :]
        return pl.pallas_call(
            _kernel_shift,
            in_specs=[pl.BlockSpec((hb2, 1), lambda i, j: (j, 0)),
                      pl.BlockSpec((hb2, 1), lambda i, j: (j, 0)),
                      pl.BlockSpec((1, w), lambda i, j: (0, 0)),
                      pl.BlockSpec((1, w), lambda i, j: (0, 0)),
                      x_spec], **kwargs)(
            col(ah_np), col(bh_np), rowv(aw_np), rowv(bw_np), x)
    raise ValueError(f"unknown variant {variant!r}")


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def upsample2x_fused(x, variant: str = "einsum", interpret: bool = False):
    """Exact 2x align_corners bilinear upsample, fused in VMEM (NHWC).

    Drop-in for ``ops.resize.upsample_bilinear_align_corners(x)``; linear op,
    custom VJP applies the transposed interpolation matrices through the XLA
    einsum path (bit-equivalent structure, runs once per backward).
    """
    n, h, w, c = x.shape
    mh = jnp.asarray(_interp_matrix_np(2 * h, h, True), x.dtype)
    mw = jnp.asarray(_interp_matrix_np(2 * w, w, True), x.dtype)
    return _upsample2x_impl(x, mh, mw, variant=variant, interpret=interpret)


def _fwd(x, variant, interpret):
    return upsample2x_fused(x, variant, interpret), x.shape


def _bwd(variant, interpret, x_shape, g):
    _, h, w, _ = x_shape
    mh_t = jnp.asarray(_interp_matrix_np(2 * h, h, True), g.dtype).T
    mw_t = jnp.asarray(_interp_matrix_np(2 * w, w, True), g.dtype).T
    gx = jnp.einsum("ho,nowc->nhwc", mh_t, g, preferred_element_type=g.dtype)
    gx = jnp.einsum("wp,nopc->nowc", mw_t, gx, preferred_element_type=g.dtype)
    return (gx,)


upsample2x_fused.defvjp(_fwd, _bwd)
