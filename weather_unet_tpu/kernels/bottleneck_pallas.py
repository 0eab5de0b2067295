"""Fused eval-mode ResNet bottleneck: conv1x1+BN+ReLU -> conv3x3+BN+ReLU ->
conv1x1+BN + residual + ReLU, one VMEM-resident Pallas kernel per image.

The supervised step's roofline profile (docs/PERF.md 'Supervised step
roofline position') names ResNet-101's 1x1 bottleneck convs as HBM-bound
(~51 FLOP/byte; the 56^2 256->64 conv moves 256 MB for 13 GFLOP at B=128)
and identifies block-level fusion — holding activations in VMEM across
conv+BN+ReLU+next-conv — as the one unattempted lever.  This kernel is that
bounded experiment (VERDICT r3 next #7), scoped to *eval-mode* bottlenecks
(BN running stats fold into per-channel scale/bias), which is exactly the
hot production configuration: the GAN combined step runs FOUR frozen
ResNet-101 forwards per step (train/gan.py), all eval-mode.

Traffic per identity block (56^2, 256ch, B=128, bf16): XLA writes/reads the
two 64ch intermediates and re-reads x for the residual on top of the
mandatory x-read/y-write — >= 3x the fused kernel's 2 x 1.6 MB per image.
FLOPs are identical (reference semantics: torchvision Bottleneck,
``models/resnet.py:36-68``; reference uses it via ``classifier.py:104-114``).

Whole-image tiles (grid over batch): a 56^2 x 256 bf16 image plus the padded
64ch intermediate, f32 accumulators, and the output fit in ~8 MB of VMEM, so
the 3x3 conv needs no halo exchange — zero padding is applied in-register.

Identity blocks only (stride 1, no downsample projection): layer1's two
identity blocks at 56^2 are the worst HBM offenders; the stride/projection
blocks stay on XLA.  Forward-only (the frozen-ResNet path takes no grads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fold_bn(bn_params, bn_stats, eps: float = 1e-5):
    """Eval-mode BatchNorm as per-channel (scale, bias):
    ``bn(z) = z * s + t`` with ``s = gamma/sqrt(var+eps)``,
    ``t = beta - mean*s`` (models/common.py::BatchNorm2d running-stats path).
    """
    s = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    t = bn_params["bias"] - bn_stats["mean"] * s
    return s, t


def fold_bottleneck(params, stats, eps: float = 1e-5):
    """Flax ``models/resnet.py::Bottleneck`` variables -> fused-kernel
    weights ``(w1, b1, w2, b2, w3, b3)`` with each BN folded into the
    preceding conv (identity blocks: no downsample projection)."""
    s1, t1 = fold_bn(params["bn1"], stats["bn1"], eps)
    s2, t2 = fold_bn(params["bn2"], stats["bn2"], eps)
    s3, t3 = fold_bn(params["bn3"], stats["bn3"], eps)
    k1 = params["conv1"]["kernel"]          # (1, 1, C, P) HWIO
    k2 = params["conv2"]["kernel"]          # (3, 3, P, P)
    k3 = params["conv3"]["kernel"]          # (1, 1, P, C)
    w1 = k1[0, 0] * s1[None, :]
    w2 = (k2 * s2[None, None, None, :]).reshape(9, k2.shape[2], k2.shape[3])
    w3 = k3[0, 0] * s3[None, :]
    return w1, t1, w2, t2, w3, t3


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
            *, H, W, C, P):
    x = x_ref[0]                                        # (H, W, C)
    xm = x.reshape(H * W, C)
    t1 = jnp.dot(xm, w1_ref[:], preferred_element_type=jnp.float32)
    t1 = jnp.maximum(t1 + b1_ref[:], 0.0).astype(x.dtype)
    # in-register zero padding doubles as the 3x3 conv's SAME padding
    t1p = jnp.pad(t1.reshape(H, W, P), ((1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros((H * W, P), jnp.float32)
    for ky in range(3):                                 # 9 MXU taps, unrolled
        for kx in range(3):
            win = t1p[ky:ky + H, kx:kx + W, :].reshape(H * W, P)
            acc += jnp.dot(win, w2_ref[ky * 3 + kx],
                           preferred_element_type=jnp.float32)
    t2 = jnp.maximum(acc + b2_ref[:], 0.0).astype(x.dtype)
    # final projection chunked over output channels: keeps the f32 (HW, C)
    # expansion out of VMEM at once (whole-image 56^2x256 tiles sit ~1.4 MB
    # over the 16 MB scoped-vmem stack otherwise)
    CH = 128 if C % 128 == 0 else C
    for co in range(0, C, CH):
        y = jnp.dot(t2, w3_ref[:, co:co + CH],
                    preferred_element_type=jnp.float32)
        y = y + b3_ref[0, co:co + CH] + xm[:, co:co + CH].astype(jnp.float32)
        out_ref[0, :, :, co:co + CH] = jnp.maximum(y, 0.0).astype(
            x.dtype).reshape(H, W, CH)


def fused_bottleneck_eval(x, w1, b1, w2, b2, w3, b3, *,
                          interpret: bool = False):
    """``relu(bn3(conv3(relu(bn2(conv2(relu(bn1(conv1(x)))))))) + x)`` with
    all BNs folded (eval mode), one fused kernel launch per batch item.

    ``x`` is NHWC; weights from :func:`fold_bottleneck`.
    """
    B, H, W, C = x.shape
    P = w1.shape[1]
    dt = x.dtype
    f32 = jnp.float32
    ms = pl.ANY if interpret else pltpu.VMEM
    kern = functools.partial(_kernel, H=H, W=W, C=C, P=P)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                         memory_space=ms),
            pl.BlockSpec((C, P), lambda b: (0, 0), memory_space=ms),
            pl.BlockSpec((1, P), lambda b: (0, 0), memory_space=ms),
            pl.BlockSpec((9, P, P), lambda b: (0, 0, 0), memory_space=ms),
            pl.BlockSpec((1, P), lambda b: (0, 0), memory_space=ms),
            pl.BlockSpec((P, C), lambda b: (0, 0), memory_space=ms),
            pl.BlockSpec((1, C), lambda b: (0, 0), memory_space=ms),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0),
                               memory_space=ms),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dt),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * (C * P + 9 * P * P + P * C),
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize,
            transcendentals=0),
    )(x.astype(dt), w1.astype(dt), b1.reshape(1, P).astype(f32),
      w2.astype(dt), b2.reshape(1, P).astype(f32), w3.astype(dt),
      b3.reshape(1, C).astype(f32))


def _folded_conv(x, kernel, s, t, *, stride=1, padding=0, relu=True):
    """conv (HWIO) with eval-BN folded into a per-channel scale/bias."""
    k = kernel * s.astype(kernel.dtype)
    pad = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + t
    return (jax.nn.relu(y) if relu else y).astype(x.dtype)


def _bottleneck_xla(x, params, stats, *, stride, downsample, eps=1e-5):
    """Folded-BN eval bottleneck on plain XLA (stride/projection blocks)."""
    s1, t1 = fold_bn(params["bn1"], stats["bn1"], eps)
    s2, t2 = fold_bn(params["bn2"], stats["bn2"], eps)
    s3, t3 = fold_bn(params["bn3"], stats["bn3"], eps)
    idn = x
    out = _folded_conv(x, params["conv1"]["kernel"], s1, t1)
    out = _folded_conv(out, params["conv2"]["kernel"], s2, t2,
                       stride=stride, padding=1)
    out = _folded_conv(out, params["conv3"]["kernel"], s3, t3, relu=False)
    if downsample:
        sd, td = fold_bn(params["downsample_bn"], stats["downsample_bn"], eps)
        idn = _folded_conv(x, params["downsample_conv"]["kernel"], sd, td,
                           stride=stride, relu=False)
    return jax.nn.relu(out.astype(jnp.float32)
                       + idn.astype(jnp.float32)).astype(x.dtype)


def fused_resnet_eval(variables, *, block_counts=(3, 4, 23, 3),
                      fuse_layers=(1, 2, 3, 4), interpret: bool = False):
    """Frozen (eval-mode) torchvision-style ResNet forward with every
    identity bottleneck running the fused Pallas kernel and the
    stride/projection blocks + stem/head on folded XLA ops.

    Mirrors ``models/resnet.py::ResNet.__call__`` exactly (running-stats BN
    throughout — the configuration the GAN step uses for its four frozen
    ResNet-101 forwards and the serving estimator).  Returns
    ``apply(images) -> logits``; parity vs ``model.apply(train=False)`` is
    pinned in tests.
    """
    from weather_unet_tpu.ops.convs import max_pool

    p, bs = variables["params"], variables["batch_stats"]

    def apply(x):
        s, t = fold_bn(p["bn1"], bs["bn1"])
        x = _folded_conv(x, p["conv1"]["kernel"], s, t, stride=2, padding=3)
        x = max_pool(x, window=3, stride=2, padding=1)
        for li, n_blocks in enumerate(block_counts):
            for bi in range(n_blocks):
                name = f"layer{li + 1}_{bi}"
                bp, bst = p[name], bs[name]
                if bi == 0:
                    x = _bottleneck_xla(x, bp, bst,
                                        stride=1 if li == 0 else 2,
                                        downsample=True)
                elif li + 1 in fuse_layers:
                    w = fold_bottleneck(bp, bst)
                    w = [a.astype(x.dtype) if a.ndim > 1 else a for a in w]
                    x = fused_bottleneck_eval(x, *w, interpret=interpret)
                else:
                    x = _bottleneck_xla(x, bp, bst, stride=1,
                                        downsample=False)
        feats = jnp.mean(x, axis=(1, 2))        # model head dtype semantics
        return feats @ p["fc"]["kernel"].astype(x.dtype) + p["fc"]["bias"]

    return apply


def bottleneck_eval_reference(x, w1, b1, w2, b2, w3, b3):
    """Plain-XLA twin of the fused kernel (identical math; parity tests)."""
    dt = x.dtype
    t1 = jax.nn.relu(
        (x.astype(jnp.float32) @ w1.astype(jnp.float32)) + b1).astype(dt)
    t2 = jax.lax.conv_general_dilated(
        t1, w2.reshape(3, 3, w2.shape[1], w2.shape[2]).astype(dt),
        (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    t2 = jax.nn.relu(t2 + b2).astype(dt)
    y = (t2.astype(jnp.float32) @ w3.astype(jnp.float32)) + b3
    return jax.nn.relu(y + x.astype(jnp.float32)).astype(dt)
