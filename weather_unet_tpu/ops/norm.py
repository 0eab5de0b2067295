"""Normalization ops reproducing the reference's exact (quirky) numerics.

The reference AdaIN (``utils.py:26-51``) projects the condition vector through
``Linear(num_classes, C*4)``, views both the feature map and the projection as
``(B, C, -1)`` and takes per-channel mean/std of each — so the "style" stats
are computed over only 4 values per channel, with torch's *unbiased* variance
(ddof=1) and ``var + eps`` inside the sqrt.  Pixel parity requires reproducing
this exactly, not "fixing" it.
"""

from __future__ import annotations

import jax.numpy as jnp


def _mean_var_unbiased(x, axis):
    """Mean and unbiased (ddof=1) variance along ``axis`` — torch ``.var()``.

    Statistics are computed in float32 with the two-pass formula
    ``mean((x - mean)^2)`` (non-negative by construction, and what torch
    itself does): the one-pass ``E[x^2] - mu^2`` form cancels
    catastrophically in bfloat16 — variance goes slightly negative,
    ``sqrt(var + eps)`` goes NaN, and bf16 GAN training diverges on step 1
    (found by the bf16 drift guard, tests/test_bf16_training.py)."""
    n = 1
    for a in (axis if isinstance(axis, tuple) else (axis,)):
        n *= x.shape[a]
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=axis, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=axis) * (n / max(n - 1, 1))
    return jnp.squeeze(mean, axis=axis), var


def adain(x, y_proj, eps: float = 1e-5):
    """Adaptive instance norm, reference semantics (``utils.py:41-51``).

    Args:
      x: features NHWC ``(B, H, W, C)``.
      y_proj: projected condition ``(B, C*4)`` (output of the Dense layer).
      eps: added to the *variance* before sqrt (``utils.py:36-37``).
    """
    b, h, w, c = x.shape
    x_mean, x_var = _mean_var_unbiased(x, axis=(1, 2))          # (B, C)
    y = y_proj.reshape(b, c, 4)                                  # channel-major view
    y_mean, y_var = _mean_var_unbiased(y, axis=2)                # (B, C), ddof=1 over 4!
    x_std = jnp.sqrt(x_var + eps)
    y_std = jnp.sqrt(y_var + eps)
    x_mean = x_mean[:, None, None, :]
    x_std = x_std[:, None, None, :]
    y_mean = y_mean[:, None, None, :]
    y_std = y_std[:, None, None, :]
    # modulate in f32 (stats already are), cast back to the compute dtype
    out = (x.astype(jnp.float32) - x_mean) / x_std * y_std + y_mean
    return out.astype(x.dtype)


def adain_scale_shift(x, y_proj, eps: float = 1e-5):
    """AdaIN factored as a per-(sample, channel) affine: f32 ``(scale,
    shift)`` of shape (B, C) with ``adain(x, y_proj) ==
    (x_f32 * scale + shift).astype(x.dtype)`` up to f32 reassociation.

    Lets a fused consumer (``kernels/upconv_pallas.py``) apply the modulate
    inside its own VMEM pass instead of materializing the modulated tensor
    in HBM; the instance statistics (one read of ``x``) stay in XLA."""
    b, h, w, c = x.shape
    x_mean, x_var = _mean_var_unbiased(x, axis=(1, 2))
    y = y_proj.reshape(b, c, 4)
    y_mean, y_var = _mean_var_unbiased(y, axis=2)
    scale = jnp.sqrt(y_var + eps) / jnp.sqrt(x_var + eps)
    shift = y_mean - x_mean * scale
    return scale, shift


def instance_whiten(x, eps: float = 1e-5):
    """Per-sample, per-channel whitening (no affine), unbiased variance."""
    mean, var = _mean_var_unbiased(x, axis=(1, 2))
    out = (x.astype(jnp.float32) - mean[:, None, None, :]) / jnp.sqrt(
        var + eps)[:, None, None, :]
    return out.astype(x.dtype)


def batch_whiten(x, eps: float = 1e-5):
    """Reference custom ``BatchNorm`` (``utils.py:54-71``): per-*sample*
    whitening over all of C,H,W flattened, unbiased variance."""
    b = x.shape[0]
    flat = x.reshape(b, -1)
    mean, var = _mean_var_unbiased(flat, axis=1)
    std = jnp.sqrt(var + eps)
    shape = (b,) + (1,) * (x.ndim - 1)
    out = (x.astype(jnp.float32) - mean.reshape(shape)) / std.reshape(shape)
    return out.astype(x.dtype)


def conditional_norm(x, batch_mean, batch_var, gamma, beta, eps: float = 1e-5):
    """Class-conditional BN core (reference ``utils.py:7-23``): affine-less BN
    followed by per-class gamma/beta looked up by the caller."""
    inv = 1.0 / jnp.sqrt(batch_var + eps)
    out = (x - batch_mean) * inv
    return gamma[:, None, None, :] * out + beta[:, None, None, :]
