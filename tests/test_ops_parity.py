"""Numerical parity of core ops against PyTorch (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from weather_unet_tpu.ops.convs import conv2d, max_pool_2x2, max_pool
from weather_unet_tpu.ops.norm import adain, batch_whiten
from weather_unet_tpu.ops.resize import resize_bilinear_torch, upsample_bilinear_align_corners
from weather_unet_tpu.ops.spectral import spectral_normalize
from weather_unet_tpu.ops import losses


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2).float()


def _nhwc(x):
    return x.permute(0, 2, 3, 1).numpy()


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 13, 17, 5)).astype(np.float32)
    w = rng.standard_normal((3, 3, 5, 7)).astype(np.float32)
    b = rng.standard_normal(7).astype(np.float32)
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
    theirs = _nhwc(F.conv2d(_nchw(x), wt, torch.from_numpy(b), padding=1))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_conv2d_stride2(rng):
    x = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    w = rng.standard_normal((3, 3, 4, 8)).astype(np.float32)
    ours = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), stride=2))
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
    theirs = _nhwc(F.conv2d(_nchw(x), wt, stride=2, padding=1))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_maxpool_2x2(rng):
    x = rng.standard_normal((2, 15, 15, 3)).astype(np.float32)  # odd -> floor
    ours = np.asarray(max_pool_2x2(jnp.asarray(x)))
    theirs = _nhwc(F.max_pool2d(_nchw(x), 2))
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_maxpool_3x3_s2_p1(rng):
    x = rng.standard_normal((2, 56, 56, 3)).astype(np.float32)
    ours = np.asarray(max_pool(jnp.asarray(x), 3, 2, 1))
    theirs = _nhwc(F.max_pool2d(_nchw(x), 3, stride=2, padding=1))
    np.testing.assert_allclose(ours, theirs, atol=0)


def test_upsample_align_corners(rng):
    for h, w in [(7, 7), (28, 28), (13, 9)]:
        x = rng.standard_normal((2, h, w, 3)).astype(np.float32)
        ours = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x)))
        theirs = _nhwc(
            F.interpolate(_nchw(x), scale_factor=2, mode="bilinear", align_corners=True)
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_resize_arbitrary(rng):
    x = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear_torch(jnp.asarray(x), 100, 50))
    theirs = _nhwc(
        F.interpolate(_nchw(x), size=(100, 50), mode="bilinear", align_corners=True)
    )
    # torch computes fractional source coords in float32; our float64 weights
    # differ in the last ulp, amplified by pixel magnitude -> ~1e-4 worst case.
    np.testing.assert_allclose(ours, theirs, atol=3e-4)


def test_adain_matches_reference_semantics(rng):
    b, h, w, c, ncls = 3, 14, 14, 16, 5
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    y_proj = rng.standard_normal((b, c * 4)).astype(np.float32)
    ours = np.asarray(adain(jnp.asarray(x), jnp.asarray(y_proj)))

    xt = _nchw(x)
    yt = torch.from_numpy(y_proj)
    eps = 1e-5
    x_ = xt.reshape(b, c, -1)
    y_ = yt.reshape(b, c, -1)
    x_std = (x_.var(dim=-1) + eps).sqrt().view(b, c, 1, 1)
    x_mean = x_.mean(dim=-1).view(b, c, 1, 1)
    y_std = (y_.var(dim=-1) + eps).sqrt().view(b, c, 1, 1)
    y_mean = y_.mean(dim=-1).view(b, c, 1, 1)
    theirs = _nhwc((xt - x_mean) / x_std * y_std + y_mean)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_batch_whiten(rng):
    x = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(batch_whiten(jnp.asarray(x)))
    xt = _nchw(x)
    flat = xt.reshape(4, -1)
    std = (flat.var(dim=-1) + 1e-5).sqrt().view(4, 1, 1, 1)
    mean = flat.mean(dim=-1).view(4, 1, 1, 1)
    theirs = _nhwc((xt - mean) / std)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_spectral_norm_matches_torch(rng):
    # conv kernel
    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    u = rng.standard_normal(16).astype(np.float32)
    u = u / np.linalg.norm(u)
    w_bar, new_u = spectral_normalize(jnp.asarray(w), jnp.asarray(u), update=True)

    wt = torch.from_numpy(np.transpose(w, (3, 0, 1, 2)).reshape(16, -1).copy())
    ut = torch.from_numpy(u.copy())
    v = F.normalize(wt.t() @ ut, dim=0, eps=1e-12)
    ut = F.normalize(wt @ v, dim=0, eps=1e-12)
    sigma = torch.dot(ut, wt @ v).item()
    np.testing.assert_allclose(np.asarray(new_u), ut.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w_bar), w / sigma, rtol=1e-5)


def test_spectral_norm_gradient_matches_torch(rng):
    """Gradients must flow through sigma's dependence on W (torch buffers u,v
    are constants)."""
    w = rng.standard_normal((6, 4)).astype(np.float32)  # flax (in, out)
    u = rng.standard_normal(4).astype(np.float32)
    u /= np.linalg.norm(u)

    def loss_fn(wj):
        w_bar, _ = spectral_normalize(wj, jnp.asarray(u), update=True)
        return jnp.sum(w_bar * jnp.arange(w_bar.size).reshape(w_bar.shape))

    g_ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(w)))

    wt = torch.from_numpy(np.transpose(w).copy()).requires_grad_(True)  # (out, in)
    ut = torch.from_numpy(u.copy())
    with torch.no_grad():
        v = F.normalize(wt.t() @ ut, dim=0, eps=1e-12)
        u2 = F.normalize(wt @ v, dim=0, eps=1e-12)
    sigma = torch.dot(u2, wt @ v)
    w_bar_t = wt / sigma
    coef = torch.arange(w_bar_t.numel()).float().reshape(w.shape).t()
    (w_bar_t * coef).sum().backward()
    np.testing.assert_allclose(g_ours, wt.grad.t().numpy(), atol=1e-4)


def test_hinge_losses(rng):
    f = rng.standard_normal((8, 1)).astype(np.float32)
    r = rng.standard_normal((8, 1)).astype(np.float32)
    ours_d = float(losses.dis_hinge(jnp.asarray(f), jnp.asarray(r)))
    ours_g = float(losses.gen_hinge(jnp.asarray(f)))
    ft, rt = torch.from_numpy(f), torch.from_numpy(r)
    theirs_d = (torch.relu(1 - rt).mean() + torch.relu(1 + ft).mean()).item()
    np.testing.assert_allclose(ours_d, theirs_d, rtol=1e-6)
    np.testing.assert_allclose(ours_g, (-ft).mean().item(), rtol=1e-6)


def test_cross_entropy_matches_torch(rng):
    logits = rng.standard_normal((8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 8)
    ours = float(losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = F.cross_entropy(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_reconstruction_con_loss(rng):
    fake = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    real = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    pl = rng.standard_normal((4, 5)).astype(np.float32)
    rl = rng.standard_normal((4, 5)).astype(np.float32)
    ours = float(losses.reconstruction_con_loss(
        jnp.asarray(fake), jnp.asarray(real), jnp.asarray(pl), jnp.asarray(rl)))
    ft = torch.from_numpy(fake).permute(0, 3, 1, 2)
    rt = torch.from_numpy(real).permute(0, 3, 1, 2)
    diff = torch.mean(torch.abs(ft - rt), [1, 2, 3])
    lmda = torch.mean(torch.abs(torch.from_numpy(pl) - torch.from_numpy(rl)), 1)
    theirs = torch.mean(diff / (lmda + 1e-7)).item()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)
