"""Functional PyTorch mirrors of the reference architectures, used as parity
oracles in tests.

These are *not* copies of the reference modules: they re-express the reference
semantics (documented in SURVEY.md §2.1 with file:line citations) directly in
``torch.nn.functional`` calls, consuming weights exported from our Flax models
via ``compat.torch_io``.  Running both implementations on identical weights and
inputs checks every numerical convention (conv layout, align_corners resize,
unbiased variances, spectral-norm power iteration, BN modes) end to end.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def t(x):
    return torch.from_numpy(np.asarray(x)).float()


def nhwc_to_nchw(x):
    return t(x).permute(0, 3, 1, 2).contiguous()


def nchw_to_nhwc(x: torch.Tensor) -> np.ndarray:
    return x.detach().permute(0, 2, 3, 1).contiguous().numpy()


# ---------------------------------------------------------------- pieces

def r_double_conv(x, sd, prefix):
    """(conv3x3 pad1 -> relu) x2 — reference nets.py:18-24."""
    x = F.conv2d(x, t(sd[f"{prefix}.0.weight"]), t(sd[f"{prefix}.0.bias"]), padding=1)
    x = F.relu(x)
    x = F.conv2d(x, t(sd[f"{prefix}.2.weight"]), t(sd[f"{prefix}.2.bias"]), padding=1)
    return F.relu(x)


def adain(x, c, sd, prefix, eps=1e-5):
    """Reference utils.py:26-51 semantics (unbiased var, 4-sample style stats)."""
    bs, ch = x.shape[:2]
    y = F.linear(c, t(sd[f"{prefix}.l1.weight"]), t(sd[f"{prefix}.l1.bias"]))
    x_ = x.reshape(bs, ch, -1)
    y_ = y.reshape(bs, ch, -1)
    x_std = (x_.var(dim=-1) + eps).sqrt().view(bs, ch, 1, 1)
    x_mean = x_.mean(dim=-1).view(bs, ch, 1, 1)
    y_std = (y_.var(dim=-1) + eps).sqrt().view(bs, ch, 1, 1)
    y_mean = y_.mean(dim=-1).view(bs, ch, 1, 1)
    return (x - x_mean) / x_std * y_std + y_mean


def upsample2(x):
    return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)


def cunet_forward(x_nhwc, c, sd):
    """Full Conditional_UNet forward (eval mode: dropout off) — cunet.py:43-82."""
    x = nhwc_to_nchw(x_nhwc)
    c = t(c)
    with torch.no_grad():
        conv1 = r_double_conv(x, sd, "dconv_down1")
        x = F.max_pool2d(conv1, 2)
        conv2 = r_double_conv(x, sd, "dconv_down2")
        x = F.max_pool2d(conv2, 2)
        conv3 = r_double_conv(x, sd, "dconv_down3")
        x = F.max_pool2d(conv3, 2)
        x = r_double_conv(x, sd, "dconv_down4")

        x = adain(x, c, sd, "adain3")
        x = upsample2(x)
        x = torch.cat([x, conv3], dim=1)
        x = r_double_conv(x, sd, "dconv_up3")

        x = adain(x, c, sd, "adain2")
        x = upsample2(x)
        x = torch.cat([x, conv2], dim=1)
        x = r_double_conv(x, sd, "dconv_up2")

        x = adain(x, c, sd, "adain1")
        x = upsample2(x)
        x = torch.cat([x, conv1], dim=1)
        x = r_double_conv(x, sd, "dconv_up1")

        out = F.conv2d(x, t(sd["conv_last.weight"]), t(sd["conv_last.bias"]))
        return nchw_to_nhwc(torch.tanh(out))


# ---------------------------------------------------------------- SNDisc

def sn_weight(sd, prefix, update: bool):
    """Spectral-normalized weight with torch's power-iteration semantics.

    Returns (w_bar, new_u).  update=True mimics a training-mode forward.
    """
    w = t(sd[f"{prefix}.weight_orig"])
    u = t(sd[f"{prefix}.weight_u"])
    w_mat = w.reshape(w.shape[0], -1)
    if update:
        v = F.normalize(w_mat.t() @ u, dim=0, eps=1e-12)
        u = F.normalize(w_mat @ v, dim=0, eps=1e-12)
    else:
        v = F.normalize(w_mat.t() @ u, dim=0, eps=1e-12)
    sigma = torch.dot(u, w_mat @ v)
    return w / sigma, u


def sndisc_forward(x_nhwc, c, sd, update=False):
    """Reference disc.py:27-38 forward; returns (out, feats, new_us)."""
    x = nhwc_to_nchw(x_nhwc)
    c = t(c)
    new_us = {}
    with torch.no_grad():
        feats = []
        for i in range(1, 5):
            for j, stride in ((0, 1), (1, 2)):
                w, u = sn_weight(sd, f"conv{i}.{j}", update)
                new_us[f"conv{i}.{j}"] = u
                x = F.conv2d(x, w, t(sd[f"conv{i}.{j}.bias"]), stride=stride, padding=1)
            x = F.leaky_relu(x, 0.2)
            feats.append(x)
        h = x.sum(dim=[2, 3])
        wl, ul = sn_weight(sd, "l", update)
        new_us["l"] = ul
        out = F.linear(h, wl, t(sd["l.bias"]))
        we, ue = sn_weight(sd, "embed", update)
        new_us["embed"] = ue
        e_c = F.linear(c, we, t(sd["embed.bias"]))
        out = out + (e_c * h).sum(dim=1, keepdim=True)
    return out.numpy(), [nchw_to_nhwc(f) for f in feats], new_us


# ---------------------------------------------------------------- ResNet

def bottleneck(x, sd, prefix, stride, train=False):
    def bn(h, p):
        return F.batch_norm(
            h, t(sd[f"{p}.running_mean"]), t(sd[f"{p}.running_var"]),
            t(sd[f"{p}.weight"]), t(sd[f"{p}.bias"]), training=train, eps=1e-5,
        )

    identity = x
    out = F.relu(bn(F.conv2d(x, t(sd[f"{prefix}.conv1.weight"])), f"{prefix}.bn1"))
    out = F.relu(bn(F.conv2d(out, t(sd[f"{prefix}.conv2.weight"]), stride=stride, padding=1),
                    f"{prefix}.bn2"))
    out = bn(F.conv2d(out, t(sd[f"{prefix}.conv3.weight"])), f"{prefix}.bn3")
    if f"{prefix}.downsample.0.weight" in sd:
        identity = bn(F.conv2d(x, t(sd[f"{prefix}.downsample.0.weight"]), stride=stride),
                      f"{prefix}.downsample.1")
    return F.relu(out + identity)


def resnet_forward(x_nhwc, sd, block_counts=(3, 4, 23, 3), train=False):
    """torchvision-style bottleneck ResNet forward, eval mode."""
    x = nhwc_to_nchw(x_nhwc)
    with torch.no_grad():
        x = F.conv2d(x, t(sd["conv1.weight"]), stride=2, padding=3)
        x = F.batch_norm(x, t(sd["bn1.running_mean"]), t(sd["bn1.running_var"]),
                         t(sd["bn1.weight"]), t(sd["bn1.bias"]), training=train)
        x = F.relu(x)
        x = F.max_pool2d(x, kernel_size=3, stride=2, padding=1)
        for li, n in enumerate(block_counts):
            for bi in range(n):
                stride = 2 if (li > 0 and bi == 0) else 1
                x = bottleneck(x, sd, f"layer{li + 1}.{bi}", stride, train)
        x = x.mean(dim=[2, 3])
        x = F.linear(x, t(sd["fc.weight"]), t(sd["fc.bias"]))
    return x.numpy()
