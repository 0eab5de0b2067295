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


# ------------------------------------------------------- differentiable GAN

def t_params(sd, requires_grad=True):
    """state-dict numpy -> torch tensors (leaves with grad)."""
    out = {}
    for k, v in sd.items():
        tt = torch.from_numpy(np.array(v, copy=True)).float()
        if requires_grad and not k.endswith(("_u", "_v")):
            tt.requires_grad_(True)
        out[k] = tt
    return out


def cunet_forward_diff(p, x, c):
    """Differentiable Conditional_UNet forward, dropout disabled (NCHW)."""

    def rdc(h, prefix):
        h = F.conv2d(h, p[f"{prefix}.0.weight"], p[f"{prefix}.0.bias"], padding=1)
        h = F.relu(h)
        h = F.conv2d(h, p[f"{prefix}.2.weight"], p[f"{prefix}.2.bias"], padding=1)
        return F.relu(h)

    def ada(h, prefix, eps=1e-5):
        bs, ch = h.shape[:2]
        y = F.linear(c, p[f"{prefix}.l1.weight"], p[f"{prefix}.l1.bias"])
        h_ = h.reshape(bs, ch, -1)
        y_ = y.reshape(bs, ch, -1)
        h_std = (h_.var(dim=-1) + eps).sqrt().view(bs, ch, 1, 1)
        h_mean = h_.mean(dim=-1).view(bs, ch, 1, 1)
        y_std = (y_.var(dim=-1) + eps).sqrt().view(bs, ch, 1, 1)
        y_mean = y_.mean(dim=-1).view(bs, ch, 1, 1)
        return (h - h_mean) / h_std * y_std + y_mean

    conv1 = rdc(x, "dconv_down1")
    h = F.max_pool2d(conv1, 2)
    conv2 = rdc(h, "dconv_down2")
    h = F.max_pool2d(conv2, 2)
    conv3 = rdc(h, "dconv_down3")
    h = F.max_pool2d(conv3, 2)
    h = rdc(h, "dconv_down4")
    for ada_name, up_name, skip in (("adain3", "dconv_up3", conv3),
                                    ("adain2", "dconv_up2", conv2),
                                    ("adain1", "dconv_up1", conv1)):
        h = ada(h, ada_name)
        h = upsample2(h)
        h = torch.cat([h, skip], dim=1)
        h = rdc(h, up_name)
    out = F.conv2d(h, p["conv_last.weight"], p["conv_last.bias"])
    return torch.tanh(out)


def sn_weight_diff(p, u_store, prefix, update=True):
    """Spectral norm with torch semantics: power iteration under no_grad on
    buffers, sigma differentiable w.r.t. weight_orig."""
    w = p[f"{prefix}.weight_orig"]
    u = u_store[prefix]
    w_mat = w.reshape(w.shape[0], -1)
    with torch.no_grad():
        if update:
            v = F.normalize(w_mat.t() @ u, dim=0, eps=1e-12)
            u = F.normalize(w_mat @ v, dim=0, eps=1e-12)
            u_store[prefix] = u
        else:
            v = F.normalize(w_mat.t() @ u, dim=0, eps=1e-12)
    sigma = torch.dot(u, w_mat @ v)
    return w / sigma


def sndisc_forward_diff(p, u_store, x, c, update=True):
    h = x
    for i in range(1, 5):
        for j, stride in ((0, 1), (1, 2)):
            w = sn_weight_diff(p, u_store, f"conv{i}.{j}", update)
            h = F.conv2d(h, w, p[f"conv{i}.{j}.bias"], stride=stride, padding=1)
        h = F.leaky_relu(h, 0.2)
    feat = h.sum(dim=[2, 3])
    wl = sn_weight_diff(p, u_store, "l", update)
    out = F.linear(feat, wl, p["l.bias"])
    we = sn_weight_diff(p, u_store, "embed", update)
    e_c = F.linear(c, we, p["embed.bias"])
    return out + (e_c * feat).sum(dim=1, keepdim=True)


class TorchGanSim:
    """Persistent differentiable GAN mirror: params + Adam state + u buffers
    survive across steps (matches the jax trainer's persistent TrainState)."""

    def __init__(self, gen_sd, disc_sd, est_w, lr=1e-4):
        self.gp = t_params(gen_sd)
        self.dp = t_params({k: v for k, v in disc_sd.items()
                            if not k.endswith(("_u", "_v"))
                            and not k.endswith(".weight")})
        self.us = {k[: -len(".weight_u")]:
                   torch.from_numpy(np.array(v, copy=True)).float()
                   for k, v in disc_sd.items() if k.endswith("weight_u")}
        self.est_w = torch.from_numpy(np.array(est_w, copy=True)).float()
        g_leaves = [v for v in self.gp.values() if v.requires_grad]
        d_leaves = [v for v in self.dp.values() if v.requires_grad]
        self.g_opt = torch.optim.Adam(g_leaves, lr=lr, betas=(0.0, 0.999),
                                      weight_decay=lr / 20)
        self.d_opt = torch.optim.Adam(d_leaves, lr=lr, betas=(0.0, 0.999),
                                      weight_decay=lr / 20)

    def est(self, imgs):
        return imgs.mean(dim=[2, 3]) @ self.est_w

    def step(self, images_nhwc, rand_images_nhwc):
        """One combined D+G update as the reference runs it
        (t_est_train.py:214-283,384-391)."""
        x = nhwc_to_nchw(images_nhwc)
        rx = nhwc_to_nchw(rand_images_nhwc)
        rand_labels = self.est(rx).detach()
        pred_labels = self.est(x).detach()

        self.d_opt.zero_grad()
        real_out = sndisc_forward_diff(self.dp, self.us, x, pred_labels)
        with torch.no_grad():
            fake_d = cunet_forward_diff(self.gp, x, rand_labels)
        fake_out = sndisc_forward_diff(self.dp, self.us, fake_d, rand_labels)
        d_loss = (torch.relu(1.0 - real_out).mean()
                  + torch.relu(1.0 + fake_out).mean())
        d_loss.backward()
        self.d_opt.step()

        self.g_opt.zero_grad()
        fake = cunet_forward_diff(self.gp, x, rand_labels)
        fake_c = self.est(fake)
        fake_out2 = sndisc_forward_diff(self.dp, self.us, fake, rand_labels)
        g_adv = (-fake_out2).mean()
        g_w = F.mse_loss(fake_c, rand_labels)
        diff = torch.mean(torch.abs(fake - x), [1, 2, 3])
        lmda = torch.mean(torch.abs(pred_labels - rand_labels), 1)
        loss_con = torch.mean(diff / (lmda + 1e-7))
        g_loss = g_adv + loss_con + g_w
        g_loss.backward()
        self.g_opt.step()

        return {"d_loss": d_loss.item(), "g_loss": g_loss.item(),
                "g_loss_adv": g_adv.item(), "g_loss_w": g_w.item(),
                "loss_con": loss_con.item()}

    def export(self):
        gen = {k: v.detach().numpy() for k, v in self.gp.items()}
        disc = {k: v.detach().numpy() for k, v in self.dp.items()}
        us = {k: v.numpy() for k, v in self.us.items()}
        return gen, disc, us


def torch_gan_step(gen_sd, disc_sd, images_nhwc, rand_images_nhwc, est_w,
                   lr=1e-4):
    """Single combined step convenience wrapper around TorchGanSim."""
    sim = TorchGanSim(gen_sd, disc_sd, est_w, lr=lr)
    metrics = sim.step(images_nhwc, rand_images_nhwc)
    gen, disc, us = sim.export()
    return gen, disc, us, metrics


# ------------------------------------------------- FID InceptionV3 mirror

def _bconv(x, sd, prefix, stride=1, padding=0):
    """BasicConv2d: bias-free conv + BN(eps=0.001) + relu."""
    x = F.conv2d(x, t(sd[f"{prefix}.conv.weight"]), stride=stride, padding=padding)
    x = F.batch_norm(x, t(sd[f"{prefix}.bn.running_mean"]),
                     t(sd[f"{prefix}.bn.running_var"]),
                     t(sd[f"{prefix}.bn.weight"]), t(sd[f"{prefix}.bn.bias"]),
                     training=False, eps=0.001)
    return F.relu(x)


def _avg3(x, tf=True):
    # FID patch: count_include_pad=False; stock torchvision: True
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=not tf)


def _mix_a(x, sd, p, tf=True):
    b1 = _bconv(x, sd, f"{p}.branch1x1")
    b5 = _bconv(_bconv(x, sd, f"{p}.branch5x5_1"), sd, f"{p}.branch5x5_2", padding=2)
    bd = _bconv(_bconv(_bconv(x, sd, f"{p}.branch3x3dbl_1"), sd,
                       f"{p}.branch3x3dbl_2", padding=1), sd,
                f"{p}.branch3x3dbl_3", padding=1)
    bp = _bconv(_avg3(x, tf), sd, f"{p}.branch_pool")
    return torch.cat([b1, b5, bd, bp], 1)


def _mix_b(x, sd, p):
    b3 = _bconv(x, sd, f"{p}.branch3x3", stride=2)
    bd = _bconv(_bconv(_bconv(x, sd, f"{p}.branch3x3dbl_1"), sd,
                       f"{p}.branch3x3dbl_2", padding=1), sd,
                f"{p}.branch3x3dbl_3", stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def _mix_c(x, sd, p, tf=True):
    b1 = _bconv(x, sd, f"{p}.branch1x1")
    b7 = _bconv(x, sd, f"{p}.branch7x7_1")
    b7 = _bconv(b7, sd, f"{p}.branch7x7_2", padding=(0, 3))
    b7 = _bconv(b7, sd, f"{p}.branch7x7_3", padding=(3, 0))
    bd = _bconv(x, sd, f"{p}.branch7x7dbl_1")
    bd = _bconv(bd, sd, f"{p}.branch7x7dbl_2", padding=(3, 0))
    bd = _bconv(bd, sd, f"{p}.branch7x7dbl_3", padding=(0, 3))
    bd = _bconv(bd, sd, f"{p}.branch7x7dbl_4", padding=(3, 0))
    bd = _bconv(bd, sd, f"{p}.branch7x7dbl_5", padding=(0, 3))
    bp = _bconv(_avg3(x, tf), sd, f"{p}.branch_pool")
    return torch.cat([b1, b7, bd, bp], 1)


def _mix_d(x, sd, p):
    b3 = _bconv(_bconv(x, sd, f"{p}.branch3x3_1"), sd, f"{p}.branch3x3_2", stride=2)
    b7 = _bconv(x, sd, f"{p}.branch7x7x3_1")
    b7 = _bconv(b7, sd, f"{p}.branch7x7x3_2", padding=(0, 3))
    b7 = _bconv(b7, sd, f"{p}.branch7x7x3_3", padding=(3, 0))
    b7 = _bconv(b7, sd, f"{p}.branch7x7x3_4", stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def _mix_e(x, sd, p, pool, tf=True):
    b1 = _bconv(x, sd, f"{p}.branch1x1")
    b3 = _bconv(x, sd, f"{p}.branch3x3_1")
    b3 = torch.cat([_bconv(b3, sd, f"{p}.branch3x3_2a", padding=(0, 1)),
                    _bconv(b3, sd, f"{p}.branch3x3_2b", padding=(1, 0))], 1)
    bd = _bconv(_bconv(x, sd, f"{p}.branch3x3dbl_1"), sd,
                f"{p}.branch3x3dbl_2", padding=1)
    bd = torch.cat([_bconv(bd, sd, f"{p}.branch3x3dbl_3a", padding=(0, 1)),
                    _bconv(bd, sd, f"{p}.branch3x3dbl_3b", padding=(1, 0))], 1)
    bp = _avg3(x, tf) if pool == "avg" else F.max_pool2d(x, 3, 1, padding=1)
    bp = _bconv(bp, sd, f"{p}.branch_pool")
    return torch.cat([b1, b3, bd, bp], 1)


def inception_fid_forward(x_nhwc, sd, resize=True, normalize=True,
                          tf_variant=True, logits=False):
    """pytorch-fid InceptionV3 pool3 features (eval/inception.py semantics).

    ``tf_variant=False`` mirrors *stock torchvision* ``inception_v3``
    (transform_input=False, eval): count_include_pad avg pools everywhere and
    an avg-pool branch in Mixed_7c — the network the reference IS uses
    (eval/inception_score.py:29,64).  ``logits=True`` applies the fc head."""
    tf = tf_variant
    x = nhwc_to_nchw(x_nhwc)
    with torch.no_grad():
        if resize and x.shape[2:] != (299, 299):
            # reference eval/inception.py:146-150: align_corners=False
            x = F.interpolate(x, size=(299, 299), mode="bilinear",
                              align_corners=False)
        if normalize:
            x = 2.0 * x - 1.0
        x = _bconv(x, sd, "Conv2d_1a_3x3", stride=2)
        x = _bconv(x, sd, "Conv2d_2a_3x3")
        x = _bconv(x, sd, "Conv2d_2b_3x3", padding=1)
        x = F.max_pool2d(x, 3, 2)
        x = _bconv(x, sd, "Conv2d_3b_1x1")
        x = _bconv(x, sd, "Conv2d_4a_3x3")
        x = F.max_pool2d(x, 3, 2)
        x = _mix_a(x, sd, "Mixed_5b", tf)
        x = _mix_a(x, sd, "Mixed_5c", tf)
        x = _mix_a(x, sd, "Mixed_5d", tf)
        x = _mix_b(x, sd, "Mixed_6a")
        x = _mix_c(x, sd, "Mixed_6b", tf)
        x = _mix_c(x, sd, "Mixed_6c", tf)
        x = _mix_c(x, sd, "Mixed_6d", tf)
        x = _mix_c(x, sd, "Mixed_6e", tf)
        x = _mix_d(x, sd, "Mixed_7a")
        x = _mix_e(x, sd, "Mixed_7b", pool="avg", tf=tf)
        x = _mix_e(x, sd, "Mixed_7c", pool="max" if tf else "avg", tf=tf)
        x = x.mean(dim=[2, 3])
        if logits:
            x = F.linear(x, t(sd["fc.weight"]), t(sd["fc.bias"]))
    return x.numpy()
