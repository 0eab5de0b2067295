"""PyTorch ⇄ JAX checkpoint conversion.

The reference saves GAN checkpoints as
``{'inference': state_dict, 'discriminator': state_dict, 'epoch', 'global_step'}``
(``t_est_train.py:365-373``) and whole pickled ResNet-101 models for the
estimator/classifier (``estimator.py:222-227``).  These functions convert such
state dicts to our Flax variable trees and back, handling:

* layout transposes: conv OIHW → HWIO, linear (out, in) → (in, out),
* spectral-norm buffers: ``weight_orig``/``weight_u`` → params kernel +
  ``'spectral'`` collection ``u`` (``weight_v`` is recomputed, not stored),
* BatchNorm running stats → ``'batch_stats'`` collection,
* the unused ``adain*.emb.weight`` embedding (``utils.py:32``) — dropped on
  import, synthesized (torch default N(0,1)) on export so torch
  ``load_state_dict`` round-trips strictly.

torch itself is only needed for reading ``.pt`` pickles; conversion operates
on numpy arrays.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv_in(w) -> np.ndarray:  # OIHW -> HWIO
    return np.transpose(_np(w), (2, 3, 1, 0))


def _conv_out(w) -> np.ndarray:  # HWIO -> OIHW
    return np.transpose(_np(w), (3, 2, 0, 1))


def _lin_in(w) -> np.ndarray:  # (out, in) -> (in, out)
    return np.transpose(_np(w))


def _lin_out(w) -> np.ndarray:
    return np.transpose(_np(w))


def load_torch_file(path: str) -> Any:
    """Load a ``.pt``/``.pth`` pickle.  Whole-model pickles (the reference's
    estimator/classifier format, ``estimator.py:227``) are reduced to their
    state_dict — unpickling those requires the defining package (torchvision)
    to be importable; state-dict checkpoints need only torch."""
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=False)
    except ModuleNotFoundError as e:
        raise ModuleNotFoundError(
            f"{path} is a whole-model pickle that needs '{e.name}' to "
            f"unpickle (the reference saves estimators this way, "
            f"estimator.py:227). Convert it once in an environment with "
            f"that package: torch.save(torch.load(p).state_dict(), out)"
        ) from e
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return obj


def _state_dict_np(sd) -> Dict[str, np.ndarray]:
    return {k: _np(v) for k, v in sd.items()}


# ---------------------------------------------------------------- cUNet

_CUNET_BLOCKS = (
    [(f"dconv_down{i}", f"down{i}") for i in (1, 2, 3, 4)]
    + [(f"dconv_up{i}", f"up{i}") for i in (3, 2, 1)]
)


def cunet_from_torch(sd) -> Dict[str, Any]:
    """Reference ``Conditional_UNet.state_dict()`` → Flax variables."""
    sd = _state_dict_np(sd)
    p: Dict[str, Any] = {}
    for tname, fname in _CUNET_BLOCKS:
        p[fname] = {
            "conv1": {"kernel": _conv_in(sd[f"{tname}.0.weight"]),
                      "bias": _np(sd[f"{tname}.0.bias"])},
            "conv2": {"kernel": _conv_in(sd[f"{tname}.2.weight"]),
                      "bias": _np(sd[f"{tname}.2.bias"])},
        }
    for i in (1, 2, 3):
        p[f"adain{i}"] = {"proj": {"kernel": _lin_in(sd[f"adain{i}.l1.weight"]),
                                   "bias": _np(sd[f"adain{i}.l1.bias"])}}
    p["conv_last"] = {"kernel": _conv_in(sd["conv_last.weight"]),
                      "bias": _np(sd["conv_last.bias"])}
    return {"params": p}


def cunet_to_torch(variables) -> Dict[str, np.ndarray]:
    """Flax variables → reference-format state dict (numpy values)."""
    p = variables["params"]
    sd: Dict[str, np.ndarray] = {}
    for tname, fname in _CUNET_BLOCKS:
        sd[f"{tname}.0.weight"] = _conv_out(p[fname]["conv1"]["kernel"])
        sd[f"{tname}.0.bias"] = _np(p[fname]["conv1"]["bias"])
        sd[f"{tname}.2.weight"] = _conv_out(p[fname]["conv2"]["kernel"])
        sd[f"{tname}.2.bias"] = _np(p[fname]["conv2"]["bias"])
    for i in (1, 2, 3):
        sd[f"adain{i}.l1.weight"] = _lin_out(p[f"adain{i}"]["proj"]["kernel"])
        sd[f"adain{i}.l1.bias"] = _np(p[f"adain{i}"]["proj"]["bias"])
        ncls = sd[f"adain{i}.l1.weight"].shape[1]
        # unused embedding, synthesized for strict torch load_state_dict
        sd[f"adain{i}.emb.weight"] = np.random.default_rng(0).standard_normal(
            (ncls, ncls)).astype(np.float32)
    sd["conv_last.weight"] = _conv_out(p["conv_last"]["kernel"])
    sd["conv_last.bias"] = _np(p["conv_last"]["bias"])
    return sd


# ---------------------------------------------------------------- SNDisc

_DISC_BLOCKS = [(f"conv{i}", f"block{i}") for i in (1, 2, 3, 4)]


def sndisc_from_torch(sd) -> Dict[str, Any]:
    """Reference ``SNDisc.state_dict()`` → Flax variables (params + spectral)."""
    sd = _state_dict_np(sd)
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    for tname, fname in _DISC_BLOCKS:
        p[fname] = {}
        s[fname] = {}
        for j, cname in ((0, "conv1"), (1, "conv2")):
            p[fname][cname] = {
                "kernel": _conv_in(sd[f"{tname}.{j}.weight_orig"]),
                "bias": _np(sd[f"{tname}.{j}.bias"]),
            }
            s[fname][cname] = {"u": _np(sd[f"{tname}.{j}.weight_u"])}
    p["linear"] = {"kernel": _lin_in(sd["l.weight_orig"]), "bias": _np(sd["l.bias"])}
    s["linear"] = {"u": _np(sd["l.weight_u"])}
    p["embed"] = {"kernel": _lin_in(sd["embed.weight_orig"]), "bias": _np(sd["embed.bias"])}
    s["embed"] = {"u": _np(sd["embed.weight_u"])}
    return {"params": p, "spectral": s}


def sndisc_to_torch(variables) -> Dict[str, np.ndarray]:
    p, s = variables["params"], variables["spectral"]
    sd: Dict[str, np.ndarray] = {}

    def emit(tkey, kernel, bias, u, is_conv):
        w = _conv_out(kernel) if is_conv else _lin_out(kernel)
        w_mat = w.reshape(w.shape[0], -1)
        u = _np(u)
        v = w_mat.T @ u
        v = v / (np.linalg.norm(v) + 1e-12)
        sigma = u @ w_mat @ v
        sd[f"{tkey}.weight_orig"] = w
        sd[f"{tkey}.weight"] = w / sigma
        sd[f"{tkey}.weight_u"] = u
        sd[f"{tkey}.weight_v"] = v.astype(w.dtype)
        sd[f"{tkey}.bias"] = _np(bias)

    for tname, fname in _DISC_BLOCKS:
        for j, cname in ((0, "conv1"), (1, "conv2")):
            blk = p[fname][cname]
            emit(f"{tname}.{j}", blk["kernel"], blk["bias"], s[fname][cname]["u"], True)
    emit("l", p["linear"]["kernel"], p["linear"]["bias"], s["linear"]["u"], False)
    emit("embed", p["embed"]["kernel"], p["embed"]["bias"], s["embed"]["u"], False)
    return sd


# ---------------------------------------------------------------- ResNet

def _bn_from(sd, prefix):
    return (
        {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])},
        {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])},
    )


def _infer_block_counts(keys, sep=".") -> tuple:
    """Count bottlenecks per layer from key names like layer3.22.* / layer3_22."""
    counts = []
    for li in range(1, 5):
        n = 0
        while any(k.startswith(f"layer{li}{sep}{n}{sep if sep == '.' else ''}")
                  or k.startswith(f"layer{li}_{n}") for k in keys):
            n += 1
        counts.append(n)
    return tuple(counts)


def resnet_from_torch(sd, block_counts=None) -> Dict[str, Any]:
    """torchvision ResNet state_dict → Flax variables (params + batch_stats).
    ``block_counts=None`` infers the depth from the key names."""
    sd = _state_dict_np(sd)
    # whole-model pickles saved through DataParallel prefix keys with 'module.'
    sd = {k[len("module."):] if k.startswith("module.") else k: v for k, v in sd.items()}
    if block_counts is None:
        block_counts = _infer_block_counts(sd.keys())
    p: Dict[str, Any] = {"conv1": {"kernel": _conv_in(sd["conv1.weight"])}}
    bs: Dict[str, Any] = {}
    p["bn1"], bs["bn1"] = _bn_from(sd, "bn1")
    for li, n_blocks in enumerate(block_counts):
        for bi in range(n_blocks):
            t = f"layer{li + 1}.{bi}"
            f = f"layer{li + 1}_{bi}"
            p[f], bs[f] = {}, {}
            for k in (1, 2, 3):
                p[f][f"conv{k}"] = {"kernel": _conv_in(sd[f"{t}.conv{k}.weight"])}
                p[f][f"bn{k}"], bs[f][f"bn{k}"] = _bn_from(sd, f"{t}.bn{k}")
            if f"{t}.downsample.0.weight" in sd:
                p[f]["downsample_conv"] = {"kernel": _conv_in(sd[f"{t}.downsample.0.weight"])}
                p[f]["downsample_bn"], bs[f]["downsample_bn"] = _bn_from(
                    sd, f"{t}.downsample.1"
                )
    p["fc"] = {"kernel": _lin_in(sd["fc.weight"]), "bias": _np(sd["fc.bias"])}
    return {"params": p, "batch_stats": bs}


def resnet_to_torch(variables, block_counts=None) -> Dict[str, np.ndarray]:
    p, bs = variables["params"], variables["batch_stats"]
    if block_counts is None:
        block_counts = _infer_block_counts(p.keys(), sep="_")
    sd: Dict[str, np.ndarray] = {"conv1.weight": _conv_out(p["conv1"]["kernel"])}

    def emit_bn(tkey, pb, sb):
        sd[f"{tkey}.weight"] = _np(pb["scale"])
        sd[f"{tkey}.bias"] = _np(pb["bias"])
        sd[f"{tkey}.running_mean"] = _np(sb["mean"])
        sd[f"{tkey}.running_var"] = _np(sb["var"])
        sd[f"{tkey}.num_batches_tracked"] = np.array(0, dtype=np.int64)

    emit_bn("bn1", p["bn1"], bs["bn1"])
    for li, n_blocks in enumerate(block_counts):
        for bi in range(n_blocks):
            t = f"layer{li + 1}.{bi}"
            f = f"layer{li + 1}_{bi}"
            for k in (1, 2, 3):
                sd[f"{t}.conv{k}.weight"] = _conv_out(p[f][f"conv{k}"]["kernel"])
                emit_bn(f"{t}.bn{k}", p[f][f"bn{k}"], bs[f][f"bn{k}"])
            if "downsample_conv" in p[f]:
                sd[f"{t}.downsample.0.weight"] = _conv_out(p[f]["downsample_conv"]["kernel"])
                emit_bn(f"{t}.downsample.1", p[f]["downsample_bn"], bs[f]["downsample_bn"])
    sd["fc.weight"] = _lin_out(p["fc"]["kernel"])
    sd["fc.bias"] = _np(p["fc"]["bias"])
    return sd


# ---------------------------------------------------------------- GAN bundle

def gan_checkpoint_from_torch(path: str) -> Dict[str, Any]:
    """Load a reference GAN checkpoint
    (``{'inference','discriminator','epoch','global_step'}``)."""
    obj = load_torch_file(path)
    return {
        "inference": cunet_from_torch(obj["inference"]),
        "discriminator": sndisc_from_torch(obj["discriminator"]),
        "epoch": int(obj.get("epoch", 0)),
        "global_step": int(obj.get("global_step", 0)),
    }


# ---------------------------------------------------------------- Inception (FID)

def inception_from_torch(sd) -> Dict[str, Any]:
    """TF-ported FID InceptionV3 checkpoint (pytorch-fid layout:
    ``Mixed_5b.branch1x1.conv.weight`` / ``...bn.{weight,bias,running_*}``)
    → Flax variables for ``models.inception_fid.InceptionV3FID``.

    The ``fc`` head is kept (used by the Inception Score CLI); FID itself
    reads pool3 only.  Handles both checkpoint families with the same layer
    vocabulary: the TF-ported FID weights (1008-way fc) and *stock
    torchvision* ``inception_v3`` ImageNet weights (1000-way fc + an
    ``AuxLogits`` tower that only exists for training and is dropped here,
    exactly as eval-mode torchvision ignores it).
    """
    sd = _state_dict_np(sd)
    p: Dict[str, Any] = {}
    bs: Dict[str, Any] = {}

    def set_in(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    for key, val in sd.items():
        parts = key.split(".")
        if parts[0] == "AuxLogits":   # train-only tower, unused in eval
            continue
        if parts[0] == "fc":   # TF-port 1008-way head (kept for IS)
            if parts[1] == "weight":
                p["fc"] = p.get("fc", {})
                p["fc"]["kernel"] = _lin_in(val)
            elif parts[1] == "bias":
                p["fc"] = p.get("fc", {})
                p["fc"]["bias"] = val
            continue
        if parts[-2] == "conv" and parts[-1] == "weight":
            set_in(p, parts[:-1] + ["kernel"], _conv_in(val))
        elif parts[-2] == "bn":
            field = parts[-1]
            if field == "weight":
                set_in(p, parts[:-1] + ["scale"], val)
            elif field == "bias":
                set_in(p, parts[:-1] + ["bias"], val)
            elif field == "running_mean":
                set_in(bs, parts[:-1] + ["mean"], val)
            elif field == "running_var":
                set_in(bs, parts[:-1] + ["var"], val)
        # num_batches_tracked ignored
    return {"params": p, "batch_stats": bs}


def inception_to_torch(variables) -> Dict[str, np.ndarray]:
    """Flax ``InceptionV3FID`` variables → pytorch-fid-style flat state dict
    (inverse of :func:`inception_from_torch`; used by parity tests)."""
    sd: Dict[str, np.ndarray] = {}

    def walk(ptree, btree, prefix):
        if "conv" in ptree and "kernel" in ptree.get("conv", {}):
            sd[f"{prefix}.conv.weight"] = _conv_out(ptree["conv"]["kernel"])
            bn_p, bn_b = ptree["bn"], btree["bn"]
            sd[f"{prefix}.bn.weight"] = _np(bn_p["scale"])
            sd[f"{prefix}.bn.bias"] = _np(bn_p["bias"])
            sd[f"{prefix}.bn.running_mean"] = _np(bn_b["mean"])
            sd[f"{prefix}.bn.running_var"] = _np(bn_b["var"])
            return
        if "kernel" in ptree:  # dense head (fc)
            sd[f"{prefix}.weight"] = _lin_out(ptree["kernel"])
            if "bias" in ptree:
                sd[f"{prefix}.bias"] = _np(ptree["bias"])
            return
        for k in ptree:
            walk(ptree[k], btree.get(k, {}), f"{prefix}.{k}" if prefix else k)

    walk(variables["params"], variables["batch_stats"], "")
    return sd
