"""Portable serving artifacts: the cUNet forward as serialized StableHLO.

``core/aot.py`` caches *device executables* — the fastest restart on the
same machine, but each entry is pinned to one backend fingerprint (platform,
device kind, jax version).  This module is the complementary portable path,
built on ``jax.export``: the serving forward is traced once with a
*symbolic batch dimension* and serialized as versioned StableHLO.  One
artifact then serves ANY batch size on ANY host that can lower StableHLO
(TPU, CPU, GPU), without the model code or checkpoint — weights are baked
into the module as constants, which is exactly right for a frozen
deployment snapshot (and exactly wrong for the AOT cache, see the argument
in ``core/aot.py``).

The reference has no deployment story beyond shipping ``.pt`` pickles plus
the full source tree (``demo.py:51-54`` re-instantiates the nn.Module to
load them); this is the TPU-native replacement: a self-contained, versioned,
shape-polymorphic compiler artifact.

Artifact layout (a directory):

    manifest.json           sizes, dtype, jax/module versions, platforms
    translate.stablehlo     f32/bf16 (b,H,W,3)[-1,1] + (b,C) -> (b,H,W,3)
    translate_u8.stablehlo  uint8 wire path (normalize/denorm fused on device)

Round trip::

    exps = export_transfer(model, variables)          # symbolic batch "b"
    save_artifact("art/", exps)
    art = load_artifact("art/")
    y = art["translate"](x, c)        # any batch size, no retrace
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jexport

_MODULE_SUFFIX = ".stablehlo"


def export_transfer(model, variables, *, size: int = 256,
                    batch: Optional[int] = None,
                    platforms: Optional[Sequence[str]] = None
                    ) -> Dict[str, jexport.Exported]:
    """Export the serving forwards of a loaded cUNet.

    ``batch=None`` (default) exports with a symbolic batch dimension ``b``:
    the artifact accepts any batch size.  A concrete ``batch`` pins the
    leading dimension instead (use when the consumer's compiler lacks
    dynamic-shape support).  ``platforms`` defaults to the current backend;
    pass e.g. ``("tpu", "cpu")`` for a multi-platform module.

    Returns ``{"translate": Exported, "translate_u8": Exported}`` — the same
    two wire formats ``api.WeatherTransfer`` serves (f32/bf16 tensors in
    [-1, 1], and the uint8 fast path with normalize/denormalize fused into
    the graph).
    """
    dtype = getattr(model, "dtype", jnp.float32)
    ncls = model.num_classes
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = batch
    x_spec = jax.ShapeDtypeStruct((b, size, size, 3), dtype)
    c_spec = jax.ShapeDtypeStruct((b, ncls), dtype)
    xu8_spec = jax.ShapeDtypeStruct((b, size, size, 3), jnp.uint8)

    def translate(x, c):
        return model.apply(variables, x, c)

    def translate_u8(x_u8, c):
        # mirror api.WeatherTransfer._fwd_u8: uint8 both ways on the wire,
        # normalize exactly like data.transforms.normalize_batch
        x = x_u8.astype(jnp.float32) / 255.0
        y = model.apply(variables, (x - 0.5) / 0.5, c.astype(dtype))
        return ((y.astype(jnp.float32) + 1.0) * 127.5).clip(0, 255
                                                            ).astype(jnp.uint8)

    kw = dict(platforms=tuple(platforms)) if platforms else {}
    return {
        "translate": jexport.export(jax.jit(translate), **kw)(x_spec, c_spec),
        "translate_u8": jexport.export(jax.jit(translate_u8), **kw)(
            xu8_spec, jax.ShapeDtypeStruct((b, ncls), jnp.float32)),
    }


def save_artifact(path: str, exports: Dict[str, jexport.Exported],
                  extra: Optional[dict] = None) -> str:
    """Write an artifact directory: one ``<name>.stablehlo`` per export plus
    ``manifest.json`` (shapes, dtypes, versions — enough for a consumer to
    validate compatibility before deserializing)."""
    os.makedirs(path, exist_ok=True)
    manifest = {
        "format": "weather_unet_tpu.export/1",
        "jax_version": jax.__version__,
        "modules": {},
    }
    if extra:
        clash = set(extra) & set(manifest)
        if clash:
            raise ValueError(
                f"extra manifest keys {sorted(clash)} collide with reserved "
                "fields; pick different names")
        manifest.update(extra)
    for name, exp in exports.items():
        blob = exp.serialize()
        with open(os.path.join(path, name + _MODULE_SUFFIX), "wb") as f:
            f.write(blob)
        # batch mode and image geometry recorded from the REAL avals here at
        # save time — consumers must never parse aval repr strings (fragile
        # across jax versions); in_avals stays for human inspection only
        manifest["modules"][name] = mod = {
            "bytes": len(blob),
            "platforms": list(exp.platforms),
            "calling_convention_version": exp.calling_convention_version,
            "in_avals": [str(a) for a in exp.in_avals],
            "out_avals": [str(a) for a in exp.out_avals],
        }
        # geometry fields only for (image NHWC, condition) signatures — the
        # writer is generic, so a module with a different arity/rank simply
        # omits them (ExportedTransfer refuses such artifacts with a clear
        # error instead of this crashing at save time)
        if (len(exp.in_avals) == 2 and len(exp.in_avals[0].shape) == 4
                and len(exp.in_avals[1].shape) == 2):
            x_shape = exp.in_avals[0].shape
            lead = x_shape[0]
            mod["batch"] = int(lead) if isinstance(lead, int) else "symbolic"
            # H / num_classes may also be symbolic dims (e.g. an export over
            # symbolic_shape("b,h")); record only concrete ints
            if isinstance(x_shape[1], int):
                mod["input_size"] = int(x_shape[1])
            if isinstance(exp.in_avals[1].shape[1], int):
                mod["num_classes"] = int(exp.in_avals[1].shape[1])
    tmp = os.path.join(path, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(path, "manifest.json"))
    return path


def load_manifest(path: str) -> dict:
    with open(os.path.join(path, "manifest.json")) as f:
        return json.load(f)


def load_artifact(path: str, names: Optional[Sequence[str]] = None) -> dict:
    """Deserialize an artifact directory into jitted callables.

    Returns ``{name: callable}``; each callable is ``Exported.call`` under
    ``jax.jit`` — the module is compiled for the *current* backend on first
    dispatch (shape-polymorphic modules compile once per concrete shape,
    like any jit).  Raises ``FileNotFoundError``/``ValueError`` on a missing
    or malformed artifact rather than guessing.
    """
    manifest = load_manifest(path)
    if not str(manifest.get("format", "")).startswith(
            "weather_unet_tpu.export/"):
        raise ValueError(f"{path}: not a weather_unet_tpu export artifact "
                         f"(manifest format={manifest.get('format')!r})")
    backend = jax.default_backend()
    out = {}
    for name in (names or manifest["modules"].keys()):
        if name not in manifest["modules"]:
            raise ValueError(
                f"{path}: artifact has no module {name!r} (available: "
                f"{sorted(manifest['modules'])})")
        platforms = manifest["modules"][name].get("platforms")
        # pre-flight: a platform-mismatched module fails deep in lowering
        # with an opaque error; refuse with names instead. jax.export spells
        # gpu as cuda/rocm; default_backend says "gpu".
        if platforms and backend not in platforms and not (
                backend == "gpu" and {"cuda", "rocm"} & set(platforms)):
            raise ValueError(
                f"{path}/{name}: artifact was exported for platforms "
                f"{platforms} but this host's backend is {backend!r}; "
                "re-export with platforms=(...) covering it")
        fp = os.path.join(path, name + _MODULE_SUFFIX)
        with open(fp, "rb") as f:
            exp = jexport.deserialize(f.read())
        out[name] = jax.jit(exp.call)
    return out


class ExportedTransfer:
    """Serving facade over an artifact: the ``api.WeatherTransfer`` subset
    the HTTP server needs (``translate`` / ``translate_u8`` with
    power-of-two batch bucketing), backed by a StableHLO artifact instead of
    model code + a checkpoint.  ``wut-serve --artifact DIR`` serves a frozen
    deployment snapshot this way — the serving host never imports the model
    and cannot drift from the exported numerics.

    Requires a symbolic-batch artifact (the export default): bucketing
    dispatches many batch sizes through the one module.  A pinned-batch
    artifact is refused up front instead of failing on the first off-size
    group.
    """

    def __init__(self, path: str):
        self.manifest = load_manifest(path)
        mod_meta = self.manifest["modules"].get("translate", {})
        # geometry comes from the per-module record (written from the real
        # avals at save time); top-level extra= keys are a legacy fallback.
        # Serving without it would die per-request with an opaque shape
        # error, so refuse up front.
        self.num_classes = mod_meta.get("num_classes",
                                        self.manifest.get("num_classes"))
        self.input_size = mod_meta.get("input_size",
                                       self.manifest.get("input_size"))
        if self.num_classes is None or self.input_size is None:
            raise ValueError(
                f"{path}: manifest records no input_size/num_classes — "
                "either a legacy artifact saved without extra= (re-export "
                "with the current save_artifact) or an export with symbolic "
                "H/class dims (serving needs concrete ones; only the batch "
                "dim may be symbolic)")
        batch = mod_meta.get("batch")
        if batch is None:
            # legacy artifact (manifest predates the "batch" field): detect
            # a pinned batch from the recorded aval repr — written by the
            # same old code, so the format is known ("f32[4,224,224,3]")
            avals = mod_meta.get("in_avals") or []
            lead = avals[0].split("[", 1)[-1].split(",", 1)[0] if avals else ""
            batch = int(lead) if lead.isdigit() else "symbolic"
        if batch != "symbolic":
            raise ValueError(
                f"{path}: artifact has a pinned batch dimension ({batch}); "
                "serving needs the symbolic-batch export (omit --batch in "
                "wut-export-serving)")
        mods = load_artifact(path, names=("translate", "translate_u8"))
        self._translate = mods["translate"]
        self._translate_u8 = mods["translate_u8"]
        self.aot = None  # executables come from the module, not an AOT cache

    @staticmethod
    def _bucketed(fn, x, c, bucket):
        b = np.shape(x)[0]
        nb = 1 << max(b - 1, 0).bit_length()
        if not bucket or b == 0 or nb == b:
            return fn(jnp.asarray(x), jnp.asarray(c))
        # numpy padding on host: one H2D with the dispatch (api.py rationale)
        pad = lambda a: np.concatenate(  # noqa: E731
            [np.asarray(a), np.zeros((nb - b,) + np.shape(a)[1:],
                                     np.asarray(a).dtype)])
        return fn(jnp.asarray(pad(x)), jnp.asarray(pad(c)))[:b]

    def translate(self, images, conditions, *, bucket: bool = True):
        return self._bucketed(self._translate, images, conditions, bucket)

    def translate_u8(self, images_u8, conditions, *, bucket: bool = True):
        return self._bucketed(self._translate_u8, images_u8,
                              np.asarray(conditions, np.float32), bucket)
