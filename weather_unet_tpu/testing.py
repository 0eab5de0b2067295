"""Synthetic-world builders shared by the test suite and user-facing tools.

The in-process CLI chain test (``tests/test_cli_integration.py``) and the
on-device scripted run-through (``tools/tpu_runthrough.py``) must exercise
the SAME world — one recipe, two consumers — so a change to the split-pkl
schema, class list, or image layout cannot silently diverge what the
on-device run exercises from what the suite pins (round-5 review finding).

Reference layout being mirrored: the i2w class tree consumed by
``ClassImageLoader`` (``dataset.py:93-121``) and the train/test split pickle
``t_cls_train.py`` loads (``t_cls_train.py:117-124``).
"""

from __future__ import annotations

import os
import pickle

#: The reference's five i2w weather classes, in its fixed order
#: (t_cls_train.py:105 ``['sunny','cloudy','rain','snow','foggy']``).
I2W_CLASSES = ("sunny", "cloudy", "rain", "snow", "foggy")


def build_i2w_world(root, *, classes=I2W_CLASSES, per_class: int = 3,
                    train_per_class: int = 2, size: int = 40,
                    rng=None) -> dict:
    """Build a tiny i2w world: ``root/i2w/<class>/<j>.jpg`` + a train/test
    split pickle (``{"train": [paths...], "test": [paths...]}``).

    Returns ``{"i2w_dir", "split_pkl", "paths"}``.  ``rng`` is a
    ``numpy.random.Generator`` (fresh seed-0 generator when omitted).
    """
    import numpy as np
    from PIL import Image

    if rng is None:
        rng = np.random.default_rng(0)
    root = str(root)
    i2w = os.path.join(root, "i2w")
    paths = {"train": [], "test": []}
    for cls in classes:
        d = os.path.join(i2w, cls)
        os.makedirs(d, exist_ok=True)
        for j in range(per_class):
            p = os.path.join(d, f"{j}.jpg")
            Image.fromarray(
                rng.integers(0, 255, (size, size, 3), dtype=np.uint8)).save(p)
            paths["train" if j < train_per_class else "test"].append(p)
    split_pkl = os.path.join(root, "split.pkl")
    with open(split_pkl, "wb") as f:
        pickle.dump(paths, f)
    return {"i2w_dir": i2w, "split_pkl": split_pkl, "paths": paths}


def build_random_classifier_pt(path, *, num_classes: int = 5,
                               input_size: int = 32, seed: int = 0) -> str:
    """Random full-depth ResNet-101 classifier in the reference's ``.pt``
    format (what ``t_cls_train.py:126-133`` torch-loads as the frozen
    weather classifier).

    Host-side by construction: if no jax backend is live yet, this PINS the
    process to the CPU platform before the ``init`` below can trigger
    backend init — on the TPU host the default backend is the axon plugin
    (which ignores ``JAX_PLATFORMS``), so an unguarded call would grab the
    single-tenant tunneled device (review finding, round 5).  A caller that
    wants device work must initialize its backend first; a live backend is
    left untouched."""
    import jax

    try:
        from jax._src import xla_bridge

        live = bool(xla_bridge._backends)
    except Exception:
        live = False
    if not live:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import torch

    from weather_unet_tpu.compat.torch_io import resnet_to_torch
    from weather_unet_tpu.models.resnet import ResNet101

    v = ResNet101(num_classes=num_classes).init(
        jax.random.key(seed), jnp.zeros((1, input_size, input_size, 3)),
        train=False)
    torch.save(resnet_to_torch(v), str(path))
    return str(path)
