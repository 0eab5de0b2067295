"""Shared CLI plumbing: checkpoint/model loading, image IO, dataset builders."""

from __future__ import annotations

import os
from glob import glob
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from weather_unet_tpu.compat import torch_io
from weather_unet_tpu.data.datasets import SIGNAL_COLUMNS
from weather_unet_tpu.models import ConditionalUNet, ResNet101
from weather_unet_tpu.train import checkpoint as ckpt

# Honor the WUT_* env contract (WUT_CPU_DEVICES platform forcing, multi-
# process join) for EVERY CLI, not only the trainers: inference/eval CLIs
# funnel through this module before their first jax computation, and the
# axon TPU plugin ignores JAX_PLATFORMS=cpu so the config API must run
# before backend init (parallel/launch.py). Idempotent; no-op without the
# env vars.
from weather_unet_tpu.parallel.launch import maybe_initialize as _maybe_init


def _env_contract_init():
    """Import-time env-contract hook.  A library consumer may import this
    module AFTER initializing a backend (e.g. TPU work done, then loading a
    checkpoint helper) while WUT_CPU_DEVICES lingers in the environment; the
    contract can only be honored before backend init, so skip with a notice
    instead of mutating platform config out from under a live backend."""
    try:
        from jax._src import xla_bridge

        started = bool(xla_bridge._backends)
    except Exception as e:
        # The probe reads a private jax attribute; if it moves in a jax
        # upgrade, silently assuming "not started" would reintroduce the
        # mutate-config-under-a-live-backend bug this function exists to
        # prevent.  Warn loudly (tests pin the attribute's existence for
        # the installed jax — tests/test_misc_coverage.py).
        import sys

        print(f"weather_unet_tpu: live-backend probe failed "
              f"({type(e).__name__}: {e}); assuming no backend is "
              f"initialized — if one is, platform config may be mutated "
              f"under it", file=sys.stderr)
        started = False
    if started:
        if int(os.environ.get("WUT_NUM_PROCESSES", "1")) > 1:
            # Silently skipping the distributed join would leave the peer
            # ranks blocked in jax.distributed.initialize with zero
            # diagnostic on THIS rank — refuse loudly instead.
            raise RuntimeError(
                "weather_unet_tpu: WUT_NUM_PROCESSES>1 but the jax backend "
                "was already initialized before cli.common was imported; "
                "the distributed join must run before any jax computation. "
                "Import weather_unet_tpu.cli.common (or call "
                "parallel.launch.maybe_initialize()) first.")
        if os.environ.get("WUT_CPU_DEVICES"):
            import sys

            print("weather_unet_tpu: WUT_CPU_DEVICES ignored — the jax "
                  "backend was already initialized before cli.common was "
                  "imported", file=sys.stderr)
        return
    _maybe_init()


_env_contract_init()


def load_transfer(cp_path: str, num_classes: int = 5, dtype=jnp.float32,
                  fuse_upconv="auto"):
    """Load a cUNet from either our msgpack checkpoint or a reference
    ``.pt`` GAN bundle (``sd['inference']`` — ``demo.py:51-54``).

    ``fuse_upconv`` selects the fused Pallas upsample+conv decoder
    (``kernels/upconv_pallas.py``; identical numerics).  ``"auto"``
    currently resolves to OFF: the kernel beats the XLA chain standalone
    (up1 16.8 vs 27.6 ms) but its pair-layout output boundary costs the
    win back in the full forward (measured 106.0 vs 100.3 ms, see
    docs/UPSAMPLE_STUDY.md round-3 addendum) — flip to opt-in once the
    boundary is solved.

    Returns (model, variables)."""
    from weather_unet_tpu.core.profiling import enable_compilation_cache

    enable_compilation_cache()  # serving funnel: all inference/eval CLIs + api
    if fuse_upconv == "auto":
        fuse_upconv = False
    model = ConditionalUNet(
        num_classes=num_classes, dtype=dtype,
        fuse_upconv=(tuple(fuse_upconv)
                     if isinstance(fuse_upconv, (tuple, list))
                     else bool(fuse_upconv)))
    if cp_path.endswith((".pt", ".pth")):
        bundle = torch_io.load_torch_file(cp_path)
        variables = torch_io.cunet_from_torch(bundle["inference"])
    else:
        state = ckpt.restore_checkpoint(cp_path, None)
        # our GAN checkpoints store the full GanTrainState dict; a bare
        # variables dict (params only) is also accepted
        if isinstance(state, dict) and "gen" in state:
            variables = {"params": state["gen"]["params"]}
        elif isinstance(state, dict) and "params" in state:
            variables = {"params": state["params"]}
        else:
            raise ValueError(
                f"unrecognized checkpoint layout in {cp_path}: "
                f"expected a GanTrainState dict or a params tree")
    try:  # flax Dense kernel is (in, out); adain proj's in-dim = num_classes
        ncls_ckpt = int(variables["params"]["adain1"]["proj"]["kernel"].shape[0])
    except (KeyError, TypeError, IndexError):
        ncls_ckpt = None
    if ncls_ckpt is not None and ncls_ckpt != num_classes:
        raise ValueError(
            f"checkpoint {cp_path} was trained with {ncls_ckpt} condition "
            f"classes but num_classes={num_classes} was requested (e.g. the "
            f"demo CLI's reference-parity default is 6) — pass "
            f"--num_classes {ncls_ckpt}")
    return model, variables


def load_estimator(path: str, num_classes: int = 5, dtype=jnp.float32,
                   softmax: bool = False):
    """Load the frozen ResNet-101 weather net from a reference whole-model
    pickle (``t_est_train.py:165``) or our msgpack; returns a jitted
    ``apply(images) -> (B, num_classes)`` (eval mode, running BN stats)."""
    model = ResNet101(num_classes=num_classes, dtype=dtype)
    if path.endswith((".pt", ".pth")):
        sd = torch_io.load_torch_file(path)
        variables = torch_io.resnet_from_torch(sd)
    else:
        state = ckpt.restore_checkpoint(path, None)
        variables = {"params": state["params"], "batch_stats": state["batch_stats"]}

    @jax.jit
    def apply(images):
        out = model.apply(variables, images, train=False)
        return jax.nn.softmax(out, axis=1) if softmax else out

    return apply


def save_image(path: str, images: np.ndarray, nrow: int = 8,
               normalize: bool = True):
    """torchvision ``save_image`` equivalent for NHWC arrays (min-max
    normalized over the whole tensor when ``normalize``, as
    ``inf_transfer_c.py:119-121`` uses)."""
    from PIL import Image

    from weather_unet_tpu.train.metrics import make_grid

    images = np.asarray(images, dtype=np.float32)
    grid = make_grid(images, nrow=min(nrow, len(images)),
                     normalize=normalize, scale_each=False)
    Image.fromarray((grid * 255.0 + 0.5).clip(0, 255).astype(np.uint8)).save(path)


def denorm_tanh(images: np.ndarray) -> np.ndarray:
    """``(res + 1) * 127.5`` uint8 denorm (``demo.py:80``)."""
    return ((np.asarray(images) + 1.0) * 127.5).clip(0, 255).astype(np.uint8)


def list_images(root: str) -> list:
    exts = (".jpg", ".jpeg", ".png")
    return sorted(
        p for p in glob(os.path.join(root, "*")) if p.lower().endswith(exts))


def wrap_decode_cache(aug, cache_dir, base_size: int, paths):
    """``--decode_cache``: wrap a train augmentation so each source image is
    decoded ONCE into a memmap and only augmented per epoch
    (``data/cache.py`` — removes the per-epoch JPEG decode that binds the
    input pipeline on decode-poor hosts; a GAN step consumes 2x batch
    images).  No-op when ``cache_dir`` is falsy."""
    if not cache_dir:
        return aug
    from weather_unet_tpu.data.cache import CachedAugment, DecodedCache

    return CachedAugment(DecodedCache(cache_dir, base_size, paths), aug)


def load_flickr_frame(pkl_path: str, columns: Sequence[str] = SIGNAL_COLUMNS,
                      stats_pkl: Optional[str] = None):
    """Read a dataframe pickle and z-score the signal columns against
    ``stats_pkl`` (the reference's without-outlier frame,
    ``t_est_train.py:126-131``) or itself."""
    import pandas as pd

    from weather_unet_tpu.data.datasets import zscore_columns

    df = pd.read_pickle(pkl_path)
    stats_df = pd.read_pickle(stats_pkl) if stats_pkl else None
    df, mean, std = zscore_columns(df, columns, stats_df=stats_df)
    return df, mean, std
