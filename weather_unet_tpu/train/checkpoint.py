"""Checkpoint save/restore with auto-resume.

Mirrors the reference's behavior (SURVEY.md §5):
* GAN runs save ``{'inference','discriminator','epoch','global_step'}`` every
  1000 steps under ``save_dir/name`` and auto-resume from the latest file
  (``t_est_train.py:151-163,365-373``),
* the reference drops optimizer state on resume — we additionally persist it
  (strict superset; resume is exact here),
* a PyTorch-format export/import shim keeps checkpoint compatibility with the
  reference tooling (``compat/torch_io.py``).

Format: flax msgpack, one file per step (atomic rename), newest-wins resume.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np

from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(directory: str, name: str, step: int, tree: Any) -> str:
    """Serialize ``tree`` to ``directory/name/ckpt_s{step}.msgpack``."""
    out_dir = os.path.join(directory, name)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"ckpt_s{step:010d}.msgpack")
    data = serialization.to_bytes(_to_host(tree))
    # Unique staging name: under multi-controller JAX every rank writes the
    # (identical, replicated) checkpoint to the same shared-fs path; a shared
    # ".tmp" would interleave concurrent writers.  A pid alone is NOT unique
    # across hosts (containerized ranks routinely share pids), so include the
    # JAX process index and a random token — colliding staged files would
    # make one rank's os.replace fail after another's succeeded.
    import uuid

    try:
        proc = jax.process_index()
    except Exception:  # before distributed init / no backend
        proc = 0
    tmp = f"{path}.tmp.p{proc}.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def save_checkpoint_file(path: str, tree: Any) -> str:
    """Serialize ``tree`` to EXACTLY ``path`` (no ``directory/name/ckpt_*``
    convention) — for tools whose user names the output file, e.g.
    ``wut-convert-checkpoint from-torch --output est.msgpack``.  Same
    atomic staged-write discipline as :func:`save_checkpoint`."""
    import uuid

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    data = serialization.to_bytes(_to_host(tree))
    tmp = f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def latest_checkpoint(directory: str, name: str) -> Optional[str]:
    """Path of the newest checkpoint under ``directory/name`` (auto-resume,
    reference globs and sorts — ``t_est_train.py:151``)."""
    out_dir = os.path.join(directory, name)
    if not os.path.isdir(out_dir):
        return None
    cands = [f for f in os.listdir(out_dir)
             if re.match(r"ckpt_s\d+\.msgpack$", f)]
    if not cands:
        return None
    return os.path.join(out_dir, sorted(cands)[-1])


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore a tree saved by :func:`save_checkpoint` into ``target``'s
    structure; ``target=None`` returns the raw nested dict."""
    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)


class AsyncCheckpointer:
    """Overlap checkpoint IO with training.

    ``save_checkpoint`` in the step loop costs a device->host read of the
    full train state plus msgpack serialization and a disk write — all of it
    dead time for the accelerator (and the D2H alone is substantial over a
    tunneled device).  ``save()`` instead:

    1. snapshots the state on DEVICE (async HBM->HBM copies; near-free for
       the caller).  The copy is load-bearing, not an optimization: the
       train steps donate their state buffers (``donate_argnums=(0,)``), so
       by the time a background thread read the original arrays the next
       step would already have invalidated them.
    2. hands D2H + serialize + atomic write to a single worker thread.

    One write in flight at a time (a second ``save`` first joins the
    previous) bounds peak host memory at one snapshot and keeps newest-wins
    resume ordering.  ``wait()`` joins the pending write and re-raises any
    IO error — call it before process exit (preemption), before reading
    ``latest_checkpoint`` (the pending write may be the latest), and before
    rollback-restores.  The reference has no analogue (``torch.save`` blocks
    the loop, ``t_est_train.py:365-373``).
    """

    def __init__(self):
        # The worker thread is created lazily on the first save(): trainers
        # construct a checkpointer unconditionally, but callers that drive
        # train_epoch() directly (benches, tests) never save — an eager pool
        # would leak one idle 'ckpt' thread per constructed trainer.
        self._pool = None
        self._pending = None

    @staticmethod
    def _snapshot(x):
        if isinstance(x, jax.Array):
            import jax.numpy as jnp

            return jnp.copy(x)      # fresh buffers: immune to donation
        return x

    def save(self, directory: str, name: str, step: int, tree: Any) -> None:
        """Schedule an async save; returns once the device-side snapshot is
        dispatched (microseconds), not when the file lands."""
        self.wait()
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(1, thread_name_prefix="ckpt")
        snap = jax.tree.map(self._snapshot, tree)
        self._pending = self._pool.submit(
            save_checkpoint, directory, name, step, snap)

    def wait(self) -> Optional[str]:
        """Join the in-flight write (if any); returns its path."""
        if self._pending is None:
            return None
        pending, self._pending = self._pending, None
        return pending.result()

    def close(self) -> None:
        self.wait()
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def export_torch_gan(path: str, gen_variables, disc_variables,
                     epoch: int, global_step: int) -> None:
    """Write a reference-format ``.pt`` GAN checkpoint loadable by the PyTorch
    tooling (``t_est_train.py:367-373`` layout)."""
    import torch

    from weather_unet_tpu.compat.torch_io import cunet_to_torch, sndisc_to_torch

    bundle = {
        "inference": {k: torch.from_numpy(np.array(v, copy=True))
                      for k, v in cunet_to_torch(gen_variables).items()},
        "discriminator": {k: torch.from_numpy(np.array(v, copy=True))
                          for k, v in sndisc_to_torch(disc_variables).items()},
        "epoch": epoch,
        "global_step": global_step,
    }
    torch.save(bundle, path)
