"""Device mesh and sharding layout.

The reference's only parallelism is single-process ``nn.DataParallel``
(``estimator.py:156-157``, SURVEY.md §2.9).  The TPU-native equivalent is SPMD
data parallelism over a ``jax.sharding.Mesh``: the batch dimension is sharded
along the ``'data'`` axis (ICI), parameters are replicated, and XLA inserts
the ``psum`` gradient all-reduce automatically when a jitted step consumes
sharded batches and produces replicated parameter updates.

The ``'model'`` axis carries the two scaling layouts beyond DP: spatial
partitioning (image height sharded, :meth:`MeshPlan.spatial` — conv halo
exchanges inserted by the partitioner) and tensor parallelism (conv channels
Megatron-split per double-conv pair, ``parallel/tp.py``).  PP/EP have no
counterpart in this model family (SURVEY.md §2.9) and are intentionally
absent.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshPlan:
    mesh: Mesh

    @property
    def n_data(self) -> int:
        return self.mesh.shape["data"]

    def batch(self) -> NamedSharding:
        return NamedSharding(self.mesh, P("data"))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def spatial(self, input_size: Optional[int] = None,
                deepest_stride: int = 16) -> NamedSharding:
        """Batch over 'data' AND image height over 'model' — spatial
        partitioning for NHWC images.  The XLA SPMD partitioner inserts the
        conv halo exchanges and turns AdaIN's per-image spatial reductions
        and the upsample matmuls into the right collectives automatically
        (verified equal to the unsharded forward/train-step at ~1e-5 in
        tests/test_spatial_partition.py).

        Constraint: the model-axis size must not exceed the height of the
        DEEPEST feature map (cUNet: H/8; SNDisc: H/16 — hence the default
        ``deepest_stride=16``) — below one row per shard the partitioner
        silently degrades.  At the reference's 224-256^2 resolutions this
        allows up to 14-way spatial sharding.  Pass ``input_size`` to have
        the constraint enforced here instead of relying on the docstring."""
        n_model = self.mesh.shape["model"]
        if input_size is not None and n_model > max(input_size // deepest_stride, 1):
            raise ValueError(
                f"spatial partitioning degree {n_model} exceeds the deepest "
                f"feature-map height {input_size // deepest_stride} "
                f"(input_size={input_size}, deepest_stride={deepest_stride}); "
                f"use a smaller 'model' axis or a larger input")
        return NamedSharding(self.mesh, P("data", "model", None, None))


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              data: Optional[int] = None, model: int = 1,
              batch_size: Optional[int] = None) -> MeshPlan:
    """Build a (data, model) mesh over the available devices.

    ``batch_size`` clamps the data axis to the largest divisor of the batch
    (a batch of 4 on an 8-device host trains 4-way data-parallel, matching
    the reference's small default batches — ``t_est_train.py:24``)."""
    devices = list(devices if devices is not None else jax.devices())
    if model < 1 or model > len(devices):
        raise ValueError(
            f"model axis {model} does not fit the {len(devices)} available "
            f"device(s); reduce --tensor_parallel / the spatial degree or "
            f"run on a larger slice")
    if data is None:
        data = len(devices) // model
        if batch_size is not None:
            while data > 1 and batch_size % data != 0:
                data -= 1
    if data < 1 or data * model > len(devices):
        raise ValueError(
            f"mesh (data={data} x model={model}) does not fit the "
            f"{len(devices)} available device(s)")
    if jax.process_count() > 1 and data * model != len(devices):
        # A devices[:k] subset under multi-controller JAX is process-lopsided
        # (device order groups by process): some process would own zero mesh
        # shards and every collective would wedge.  Require the global batch
        # to divide over every chip instead of silently shrinking the mesh.
        raise ValueError(
            f"multi-process mesh must span all {len(devices)} devices, got "
            f"data={data} x model={model}"
            + (f" (batch_size={batch_size} is not divisible by the device "
               f"count)" if batch_size is not None else ""))
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return MeshPlan(Mesh(arr, ("data", "model")))


def batch_sharding(plan: MeshPlan) -> NamedSharding:
    return plan.batch()


def replicated_sharding(plan: MeshPlan) -> NamedSharding:
    return plan.replicated()


def put_host_local(sharding, tree):
    """``device_put`` a host value onto a possibly CROSS-PROCESS sharding.

    Under multi-controller JAX a sharding that spans other hosts' devices is
    not addressable, so plain ``jax.device_put`` refuses it.  This helper
    takes the *process-local view* of the value — the full value for
    replicated specs (identical on every process by contract), this host's
    rows for batch-sharded specs — and assembles the global array
    (``host_local_array_to_global_array``).  Single-process, the local view
    IS the global value and this is exactly ``device_put``.  Works on
    pytrees and typed PRNG-key arrays.

    ``sharding`` may be a single :class:`NamedSharding` (applied to every
    leaf) or a pytree of shardings matching ``tree`` (e.g. the
    tensor-parallel state layout from ``parallel/tp.py``).
    """
    import jax

    is_tree = not isinstance(sharding, jax.sharding.Sharding)
    if jax.process_count() == 1:
        if is_tree:
            return jax.device_put(tree, sharding)   # matching pytrees
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    from jax.experimental import multihost_utils as mhu

    if is_tree:
        mesh = jax.tree.leaves(
            sharding, is_leaf=lambda s: isinstance(s, jax.sharding.Sharding)
        )[0].mesh
        specs = jax.tree.map(
            lambda s: s.spec, sharding,
            is_leaf=lambda s: isinstance(s, jax.sharding.Sharding))
        return mhu.host_local_array_to_global_array(tree, mesh, specs)
    return mhu.host_local_array_to_global_array(
        tree, sharding.mesh, sharding.spec)


def shard_batch(plan: MeshPlan, tree):
    """Place a host batch (pytree of np arrays) onto the mesh, batch-sharded."""
    sh = plan.batch()
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def replicate(plan: MeshPlan, tree):
    sh = plan.replicated()
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
