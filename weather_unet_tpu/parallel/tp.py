"""Tensor parallelism: channel-sharded conv pairs over the mesh 'model' axis.

The reference has no tensor parallelism (its only parallelism is one-process
``nn.DataParallel`` — SURVEY.md §2.9); this module is a TPU-native addition
for multi-chip serving/training of the GAN nets.  Every compute block in both
networks is a *double conv* (``nets.py:18-24,26-33``: conv → [act] → conv),
which maps exactly onto the Megatron column/row split:

* ``conv1`` kernels (HWIO) shard their **output** channels over ``'model'``
  (column parallel) — its bias and spectral-norm ``u`` vector (both length-O)
  shard the same way,
* ``conv2`` kernels shard their **input** channels (row parallel), so the
  intermediate activation stays channel-sharded with NO resharding between
  the two convs, and XLA's SPMD partitioner inserts one ``psum`` after
  ``conv2`` to combine the partial sums.

Everything between the convs is channel-local (ReLU/LeakyReLU, and for the
generator's decoder blocks the preceding AdaIN/upsample/dropout run on the
*replicated* block outputs), so one all-reduce per double conv is the entire
communication cost — it rides ICI and overlaps with the next block's compute
under XLA's latency-hiding scheduler.

The rules are **path-based and shape-guarded**: they apply to any pytree
whose leaf paths contain ``conv1``/``conv2`` (raw param dicts, full
``GanTrainState`` including Adam moments and the ``'spectral'`` collection —
optimizer moments mirror their parameter's sharding automatically because
optax state reuses the param tree structure).  Leaves whose sharded dimension
is not divisible by the axis size stay replicated (correct either way; GSPMD
reshards as needed).

Numerical equality with the unsharded forward/train step is pinned in
``tests/test_tensor_parallel.py``.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def _path_names(path) -> set:
    names = set()
    for k in path:
        if hasattr(k, "key"):        # DictKey
            names.add(str(k.key))
        elif hasattr(k, "name"):     # GetAttrKey (flax.struct dataclasses)
            names.add(k.name)
    return names


def tp_specs(tree: Any, n_shard: int, axis: str = "model") -> Any:
    """PartitionSpec pytree for ``tree`` under ``n_shard``-way channel TP.

    ``tree`` may be a param dict, a variables dict (params + spectral), or a
    whole train state — anything whose leaf paths name the conv pair members.
    """
    def spec(path, leaf):
        ndim = getattr(leaf, "ndim", None)
        shape = getattr(leaf, "shape", ())
        names = _path_names(path)
        if n_shard > 1 and "conv1" in names:
            # column parallel: kernel O, bias O, spectral u (length O)
            if ndim == 4 and shape[3] % n_shard == 0:
                return P(None, None, None, axis)
            if ndim == 1 and shape and shape[0] % n_shard == 0:
                return P(axis)
        elif n_shard > 1 and "conv2" in names:
            # row parallel: kernel I (bias/u stay replicated — the psum-ed
            # conv2 output is full-width on every shard)
            if ndim == 4 and shape[2] % n_shard == 0:
                return P(None, None, axis, None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, tree)


def tp_shardings(plan, tree: Any) -> Any:
    """NamedSharding pytree for ``tree`` on ``plan``'s mesh (TP over 'model').

    Drop-in for ``plan.replicated()`` wherever a params/state pytree is placed
    or passed as a jit in/out sharding::

        shardings = tp_shardings(plan, state)
        state = jax.device_put(state, shardings)
        step = jax.jit(fn, in_shardings=(shardings, ...), out_shardings=...)
    """
    n = plan.mesh.shape["model"]
    specs = tp_specs(tree, n)
    if n > 1 and not any(
            s != P() for s in jax.tree.leaves(
                specs, is_leaf=lambda x: isinstance(x, P))):
        # Every leaf fell back to replicated (the shape guards reject an
        # n_shard that divides no conv channel width) — a silent no-op that
        # would train/serve fully replicated while claiming K-way TP.
        raise ValueError(
            f"{n}-way tensor parallelism shards NO leaf of this tree: no "
            f"conv1/conv2 channel dimension is divisible by {n}. Use a "
            f"divisor of the model's channel widths (cUNet: a power of two "
            f"<= 64) or drop --tensor_parallel")
    return jax.tree.map(lambda s: NamedSharding(plan.mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))
