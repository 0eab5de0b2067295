"""Train state containers (flax.struct pytrees).

All training-time hidden state of the reference (optimizer moments,
spectral-norm ``u`` vectors, BN running stats, step counters) is explicit here
so the whole train step is a pure jittable function and checkpoints capture
everything (the reference loses optimizer state across resumes —
SURVEY.md §5; we keep it).
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    extra: Any = None           # e.g. batch_stats for ResNet training
    step: jax.Array | int = 0
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, extra=None):
        return cls(params=params, opt_state=tx.init(params), extra=extra, step=0, tx=tx)

    def apply_gradients(self, grads, extra=None):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            params=new_params, opt_state=new_opt,
            extra=self.extra if extra is None else extra,
            step=self.step + 1,
        )


@struct.dataclass
class GanTrainState:
    """Paired generator/discriminator state plus discriminator spectral-norm
    power-iteration vectors (threaded explicitly — SURVEY.md §7 hard part 3)."""

    gen: TrainState
    disc: TrainState
    spectral: Any               # 'spectral' collection of SNDisc
    epoch: jax.Array | int = 0
    global_step: jax.Array | int = 0
