"""Supervised pretraining steps: weather classifier and signal estimator.

Rebuilds the reference's flat training scripts (``classifier.py:132-184``,
``estimator.py:170-227``) as pure jitted step functions over a ResNet-101:

* classifier: softmax cross-entropy on 5 weather classes, Adam(1e-4, wd 1e-4)
  (``classifier.py:115-117``),
* estimator: the reference computes per-column MSE with ``reduction='none'``,
  means over the batch, and calls ``loss.backward(ones(5))``
  (``estimator.py:183-187``) — mathematically the gradient of the SUM of
  per-column batch-mean squared errors; reproduced as that scalar loss,
* BatchNorm batch statistics update in train mode (torch semantics,
  ``models/common.py``); the optional frozen-backbone mode trains only the
  head (``estimator.py:145-153``) via a gradient mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from weather_unet_tpu.core.state import TrainState
from weather_unet_tpu.ops import losses


def _masked_grads(grads, trainable_mask):
    if trainable_mask is None:
        return grads
    return jax.tree.map(lambda g, m: g * m, grads, trainable_mask)


def make_classifier_step(model, trainable_mask=None):
    """One classifier train step.  ``state.extra`` holds BN batch_stats.

    The ``accuracy`` metric is the reference's ``precision``
    (``classifier.py:41-43`` defines it as mean(argmax == labels))."""

    def step(state: TrainState, images, labels):
        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.extra},
                images, train=True, mutable=["batch_stats"],
            )
            loss = losses.cross_entropy_loss(logits, labels)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = _masked_grads(grads, trainable_mask)
        new_state = state.apply_gradients(grads, extra=new_bs)
        acc = jnp.mean((jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
        return new_state, {"loss": loss, "accuracy": acc}

    return step


def make_estimator_step(model, trainable_mask=None):
    """One estimator (signal-regressor) train step.

    Loss = sum over signal columns of the per-column batch-mean squared error
    (the reference's ``backward(ones)`` semantics, ``estimator.py:183-187``).
    """

    def step(state: TrainState, images, signals):
        def loss_fn(params):
            preds, mutated = model.apply(
                {"params": params, "batch_stats": state.extra},
                images, train=True, mutable=["batch_stats"],
            )
            per_col = jnp.mean(jnp.square(preds - signals), axis=0)  # (num_signals,)
            return jnp.sum(per_col), (preds, mutated["batch_stats"])

        (loss, (preds, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = _masked_grads(grads, trainable_mask)
        new_state = state.apply_gradients(grads, extra=new_bs)
        metrics = {
            "loss": loss,
            "mse": losses.mse_loss(preds, signals),
            "l1": losses.l1_loss(preds, signals),
        }
        return new_state, metrics

    return step


def make_eval_metrics(model, kind: str):
    """Eval forward (BN running stats) returning the reference's test metrics
    (``classifier.py:148-160``, ``estimator.py:196-206``).

    ``weights`` (optional, per-sample 0/1) lets the eval sweep include a
    PARTIAL final test batch padded up to a shardable size: padded rows get
    weight 0 and the returned metrics are weighted means over real rows
    only, matching the reference DataLoader's ``drop_last=False`` test
    semantics (review finding, round 5).  ``weights=None`` is the plain
    mean (identical to the pre-weights behavior)."""

    def evaluate(params, batch_stats, images, targets, weights=None):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          images, train=False)
        w = (jnp.ones(out.shape[0], jnp.float32) if weights is None
             else weights.astype(jnp.float32))
        wmean = lambda per_sample: (jnp.sum(per_sample.astype(jnp.float32) * w)
                                    / jnp.sum(w))
        if kind == "classifier":
            logp = jax.nn.log_softmax(out, axis=-1)
            nll = -jnp.take_along_axis(
                logp, targets[:, None].astype(jnp.int32), axis=-1)[:, 0]
            return {
                "loss": wmean(nll),
                "accuracy": wmean(
                    (jnp.argmax(out, axis=1) == targets).astype(jnp.float32)),
            }
        # per-sample mean over signal dims == the reference's global mean
        # when every sample carries equal weight
        sq = jnp.mean(jnp.square(out - targets), axis=tuple(range(1, out.ndim)))
        ab = jnp.mean(jnp.abs(out - targets), axis=tuple(range(1, out.ndim)))
        return {"mse": wmean(sq), "l1": wmean(ab)}

    return evaluate


def resnet_pretrained_mask(params):
    """Gradient mask for the reference's ``pre_trained`` mode: children 1..7
    of the torchvision ResNet (conv1, bn1, relu, maxpool, layer1..3) are
    frozen (``estimator.py:145-153``: ``ct < 8``), leaving layer4 and fc
    trainable."""
    def mask_for(path, leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        trainable = top == "fc" or top.startswith("layer4")
        return jnp.ones_like(leaf) if trainable else jnp.zeros_like(leaf)

    return jax.tree_util.tree_map_with_path(mask_for, params)
