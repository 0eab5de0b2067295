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
    (``classifier.py:148-160``, ``estimator.py:196-206``)."""

    def evaluate(params, batch_stats, images, targets):
        out = model.apply({"params": params, "batch_stats": batch_stats},
                          images, train=False)
        if kind == "classifier":
            return {
                "loss": losses.cross_entropy_loss(out, targets),
                "accuracy": jnp.mean(
                    (jnp.argmax(out, axis=1) == targets).astype(jnp.float32)
                ),
            }
        return {"mse": losses.mse_loss(out, targets),
                "l1": losses.l1_loss(out, targets)}

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
