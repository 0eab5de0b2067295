"""Transfer-consistency evaluation — rebuilds of ``eval/eval_class_transfer.py``,
``eval/eval_estimator_transfer.py``, ``eval/eval_classifier_i2w.py`` and
``eval/eval_estimator.py``.

All heavy compute (translate + re-classify / re-estimate) runs as jitted
batched programs; sklearn reporting stays on host like the reference.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp


def class_transfer_consistency(model, variables, classify: Callable,
                               batches: Iterable, num_classes: int = 5):
    """Translate every batch to each class, re-classify the outputs, and
    return (y_true=requested class, y_pred=classifier readback)
    (``eval_class_transfer.py:106-125``)."""

    @jax.jit
    def translate_and_classify(batch):
        def per_class(onehot):
            c = jnp.tile(onehot[None, :], (batch.shape[0], 1))
            fake = model.apply(variables, batch, c)
            return jnp.argmax(classify(fake), axis=1)
        return jax.vmap(per_class)(jnp.eye(num_classes, dtype=batch.dtype))

    y_true, y_pred = [], []
    for batch in batches:
        preds = np.asarray(translate_and_classify(batch))   # (C, B)
        for ci in range(num_classes):
            y_true.extend([ci] * preds.shape[1])
            y_pred.extend(preds[ci].tolist())
    return np.asarray(y_true), np.asarray(y_pred)


def classification_report_dict(y_true, y_pred, class_names) -> Dict:
    """sklearn classification report + confusion matrix
    (``eval_class_transfer.py:126-143``)."""
    from sklearn.metrics import classification_report, confusion_matrix

    report = classification_report(
        y_true, y_pred, labels=list(range(len(class_names))),
        target_names=class_names, output_dict=True, zero_division=0)
    cm = confusion_matrix(y_true, y_pred, labels=list(range(len(class_names))))
    return {"report": report, "confusion_matrix": cm}


def estimator_transfer_consistency(model, variables, estimate: Callable,
                                   batches: Iterable, *,
                                   sigma: Optional[np.ndarray] = None):
    """Translate each batch with each sample's own signals and measure the
    signed per-column error between the estimator's readback and the requested
    signals (``eval_estimator_transfer.py:48-61``).

    Returns dict with per-column mean/std in z-space and (when ``sigma`` is
    given) de-normalized (``eval_estimator_transfer.py:129-138``)."""

    @jax.jit
    def readback_err(batch, conds):
        fake = model.apply(variables, batch, conds)
        return estimate(fake) - conds

    errs = []
    for batch, conds in batches:
        errs.append(np.asarray(readback_err(batch, conds)))
    e = np.concatenate(errs, axis=0)
    out = {"l1_mean": np.abs(e).mean(axis=0), "l1_std": np.abs(e).std(axis=0),
           "signed_mean": e.mean(axis=0), "signed_std": e.std(axis=0)}
    if sigma is not None:
        out["l1_mean_denorm"] = out["l1_mean"] * np.asarray(sigma)
        out["l1_std_denorm"] = out["l1_std"] * np.asarray(sigma)
    return out


def classifier_accuracy(classify: Callable, batches: Iterable):
    """y_true/y_pred over labeled batches (``eval_classifier_i2w.py:91-104``)."""
    y_true, y_pred = [], []
    for batch, labels in batches:
        p = np.asarray(jnp.argmax(classify(batch), axis=1))
        y_pred.extend(p.tolist())
        y_true.extend(np.asarray(labels).tolist())
    return np.asarray(y_true), np.asarray(y_pred)


def estimator_errors(estimate: Callable, batches: Iterable, *,
                     sigma: Optional[np.ndarray] = None):
    """Per-column signed-L1/MSE of the estimator vs ground truth
    (``eval_estimator.py:133-177``)."""
    errs = []
    for batch, signals in batches:
        errs.append(np.asarray(estimate(batch)) - np.asarray(signals))
    e = np.concatenate(errs, axis=0)
    out = {"signed_l1": e, "l1_mean": np.abs(e).mean(axis=0),
           "mse_mean": (e ** 2).mean(axis=0)}
    if sigma is not None:
        out["l1_mean_denorm"] = out["l1_mean"] * np.asarray(sigma)
    return out
