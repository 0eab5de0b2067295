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
    """sklearn classification report (dict + printable ``text``) +
    confusion matrix (``eval_class_transfer.py:126-143``)."""
    from sklearn.metrics import classification_report, confusion_matrix

    kw = dict(labels=list(range(len(class_names))),
              target_names=class_names, zero_division=0)
    report = classification_report(y_true, y_pred, output_dict=True, **kw)
    text = classification_report(y_true, y_pred, **kw)
    cm = confusion_matrix(y_true, y_pred, labels=list(range(len(class_names))))
    return {"report": report, "text": text, "confusion_matrix": cm}


def write_confusion_artifacts(output_dir: str, cm, class_names) -> None:
    """The reference evals' on-disk artifacts: ``cm.pkl`` (a pandas
    DataFrame with class-named axes) + ``pr_table.png`` seaborn heatmap
    (``eval_classifier_i2w.py:106-114``, ``eval_class_transfer.py:126-143``)
    — one writer shared by both eval CLIs.  Plotting is best-effort."""
    import os

    import pandas as pd

    names = list(class_names)
    df = pd.DataFrame(np.asarray(cm), index=names, columns=names)
    df.to_pickle(os.path.join(output_dir, "cm.pkl"))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        fig, ax = plt.subplots(figsize=(6, 5))
        sns.heatmap(df, square=True, annot=True, fmt="d", ax=ax)
        ax.set_xlabel("predicted")
        ax.set_ylabel("true/requested")
        fig.savefig(os.path.join(output_dir, "pr_table.png"),
                    bbox_inches="tight")
        plt.close(fig)
    except Exception as e:  # plotting is best-effort
        print(f"pr_table.png skipped: {type(e).__name__}: {e}")


def estimator_transfer_consistency(model, variables, estimate: Callable,
                                   batches: Iterable, *,
                                   sigma: Optional[np.ndarray] = None):
    """CROSS-conditioned transfer consistency
    (``eval_estimator_transfer.py:48-61``): for each reference sample j, the
    WHOLE batch is translated to j's signals (``ref_sig_expand = cat([r_sig
    [j]] * bs)``) and one row ``mean_over_batch(est(fake) - r_sig[j])`` is
    appended — B rows per batch, each SIGNED per-column.  (The reference's
    'random' loader has no shuffle, so its reference signals are the same
    batch's own signals — matched here by conditioning on the batch's
    conds.)  A diagonal own-signals translation would measure an easier
    self-transfer task and is NOT comparable.

    Returns per-column stats over the rows: ``signed_mean``/``signed_std``
    (what the reference prints as ``l1``/``l1 std``,
    ``eval_estimator_transfer.py:129-138``), de-normalized twins when
    ``sigma`` is given, abs-error stats as extra info, and the raw
    ``rows``."""

    @jax.jit
    def readback_rows(batch, conds):
        def per_ref(c):
            cc = jnp.tile(c[None, :], (batch.shape[0], 1))
            fake = model.apply(variables, batch, cc)
            return jnp.mean(estimate(fake) - cc, axis=0)    # (C,)
        # lax.map, NOT vmap: vmapping B whole-batch forwards holds B^2
        # images of activations at once (B=64 at 224^2 compile-OOMs a
        # 16 GB chip); the reference loops refs sequentially too
        # (eval_estimator_transfer.py:49-57)
        return jax.lax.map(per_ref, conds)                  # (B, C)

    rows = []
    for batch, conds in batches:
        rows.append(np.asarray(readback_rows(batch, conds)))
    e = np.concatenate(rows, axis=0)
    out = {"signed_mean": e.mean(axis=0), "signed_std": e.std(axis=0),
           "l1_mean": np.abs(e).mean(axis=0), "l1_std": np.abs(e).std(axis=0),
           "rows": e}
    if sigma is not None:
        s = np.asarray(sigma)
        out["signed_mean_denorm"] = out["signed_mean"] * s
        out["signed_std_denorm"] = out["signed_std"] * s
        out["l1_mean_denorm"] = out["l1_mean"] * s
        out["l1_std_denorm"] = out["l1_std"] * s
    return out


def classifier_accuracy(classify: Callable, batches: Iterable):
    """``(y_true, y_pred, paths)`` over labeled batches
    (``eval_classifier_i2w.py:91-104``).  Batches are ``(images, labels)``
    or ``(images, labels, paths)``; ``paths`` is empty when never
    provided.  Used by ``cli/eval_classifier_i2w.py`` (which needs the
    paths for the misclassified-image copies)."""
    y_true, y_pred, paths = [], [], []
    for batch in batches:
        x, labels = batch[0], batch[1]
        p = np.asarray(jnp.argmax(classify(x), axis=1))
        y_pred.extend(p.tolist())
        y_true.extend(np.asarray(labels).astype(int).tolist())
        if len(batch) > 2:
            paths.extend(list(batch[2]))
    return np.asarray(y_true), np.asarray(y_pred), paths


def estimator_errors(estimate: Callable, batches: Iterable, *,
                     sigma: Optional[np.ndarray] = None):
    """Per-column estimator-vs-ground-truth errors
    (``eval_estimator.py:133-177``).  The reference's printed ``l1`` is the
    SIGNED mean (``l1 = pred - signals``, the abs form is commented out at
    ``eval_estimator.py:145-147``) with a std over per-sample rows, both
    also de-normalized by ``sigma``; abs-mean is kept as extra info."""
    errs = []
    for batch, signals in batches:
        errs.append(np.asarray(estimate(batch)) - np.asarray(signals))
    e = np.concatenate(errs, axis=0)
    out = {"signed_l1": e,
           "signed_mean": e.mean(axis=0), "signed_std": e.std(axis=0),
           "l1_mean": np.abs(e).mean(axis=0),
           "mse_mean": (e ** 2).mean(axis=0)}
    if sigma is not None:
        s = np.asarray(sigma)
        out["signed_mean_denorm"] = out["signed_mean"] * s
        out["signed_std_denorm"] = out["signed_std"] * s
        out["l1_mean_denorm"] = out["l1_mean"] * s
    return out
