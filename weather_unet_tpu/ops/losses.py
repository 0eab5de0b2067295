"""Loss functions of the reference GAN pipeline (``ops.py:14-83``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(a, b):
    """Mean absolute error (``ops.py:22-24``)."""
    return jnp.mean(jnp.abs(a - b))


def mse_loss(a, b):
    """Mean squared error — the reference's ``adv_loss`` (``ops.py:18-20``)."""
    return jnp.mean(jnp.square(a - b))


adv_loss = mse_loss


def feat_loss(feats_a, feats_b):
    """Mean of per-layer L1s (feature matching, ``ops.py:26-27``)."""
    return jnp.mean(jnp.stack([l1_loss(a, b) for a, b in zip(feats_a, feats_b)]))


def cross_entropy_loss(logits, labels):
    """torch ``nn.CrossEntropyLoss()``: softmax CE with integer labels, mean."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)
    return jnp.mean(nll)


def pred_loss(preds, labels, one_hot: bool = False):
    """Weather-consistency loss (``ops.py:29-40``): CE for class conditions,
    MSE for soft signal conditions."""
    if one_hot:
        return cross_entropy_loss(preds, labels)
    return mse_loss(preds, labels)


def dis_hinge(dis_fake, dis_real):
    """Hinge discriminator loss (``ops.py:42-45``)."""
    return jnp.mean(jax.nn.relu(1.0 - dis_real)) + jnp.mean(jax.nn.relu(1.0 + dis_fake))


def gen_hinge(dis_fake):
    """Hinge generator loss (``ops.py:47-48``)."""
    return jnp.mean(-dis_fake)


def reconstruction_con_loss(fake, real, pred_labels, rand_labels, eps: float = 1e-7):
    """Distance-weighted reconstruction penalty ``loss_con``
    (``t_est_train.py:237-239``; the supervised variant uses ``eps=1e-2``,
    ``t_cls_train.py:259-262``):

      mean_b [ mean_pix |fake - real|  /  (mean_c |est(real) - rand_label| + eps) ]
    """
    diff = jnp.mean(jnp.abs(fake - real), axis=(1, 2, 3))
    dist = jnp.mean(jnp.abs(pred_labels - rand_labels), axis=1)
    return jnp.mean(diff / (dist + eps))


def soft_transform(key, x, std: float = 0.05):
    """Gaussian label smoothing (``ops.py:14-16``)."""
    return x + std * jax.random.normal(key, x.shape, x.dtype)
