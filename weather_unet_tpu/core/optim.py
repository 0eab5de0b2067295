"""Optimizers matching the reference's torch.optim semantics.

The GAN drivers use ``Adam(lr, betas=(0.0, 0.999), weight_decay=lr/20)``
(``t_est_train.py:172-173``); the estimator/classifier use
``Adam(1e-4, weight_decay=1e-5 | 1e-4)`` (``estimator.py:160``,
``classifier.py:117``).  torch Adam's ``weight_decay`` is *coupled* L2: it
adds ``wd * p`` to the gradient before the moment updates — not AdamW.  The
chain below reproduces that ordering exactly (eps outside the sqrt, bias
correction identical).
"""

from __future__ import annotations

import optax


def torch_adam(lr: float, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 0.0) -> optax.GradientTransformation:
    """torch.optim.Adam equivalent (coupled L2 weight decay)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def gan_adam(lr: float) -> optax.GradientTransformation:
    """The reference GAN optimizer: betas (0.0, 0.999), wd = lr/20."""
    return torch_adam(lr, b1=0.0, b2=0.999, weight_decay=lr / 20.0)
