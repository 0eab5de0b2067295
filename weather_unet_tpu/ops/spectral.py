"""Spectral normalization with explicit power-iteration state.

PyTorch's ``nn.utils.spectral_norm`` (used by the reference discriminator,
``nets.py:26-33`` / ``disc.py:21-25``) hides a stateful ``u`` vector that is
updated on every *training-mode forward*.  In JAX that state must be explicit:
``power_iteration`` returns the updated ``u`` and the caller threads it through
the train step (Flax keeps it in a ``'spectral'`` variable collection).

Numerics and *gradients* match torch: the power iteration itself runs without
gradient (u, v are buffers), but ``sigma = u @ W @ v`` keeps its dependence on
W, so gradients flow through ``W / sigma`` exactly as in torch.  One iteration
per training forward, l2-normalization with ``eps=1e-12``, and in eval mode
sigma is recomputed from the stored ``u`` without advancing it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def _l2norm(v, eps=_EPS):
    return v / (jnp.linalg.norm(v) + eps)


def power_iteration(w_mat, u, *, update: bool, n_iter: int = 1):
    """Power iteration on ``w_mat`` of shape (out, in); returns (sigma, new_u).

    ``u``/``v`` are treated as constants (torch buffers): no gradient flows
    through the iteration, but ``sigma`` remains differentiable w.r.t. W.
    """
    w_ng = jax.lax.stop_gradient(w_mat)
    if update:
        for _ in range(n_iter):
            v = _l2norm(w_ng.T @ u)
            u = _l2norm(w_ng @ v)
    else:
        v = _l2norm(w_ng.T @ u)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (w_mat @ v)
    return sigma, u


def spectral_normalize(kernel, u, *, update: bool):
    """Normalize an HWIO conv kernel (or flax (in, out) dense kernel) by its
    spectral norm.

    torch reshapes OIHW to (O, I*H*W); column permutations preserve singular
    values, so reshaping HWIO to (O, H*W*I) yields the same sigma.

    Returns ``(kernel / sigma, new_u)``.
    """
    if kernel.ndim == 4:  # HWIO -> (O, HWI)
        w_mat = jnp.transpose(kernel, (3, 0, 1, 2)).reshape(kernel.shape[3], -1)
    elif kernel.ndim == 2:  # flax dense (in, out) -> (out, in) like torch Linear
        w_mat = kernel.T
    else:
        raise ValueError(f"unsupported kernel rank {kernel.ndim}")
    sigma, new_u = power_iteration(w_mat, u, update=update)
    return kernel / sigma, new_u
