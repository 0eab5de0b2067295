"""BatchNorm2d train-mode parity vs torch: normalization, running-stat
update conventions (biased batch var for normalization, unbiased for the
running update, momentum 0.1), and gradients through batch statistics."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from weather_unet_tpu.models.common import BatchNorm2d


def _setup(rng, c=6):
    x = rng.standard_normal((4, 5, 5, c)).astype(np.float32)
    gamma = rng.standard_normal(c).astype(np.float32)
    beta = rng.standard_normal(c).astype(np.float32)
    rmean = rng.standard_normal(c).astype(np.float32)
    rvar = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5
    variables = {
        "params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)},
        "batch_stats": {"mean": jnp.asarray(rmean), "var": jnp.asarray(rvar)},
    }
    return x, gamma, beta, rmean, rvar, variables


def test_bn_train_forward_and_running_stats(rng):
    x, gamma, beta, rmean, rvar, variables = _setup(rng)
    bn = BatchNorm2d()
    out, mutated = bn.apply(variables, jnp.asarray(x), use_running_average=False,
                            mutable=["batch_stats"])

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    t_rmean = torch.from_numpy(rmean.copy())
    t_rvar = torch.from_numpy(rvar.copy())
    t_out = F.batch_norm(xt, t_rmean, t_rvar, torch.from_numpy(gamma),
                         torch.from_numpy(beta), training=True, momentum=0.1)
    np.testing.assert_allclose(np.asarray(out),
                               t_out.permute(0, 2, 3, 1).numpy(), atol=1e-5)
    # torch mutates the running tensors in place
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["mean"]),
                               t_rmean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(mutated["batch_stats"]["var"]),
                               t_rvar.numpy(), atol=1e-5)


def test_bn_eval_forward(rng):
    x, gamma, beta, rmean, rvar, variables = _setup(rng)
    bn = BatchNorm2d()
    out = bn.apply(variables, jnp.asarray(x), use_running_average=True)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    t_out = F.batch_norm(xt, torch.from_numpy(rmean.copy()),
                         torch.from_numpy(rvar.copy()),
                         torch.from_numpy(gamma), torch.from_numpy(beta),
                         training=False)
    np.testing.assert_allclose(np.asarray(out),
                               t_out.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_bn_train_gradients_match(rng):
    """Gradients flow through the batch statistics exactly as in torch."""
    x, gamma, beta, rmean, rvar, variables = _setup(rng)
    bn = BatchNorm2d()
    coef = rng.standard_normal((4, 5, 5, 6)).astype(np.float32)

    def loss_fn(xj):
        out, _ = bn.apply(variables, xj, use_running_average=False,
                          mutable=["batch_stats"])
        return jnp.sum(out * jnp.asarray(coef))

    g_ours = np.asarray(jax.grad(loss_fn)(jnp.asarray(x)))

    xt = torch.from_numpy(x.copy()).permute(0, 3, 1, 2).requires_grad_(True)
    t_out = F.batch_norm(xt, torch.from_numpy(rmean.copy()),
                         torch.from_numpy(rvar.copy()),
                         torch.from_numpy(gamma), torch.from_numpy(beta),
                         training=True, momentum=0.1)
    (t_out * torch.from_numpy(coef).permute(0, 3, 1, 2)).sum().backward()
    g_theirs = xt.grad.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(g_ours, g_theirs, atol=2e-5)
