"""FID weight hardening (VERDICT round-1 item 4): structural fingerprint,
refusal without real weights, and a golden-activation check against the real
TF-ported checkpoint whenever one is available locally.

Provide the real checkpoint via env ``FID_INCEPTION_PTH`` or at
``configs/pt_inception.pth`` — ``wut-doctor --goldens`` prints the full
instructions (``evaluation/goldens.py`` is the registry; offline conversion
documented in ``weather_unet_tpu/evaluation/fid.py``).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weather_unet_tpu.evaluation.fid import (
    FID_WEIGHTS_SHA256_PREFIX, fingerprint_weights_file, make_feature_fn,
    verify_fid_weights)
from weather_unet_tpu.evaluation.goldens import find_golden
from weather_unet_tpu.models.inception_fid import InceptionV3FID

REAL_PTH = find_golden("fid_inception").path()


def test_refuses_random_weights_by_default():
    with pytest.raises(RuntimeError, match="No FID inception weights"):
        make_feature_fn(None)


def test_allow_random_opt_in_works():
    fn = make_feature_fn(None, allow_random=True)
    out = fn(np.zeros((1, 64, 64, 3), np.float32))
    assert out.shape == (1, 2048)


def test_verify_accepts_correct_structure():
    model = InceptionV3FID()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    assert verify_fid_weights(variables, model) == "converted"


def test_verify_accepts_converted_tree_with_fc_head():
    """Real converted checkpoints KEEP the classifier head
    (inception_from_torch keeps fc for the IS CLI) while the pool3-only FID
    graph has none — verify must ignore the fc subtree instead of rejecting
    every real checkpoint as 'unexpected tensors' (review finding, round 5;
    previously --weights always crashed here).  Any fc width must pass
    (1008-way TF-ported, 1000-way torchvision)."""
    model = InceptionV3FID()
    for width in (1008, 1000):
        full = jax.eval_shape(
            lambda w=width: InceptionV3FID(
                with_logits=True, num_logits=w).init(
                    jax.random.key(0), jnp.zeros((1, 299, 299, 3))))
        vars_np = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), full)
        assert verify_fid_weights(vars_np, model) == "converted"


def test_verify_rejects_wrong_structure():
    model = InceptionV3FID()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    params = dict(variables["params"])
    # drop a tensor -> missing leaf
    broken = {"params": {k: v for k, v in params.items()
                         if k != sorted(params)[0]}, **{
        k: v for k, v in variables.items() if k != "params"}}
    with pytest.raises(ValueError, match="do not match"):
        verify_fid_weights(broken, model)


def test_verify_rejects_wrong_shapes():
    model = InceptionV3FID()
    variables = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
    flat, tree = jax.tree_util.tree_flatten(variables)
    flat[0] = jnp.zeros(np.asarray(flat[0]).shape + (1,), flat[0].dtype)
    with pytest.raises(ValueError, match="shape mismatch"):
        verify_fid_weights(jax.tree_util.tree_unflatten(tree, flat), model)


@pytest.mark.skipif(not os.path.exists(REAL_PTH),
                    reason="real pt_inception .pth not available (no egress)")
def test_real_checkpoint_golden_activations():
    """With the real TF-ported checkpoint present: certified fingerprint and
    pool3 golden parity against the torch mirror running the SAME weights."""
    from tests import torch_mirror
    from weather_unet_tpu.compat.torch_io import (
        inception_from_torch, load_torch_file)

    sd = load_torch_file(REAL_PTH)
    model = InceptionV3FID()
    variables = inception_from_torch(sd)
    trust = verify_fid_weights(variables, model, path=REAL_PTH)
    if fingerprint_weights_file(REAL_PTH).startswith(FID_WEIGHTS_SHA256_PREFIX):
        assert trust == "certified"

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 299, 299, 3)).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(x)))
    theirs = torch_mirror.inception_fid_forward(x, sd)
    np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)
