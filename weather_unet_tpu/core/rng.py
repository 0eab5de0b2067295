"""Training-time PRNG keys: hardware RNG by default.

JAX's default ``threefry2x32`` generator is a software kernel; profiling the
fused GAN combined step on TPU v5e (bench_gan_profile.py + tools/
parse_xplane.py) showed ~67 ms of a 427 ms step (~16%) spent inside threefry
fusions generating the six decoder dropout masks (two of
``bf16[128,224,224,128]`` at 19.4 ms each, plus the 112^2/56^2 levels).

The ``rbg`` implementation keeps cheap threefry-based ``split``/``fold_in``
key derivation but lowers bit generation to XLA's ``RngBitGenerator``, which
maps to the TPU hardware RNG.  Dropout/augment masks carry no cross-framework
parity requirement (the torch-mirror parity tests run ``dropout_rate=0``), so
trainers default to ``rbg``; ``WUT_PRNG_IMPL=threefry2x32`` restores the JAX
default (e.g. to reproduce an old run's exact mask sequence).

Model/param *init* keys are not routed through here — init randomness is
overwritten by checkpoint loads in every parity path and is not hot.
"""
import os

import jax

_VALID = ("rbg", "unsafe_rbg", "threefry2x32")


def default_impl() -> str:
    impl = os.environ.get("WUT_PRNG_IMPL", "rbg")
    if impl not in _VALID:
        raise ValueError(f"WUT_PRNG_IMPL={impl!r}; expected one of {_VALID}")
    return impl


def train_key(seed: int, impl: str | None = None):
    """Typed PRNG key for train-time randomness (dropout, augmentation)."""
    return jax.random.key(seed, impl=impl or default_impl())
