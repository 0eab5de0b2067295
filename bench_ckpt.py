"""Checkpoint-save stall: synchronous save vs AsyncCheckpointer on the real
GAN train state (G + D params, optimizer moments, spectral vectors — the
exact tree the trainer writes every 1000 steps).

The number that matters is the CALLER-VISIBLE stall: sync `save_checkpoint`
blocks the step loop for the full D2H read + msgpack + write; async `save()`
returns after dispatching device-side copies, and the D2H/serialize/write
happen on the checkpointer thread while training continues.  `wait()` time
is reported for completeness (it bounds the preemption grace window needed).
"""

import json
import tempfile
import time

import jax
import jax.numpy as jnp

from weather_unet_tpu.core.profiling import enable_compilation_cache
from weather_unet_tpu.train import checkpoint as ckpt
from weather_unet_tpu.train.gan import GanConfig, build_gan_state

enable_compilation_cache()


def main():
    cfg = GanConfig(input_size=224, batch_size=8)
    _, _, state = build_gan_state(cfg, jax.random.key(0))
    state = jax.device_put(state)
    jax.block_until_ready(jax.tree.leaves(state.gen.params)[0])
    nbytes = sum(getattr(x, "nbytes", 0) for x in jax.tree.leaves(state))
    tmp = tempfile.mkdtemp()

    # sync: what the loop used to pay at every cadence save
    t0 = time.perf_counter()
    ckpt.save_checkpoint(tmp, "sync", 1, state)
    t_sync = time.perf_counter() - t0

    with ckpt.AsyncCheckpointer() as ac:
        t0 = time.perf_counter()
        ac.save(tmp, "async", 1, state)
        t_return = time.perf_counter() - t0     # the loop's stall now
        ac.wait()
        t_total = time.perf_counter() - t0

        # second save: steady state (worker warm, dir exists)
        t0 = time.perf_counter()
        ac.save(tmp, "async", 2, state)
        t_return2 = time.perf_counter() - t0
        ac.wait()
        t_total2 = time.perf_counter() - t0

    print(json.dumps({
        "state_mb": round(nbytes / 1e6, 1),
        "sync_save_s": round(t_sync, 3),
        "async_return_s": round(t_return, 4),
        "async_total_s": round(t_total, 3),
        "async_return2_s": round(t_return2, 4),
        "async_total2_s": round(t_total2, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
