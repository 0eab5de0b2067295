"""Which H2D staging discipline keeps the tunnel fast while steps dispatch?

bench_trainer_realdiag.py isolated the real-data trainer bottleneck to the
numpy->device path: device-staged epochs run 286-335 img/s, identical
epochs fed in-memory NUMPY batches run 32 img/s — the transfers crawl once
the dispatch stream is busy.  This measures a cheap jitted step (so compute
doesn't dominate) against four disciplines:

  A fixed device args                      (floor, no transfers)
  B put + block_until_ready, then dispatch (serialized, full-bandwidth)
  C async puts queued 2 deep               (device_prefetch today)
  D numpy passed directly as step args     (transfer fused into dispatch)
"""

import json
import time

import numpy as np


def main(batch=128, size=224, n=16):
    import jax
    import jax.numpy as jnp

    from weather_unet_tpu.core.profiling import enable_compilation_cache

    enable_compilation_cache()

    @jax.jit
    def step(x, y):
        # ~40 ms of real compute at B=128: a few big matmuls over the batch
        a = (x.astype(jnp.bfloat16) / 255.0).reshape(batch, -1)
        m = a[:, :4096].T @ a[:, :4096]
        for _ in range(3):
            m = jnp.tanh(m @ m)
        return jnp.sum(m) + jnp.sum(y)

    rng = np.random.default_rng(0)
    batches = [(rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8),
                rng.standard_normal((batch, 5)).astype(np.float32))
               for _ in range(4)]

    dev = [tuple(jax.device_put(a) for a in b) for b in batches]
    out = step(*dev[0])
    float(out)
    results = {}

    def run(feed):
        t0 = time.perf_counter()
        o = None
        for i in range(n):
            o = feed(i)
        float(o)
        dt = (time.perf_counter() - t0) / n
        return round(batch / dt, 1)

    results["A_device_staged"] = run(lambda i: step(*dev[i % 4]))

    def b_feed(i):
        x = jax.device_put(batches[i % 4][0])
        y = jax.device_put(batches[i % 4][1])
        x.block_until_ready()
        y.block_until_ready()
        return step(x, y)

    results["B_put_ready_dispatch"] = run(b_feed)

    import collections
    q = collections.deque()

    def c_feed(i):
        while len(q) < 2 and len(q) < n - i + 1:
            j = i + len(q)
            q.append(tuple(jax.device_put(a) for a in batches[j % 4]))
        args = q.popleft()
        return step(*args)

    results["C_async_depth2"] = run(c_feed)

    results["D_numpy_args"] = run(lambda i: step(*batches[i % 4]))

    results["A_again"] = run(lambda i: step(*dev[i % 4]))
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
