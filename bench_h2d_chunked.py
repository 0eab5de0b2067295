"""Phase-alternated H2D: stage a chunk of batches with the dispatch stream
EMPTY, then dispatch that chunk's steps with NO concurrent transfers.

Hypothesis from bench_h2d_discipline.py + the isolated probes: transfers
interleaved with computation dispatches collapse to ~25-65 MB/s on the
tunnel, while transfer-only windows sustain ~1.5 GB/s.  If true, strict
phase alternation recovers most of the device-staged throughput at the cost
of an idle device during the (fast) transfer phase.

Measures a realistic ~compute-heavy step with per-step fresh uint8 batches:
  C  async depth-2 prefetch       (device_prefetch today)
  E  chunked: put 2k arrays, ready ALL, then k dispatches, repeat
for k in {2, 4, 8}.
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
        a = (x.astype(jnp.bfloat16) / 255.0).reshape(batch, -1)
        m = a[:, :4096].T @ a[:, :4096]
        for _ in range(40):           # ~heavier step, O(100 ms)
            m = jnp.tanh(m @ m)
        return jnp.sum(m) + jnp.sum(y)

    rng = np.random.default_rng(0)
    batches = [(rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8),
                rng.standard_normal((batch, 5)).astype(np.float32))
               for _ in range(8)]

    dev0 = tuple(jax.device_put(a) for a in batches[0])
    out = step(*dev0)
    float(out)

    results = {}

    # floor: device staged
    t0 = time.perf_counter()
    o = None
    for i in range(n):
        o = step(*dev0)
    float(o)
    step_s = (time.perf_counter() - t0) / n
    results["step_ms"] = round(step_s * 1e3, 1)
    results["A_device_staged"] = round(batch / step_s, 1)

    # C: async depth-2 (device_prefetch behavior)
    import collections
    q = collections.deque()
    t0 = time.perf_counter()
    for i in range(n):
        while len(q) < 2 and i + len(q) < n:
            j = i + len(q)
            q.append(tuple(jax.device_put(a) for a in batches[j % 8]))
        o = step(*q.popleft())
    float(o)
    results["C_async_depth2"] = round(batch * n / (time.perf_counter() - t0), 1)

    # E: strict phase alternation
    for k in (2, 4, 8):
        t0 = time.perf_counter()
        done = 0
        while done < n:
            m = min(k, n - done)
            staged = [tuple(jax.device_put(a) for a in batches[(done + j) % 8])
                      for j in range(m)]
            for s in staged:          # ready ALL before any dispatch
                for a in s:
                    a.block_until_ready()
            for s in staged:
                o = step(*s)
            float(o)                  # drain the chunk's dispatches
            done += m
        results[f"E_chunk{k}"] = round(batch * n / (time.perf_counter() - t0), 1)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
