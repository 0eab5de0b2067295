"""End-to-end HTTP serving throughput on TPU: concurrent clients POSTing
JPEGs to cli/serve.py (in-process server), measuring served images/sec and
request latency percentiles.  This includes everything a deployment pays:
HTTP, JPEG decode (native runtime), micro-batching, device dispatch, JPEG
encode — vs bench.py which measures the pure device forward.

Run: python bench_serve.py   (real TPU; also works on CPU for a smoke run)
"""

import io
import json
import tempfile
import threading
import time
import urllib.request


def main(duration_s: float = 45.0, n_clients: int = 32, size: int = 256):
    import numpy as np

    import jax
    from weather_unet_tpu.cli.serve import build_parser, build_server
    from weather_unet_tpu.train import checkpoint as ckpt
    from weather_unet_tpu.train.gan import GanConfig, build_gan_state

    cfg = GanConfig(input_size=size)
    _, _, state = build_gan_state(cfg, jax.random.key(0))
    cp = tempfile.mktemp(suffix=".pt")
    ckpt.export_torch_gan(cp, {"params": state.gen.params},
                          {"params": state.disc.params,
                           "spectral": state.spectral}, 0, 0)

    args = build_parser().parse_args([
        "--cp_path", cp, "--host", "127.0.0.1", "--port", "0",
        "--input_size", str(size), "--max_batch", "64",
        "--batch_wait_ms", "10", "--bf16"])
    t_warm = time.monotonic()
    server = build_server(args)   # --warmup compiles every pow2 bucket <= 64
    print(json.dumps({"warmup_s": round(time.monotonic() - t_warm, 1)}),
          flush=True)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}/translate?class=2"

    from PIL import Image
    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)).save(
        buf, "JPEG", quality=90)
    jpeg = buf.getvalue()

    # saturate the batcher once so every bucket in between compiles pre-measure
    req = urllib.request.Request(url, data=jpeg, method="POST")
    urllib.request.urlopen(req, timeout=600).read()

    stop = time.monotonic() + duration_s
    lat = []
    lock = threading.Lock()

    def client():
        while time.monotonic() < stop:
            t0 = time.perf_counter()
            try:
                r = urllib.request.Request(url, data=jpeg, method="POST")
                with urllib.request.urlopen(r, timeout=600) as resp:
                    resp.read()
            except OSError:  # transient reset under heavy concurrency
                continue
            dt = time.perf_counter() - t0
            with lock:
                lat.append(dt)

    t_start = time.monotonic()
    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t_start

    lat_ms = np.sort(np.asarray(lat)) * 1e3
    out = {
        "metric": f"served images/sec end-to-end HTTP, {size}^2 bf16",
        "value": round(len(lat) / wall, 1),
        "unit": "images/sec",
        "n_requests": len(lat),
        "clients": n_clients,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
        "p90_ms": round(float(np.percentile(lat_ms, 90)), 1),
        "batcher": server.batcher.stats(),
    }
    print(json.dumps(out))
    server.shutdown()


if __name__ == "__main__":
    main()
