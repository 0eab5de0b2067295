"""HTTP inference server for weather transfer — the serving surface the
reference lacks (its L5 layer is batch scripts only; SURVEY.md §1).

Endpoints:
  GET  /healthz    liveness + device + request counters (JSON)
  GET  /stats      batch-latency percentiles and batching behavior (JSON)
  POST /translate  body = JPEG/PNG bytes; condition from the query string:
                     ?class=sunny           one-hot over ``--classes``
                     ?class=2               one-hot by index
                     ?cond=0.1,-0.3,...     raw soft-signal vector
                   response: image/jpeg, the translated image.

Requests are micro-batched: a dispatcher thread drains the queue for up to
``--batch_wait_ms`` (or ``--max_batch`` requests) and issues ONE device
dispatch for the group; the library API's power-of-two bucketing keeps the
number of compiled executables logarithmic in batch size.  Image decode and
resize happen host-side with PIL — the same library the reference's test
transform drives (torchvision ``Resize`` on PIL inputs), so serving
preprocessing matches the reference's eval path.

Usage: python -m weather_unet_tpu.cli.serve --cp_path cp.pt --port 8000
       python -m weather_unet_tpu.cli.serve --artifact art/ --port 8000
                                   (frozen StableHLO export, core/export.py)
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from weather_unet_tpu.data.datasets import WEATHER_CLASSES_I2W


@dataclass
class _Request:
    image: np.ndarray                      # (H, W, 3) uint8
    cond: np.ndarray                       # (num_classes,) float32
    event: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None    # (H, W, 3) uint8
    error: Optional[str] = None
    cancelled: bool = False                # client gave up (submit timeout)


class Batcher:
    """Queue + two-stage pipeline: groups concurrent requests into one
    device dispatch (the TPU analogue of the reference's DataLoader batching,
    applied at serving time).

    Dispatch and completion are separate threads so the device computes
    group k+1 while the host reads back / distributes group k — dispatch is
    async in JAX, and the D2H readback (25 MB at B=128, plus the tunnel RTT)
    is exactly the window the next group's forward can hide in.  One group
    in flight beyond the one completing (``pipeline_depth=2``): deeper
    pipelines only add latency, and the blocked dispatch thread doubles as
    backpressure that grows the next group (better batching under load).
    """

    def __init__(self, transfer, max_batch: int = 16, batch_wait_ms: float = 5.0,
                 timeout_s: float = 300.0, pipeline_depth: int = 2):
        self.transfer = transfer
        self.max_batch = max_batch
        self.batch_wait_s = batch_wait_ms / 1e3
        self.timeout_s = timeout_s
        self.queue: "queue.Queue[_Request]" = queue.Queue()
        # (group, device_out, error, t0) tuples; maxsize = extra groups in
        # flight — put() blocking on a full queue is the backpressure
        self._inflight: "queue.Queue[tuple]" = queue.Queue(
            maxsize=max(1, pipeline_depth - 1))
        self.lock = threading.Lock()
        self.n_requests = 0
        self.n_batches = 0
        self.batch_sizes: list = []
        self.batch_ms: list = []
        self.readback_ms: list = []
        self._dispatcher = threading.Thread(target=self._dispatch_loop,
                                            daemon=True)
        self._completer = threading.Thread(target=self._complete_loop,
                                           daemon=True)
        self._dispatcher.start()
        self._completer.start()

    def submit(self, image: np.ndarray, cond: np.ndarray) -> np.ndarray:
        req = _Request(image=image, cond=cond)
        self.queue.put(req)
        if not req.event.wait(self.timeout_s):
            # mark abandoned so the dispatcher drops it from its group
            # instead of spending a device dispatch on a request whose
            # client already got a 500
            req.cancelled = True
            raise TimeoutError("translation timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    def _dispatch_loop(self):
        while True:
            first = self.queue.get()
            group = [first]
            deadline = time.monotonic() + self.batch_wait_s
            while len(group) < self.max_batch:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                try:
                    group.append(self.queue.get(timeout=remaining))
                except queue.Empty:
                    break
            group = [r for r in group if not r.cancelled]
            if not group:
                continue
            t0 = time.perf_counter()
            out = err = None
            try:
                x = np.stack([r.image for r in group])
                c = np.stack([r.cond for r in group])
                # async dispatch: returns a DEVICE array; the completion
                # thread pays the readback while this thread batches and
                # dispatches the next group
                out = self.transfer.translate_u8(x, c)
            except Exception as e:  # surface per-request, keep serving
                err = f"{type(e).__name__}: {e}"
            self._inflight.put((group, out, err, t0))

    def _complete_loop(self):
        while True:
            group, out, err, t0 = self._inflight.get()
            t1 = time.perf_counter()
            if err is None:
                try:
                    host = np.asarray(out)     # blocks: compute + D2H
                    for i, r in enumerate(group):
                        r.result = host[i]
                except Exception as e:
                    err = f"{type(e).__name__}: {e}"
            if err is not None:
                for r in group:
                    r.error = err
            now = time.perf_counter()
            # batch_ms = dispatch -> responses ready.  Under pipelined load
            # this INCLUDES time queued behind the previous group's readback
            # (true end-to-end group latency); readback_ms isolates this
            # group's own compute-completion + D2H + distribution cost.
            dt_ms = (now - t0) * 1e3
            rb_ms = (now - t1) * 1e3
            with self.lock:
                self.n_requests += len(group)
                self.n_batches += 1
                self.batch_sizes.append(len(group))
                self.batch_ms.append(dt_ms)
                self.readback_ms.append(rb_ms)
                if len(self.batch_ms) > 1000:
                    self.batch_ms.pop(0)
                    self.batch_sizes.pop(0)
                    self.readback_ms.pop(0)
            for r in group:
                r.event.set()

    def stats(self) -> dict:
        with self.lock:
            ms = np.asarray(self.batch_ms) if self.batch_ms else np.zeros(1)
            rb = (np.asarray(self.readback_ms) if self.readback_ms
                  else np.zeros(1))
            sizes = self.batch_sizes[:]
            return {
                "requests": self.n_requests,
                "batches": self.n_batches,
                "mean_batch_size": float(np.mean(sizes)) if sizes else 0.0,
                # dispatch -> responses ready (includes pipeline queueing)
                "batch_ms_p50": float(np.percentile(ms, 50)),
                "batch_ms_p90": float(np.percentile(ms, 90)),
                # this group's own completion+D2H+distribute share
                "readback_ms_p50": float(np.percentile(rb, 50)),
            }


def _parse_condition(qs: dict, classes, num_classes: int) -> np.ndarray:
    """?class=<name|index> -> one-hot; ?cond=f,f,... -> raw vector."""
    if "cond" in qs:
        vec = np.asarray([float(v) for v in qs["cond"][0].split(",")],
                         np.float32)
        if vec.shape != (num_classes,):
            raise ValueError(
                f"cond needs {num_classes} comma-separated floats, got {vec.shape[0]}")
        return vec
    if "class" in qs:
        raw = qs["class"][0]
        idx = int(raw) if raw.lstrip("-").isdigit() else classes.index(raw)
        if not 0 <= idx < num_classes:
            raise ValueError(f"class index {idx} out of range [0, {num_classes})")
        return np.eye(num_classes, dtype=np.float32)[idx]
    raise ValueError("missing condition: pass ?class=<name|index> or ?cond=...")


def _decode_resize(body: bytes, size: int) -> np.ndarray:
    """JPEG/PNG bytes -> (size, size, 3) uint8 (normalization happens inside
    the jitted forward — ``translate_u8`` — so the wire stays uint8).

    JPEGs go through the native runtime when built (GIL-free libjpeg decode
    with DCT-domain downscale — the same path the training datasets use);
    PNG/odd inputs fall back to PIL (the reference test transform's own
    backend)."""
    from weather_unet_tpu import runtime

    arr = runtime.decode_bytes(body, size)
    if arr is None:
        from PIL import Image

        img = Image.open(io.BytesIO(body)).convert("RGB")
        if img.size != (size, size):
            img = img.resize((size, size), Image.BILINEAR)
        arr = np.asarray(img)
    return arr


def make_handler(batcher: Batcher, classes, num_classes: int, size: int,
                 quality: int = 95, profile_dir: Optional[str] = None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet by default; /stats has the data
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                import jax

                self._json(200, {"status": "ok",
                                 "device": str(jax.devices()[0]),
                                 **batcher.stats()})
            elif path == "/stats":
                self._json(200, batcher.stats())
            else:
                self._json(404, {"error": f"no route {path}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path == "/profile":
                # capture a jax.profiler trace of live traffic (TensorBoard/
                # Perfetto-viewable) — the observability hook the reference
                # lacks (SURVEY.md §5).  Off unless --profile_dir is set:
                # the endpoint writes files and blocks a handler thread, so
                # it must be an explicit operator opt-in, and traces only
                # ever land under the server-configured directory (a ?dir=
                # query arg is ignored — no client-chosen write paths).
                if profile_dir is None:
                    self._json(403, {"error": "profiling disabled; start the "
                                              "server with --profile_dir"})
                    return
                try:
                    seconds = float(parse_qs(url.query).get("seconds", ["3"])[0])
                    seconds = min(max(seconds, 0.1), 60.0)
                    import jax

                    jax.profiler.start_trace(profile_dir)
                    time.sleep(seconds)
                    jax.profiler.stop_trace()
                    self._json(200, {"trace_dir": profile_dir,
                                     "seconds": seconds})
                except Exception as e:
                    self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            if url.path != "/translate":
                self._json(404, {"error": f"no route {url.path}"})
                return
            try:
                cond = _parse_condition(parse_qs(url.query), classes, num_classes)
                length = int(self.headers.get("Content-Length", 0))
                if not 0 < length <= 64 * 1024 * 1024:
                    raise ValueError("bad Content-Length")
                image = _decode_resize(self.rfile.read(length), size)
            except Exception as e:
                self._json(400, {"error": str(e)})
                return
            try:
                out = batcher.submit(image, cond)
            except Exception as e:
                self._json(500, {"error": str(e)})
                return
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(out).save(buf, "JPEG", quality=quality)
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/jpeg")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def build_server(args) -> ThreadingHTTPServer:
    import jax.numpy as jnp

    from weather_unet_tpu.api import WeatherTransfer

    if bool(args.cp_path) == bool(args.artifact):
        raise SystemExit("pass exactly one of --cp_path or --artifact")
    if args.artifact:
        # frozen deployment snapshot: dtype/mesh/AOT choices were made at
        # export time and live inside the module — flags that would contradict
        # the artifact are rejected rather than silently ignored
        for flag, name in ((args.bf16, "--bf16"),
                           (args.data_parallel, "--data_parallel"),
                           (args.tensor_parallel > 1, "--tensor_parallel"),
                           (args.aot_cache, "--aot_cache")):
            if flag:
                raise SystemExit(f"{name} does not apply to --artifact "
                                 "serving (baked in at export time)")
        from weather_unet_tpu.core.export import ExportedTransfer

        wt = ExportedTransfer(args.artifact)
        # manifest metadata wins over CLI defaults; a deliberate override
        # of a recorded value is a misconfiguration, not a preference
        if wt.num_classes:
            args.num_classes = wt.num_classes
        if wt.input_size:
            args.input_size = wt.input_size
    else:
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        plan = None
        tp = max(args.tensor_parallel, 1)
        if args.data_parallel or tp > 1:
            from weather_unet_tpu.parallel.mesh import make_mesh

            # params replicated once, batches over 'data'; with
            # --tensor_parallel the 'model' axis channel-shards the conv
            # weights (parallel/tp.py)
            plan = make_mesh(model=tp)
        wt = WeatherTransfer.load(args.cp_path, num_classes=args.num_classes,
                                  dtype=dtype, plan=plan,
                                  tensor_parallel=tp > 1,
                                  aot_cache=args.aot_cache)
    batcher = Batcher(wt, max_batch=args.max_batch,
                      batch_wait_ms=args.batch_wait_ms)
    if args.warmup:
        # Compile EVERY power-of-two bucket a request group can land in
        # before accepting traffic — a cold bucket hit mid-serving stalls a
        # whole request group for the compile time (minutes on a tunneled
        # TPU; measured in bench_serve.py).  Groups go up to max_batch and
        # the API pads to the NEXT power of two, so with a non-pow2
        # max_batch (e.g. 24) the top bucket is the rounded-UP one (32).
        z = np.zeros((args.input_size, args.input_size, 3), np.uint8)
        e0 = np.eye(args.num_classes, dtype=np.float32)[0]
        top = 1 << max(args.max_batch - 1, 0).bit_length()
        bs = 1
        while bs <= top:
            wt.translate_u8(np.tile(z, (bs, 1, 1, 1)), np.tile(e0, (bs, 1)))
            bs <<= 1
    if wt.aot is not None:
        s = wt.aot.stats
        print(f"aot cache: {s['hits']} loaded from disk "
              f"({s['load_s']:.1f}s), {s['misses']} compiled "
              f"({s['compile_s']:.1f}s)")
    handler = make_handler(batcher, args.classes, args.num_classes,
                           args.input_size, profile_dir=args.profile_dir)
    server = ThreadingHTTPServer((args.host, args.port), handler)
    server.batcher = batcher     # exposed for tests/inspection
    server.transfer = wt
    return server


def build_parser():
    p = argparse.ArgumentParser(description="cUNet weather-transfer HTTP server")
    p.add_argument("--cp_path", type=str, default=None,
                   help="checkpoint to serve (msgpack or reference .pt)")
    p.add_argument("--artifact", type=str, default=None,
                   help="serve a frozen StableHLO export artifact directory "
                        "(wut-export-serving) instead of a checkpoint — no "
                        "model code or weights on the serving host")
    p.add_argument("--host", type=str, default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--num_classes", type=int, default=5)
    p.add_argument("--classes", nargs="*", default=WEATHER_CLASSES_I2W)
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--batch_wait_ms", type=float, default=5.0)
    p.add_argument("--bf16", action="store_true",
                   help="serve in bfloat16 (measured drift 9.4e-4 MAE)")
    p.add_argument("--data_parallel", action="store_true",
                   help="serve over all visible devices (batch sharded on the "
                        "mesh 'data' axis, params replicated)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="channel-shard conv weights K-way over the mesh "
                        "'model' axis (Megatron column/row split per double "
                        "conv — parallel/tp.py); remaining devices form the "
                        "'data' axis. Latency-oriented layout for multi-chip "
                        "hosts")
    p.add_argument("--no-warmup", dest="warmup", action="store_false")
    p.add_argument("--aot_cache", type=str, default=None,
                   help="directory for serialized compiled executables; a "
                        "server restart then loads every warmed batch bucket "
                        "from disk instead of re-paying XLA compilation "
                        "(core/aot.py)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="enable POST /profile and write jax.profiler traces "
                        "under this directory (client-supplied paths are "
                        "never honored); omit to disable the endpoint")
    p.add_argument("--gpu", type=str, default=None,
                   help="accepted for reference CLI parity; ignored on TPU")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    server = build_server(args)
    print(f"serving on {args.host}:{args.port} "
          f"(max_batch={args.max_batch}, wait={args.batch_wait_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
