"""HTTP serving tests: micro-batcher numerics + end-to-end server plumbing."""

import io
import threading
import time
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from weather_unet_tpu.api import WeatherTransfer
from weather_unet_tpu.cli.serve import Batcher, build_server, build_parser
from weather_unet_tpu.train import checkpoint as ckpt
from weather_unet_tpu.train.gan import GanConfig, build_gan_state


@pytest.fixture(scope="module")
def cp_path(tmp_path_factory):
    cfg = GanConfig(input_size=32)
    _, _, state = build_gan_state(cfg, jax.random.key(0))
    path = str(tmp_path_factory.mktemp("serve") / "g.pt")
    ckpt.export_torch_gan(path, {"params": state.gen.params},
                          {"params": state.disc.params,
                           "spectral": state.spectral}, 0, 0)
    return path


def test_batcher_groups_and_matches_direct(cp_path, rng):
    """Concurrent submits return exactly the direct API result, and the
    dispatcher groups them into fewer device dispatches than requests."""
    wt = WeatherTransfer.load(cp_path)
    batcher = Batcher(wt, max_batch=8, batch_wait_ms=50.0)

    imgs = rng.integers(0, 255, (6, 32, 32, 3), dtype=np.uint8)
    conds = np.eye(5, dtype=np.float32)[rng.integers(0, 5, 6)]
    results = [None] * 6

    def worker(i):
        results[i] = batcher.submit(imgs[i], conds[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    direct = np.asarray(wt.translate_u8(imgs, conds))
    for i in range(6):
        # grouping may land a request in a different bucket size than the
        # direct batch-6 call; float drift across executables can flip a
        # uint8 rounding boundary, no more
        diff = np.abs(results[i].astype(np.int16) - direct[i].astype(np.int16))
        assert diff.max() <= 1
    stats = batcher.stats()
    assert stats["requests"] == 6
    assert stats["batches"] < 6  # grouping happened
    # pipelined-latency accounting: end-to-end group latency includes
    # queueing behind the previous readback; readback_ms isolates the
    # group's own completion share
    assert stats["readback_ms_p50"] <= stats["batch_ms_p50"] + 1e-6


def test_server_data_parallel(cp_path, rng):
    """--data_parallel serves over the virtual 8-device mesh; a single
    request pads through the bucket path and returns a valid image."""
    from PIL import Image

    args = build_parser().parse_args([
        "--cp_path", cp_path, "--host", "127.0.0.1", "--port", "0",
        "--input_size", "32", "--max_batch", "4", "--no-warmup",
        "--data_parallel"])
    server = build_server(args)
    assert server.transfer.plan is not None
    assert server.transfer.plan.n_data == 8
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            buf, "JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/translate?class=foggy",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            assert Image.open(io.BytesIO(r.read())).size == (32, 32)
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_warmup_compiles_every_bucket(cp_path):
    """Startup warmup must pre-compile each pow2 bucket <= max_batch — a cold
    bucket mid-serving stalls a request group for the full compile."""
    args = build_parser().parse_args([
        "--cp_path", cp_path, "--host", "127.0.0.1", "--port", "0",
        "--input_size", "32", "--max_batch", "4"])   # warmup ON
    server = build_server(args)
    try:
        assert server.transfer._translate_u8._cache_size() == 3  # 1, 2, 4
    finally:
        server.server_close()


def test_warmup_covers_rounded_up_bucket(cp_path):
    """A non-power-of-two --max_batch still warms the bucket a FULL group
    pads into: max_batch=3 groups pad to the 4-bucket, so warmup must
    compile 1, 2 and 4 — a cold top bucket would stall the first full group
    for an entire compile."""
    args = build_parser().parse_args([
        "--cp_path", cp_path, "--host", "127.0.0.1", "--port", "0",
        "--input_size", "32", "--max_batch", "3"])   # warmup ON
    server = build_server(args)
    try:
        assert server.transfer._translate_u8._cache_size() == 3  # 1, 2, 4
    finally:
        server.server_close()


def test_timed_out_request_is_dropped(cp_path):
    """A submit that times out marks its request cancelled; the dispatcher
    must skip it instead of spending a device dispatch on a client that
    already got its 500."""

    class SlowTransfer:
        def __init__(self):
            self.calls = []
            self.release = threading.Event()

        def translate_u8(self, x, c):
            self.calls.append(x.shape[0])
            assert self.release.wait(30)
            return np.zeros_like(x)

    st = SlowTransfer()
    batcher = Batcher(st, max_batch=4, batch_wait_ms=1.0, timeout_s=0.5)
    errs = {}

    def worker(name, img):
        try:
            batcher.submit(img, np.zeros(5, np.float32))
        except Exception as e:
            errs[name] = e

    a = threading.Thread(target=worker,
                         args=("a", np.zeros((8, 8, 3), np.uint8)))
    a.start()
    deadline = time.monotonic() + 10
    while not st.calls and time.monotonic() < deadline:
        time.sleep(0.01)
    assert st.calls == [1]          # dispatcher is busy processing A
    b = threading.Thread(target=worker,
                         args=("b", np.zeros((8, 8, 3), np.uint8)))
    b.start()
    b.join(timeout=10)              # B times out while A holds the device
    assert isinstance(errs.get("b"), TimeoutError)
    st.release.set()                # let A finish; dispatcher drains queue
    a.join(timeout=10)
    assert isinstance(errs.get("a"), TimeoutError)  # A's client gave up too
    time.sleep(0.3)                 # give the dispatcher a chance to (not) run B
    assert st.calls == [1]          # cancelled B was never dispatched


def test_batcher_pipelines_dispatch_and_readback():
    """Group k+1 must be DISPATCHED while group k's readback is still in
    flight — the two-stage pipeline hides host D2H + distribution time
    behind the next group's device compute (serve.py Batcher docstring)."""
    log = []

    class LazyOut:                       # stands in for a jax device array
        def __init__(self, i):
            self.i = i

        def __array__(self, dtype=None, copy=None):
            log.append(("readback_start", self.i))
            time.sleep(0.25)             # D2H window the pipeline must hide
            log.append(("readback_end", self.i))
            return np.zeros((1, 8, 8, 3), np.uint8)

    class AsyncTransfer:
        def __init__(self):
            self.n = 0

        def translate_u8(self, x, c):
            self.n += 1
            log.append(("dispatch", self.n))
            return LazyOut(self.n)

    batcher = Batcher(AsyncTransfer(), max_batch=1, batch_wait_ms=1.0)
    threads = [threading.Thread(
        target=batcher.submit,
        args=(np.zeros((8, 8, 3), np.uint8), np.zeros(5, np.float32)))
        for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert ("dispatch", 2) in log and ("readback_end", 1) in log
    assert log.index(("dispatch", 2)) < log.index(("readback_end", 1))
    assert batcher.stats()["requests"] == 3


def test_batcher_surfaces_errors(cp_path):
    wt = WeatherTransfer.load(cp_path)
    batcher = Batcher(wt, max_batch=2, batch_wait_ms=1.0)
    with pytest.raises(RuntimeError):
        batcher.submit(np.zeros((32, 32, 3), np.float32),
                       np.zeros(7, np.float32))  # wrong condition width


def test_http_server_end_to_end(cp_path, rng):
    from PIL import Image

    # warmup ON: compiles happen before traffic (the production posture) so
    # request timeouts don't race a jit compile on a loaded CI core
    args = build_parser().parse_args([
        "--cp_path", cp_path, "--host", "127.0.0.1", "--port", "0",
        "--input_size", "32", "--max_batch", "4"])
    server = build_server(args)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert r.status == 200
            assert b'"status": "ok"' in r.read()

        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            buf, "JPEG")
        jpeg = buf.getvalue()

        req = urllib.request.Request(f"{base}/translate?class=sunny", data=jpeg,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            assert r.headers["Content-Type"] == "image/jpeg"
            out = Image.open(io.BytesIO(r.read()))
            assert out.size == (32, 32)

        # soft-signal condition vector
        req = urllib.request.Request(
            f"{base}/translate?cond=0.1,-0.2,0.3,0.0,1.0", data=jpeg,
            method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200

        # bad condition -> 400, bad route -> 404
        req = urllib.request.Request(f"{base}/translate?cond=1,2", data=jpeg,
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/nope", timeout=30)
        assert e.value.code == 404

        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            assert r.status == 200

        # /profile is an operator opt-in: without --profile_dir it must
        # refuse (it writes files and ties up a handler thread)
        req = urllib.request.Request(f"{base}/profile?seconds=0.2", data=b"",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 403
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_serve_from_export_artifact(cp_path, rng, tmp_path):
    """--artifact serves a frozen StableHLO export: HTTP responses match the
    checkpoint-backed server's numerics, manifest metadata overrides CLI
    size/class defaults, and contradictory flags are refused."""
    from PIL import Image

    from weather_unet_tpu.cli.common import load_transfer
    from weather_unet_tpu.core.export import export_transfer, save_artifact

    model, variables = load_transfer(cp_path)
    art = str(tmp_path / "art")
    save_artifact(art, export_transfer(model, variables, size=32),
                  extra={"input_size": 32, "num_classes": 5})

    # flags whose value was baked in at export time must be rejected
    for bad in (["--bf16"], ["--aot_cache", str(tmp_path / "aot")]):
        with pytest.raises(SystemExit):
            build_server(build_parser().parse_args(
                ["--artifact", art, "--no-warmup"] + bad))
    with pytest.raises(SystemExit):  # exactly one model source
        build_server(build_parser().parse_args(
            ["--cp_path", cp_path, "--artifact", art]))

    args = build_parser().parse_args([
        "--artifact", art, "--host", "127.0.0.1", "--port", "0",
        "--max_batch", "2", "--input_size", "999"])  # manifest wins over 999
    server = build_server(args)
    assert args.input_size == 32
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        u8 = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(u8).save(buf, "JPEG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/translate?class=sunny",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            got = np.asarray(Image.open(io.BytesIO(r.read())))
        # same request through the live model (identical decode + resize):
        # JPEG re-encode at the response boundary is the only lossy step,
        # so compare against the re-encoded live result
        from weather_unet_tpu.api import WeatherTransfer
        from weather_unet_tpu.cli.serve import _decode_resize

        x = _decode_resize(buf.getvalue(), 32)[None]
        want8 = np.asarray(WeatherTransfer.load(cp_path).translate_u8(
            x, np.eye(5, dtype=np.float32)[:1]))[0]
        wbuf = io.BytesIO()
        Image.fromarray(want8).save(wbuf, "JPEG", quality=95)
        want = np.asarray(Image.open(wbuf))
        assert np.abs(got.astype(np.int16) - want.astype(np.int16)).max() <= 1
    finally:
        server.shutdown()
        thread.join(timeout=10)
