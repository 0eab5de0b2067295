"""tools/parse_xplane.py: the in-process trace reader used for the kernel
studies (docs/UPSAMPLE_STUDY.md round-3 addendum, docs/PERF.md).  The tunnel
TPU has no TensorBoard; this tool is how every xplane trace in the perf docs
was read, so its parse path is pinned here against a real (CPU) trace."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp

TOOL = os.path.join(os.path.dirname(__file__), os.pardir, "tools",
                    "parse_xplane.py")


def _make_trace(tmp_path):
    tdir = str(tmp_path / "trace")

    @jax.jit
    def f(a, b):
        return jnp.tanh(a @ b)

    a = jnp.ones((256, 256), jnp.float32)
    f(a, a).block_until_ready()  # compile outside the trace window
    jax.profiler.start_trace(tdir)
    f(a, a).block_until_ready()
    jax.profiler.stop_trace()
    return tdir


def _run(*args):
    out = subprocess.run([sys.executable, TOOL, *args],
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    return out.stdout


def test_parse_xplane_lists_and_aggregates(tmp_path):
    tdir = _make_trace(tmp_path)

    listing = _run(tdir, "--list")
    assert ".xplane.pb" in listing
    # CPU traces put XLA execution on host lines; --list must surface them
    assert "/host:CPU" in listing

    report = _run(tdir, "--plane", "/host:CPU", "--line", "tf_XLA", "--top", "5")
    assert "busy=" in report and "occupancy=" in report
    assert "-- by category --" in report and "-- top 5 ops --" in report


def test_parse_xplane_empty_dir_exits_nonzero(tmp_path):
    out = subprocess.run([sys.executable, TOOL, str(tmp_path)],
                         capture_output=True, text=True, timeout=60)
    assert out.returncode != 0
    assert "no *.xplane.pb" in out.stderr
