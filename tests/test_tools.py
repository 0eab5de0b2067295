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


def test_hlo_fusion_map_classifies_anonymous_fusions():
    """load_hlo_fusion_map must classify %fusion.N by its computation BODY
    (xplane names alone file everything under 'fusion'), and
    categorize_with_hlo must apply the map only to fusion events."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("parse_xplane", TOOL)
    px = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(px)

    hlo = """\
HloModule jit_step_fn

%fused_computation.1 (p0: bf16[8,8,3], p1: bf16[3,3,3,4]) -> bf16[8,8,4] {
  %p0 = bf16[8,8,3] parameter(0)
  %p1 = bf16[3,3,3,4] parameter(1)
  %convolution.7 = bf16[8,8,4] convolution(%p0, %p1), window={size=3x3}
  ROOT %add.1 = bf16[8,8,4] add(%convolution.7, %convolution.7)
}

%fused_computation.2 (p0: f32[64]) -> f32[64] {
  %p0 = f32[64] parameter(0)
  ROOT %multiply.3 = f32[64] multiply(%p0, %p0)
}

ENTRY %main (a: bf16[8,8,3]) -> bf16[8,8,4] {
  %a = bf16[8,8,3] parameter(0)
  %fusion.10 = bf16[8,8,4] fusion(%a), kind=kOutput, calls=%fused_computation.1
  %fusion.11 = f32[64] fusion(), kind=kLoop, calls=%fused_computation.2
  ROOT %r = bf16[8,8,4] copy(%fusion.10)
}
"""
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".hlo.txt",
                                     delete=False) as f:
        f.write(hlo)
        hlo_path = f.name
    try:
        fmap = px.load_hlo_fusion_map(hlo_path)
    finally:
        os.unlink(hlo_path)
    assert fmap["fusion.10"] == "convolution (fused)"
    assert fmap["fusion.11"] == "elementwise (fused)"

    ev_conv = "%fusion.10 = bf16[8,8,4]{2,1,0:T(8,128)} fusion(%copy-done.3)"
    ev_elem = "%fusion.11 = f32[64]{0:T(128)} fusion(%convert.9)"
    ev_copy = "%copy.5 = f32[64]{0:T(128)} copy(%fusion.11)"
    assert px.categorize_with_hlo(ev_conv, fmap) == "convolution (fused)"
    assert px.categorize_with_hlo(ev_elem, fmap) == "elementwise (fused)"
    assert px.categorize_with_hlo(ev_copy, fmap) == "copy/relayout"
    # operand text must NOT leak into the category (the old bug)
    assert px.categorize(ev_copy) == "copy/relayout"
    assert px.categorize(ev_conv) == "fusion"


def test_bench_scripts_import_cleanly():
    """Every bench_*.py (and bench.py, the driver contract) must at least
    import: they are run rarely and on real TPU hardware, so plain bitrot
    (renamed APIs, moved modules) should be caught by the CPU suite, not by
    a failed driver run."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scripts = sorted(
        os.path.join(repo, p) for p in os.listdir(repo)
        if p == "bench.py" or (p.startswith("bench_") and p.endswith(".py")))
    assert len(scripts) >= 10
    ex_dir = os.path.join(repo, "examples")
    scripts += sorted(
        os.path.join(ex_dir, p) for p in os.listdir(ex_dir)
        if p.endswith(".py"))            # user-facing examples rot the same way
    for path in scripts:
        spec = importlib.util.spec_from_file_location(
            os.path.basename(path)[:-3], path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)     # __main__-guarded: no device work


def test_tpu_runthrough_cpu_smoke(tmp_path):
    """tools/tpu_runthrough.py --cpu: the README-advertised scripted user
    pipeline (train -> infer -> eval as REAL subprocesses) completes against
    the CPU backend, chaining the training run's own checkpoint (the
    on-device variant of test_cli_integration's in-process chain).  ~90 s:
    three backend inits + a 2-step 32^2 GAN epoch on one core."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "tpu_runthrough.py"),
         "--cpu", "--workdir", str(tmp_path / "run")],
        capture_output=True, text=True, timeout=1500, cwd=repo,
        env={k: v for k, v in os.environ.items() if k != "XLA_FLAGS"})
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["translated_images"] == 15
    assert set(summary["stages_s"]) == {"train", "infer", "eval"}
    assert (tmp_path / "run" / "ev" / "cm.pkl").exists()


def test_tpu_runthrough_refuses_reused_workdir(tmp_path):
    """A reused --workdir must be refused up front (before any backend
    work): the trainer auto-resumes from the previous run's terminal
    checkpoint, so a rerun would train zero steps and report a hollow
    train wall time (round-5 review finding)."""
    import importlib.util

    import pytest

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "tpu_runthrough", os.path.join(repo, "tools", "tpu_runthrough.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    (tmp_path / "old" / "cp").mkdir(parents=True)
    with pytest.raises(SystemExit, match="already holds run artifacts"):
        mod.main(["--cpu", "--workdir", str(tmp_path / "old")])


def test_bench_main_emits_exactly_one_stdout_line(monkeypatch, capsys):
    """bench.py's driver contract is EXACTLY one stdout JSON line; library
    prints reached by the probes (trainer NaN warning, cache-disabled note)
    must land on stderr via main()'s redirect shield (review finding,
    round 5)."""
    import importlib.util
    import json as _json
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(repo, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    def noisy_measure():
        print("library progress line")          # must NOT reach stdout
        print("warning: something", file=sys.stderr)
        return {"metric": "m", "value": 1.0}

    monkeypatch.setattr(bench, "_measure", noisy_measure)
    bench.main()
    cap = capsys.readouterr()
    lines = [ln for ln in cap.out.splitlines() if ln]
    assert len(lines) == 1, lines
    assert _json.loads(lines[0])["metric"] == "m"
    assert "library progress line" in cap.err
