"""Real multi-process (multi-host emulation) tests.

``parallel/launch.py`` spawns 2 OS processes, each with 4 virtual CPU
devices, joined by ``jax.distributed`` into one 8-device runtime with gloo
cross-process collectives — the closest a single node gets to validating
the multi-host path (DCN seam, SURVEY.md §2.9) without a pod.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from weather_unet_tpu.parallel import launch

WORKER = os.path.join(os.path.dirname(__file__), "mp_worker.py")


def _write_jpegs(d, n):
    """n deterministic 64x64 JPEGs for the shared decode-cache section."""
    from PIL import Image

    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(42)
    for i in range(n):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
            d / f"{i:02d}.jpg", quality=92)
    return d


def test_process_slice_single_process():
    # single-process: the slice is the whole batch
    assert launch.process_slice(16) == slice(0, 16)


def test_is_multiprocess_env(monkeypatch):
    monkeypatch.delenv("WUT_NUM_PROCESSES", raising=False)
    assert not launch.is_multiprocess()
    monkeypatch.setenv("WUT_NUM_PROCESSES", "2")
    assert launch.is_multiprocess()


def test_cpu_devices_overrides_existing_xla_flag(monkeypatch):
    """WUT_CPU_DEVICES must WIN over a pre-existing host-device-count in
    XLA_FLAGS (the test/verify shells export =8): appending-if-absent left
    spawned ranks with the wrong device count and a misleading make_mesh
    divisibility failure downstream."""
    monkeypatch.setenv(
        "XLA_FLAGS",
        "--xla_force_host_platform_device_count=8 --xla_cpu_foo=1")
    monkeypatch.setenv("WUT_CPU_DEVICES", "4")
    monkeypatch.setenv("WUT_NUM_PROCESSES", "1")
    assert launch.maybe_initialize() is False
    flags = os.environ["XLA_FLAGS"]
    assert "--xla_force_host_platform_device_count=4" in flags
    assert "--xla_force_host_platform_device_count=8" not in flags
    assert "--xla_cpu_foo=1" in flags   # unrelated flags preserved


def test_barrier_timeout_env(monkeypatch):
    """WUT_BARRIER_TIMEOUT_S overrides the default lockstep barrier budget
    (large GAN-step variants compile longer than 1800 s)."""
    captured = {}

    class FakeClient:
        def wait_at_barrier(self, name, timeout_in_ms):
            captured["name"] = name
            captured["ms"] = timeout_in_ms

    from jax._src import distributed

    monkeypatch.setattr(distributed.global_state, "client", FakeClient(),
                        raising=False)
    monkeypatch.setenv("WUT_BARRIER_TIMEOUT_S", "3600")
    launch.barrier("x")
    assert captured["ms"] == 3600 * 1000
    launch.barrier("x", timeout_s=10.0)   # explicit arg wins
    assert captured["ms"] == 10 * 1000


def test_launcher_cli_requires_command():
    with pytest.raises(SystemExit):
        launch.main(["-n", "2", "--"])


def test_two_process_global_step(tmp_path):
    """2 procs x 4 virtual CPU devices run one data-parallel Adam step with
    host-sharded input assembly; both ranks must agree with each other and
    with the same step computed single-process on this session's 8-device
    mesh."""
    env = dict(os.environ)
    env["WUT_TEST_OUT"] = str(tmp_path)
    env["WUT_TEST_GAN"] = "1"           # also run the real GAN trainer 2-proc
    env["WUT_TEST_SUP"] = "1"           # ...and the supervised loop (lockstep)
    env["WUT_TEST_CACHE"] = "1"         # ...and the shared --decode_cache dir
    env["WUT_TEST_IMGDIR"] = str(_write_jpegs(tmp_path / "imgs", 16))
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    rc = launch.launch_local(
        2, [sys.executable, WORKER], cpu_devices=4, env=env, timeout=900)
    assert rc == 0

    reports = []
    for rank in range(2):
        with open(tmp_path / f"rank{rank}.json") as f:
            reports.append(json.load(f))
    assert [r["rank"] for r in reports] == [0, 1]
    assert all(r["n_processes"] == 2 for r in reports)
    assert all(r["n_devices"] == 8 for r in reports)
    # both controllers observe the same replicated result
    assert reports[0]["loss"] == pytest.approx(reports[1]["loss"], abs=0)
    assert reports[0]["w_sum"] == pytest.approx(reports[1]["w_sum"], abs=0)
    # the real GAN trainer ran 2 steps through process-sharded loaders and
    # both controllers agree on the replicated metrics
    g0, g1 = reports[0]["gan_metrics"], reports[1]["gan_metrics"]
    assert g0 and g0.keys() == g1.keys()
    for k in g0:
        assert g0[k] == pytest.approx(g1[k], rel=1e-6), k
    # the supervised loop (lockstep-compiled step+eval jits) also ran and
    # both controllers hold identical replicated params
    assert reports[0]["sup_param_sum"] == pytest.approx(
        reports[1]["sup_param_sum"], abs=0)
    # the shared --decode_cache topology (2 real processes x ONE cache dir,
    # data/cache.py:52-66): both ranks filled rows through the flock'd
    # constructor, the warm rerun was all-hits with identical metrics (the
    # worker asserts cold == warm == uncached), replicated metrics agree
    # across controllers, and the shared memmap ended fully and correctly
    # populated (no SIGBUS / zeroed flags from the construction race)
    c0, c1 = reports[0]["cache"], reports[1]["cache"]
    assert c0["cold_misses"] > 0 and c1["cold_misses"] > 0
    assert c0["warm_hits"] > 0 and c1["warm_hits"] > 0
    for k in c0["metrics"]:
        assert c0["metrics"][k] == pytest.approx(c1["metrics"][k], rel=1e-6), k
    present = np.lib.format.open_memmap(tmp_path / "dcache" / "present.npy",
                                        mode="r")
    assert present.shape == (16,) and int(present.sum()) == 16
    from weather_unet_tpu.data.cache import DecodedCache
    jpegs = sorted(str(p) for p in (tmp_path / "imgs").glob("*.jpg"))
    reopened = DecodedCache(str(tmp_path / "dcache"), base_size=32,
                            paths=jpegs)
    for p in jpegs:                      # every row serves real pixels
        img = reopened.get(p)
        assert img.shape == (32, 32, 3) and img.any(), p
    assert reopened.misses == 0 and reopened.hits == 16

    # single-process reference on this session's own 8-device mesh
    import mp_worker
    from weather_unet_tpu.data.pipeline import assemble_global_batch
    from weather_unet_tpu.parallel.mesh import make_mesh

    plan = make_mesh()
    x, y = mp_worker.global_batch()
    bsh = plan.batch()
    loss, params = mp_worker.run_step(
        plan, assemble_global_batch(bsh, x), assemble_global_batch(bsh, y))
    assert reports[0]["loss"] == pytest.approx(float(loss), rel=1e-6)
    assert reports[0]["w_sum"] == pytest.approx(
        float(np.asarray(params["w"]).sum()), rel=1e-6)


def test_lockstep_compile_single_process_is_identity():
    import jax

    j = jax.jit(lambda x: x + 1)
    assert launch.lockstep_compile(j, "t") is j


def test_lockstep_wrapper_protocol(monkeypatch):
    """Drive LockstepCompile's first-call protocol directly (single-process,
    barrier stubbed): compile-without-execute, rank-0-first barrier order,
    then fallback-to-jit on a shape change."""
    import jax
    import numpy as np

    barriers = []
    monkeypatch.setattr(launch, "barrier",
                        lambda name, timeout_s=1800.0: barriers.append(name))
    w = launch.LockstepCompile(jax.jit(lambda x: x * 2), "proto")
    w._pending = True            # what a multi-process rank 0 would see
    x = np.arange(4.0, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(w(x)), x * 2)
    # rank 0: compile first, then release peers, then the ready barrier
    assert [b.split(":")[0] for b in barriers] == ["compile0", "ready"]
    assert w._compiled is not None
    # a different shape must ALSO rendezvous (an uncoordinated fallback to
    # the jit's own dispatch is the concurrent-first-compile wedge) and the
    # drift executable is cached per-signature
    y = np.arange(6.0, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(w(y)), y * 2)
    assert [b.split(":")[0] for b in barriers] == [
        "compile0", "ready", "compile0", "ready"]
    assert len(w._drift) == 1
    drift_exe = next(iter(w._drift.values()))
    # steady state: repeating either shape adds no rendezvous, the primary
    # fast path survives the drift, and the drift executable is reused
    np.testing.assert_allclose(np.asarray(w(y)), y * 2)
    np.testing.assert_allclose(np.asarray(w(x)), x * 2)
    assert len(barriers) == 4
    assert next(iter(w._drift.values())) is drift_exe


def test_lockstep_same_signature_error_reraises(monkeypatch):
    """A dispatch error at the PRIMARY signature is not drift: it must
    re-raise locally instead of entering a drift barrier the healthy ranks
    never join (which would wedge every rank until the barrier timeout —
    review finding, round 5)."""
    import jax
    import numpy as np
    import pytest

    barriers = []
    monkeypatch.setattr(launch, "barrier",
                        lambda name, timeout_s=1800.0: barriers.append(name))
    w = launch.LockstepCompile(jax.jit(lambda x: x * 2), "reraise")
    w._pending = True
    x = np.arange(4.0, dtype=np.float32)
    np.testing.assert_allclose(np.asarray(w(x)), x * 2)
    n_rendezvous = len(barriers)

    def boom(*a):
        raise ValueError("input committed to the wrong device")

    w._compiled = boom
    with pytest.raises(ValueError, match="wrong device"):
        w(x)
    assert len(barriers) == n_rendezvous   # no drift rendezvous entered


def test_lockstep_names_unique_per_instance():
    import jax

    a = launch.LockstepCompile(jax.jit(lambda x: x), "dup")
    b = launch.LockstepCompile(jax.jit(lambda x: x), "dup")
    assert a._name != b._name


def test_launch_local_propagates_failure(tmp_path):
    rc = launch.launch_local(
        2, [sys.executable, "-c", "import sys, os; "
            "sys.exit(int(os.environ['WUT_PROCESS_ID']))"],
        timeout=60)
    assert rc == 1


def test_worker_refuses_single_process():
    env = dict(os.environ)
    env.pop("WUT_NUM_PROCESSES", None)
    res = subprocess.run([sys.executable, WORKER], env=env,
                         capture_output=True, timeout=120)
    assert res.returncode != 0


def test_launch_local_tears_down_peers_on_rank_failure():
    """One rank dying must terminate its peers promptly — a sequential
    wait() blocked on rank 0 would leave survivors wedged in a collective
    for the full gloo/barrier timeout instead of failing fast."""
    import time as _time

    script = ("import os, sys, time\n"
              "rank = int(os.environ['WUT_PROCESS_ID'])\n"
              "sys.exit(3) if rank == 1 else time.sleep(120)\n")
    t0 = _time.monotonic()
    rc = launch.launch_local(2, [sys.executable, "-c", script], timeout=90)
    elapsed = _time.monotonic() - t0
    assert rc == 3
    assert elapsed < 30, f"peers not torn down fail-fast ({elapsed:.0f}s)"


def test_late_import_with_multiprocess_contract_refuses(tmp_path):
    """cli.common imported AFTER backend init with WUT_NUM_PROCESSES>1 must
    refuse loudly: silently skipping the distributed join would leave the
    peer ranks blocked in jax.distributed.initialize with no diagnostic on
    the offending rank."""
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "jax.numpy.zeros(1).block_until_ready()\n"   # backend init
        "import os; os.environ['WUT_NUM_PROCESSES'] = '2'\n"
        "os.environ['WUT_PROCESS_ID'] = '0'\n"
        "try:\n"
        "    import weather_unet_tpu.cli.common  # noqa: F401\n"
        "except RuntimeError as e:\n"
        "    assert 'already initialized' in str(e), e\n"
        "    print('REFUSED-OK')\n"
        "else:\n"
        "    raise SystemExit('import succeeded; distributed join silently skipped')\n"
    )
    env = dict(os.environ)
    env.pop("WUT_NUM_PROCESSES", None)
    env.pop("WUT_CPU_DEVICES", None)
    res = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, env=env, cwd=os.path.dirname(
                             os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr
    assert "REFUSED-OK" in res.stdout
