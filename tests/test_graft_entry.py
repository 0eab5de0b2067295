"""Driver-contract tests for __graft_entry__.dryrun_multichip.

Round-1 failure mode (VERDICT.md item 1): the driver calls
``dryrun_multichip(8)`` in a process whose jax backend is already
initialized with a single device; the entry must self-provision a virtual
8-CPU mesh (re-exec in a subprocess) instead of asserting on device count.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code, *, xla_flags=None):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    if xla_flags is None:
        env.pop("XLA_FLAGS", None)
    else:
        env["XLA_FLAGS"] = xla_flags
    # The first dryrun pays a ~10-min sharded-GAN-step compile on a 1-core
    # host; subsequent runs hit the persistent CPU compile cache.
    return subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=1500)


def test_dryrun_self_provisions_fresh_process():
    res = _run("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert res.returncode == 0, res.stderr
    assert "dryrun_multichip(8): ok" in res.stdout


def test_dryrun_reexecs_when_backend_too_small():
    # Simulate the driver: backend already initialized with ONE device, then
    # the 8-device dry run is requested.  Note the stale 1-device host flag
    # in the env must be overridden for the subprocess.
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert len(jax.devices()) == 1\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    res = _run(code, xla_flags="--xla_force_host_platform_device_count=1")
    assert res.returncode == 0, res.stderr
    assert "dryrun_multichip(8): ok" in res.stdout
