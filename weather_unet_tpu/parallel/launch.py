"""Multi-process (multi-host) launch: distributed init + a single-node spawner.

The reference's entire launch story is bash wrappers + ``CUDA_VISIBLE_DEVICES``
pinning through ``.env`` (``sh/train_classifier.sh:3-4``, SURVEY.md L7/§2.9) —
one process, one GPU.  The TPU-native equivalent is *multi-controller* JAX:
every host runs the same program, ``jax.distributed.initialize`` connects
them through process 0's coordinator, and the global ``Mesh`` spans every
host's chips.  Batches are assembled from per-host shards
(``data/pipeline.py::assemble_global_batch``) so no host materializes the
global batch, and gradient ``psum``s ride ICI within a slice / DCN across
slices — the seam SURVEY.md §2.9 reserves.

Two pieces:

* :func:`maybe_initialize` — called at the top of every training CLI.  A
  no-op in single-process runs; under the env contract below it wires this
  process into the global runtime (and, for tests/CI, can force a virtual
  ``cpu`` platform first).
* ``python -m weather_unet_tpu.parallel.launch -n K [--cpu-devices N] --
  <cmd ...>`` — a torchrun-style single-node spawner that sets the env
  contract and execs K copies of ``<cmd>``.  On real multi-host pods the
  resource manager (GKE/xmanager/...) sets the same variables instead.

Env contract:

``WUT_NUM_PROCESSES``
    total process count (unset or "1" → single-process, everything no-ops).
``WUT_PROCESS_ID``
    this process's rank in [0, WUT_NUM_PROCESSES).
``WUT_COORDINATOR``
    ``host:port`` of the rank-0 coordinator.
``WUT_CPU_DEVICES``
    testing only: force the ``cpu`` platform with this many virtual devices
    per process (the axon TPU plugin ignores ``JAX_PLATFORMS`` — the config
    API must be used before backend init, which is why this lives here and
    must run before any computation).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
import time
from typing import Optional, Sequence


def is_multiprocess() -> bool:
    """True when the env contract requests a multi-process run."""
    return int(os.environ.get("WUT_NUM_PROCESSES", "1")) > 1


def maybe_initialize() -> bool:
    """Join the distributed runtime if the env contract asks for it.

    Returns True when running multi-process (after initialization), False
    for plain single-process runs.  Safe to call more than once.  Must be
    called before the first jax computation (backend init); raises if the
    backend already started on the wrong platform.
    """
    n = int(os.environ.get("WUT_NUM_PROCESSES", "1"))
    cpu_devices = os.environ.get("WUT_CPU_DEVICES")
    if cpu_devices:
        import re

        # WUT_CPU_DEVICES wins over any pre-existing host-device-count flag:
        # a shell that exported XLA_FLAGS=...device_count=8 (the test/verify
        # workflow) would otherwise silently give every spawned rank 8
        # devices instead of the requested count, and make_mesh would then
        # fail with a misleading divisibility error.
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       os.environ.get("XLA_FLAGS", ""))
        os.environ["XLA_FLAGS"] = (
            flags.strip()
            + f" --xla_force_host_platform_device_count={int(cpu_devices)}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    if n <= 1:
        return False
    import jax
    from jax._src import distributed as _dist

    # NOT jax.process_count(): that would initialize the XLA backend, and
    # jax.distributed.initialize() must run first
    if _dist.global_state.client is not None:   # second call: already joined
        return True
    jax.distributed.initialize(
        coordinator_address=os.environ["WUT_COORDINATOR"],
        num_processes=n,
        process_id=int(os.environ["WUT_PROCESS_ID"]),
    )
    print(f"wut: joined distributed runtime as rank "
          f"{os.environ['WUT_PROCESS_ID']}/{n}", flush=True)
    return True


def process_slice(global_batch_size: int) -> slice:
    """This process's row range of a global batch.

    The host-sharded input contract: every process runs the SAME seeded
    sampling sequence (identical shuffle/sampler RNG across hosts), then
    loads only its ``global_batch_size / process_count`` rows; the global
    array is assembled shard-wise by ``assemble_global_batch``.  Replaces
    the reference's DataLoader worker fan-out (``estimator.py:126-138``)
    at the cross-host scale.
    """
    import jax

    pc, pid = jax.process_count(), jax.process_index()
    if global_batch_size % pc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"process count {pc}")
    per = global_batch_size // pc
    return slice(pid * per, (pid + 1) * per)


def barrier(name: str, timeout_s: Optional[float] = None) -> None:
    """Block until every process reaches this barrier.

    Pure coordination-service RPC (process 0's coordinator) — no device
    collectives are dispatched, so it is safe to call while ranks hold no
    compiled programs.  No-op single-process.  Each barrier id is one-shot
    in the coordination service; callers must use a fresh ``name`` per
    rendezvous (:class:`LockstepCompile` derives unique ids).

    Default timeout is 1800 s, overridable via ``WUT_BARRIER_TIMEOUT_S`` —
    the lockstep compile barrier must outlast the slowest rank-0 compile,
    and large GAN-step variants have measured ~25 min compiles (CLAUDE.md);
    a variant crossing the default would otherwise kill every peer with
    DEADLINE_EXCEEDED mid-startup.
    """
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        return
    if timeout_s is None:
        timeout_s = float(os.environ.get("WUT_BARRIER_TIMEOUT_S", "1800"))
    client.wait_at_barrier(f"wut:{name}", timeout_in_ms=int(timeout_s * 1000))


_lockstep_seq: dict = {}


class LockstepCompile:
    """Multi-process first-call compile protocol for a ``jax.jit`` function.

    XLA:CPU's gloo rendezvous gives peer ranks a hardcoded ~30 s to join a
    collective once the first rank enters it.  First-call jit compiles break
    that budget: ranks compile concurrently (serialized on small hosts,
    divergent cache states on real ones), so one rank can dispatch the
    step's first gradient ``psum`` minutes before a peer finishes compiling
    — observed as ``Gloo context initialization failed: DEADLINE_EXCEEDED``
    wedging the 2-process CPU emulation of the classifier CLI.

    First call: rank 0 lowers and compiles WITHOUT executing (seeding the
    shared persistent compile cache, ``core/profiling.py``), peers then
    compile as cache hits, and a final barrier releases every rank together
    — no rank enters the first collective until all hold a ready
    executable.  Steady state dispatches the kept executable directly (one
    attribute check, zero per-call key computation).  A later
    shape/sharding change (e.g. a final partial batch) runs the SAME
    protocol for the new signature — falling through to the wrapped jit's
    own dispatch would be an uncoordinated concurrent first-compile, the
    exact wedge this class exists to prevent — and the drift executable is
    kept per-signature, so the primary fast path survives.  Drift detection
    relies on the SPMD input contract: every rank sees the same batch
    shapes in the same order (host-sharded loaders, identical seeds), so
    all ranks enter the drift path together.

    Use through :func:`lockstep_compile`, which is the identity in
    single-process runs.
    """

    def __init__(self, jitted, name: str):
        import jax

        self._jitted = jitted
        # unique per (name, instance): coordination barriers are one-shot,
        # and every rank constructs wrappers in the same program order
        seq = _lockstep_seq[name] = _lockstep_seq.get(name, -1) + 1
        self._name = f"{name}:{seq}"
        self._compiled = None
        self._primary_sig = None
        self._drift: dict = {}
        self._pending = jax.process_count() > 1

    @staticmethod
    def _sig(args) -> tuple:
        """Shape/dtype signature of an argument pytree (hashable)."""
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(args)
        return treedef, tuple(
            (tuple(getattr(l, "shape", ())),
             str(getattr(l, "dtype", type(l).__name__)))
            for l in leaves)

    def _lockstep(self, *args, tag: str = ""):
        """Rank-0-first compile + release barrier; returns the executable."""
        import time

        import jax

        name = f"{tag}{self._name}"
        rank = jax.process_index()
        if rank != 0:
            barrier(f"compile0:{name}")
        t0 = time.perf_counter()
        compiled = self._jitted.lower(*args).compile()
        print(f"lockstep[{name}] rank {rank}: compiled in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
        if rank == 0:
            barrier(f"compile0:{name}")
        barrier(f"ready:{name}")
        print(f"lockstep[{name}] rank {rank}: all ranks ready", flush=True)
        return compiled

    def __call__(self, *args):
        if self._pending:
            self._pending = False
            self._primary_sig = self._sig(args)
            self._compiled = self._lockstep(*args)
        if self._compiled is not None:
            try:
                return self._compiled(*args)
            except (TypeError, ValueError):
                # Signature drift from the primary specialization — raised
                # before execution/donation, so re-dispatching is safe.
                # But ONLY treat it as drift when the args actually changed
                # shape/dtype: a dispatch error on a matching signature
                # (wrongly-committed device, reused donated buffer, ...)
                # must re-raise locally, or this rank would enter a drift
                # barrier the healthy ranks never join and all ranks would
                # wedge until WUT_BARRIER_TIMEOUT_S (review finding, r5).
                if self._sig(args) == self._primary_sig:
                    raise
        key = self._sig(args)
        exe = self._drift.get(key)
        if exe is None:
            exe = self._drift[key] = self._lockstep(
                *args, tag=f"drift{len(self._drift)}:")
        return exe(*args)


def lockstep_compile(jitted, name: str):
    """Wrap ``jitted`` in :class:`LockstepCompile` under multi-process runs;
    return it unchanged single-process (zero overhead, same call surface)."""
    import jax

    if jax.process_count() == 1:
        return jitted
    return LockstepCompile(jitted, name)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def launch_local(n_processes: int, cmd: Sequence[str], *,
                 cpu_devices: Optional[int] = None,
                 env: Optional[dict] = None,
                 timeout: Optional[float] = None,
                 rank_logs: Optional[str] = None) -> int:
    """Spawn ``n_processes`` copies of ``cmd`` on this node under the env
    contract and wait; returns the first nonzero exit code (0 if all ok).

    Output streams are inherited, or — with ``rank_logs`` — each rank's
    stdout+stderr goes to ``<rank_logs>/rank<i>.log`` (interleaved shared
    streams make per-rank failures undebuggable).  If any process fails,
    the rest are terminated (by pid, never by pattern)."""
    port = _free_port()
    procs = []
    logs = []
    if rank_logs is not None:
        os.makedirs(rank_logs, exist_ok=True)
    for pid in range(n_processes):
        e = dict(os.environ if env is None else env)
        e["WUT_NUM_PROCESSES"] = str(n_processes)
        e["WUT_PROCESS_ID"] = str(pid)
        e["WUT_COORDINATOR"] = f"127.0.0.1:{port}"
        if cpu_devices is not None:
            e["WUT_CPU_DEVICES"] = str(cpu_devices)
        out = None
        if rank_logs is not None:
            out = open(os.path.join(rank_logs, f"rank{pid}.log"), "wb")
            logs.append(out)
        procs.append(subprocess.Popen(list(cmd), env=e, stdout=out,
                                      stderr=subprocess.STDOUT if out else None))
    rc = 0
    try:
        # Poll ALL ranks rather than wait()ing on them in order: a
        # sequential wait blocked on rank 0 never notices rank k dying, so
        # the surviving peers would sit wedged in a gloo collective until
        # its timeout instead of being torn down fail-fast (the documented
        # contract).  First nonzero exit stops the poll; the finally block
        # terminates the survivors by pid.
        deadline = None if timeout is None else time.monotonic() + timeout
        live = list(procs)
        while live and rc == 0:
            for p in list(live):
                r = p.poll()
                if r is not None:
                    live.remove(p)
                    rc = rc or r
            if live and rc == 0:
                if deadline is not None and time.monotonic() > deadline:
                    raise subprocess.TimeoutExpired(cmd, timeout)
                time.sleep(0.2)
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            if p.poll() is None:
                try:
                    p.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    p.kill()
        for f in logs:
            f.close()
    return rc


def main(argv: Optional[Sequence[str]] = None) -> int:
    import argparse

    p = argparse.ArgumentParser(
        prog="python -m weather_unet_tpu.parallel.launch",
        description="single-node multi-process launcher (multi-host JAX "
                    "emulation / multi-chip hosts)")
    p.add_argument("-n", "--nprocs", type=int, required=True)
    p.add_argument("--cpu-devices", type=int, default=None,
                   help="force the cpu platform with N virtual devices per "
                        "process (testing without hardware)")
    p.add_argument("--rank-logs", type=str, default=None,
                   help="directory for per-rank rank<i>.log files "
                        "(default: inherit this terminal's streams)")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="command to launch (prefix with --)")
    args = p.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        p.error("no command given")
    return launch_local(args.nprocs, cmd, cpu_devices=args.cpu_devices,
                        rank_logs=args.rank_logs)


if __name__ == "__main__":
    sys.exit(main())
