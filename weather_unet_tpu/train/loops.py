"""High-level training loops tying steps, data, checkpoints and metrics
together — the TPU-native counterpart of the reference's ``WeatherTransfer``
driver class (``t_est_train.py:59-400``) and the flat classifier/estimator
scripts.
"""

from __future__ import annotations

import functools
import inspect
import itertools
import os
import time
from typing import Callable, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from weather_unet_tpu.core.profiling import trace
from weather_unet_tpu.core.rng import train_key
from weather_unet_tpu.core.state import TrainState
from weather_unet_tpu.data.pipeline import device_prefetch
from weather_unet_tpu.data.transforms import AugmentConfig, augment_batch, normalize_batch
from weather_unet_tpu.parallel.launch import lockstep_compile
from weather_unet_tpu.parallel.mesh import MeshPlan, make_mesh, put_host_local
from weather_unet_tpu.train import checkpoint as ckpt
from weather_unet_tpu.train.gan import (
    GanConfig, build_gan_state, make_gan_step, make_eval_step,
)
from weather_unet_tpu.train.metrics import SummaryWriter, run_comment
from weather_unet_tpu.train.preemption import GracefulShutdown


def _tiered_steps(fns_names, step_kw, aot_cache):
    """Compile-tier selection shared by both training loops.

    ``fns_names`` is a list of ``(fn, lockstep_name)``; returns
    ``(callables, cache)`` where ``cache`` is the shared
    :class:`~weather_unet_tpu.core.aot.AotCache` (or None).

    With ``aot_cache`` set, steps go through the serialized-executable disk
    tier: a restarted run loads the step programs from disk instead of
    re-paying XLA compilation (the dominant cold-start term for the GAN step
    — ~25 min over the tunnel; the persistent XLA cache skips TPU
    executables, and AOT removes the compile but not the tunnel's ~4 min
    constant per-process program-load — bench_aot.py).  Multi-process runs
    refuse the AOT tier: its cache-hit validation executes the loaded
    program on dummies, and a mixed hit/miss rank set would dispatch a
    collective some ranks never join (wedge) — lockstep-compiled jits
    (parallel/launch.py) handle that case instead.
    """
    if aot_cache is not None and jax.process_count() > 1:
        print("WARNING: --aot_cache is single-process only; ignoring it "
              "for this multi-process run", flush=True)
        aot_cache = None
    if aot_cache is not None:
        from weather_unet_tpu.core.aot import AotCache, AotJit

        cache = (aot_cache if isinstance(aot_cache, AotCache)
                 else AotCache(aot_cache))
        return [AotJit(fn, cache, step_kw) for fn, _ in fns_names], cache
    return [lockstep_compile(jax.jit(fn, **step_kw), name)
            for fn, name in fns_names], None


class WeatherTransferTrainer:
    """GAN weather-transfer training (reference ``t_est_train.py`` /
    ``t_cls_train.py`` drivers).

    ``est_apply(images) -> (B, num_classes)`` is the frozen weather net's raw
    output (signals or logits).  Cadences match the reference: checkpoint +
    eval every 1000 steps, summaries every 1000 steps, GD ratio gating
    (``t_est_train.py:350-399``).
    """

    EVAL_PER_STEP = 1000
    DISPLAY_PER_STEP = 1000

    def __init__(self, cfg: GanConfig, est_apply: Callable, *,
                 save_dir: str = "cp/transfer", name: str = "cUNet",
                 log_dir: str = "runs", augment: bool = False,
                 device_augment: bool = False,
                 plan: Optional[MeshPlan] = None, seed: int = 0,
                 export_torch: bool = False, profile_dir: Optional[str] = None,
                 nan_guard: bool = False, max_rollbacks: int = 3,
                 aot_cache: Optional[str] = None,
                 tensor_parallel: bool = False):
        self.cfg = cfg
        self.name = name
        self.save_dir = save_dir
        self.export_torch = export_torch
        self.plan = plan or make_mesh(batch_size=cfg.batch_size)
        # Tensor-parallel training: the WHOLE train state (params, Adam
        # moments, spectral u) lives channel-sharded over the mesh 'model'
        # axis (parallel/tp.py); the step's gradient math runs on the shards
        # and GSPMD inserts the per-double-conv psums.  Single-controller
        # only: checkpointing reads the state back host-side, which needs
        # every shard addressable from this process.
        if tensor_parallel and self.plan.mesh.shape["model"] < 2:
            raise ValueError(
                "tensor_parallel requires a mesh with a 'model' axis of >= 2 "
                "devices (make_mesh(model=K))")
        self.tensor_parallel = tensor_parallel
        if self.tensor_parallel and jax.process_count() > 1:
            raise ValueError(
                "tensor-parallel training is single-controller only "
                "(checkpointing needs the full state addressable)")
        self.writer = SummaryWriter(
            log_dir, comment=run_comment(cfg.lr, cfg.batch_size, cfg.num_epoch, name))

        self.gen, self.disc, self.state = build_gan_state(cfg, jax.random.key(seed))
        self._resume()

        step = make_gan_step(self.gen, self.disc, est_apply, cfg)
        bsh, rsh = self.plan.batch(), self.plan.replicated()
        if self.tensor_parallel:
            from weather_unet_tpu.parallel.tp import tp_shardings

            self._ssh = tp_shardings(self.plan, self.state)
        else:
            self._ssh = rsh

        # Default: augmentation happens on HOST in the loader threads
        # (data.transforms.HostAugment, the reference's CPU-worker design) —
        # the on-device warp is a 4-tap gather measured at 253 ms per 224^2
        # B=128 batch on v5e, more than the train step itself.  The device
        # path here then only normalizes.  device_augment=True keeps the
        # fully-on-device variant.
        if device_augment:
            aug_cfg = AugmentConfig(
                out_size=cfg.input_size, resized_crop=augment,
                brightness=0.5 if augment else 0.0,
                contrast=0.3 if augment else 0.0,
                saturation=0.3 if augment else 0.0)
            prep = lambda k, u8: augment_batch(k, u8, aug_cfg)
        else:
            prep = lambda k, u8: normalize_batch(u8, out_size=cfg.input_size)

        # ONE jitted dispatch per training step: uint8 batches in, normalize/
        # augment, per-step key derivation (fold_in of a fixed base key and
        # the host step counter, shipped as a uint32 scalar with the call),
        # then the GAN step.  Separate host-side dispatches for rng splits and
        # augmentation cost a tunnel round-trip each (~2.4 ms, with spikes to
        # tens of ms — bench_trainer_diag.py); fusing them removes every
        # per-step RTT but the step itself.
        def fused(state, x_u8, c_d, rx_u8, c_r, base_key, stepno, *, do_g):
            k = jax.random.fold_in(base_key, stepno)
            x = prep(jax.random.fold_in(k, 1), x_u8)
            rx = prep(jax.random.fold_in(k, 2), rx_u8)
            return step(state, x, c_d, rx, c_r, jax.random.fold_in(k, 0),
                        do_g=do_g)

        shardings = dict(
            in_shardings=(self._ssh, bsh, bsh, bsh, bsh, rsh, rsh),
            out_shardings=(self._ssh, rsh),
            donate_argnums=(0,))  # state buffers reused in place
        (self._step_dg, self._step_d), self.aot = _tiered_steps(
            [(functools.partial(fused, do_g=True), "gan_step_dg"),
             (functools.partial(fused, do_g=False), "gan_step_d")],
            shardings, aot_cache)
        self._eval = lockstep_compile(
            jax.jit(make_eval_step(self.gen, self.disc, est_apply, cfg)),
            "gan_eval")

        self.state = put_host_local(self._ssh, self.state)
        # hardware-RNG keys: threefry dropout-mask generation measured at
        # ~16% of the GAN step on TPU v5e (core/rng.py)
        self._base_key = put_host_local(rsh, train_key(seed + 1))
        self._rng = train_key(seed + 2)   # cold paths (evaluate)
        self.scalar_dict = {}
        self.image_dict = {}
        self.profile_dir = profile_dir
        # Host-side step mirror: the hot loop must not read
        # state.global_step back from the device every step (VERDICT.md
        # round-1 'weak' #1 — per-step host syncs serialize the async
        # dispatch stream over the axon tunnel).
        self._gstep = int(self.state.global_step)
        self._saved_step = self._gstep  # last checkpointed step (terminal save guard)
        self._last_metrics = None  # device arrays, read back at summary cadence
        self._all_step = 0
        self._window_t0 = None
        self._window_steps = 0
        self.nan_guard = nan_guard
        self.max_rollbacks = max_rollbacks
        self._rollbacks = 0
        self._ckpt = ckpt.AsyncCheckpointer()

    # ------------------------------------------------------------- state io
    def _resume(self):
        path = ckpt.latest_checkpoint(self.save_dir, self.name)
        if path:
            self.state = ckpt.restore_checkpoint(path, self.state)
            print(f"resumed from {path} at step {int(self.state.global_step)}")
            self._gstep = int(self.state.global_step)
            self._saved_step = self._gstep

    def _save(self):
        # Async: device-side snapshot now, D2H + serialize + write on the
        # checkpointer thread — the step loop resumes immediately instead of
        # stalling on the full-state host read (train/checkpoint.py).
        step = int(self.state.global_step)
        self._ckpt.save(self.save_dir, self.name, step, self.state)
        self._saved_step = step
        if self.export_torch:
            out = os.path.join(
                self.save_dir, self.name,
                f"{self.name}_e{int(self.state.epoch):04d}_s{step}.pt")
            ckpt.export_torch_gan(
                out, {"params": self.state.gen.params},
                {"params": self.state.disc.params, "spectral": self.state.spectral},
                int(self.state.epoch), step)

    # ------------------------------------------------------------- training
    def _next_rng(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def train_epoch(self, train_loader: Iterable, random_loader: Iterable,
                    test_batches=None, labeled: bool = False,
                    stop: Optional[GracefulShutdown] = None,
                    skip_batches: int = 0):
        """One epoch over zipped content/condition streams
        (``t_est_train.py:362``).  Batches are ``(uint8 images, cond...,)``
        tuples from :class:`BatchLoader`; ``labeled`` selects the cls-mode
        tuple layout ``(image, class_id)``.  ``skip_batches`` fast-forwards
        past batches a preempted run already trained on (``fit`` computes it
        on resume); skipped batches are still loaded host-side but never
        shipped to the device."""
        bsh = self.plan.batch()
        try:  # lambda ramp denominator (t_est_train.py:355)
            self._all_step = self.cfg.num_epoch * len(train_loader)
        except TypeError:
            self._all_step = 0
        # Only the image field is prefetched to device; condition vectors are
        # tiny (B ints) and ship with the step dispatch itself — a separate
        # per-step device_put costs a tunnel round-trip (~10 ms/step of the
        # 51 ms B=8 f32 step, bench_trainer_diag.py).  Multi-process runs
        # must instead assemble EVERY sharded field from per-host rows
        # (hosts only have their local shard — parallel/launch.py), so the
        # condition field joins the prefetch there.
        fields = [0] if jax.process_count() == 1 else [0, 1]
        tl_it, rl_it = iter(train_loader), iter(random_loader)
        if skip_batches:
            # fast-forward BEFORE the prefetch so skipped batches are never
            # device_put (they still pay host decode — the loaders have no
            # random access by contract)
            tl_it = itertools.islice(tl_it, skip_batches, None)
            rl_it = itertools.islice(rl_it, skip_batches, None)
        zipped = zip(
            device_prefetch(tl_it, sharding=bsh, device_fields=fields),
            device_prefetch(rl_it, sharding=bsh, device_fields=fields))
        # HOT LOOP: no device->host reads here.  Metrics stay on device
        # (self._last_metrics) and are read back only at the 1000-step
        # summary cadence, matching the reference's actual TB-write cadence
        # (t_est_train.py:336-345) — a per-step float() would serialize the
        # async dispatch stream (VERDICT.md round-1 'weak' #1).
        # hoisted: one alloc; multi-process passes this host's rows only
        zeros = put_host_local(
            bsh, np.zeros(self.cfg.batch_size // jax.process_count(), np.int32))
        base_key = self._base_key
        for data, rand_data in zipped:
            if stop is not None and stop.requested:
                # preemption notice (SIGTERM): persist at the step boundary
                # and bail — auto-resume restores this state (not the last
                # 1000-step cadence save) and fit() fast-forwards the
                # already-trained batches of the epoch (_epoch_skip)
                if self.nan_guard and self._nonfinite_metrics():
                    # same invariant as the cadence path: a diverged state
                    # must never become the newest checkpoint — it would
                    # poison both auto-resume and the rollback target.
                    # Skip the save; resume restores the last good cadence
                    # checkpoint instead.
                    print(f"preemption: signal {stop.signum} at step "
                          f"{self._gstep}, but metrics are non-finite — NOT "
                          f"checkpointing the diverged state (resume will "
                          f"use the last good checkpoint)", flush=True)
                    self._ckpt.wait()
                    return False
                print(f"preemption: signal {stop.signum} — checkpointing at "
                      f"step {self._gstep} and stopping", flush=True)
                self._save()
                self._ckpt.wait()   # the grace window must see the file land
                return False
            if data[0].shape[0] != self.cfg.batch_size:
                continue
            if labeled:
                c_d = data[1].astype(jnp.int32)
                c_r = rand_data[1].astype(jnp.int32)
            else:
                c_d = c_r = zeros

            self._gstep += 1
            gstep = self._gstep
            do_g = gstep % self.cfg.gd_train_ratio == 0
            fn = self._step_dg if do_g else self._step_d
            if self._window_t0 is None:
                self._window_t0 = time.perf_counter()
            self.state, metrics = fn(
                self.state, data[0], c_d, rand_data[0], c_r, base_key,
                np.uint32(gstep))
            self._last_metrics = metrics
            self._window_steps += 1

            if gstep % self.EVAL_PER_STEP == 0:
                # failure detection BEFORE the save: a diverged state must
                # not become the newest checkpoint (it would poison the
                # rollback target and auto-resume)
                if self._maybe_rollback():
                    base_key = self._base_key   # rollback re-seeded it
                    continue
                if self.nan_guard and self._nonfinite_metrics():
                    # diverged but rollback unavailable (no checkpoint yet /
                    # retries exhausted): same invariant as the preemption
                    # path — a diverged state must never become the newest
                    # checkpoint (it would poison auto-resume AND the
                    # rollback target of every later cadence)
                    continue
                self._save()
                if test_batches is not None:
                    self.evaluate(test_batches)
            if gstep % self.DISPLAY_PER_STEP == 0:
                self.update_summary()
        self.state = self.state.replace(epoch=self.state.epoch + 1)
        self._ckpt.wait()   # cadence saves issued this epoch are durable now
        return True

    def _nonfinite_metrics(self) -> list:
        """Names of non-finite entries in the latest step metrics (one device
        read-back; [] when no step has run yet)."""
        if self._last_metrics is None:
            return []
        vals = {k: float(v) for k, v in self._last_metrics.items()}
        return [k for k, v in vals.items() if not np.isfinite(v)]

    def _maybe_rollback(self) -> bool:
        """Failure recovery for long unattended runs: when the latest step
        metrics are non-finite (bf16 overflow, GAN blow-up), restore the
        newest (pre-divergence) checkpoint and continue on a re-seeded RNG
        stream so the retry draws different noise/dropout instead of
        replaying the identical diverging trajectory.  Bounded by
        ``max_rollbacks``; off unless ``nan_guard=True`` (then the existing
        summary-cadence warning is the only signal).  The data stream is NOT
        rewound — training continues from the current loader position, like
        a relaunch under the reference's auto-resume (t_est_train.py:151-163)
        would.  Returns True when a rollback happened."""
        if not self.nan_guard:
            return False
        bad = self._nonfinite_metrics()
        if not bad:
            return False
        self._ckpt.wait()   # the newest checkpoint may still be in flight
        path = ckpt.latest_checkpoint(self.save_dir, self.name)
        if path is None or self._rollbacks >= self.max_rollbacks:
            print(f"WARNING: non-finite metrics {bad} at step {self._gstep} "
                  f"and no rollback available "
                  f"(checkpoint={path}, rollbacks={self._rollbacks}/"
                  f"{self.max_rollbacks})", flush=True)
            return False
        self._rollbacks += 1
        rsh = self.plan.replicated()
        self.state = put_host_local(
            self._ssh, ckpt.restore_checkpoint(path, self.state))
        self._gstep = int(self.state.global_step)
        self._base_key = put_host_local(
            rsh, jax.device_get(
                jax.random.fold_in(self._base_key, self._rollbacks)))
        self._last_metrics = None    # don't log the diverged values
        self._window_t0 = None       # throughput window spanned the restore
        self._window_steps = 0
        print(f"nan_guard: non-finite metrics {bad} — rolled back to {path} "
              f"(step {self._gstep}, retry {self._rollbacks}/"
              f"{self.max_rollbacks}, re-seeded)", flush=True)
        return True

    def evaluate(self, test_batches):
        """Reference ``evaluation()`` (``t_est_train.py:285-334``) on two
        cached test batches: translate batch 0 to each of batch 1's
        conditions."""
        (images, labels), (ref_images, ref_labels) = test_batches
        metrics, fakes = self._eval(
            self.state, images, labels, ref_labels, self._next_rng())
        self.scalar_dict.update(
            {f"losses/{k}/test": float(v) for k, v in metrics.items()})
        strip = np.concatenate(
            [np.asarray(images)] + list(np.asarray(fakes)), axis=2)
        self.image_dict["images/test"] = strip

    def update_summary(self):
        """Summary-cadence sync point: the ONLY place training metrics are
        read back to the host.  The float() reads below force completion of
        every dispatched step (sequential state dependency), so the window
        wall-clock around them is an honest throughput measure — unlike
        block_until_ready, which returns early over the axon tunnel."""
        step = self._gstep
        if self._last_metrics is not None:
            vals = {k: float(v) for k, v in self._last_metrics.items()}
            bad = [k for k, v in vals.items() if not np.isfinite(v)]
            if bad:
                # Loss blow-ups surface at the summary cadence (the hot loop
                # never reads device scalars); flag loudly so a diverged or
                # NaN'd run (e.g. bf16 overflow) isn't silently logged.
                print(f"WARNING: non-finite training metrics at step {step}: "
                      f"{bad} — run may have diverged", flush=True)
            self.scalar_dict.update(
                {f"losses/{k}/train": v for k, v in vals.items()})
        if self._all_step:  # reference logs the lmda ramp (t_est_train.py:254,376-379)
            self.scalar_dict["variables/lmda"] = (
                self.cfg.lmda if self.cfg.lmda else step / self._all_step)
        if self._window_steps and self._window_t0 is not None:
            dt = time.perf_counter() - self._window_t0
            self.scalar_dict["perf/steps_per_sec"] = self._window_steps / dt
            self.scalar_dict["perf/step_time_ms/mean"] = dt / self._window_steps * 1e3
            self.scalar_dict["perf/images_per_sec"] = (
                self._window_steps * self.cfg.batch_size / dt)
        self._window_t0 = time.perf_counter()
        self._window_steps = 0
        if self.scalar_dict:
            self.writer.add_scalars(self.scalar_dict, step)
        for tag, imgs in self.image_dict.items():
            self.writer.add_image_grid(tag, imgs, step)
        self.image_dict = {}

    def _epoch_skip(self, tl, rl, abs_ep: int) -> int:
        """Batches of epoch ``abs_ep`` a resumed run already trained on.

        A preemption save lands mid-epoch (state.epoch = the in-progress
        epoch, global_step = steps completed).  With fixed-size epochs —
        both loaders sized and drop_last, so every zipped batch is full and
        steps-per-epoch is exactly ``min(len(tl), len(rl))`` — the position
        within the epoch is ``global_step - abs_ep * steps_per_epoch`` and
        the replay (``set_epoch`` makes the order deterministic) can be
        fast-forwarded.  Without those guarantees returns 0: the epoch
        replays from its start with global_step continuing, i.e. duplicate
        training on the replayed batches — same semantics as relaunching
        the reference under its auto-resume (t_est_train.py:151-163)."""
        try:
            spe = min(len(tl), len(rl))
        except TypeError:
            return 0
        if not spe or not all(getattr(ld, "drop_last", False) for ld in (tl, rl)):
            return 0
        skip = self._gstep - abs_ep * spe
        # skip == spe: a cadence save landed on the epoch's FINAL step (saved
        # before the epoch counter increments) — the epoch is fully trained,
        # so fast-forward all of it; train_epoch then just bumps the counter.
        # Without this the whole epoch re-trains AND global_step ends the run
        # spe ahead of epoch*spe, silently disabling exact-step resume for
        # every later preemption.
        if 0 < skip <= spe:
            print(f"resume: fast-forwarding {skip}/{spe} batches of epoch "
                  f"{abs_ep} (already trained before preemption)", flush=True)
            return skip
        return 0

    def fit(self, train_loader_fn: Callable[[], Iterable],
            random_loader_fn: Callable[[], Iterable], test_batches=None,
            labeled: bool = False):
        try:
            with trace(self.profile_dir), GracefulShutdown() as stop:
                # Loop on the ABSOLUTE epoch (state.epoch survives
                # auto-resume): a run preempted at epoch 30/50 trains the
                # remaining 20 epochs, not 50 more.  One host read per epoch
                # boundary, off the hot loop.
                while int(jax.device_get(self.state.epoch)) < self.cfg.num_epoch:
                    # Fresh shuffle/sampler draw per epoch (reference torch
                    # DataLoader behavior) — without this a loader rebuilt
                    # from a fixed seed replays epoch 0's order forever.
                    tl, rl = train_loader_fn(), random_loader_fn()
                    abs_ep = int(jax.device_get(self.state.epoch))
                    for ld in (tl, rl):
                        se = getattr(ld, "set_epoch", None)
                        if se is not None:
                            se(abs_ep)
                    if not self.train_epoch(
                            tl, rl,
                            test_batches=test_batches, labeled=labeled,
                            stop=stop, skip_batches=self._epoch_skip(tl, rl, abs_ep)):
                        print("Done: training (preempted)")
                        return
                # terminal save: the cadence (EVAL_PER_STEP) almost never
                # lands on the final step, so without this a completed run
                # loses up to EVAL_PER_STEP-1 steps of trained state (a
                # diverged final state is excluded — same invariant as the
                # cadence/preemption saves)
                if self._gstep != self._saved_step and not (
                        self.nan_guard and self._nonfinite_metrics()):
                    self._save()
            print("Done: training")
        finally:
            # join the in-flight write AND release the worker thread — a
            # process that builds several trainers (tests, retry wrappers)
            # must not accumulate idle ckpt threads
            self._ckpt.close()


def _padded_eval_batches(loader, n_shards: int, counts: list,
                         allow_pad: bool = True):
    """Yield ``(images, targets, weights)`` eval batches with any PARTIAL
    batch padded (last row repeated) up to a shardable row count, so the
    tail of a ``drop_last=False`` test split is evaluated instead of
    silently dropped (reference DataLoader keeps it; review finding,
    round 5).  Padded rows carry weight 0; the real row count of each batch
    is appended to ``counts`` for host-side weighted aggregation.

    The pad target is the first batch's size when shardable (the common
    case then compiles ONE eval shape: full batches pass through untouched,
    only the tail pads up), else the next multiple of ``n_shards`` (the
    mesh's batch-axis shard count — an indivisible row count cannot be
    ``device_put`` onto the batch sharding)."""
    target = None
    for b in loader:
        x, t = np.asarray(b[0]), np.asarray(b[1])
        n = x.shape[0]
        if target is None:
            target = n if n % n_shards == 0 else -(-n // n_shards) * n_shards
        tgt = max(target, -(-n // n_shards) * n_shards)  # never truncate
        if n < tgt:
            if not allow_pad:
                # a 4-arg eval_fn (weights silently dropped) would average
                # the duplicated pad rows INTO its metrics — refuse rather
                # than bias the numbers (review finding, round 5)
                raise ValueError(
                    f"partial eval batch of {n} rows needs padding+masking, "
                    f"but the supplied eval_fn takes no weights argument — "
                    f"accept (params, stats, x, targets, weights) or give "
                    f"the test loader drop_last=True")
            x = np.concatenate([x, np.repeat(x[-1:], tgt - n, axis=0)])
            t = np.concatenate([t, np.repeat(t[-1:], tgt - n, axis=0)])
        w = np.zeros(tgt, np.float32)
        w[:n] = 1.0
        counts.append(n)
        yield x, t, w


def train_supervised(model, step_fn, eval_fn, train_loader_fn, test_loader_fn,
                     *, state: TrainState, plan: Optional[MeshPlan] = None,
                     batch_size: Optional[int] = None,
                     num_epoch: int, writer: Optional[SummaryWriter] = None,
                     augment_cfg: Optional[AugmentConfig] = None,
                     input_size: int = 224,
                     save_dir: str = "cp", name: str = "model",
                     eval_per_iter: int = 100, save_per_epoch: int = 5,
                     target_dtype=jnp.float32, seed: int = 0,
                     aot_cache: Optional[str] = None):
    """Shared classifier/estimator loop (reference ``classifier.py:132-182``,
    ``estimator.py:170-227``): eval sweep every ``eval_per_iter`` iterations,
    checkpoint every ``save_per_epoch`` epochs.

    ``augment_cfg=None`` (default) expects augmentation to happen on HOST in
    the loader threads (``data.transforms.HostAugment``) and only normalizes
    on device; pass a config for the fully-on-device warp (a 4-tap gather —
    slow on TPU, see HostAugment docstring)."""
    plan = plan or make_mesh(batch_size=batch_size)
    bsh, rsh = plan.batch(), plan.replicated()
    out_size = augment_cfg.out_size if augment_cfg else input_size
    norm = jax.jit(lambda u8: normalize_batch(u8, out_size=out_size))
    if augment_cfg is not None:
        aug_cfg = augment_cfg
        prep = lambda k, u8: augment_batch(k, u8, aug_cfg)
    else:
        prep = lambda k, u8: normalize_batch(u8, out_size=out_size)

    # One dispatch per step: normalize/augment + per-step key + step fused
    # (same rationale as WeatherTransferTrainer — per-step tunnel RTTs).
    def fused(state, x_u8, targets, base_key, stepno):
        k = jax.random.fold_in(base_key, stepno)
        return step_fn(state, prep(k, x_u8), targets)

    step_kw = dict(in_shardings=(rsh, bsh, bsh, rsh, rsh),
                   out_shardings=(rsh, rsh),
                   donate_argnums=(0,))  # state buffers reused in place
    (jstep,), _ = _tiered_steps([(fused, "sup_step")], step_kw, aot_cache)
    # The sweep always passes per-sample weights (ones on full batches, 0 on
    # padded tail rows); a caller-supplied 4-arg eval_fn is wrapped to drop
    # them — numerically identical on FULL batches, and the sweep refuses
    # to pad a partial batch for such an eval_fn (the duplicated rows would
    # silently bias its unweighted mean — _padded_eval_batches allow_pad).
    accepts_weights = len(inspect.signature(eval_fn).parameters) >= 5
    if accepts_weights:
        eval_w = eval_fn
    else:
        eval_w = lambda p, b, x, t, w: eval_fn(p, b, x, t)
    jeval = lockstep_compile(
        jax.jit(eval_w, in_shardings=(rsh, rsh, bsh, bsh, bsh),
                out_shardings=rsh),
        "sup_eval")
    # Auto-resume, same semantics as WeatherTransferTrainer._resume: newest
    # checkpoint wins; optimizer state rides along so Adam moments survive a
    # preemption (the reference's classifier.py restarts cold every launch).
    global_step, start_epoch, resume_epoch_step = 0, 0, 0
    path = ckpt.latest_checkpoint(save_dir, name)
    if path is not None:
        target = {"params": state.params, "batch_stats": state.extra,
                  "opt_state": state.opt_state, "epoch": 0, "global_step": 0,
                  "epoch_step": 0}
        # older checkpoints lack the newer fields; retry with each optional
        # field dropped (epoch_step: pre-fast-forward; opt_state: pre-round-3
        # params-only) and fill the defaults back in
        restored = None
        for drop in ((), ("epoch_step",), ("epoch_step", "opt_state")):
            t = {k: v for k, v in target.items() if k not in drop}
            try:
                restored = ckpt.restore_checkpoint(path, t)
            except (KeyError, ValueError):
                continue
            if "opt_state" in drop:
                # oldest (params-only) layout: 'epoch' stored the just-
                # COMPLETED epoch (every later layout stores the first epoch
                # still to run) — without the +1 an old checkpoint re-trains
                # a full epoch
                restored["epoch"] = int(restored["epoch"]) + 1
            restored.setdefault("epoch_step", 0)
            restored.setdefault("opt_state", state.opt_state)
            break
        if restored is None:  # unreadable layout: surface the real error
            restored = ckpt.restore_checkpoint(path, target)
        state = state.replace(params=restored["params"],
                              extra=restored["batch_stats"],
                              opt_state=restored["opt_state"])
        global_step = int(restored["global_step"])
        start_epoch = int(restored["epoch"])
        resume_epoch_step = int(restored["epoch_step"])
        print(f"resumed from {path} at step {global_step}"
              + (f" (epoch {start_epoch} batch {resume_epoch_step})"
                 if resume_epoch_step else ""), flush=True)

    base_key = put_host_local(rsh, train_key(seed))
    state = put_host_local(rsh, state)
    # The step donates its state argument and device_put can ALIAS the
    # caller's buffers (same device/layout) — donate would then invalidate
    # the caller's state object.  One explicit device copy breaks the alias;
    # the caller keeps its arrays.
    state = jax.tree.map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)

    ckpter = ckpt.AsyncCheckpointer()

    saved_step = global_step  # last checkpointed step (terminal save guard)

    def save(epoch, global_step, epoch_step=0):
        nonlocal saved_step
        saved_step = global_step
        # Async: snapshot on device, write on the checkpointer thread
        # (train/checkpoint.py) — the epoch loop doesn't stall on D2H + IO.
        # epoch_step records the position within an interrupted epoch so a
        # resume can fast-forward instead of re-training the replayed head.
        ckpter.save(save_dir, name, global_step,
                    {"params": state.params, "batch_stats": state.extra,
                     "opt_state": state.opt_state,
                     "epoch": epoch, "global_step": global_step,
                     "epoch_step": epoch_step})

    train_metrics = []
    warned_empty_test = False
    # single-process: targets ship with the dispatch (see WeatherTransferTrainer);
    # multi-process: every sharded field must be assembled from per-host rows
    fields = [0] if jax.process_count() == 1 else [0, 1]
    with GracefulShutdown() as stop, ckpter:
        for epoch in range(start_epoch, num_epoch):
            tl = train_loader_fn()
            se = getattr(tl, "set_epoch", None)
            if se is not None:
                # fresh shuffle/sampler draw per epoch, deterministic in the
                # absolute epoch index so auto-resume replays the same order
                se(epoch)
            epoch_step = 0
            tl_it = iter(tl)
            if epoch == start_epoch and resume_epoch_step:
                # fast-forward the batches a preempted run already trained
                # on (the checkpoint stores the in-epoch position and
                # set_epoch made the order deterministic); skipped batches
                # still pay host decode but are never shipped to the device
                print(f"resume: fast-forwarding {resume_epoch_step} batches "
                      f"of epoch {epoch}", flush=True)
                tl_it = itertools.islice(tl_it, resume_epoch_step, None)
                epoch_step = resume_epoch_step
            for batch in device_prefetch(tl_it, sharding=bsh,
                                         device_fields=fields):
                if stop.requested:
                    # preemption notice: persist at the step boundary and
                    # bail (train/preemption.py); auto-resume picks up from
                    # here instead of the save_per_epoch cadence.  The
                    # context manager joins the write before returning.
                    print(f"preemption: signal {stop.signum} — checkpointing "
                          f"at step {global_step} and stopping", flush=True)
                    save(epoch, global_step, epoch_step)
                    return state
                t = batch[1]
                targets = (t.astype(target_dtype) if isinstance(t, jax.Array)
                           else np.asarray(t).astype(target_dtype))
                state, metrics = jstep(state, batch[0], targets, base_key,
                                       np.uint32(global_step))
                # Device arrays only — read back at the eval cadence, not per
                # step (avoids a host sync in the hot loop).
                train_metrics.append(metrics)

                if global_step % eval_per_iter == 0:
                    train_metrics = [
                        {k2: float(v) for k2, v in m.items()} for m in train_metrics]
                    test_accum, counts = [], []
                    # multi-process: never pad — each batch here is a
                    # PROCESS shard and all ranks must assemble identical
                    # global shapes in lockstep (their loaders keep
                    # drop_last=True; see the supervised CLIs)
                    pad_shards = plan.n_data if jax.process_count() == 1 else 1
                    batches = _padded_eval_batches(
                        test_loader_fn(), pad_shards, counts,
                        allow_pad=accepts_weights)
                    for tb in device_prefetch(batches, sharding=bsh,
                                              device_fields=[0, 1, 2]):
                        m = jeval(state.params, state.extra, norm(tb[0]),
                                  tb[1].astype(target_dtype), tb[2])
                        test_accum.append(m)
                    test_accum = [
                        {k2: float(v) for k2, v in m.items()} for m in test_accum]
                    if not test_accum and not warned_empty_test:
                        warned_empty_test = True
                        print("warning: test loader yielded no batches "
                              "(test split smaller than the batch size with "
                              "drop_last?) — test metrics will be skipped",
                              flush=True)
                    if writer is not None:
                        # train: plain mean over the cadence window; test:
                        # weighted by real (unpadded) rows per batch, so a
                        # partial tail batch counts its samples exactly once
                        scalars = {}
                        if train_metrics:
                            for k2 in train_metrics[0]:
                                scalars[f"{k2}/train"] = float(
                                    np.mean([m[k2] for m in train_metrics]))
                        if test_accum:
                            n_tot = float(sum(counts))
                            for k2 in test_accum[0]:
                                scalars[f"{k2}/test"] = float(
                                    sum(m[k2] * n for m, n in
                                        zip(test_accum, counts)) / n_tot)
                        writer.add_scalars(scalars, global_step)
                    train_metrics = []
                global_step += 1
                epoch_step += 1

            if epoch % save_per_epoch == 0:
                # epoch+1 = first epoch a resume still has to run (the
                # preemption save above stores the interrupted epoch itself)
                save(epoch + 1, global_step)
        # terminal save: with save_per_epoch=N the cadence misses the last
        # num_epoch % N epochs — a completed run must keep its final state
        if global_step != saved_step:
            save(num_epoch, global_step)
    return state
