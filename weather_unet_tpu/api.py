"""High-level library API: load once, translate many.

The reference exposes its capabilities only through scripts; this module
wraps the same checkpoint formats behind a serving-friendly object:

    wt = WeatherTransfer.load("ckpt.pt")            # or msgpack
    out = wt.translate(images, conditions)          # NHWC [-1,1] -> [-1,1]
    u8o = wt.translate_u8(u8_images, conditions)    # uint8 wire fast path
    outs = wt.translate_to_classes(images)          # all 5 one-hots, vmapped
    frames = wt.sweep(images, estimator)            # demo-style theta sweep
    u8 = wt.to_uint8(out)                           # (x+1)*127.5 denorm

Forward functions are jitted once per input shape; bf16 serving via
``dtype=jnp.bfloat16`` (measured drift vs f32: 9.4e-4 MAE, see bench.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp


class WeatherTransfer:
    """Checkpointed conditional U-Net with jitted translation entry points.

    Pass a :class:`~weather_unet_tpu.parallel.mesh.MeshPlan` to serve
    data-parallel over a device mesh: parameters are replicated once, inputs
    are batch-sharded over the ``'data'`` axis, and each forward runs SPMD
    with no collectives in the hot path (the cUNet has no cross-sample
    coupling in eval mode).

    ``tensor_parallel=True`` additionally channel-shards the conv weights
    over the plan's ``'model'`` axis (Megatron column/row split on the
    double-conv pairs — ``parallel/tp.py``): per-chip weight memory and
    per-conv FLOPs drop by the axis size at the cost of one ``psum`` per
    double conv, which is the latency-oriented layout when a single request
    must finish fast on a multi-chip host.
    """

    def __init__(self, model, variables, plan=None, aot_cache=None,
                 tensor_parallel: bool = False):
        self.model = model
        self.plan = plan
        if tensor_parallel and (
                plan is None or plan.mesh.shape["model"] < 2):
            raise ValueError(
                "tensor_parallel requires a MeshPlan with a 'model' axis of "
                ">= 2 devices (make_mesh(model=K))")
        if plan is not None and getattr(model, "fuse_upconv", False):
            # The Pallas upconv kernel carries no SPMD partitioning rules —
            # under a mesh the partitioner would gather its operands instead
            # of running it per-shard.  Mesh serving keeps the XLA decoder.
            raise ValueError(
                "fuse_upconv serving is single-device; rebuild the model "
                "with fuse_upconv=False when passing a MeshPlan")
        self._vsh = None
        self._sweep_jit = None
        if plan is not None:
            if tensor_parallel:
                from weather_unet_tpu.parallel.tp import tp_shardings

                self._vsh = tp_shardings(plan, variables)
            else:
                self._vsh = plan.replicated()
            variables = jax.device_put(variables, self._vsh)
        self.variables = variables

        def _fwd(variables, x, c):
            return model.apply(variables, x, c)

        def _fwd_u8(variables, x_u8, c):
            # normalize exactly like data.transforms.normalize_batch and
            # denormalize exactly like to_uint8, but ON DEVICE: the wire
            # carries uint8 both ways (4x less host<->device traffic than
            # f32 — the serving bottleneck on bandwidth-limited links,
            # measured in bench_serve.py)
            x = x_u8.astype(jnp.float32) / 255.0
            y = model.apply(variables, (x - 0.5) / 0.5, c)
            return ((y.astype(jnp.float32) + 1.0) * 127.5).clip(0, 255).astype(jnp.uint8)

        def _fwd_all(variables, x):
            eye = jnp.eye(model.num_classes, dtype=x.dtype)

            def per_class(onehot):
                cc = jnp.tile(onehot[None, :], (x.shape[0], 1))
                return model.apply(variables, x, cc)

            return jax.vmap(per_class)(eye)

        # Weights are ARGUMENTS of the compiled functions, not closure
        # captures: captured arrays get baked into the program as constants,
        # which would key the AOT disk cache (core/aot.py) to one checkpoint
        # and bloat every serialized executable with the weights.
        from weather_unet_tpu.core.aot import AotCache, AotJit, BoundFn

        vsh = self._vsh
        bsh = plan.batch() if plan is not None else None
        kw2 = (dict(in_shardings=(vsh, bsh, bsh), out_shardings=bsh)
               if plan is not None else None)
        kw1 = (dict(in_shardings=(vsh, bsh)) if plan is not None else None)
        if aot_cache is not None:
            self.aot = (aot_cache if isinstance(aot_cache, AotCache)
                        else AotCache(aot_cache))
            wrap = lambda fn, kw: AotJit(fn, self.aot, kw)  # noqa: E731
        else:
            self.aot = None
            wrap = lambda fn, kw: jax.jit(fn, **(kw or {}))  # noqa: E731
        self._translate = BoundFn(wrap(_fwd, kw2), variables)
        self._translate_u8 = BoundFn(wrap(_fwd_u8, kw2), variables)
        self._translate_all = BoundFn(wrap(_fwd_all, kw1), variables)

    @classmethod
    def load(cls, cp_path: str, num_classes: int = 5, dtype=jnp.float32,
             plan=None, aot_cache=None, tensor_parallel: bool = False,
             fuse_upconv="auto"):
        """Load from a reference ``.pt`` GAN bundle or our msgpack checkpoint.

        ``aot_cache``: directory (or :class:`~weather_unet_tpu.core.aot.
        AotCache`) for serialized executables — a restarted process loads
        compiled programs from disk instead of re-paying XLA compilation
        (minutes per bucket on a tunneled TPU; see ``core/aot.py``).

        ``fuse_upconv``: opt-in fused Pallas upsample+conv decoder
        (identical numerics; currently ~2% SLOWER end-to-end than the XLA
        decoder due to custom-call layout-boundary copies — see
        docs/UPSAMPLE_STUDY.md round-3 addendum — so ``"auto"`` resolves to
        off).  Incompatible with mesh serving (``plan``): the Pallas call
        has no SPMD partitioning rules."""
        from weather_unet_tpu.cli.common import load_transfer

        if fuse_upconv == "auto" and plan is not None:
            fuse_upconv = False
        model, variables = load_transfer(cp_path, num_classes=num_classes,
                                         dtype=dtype, fuse_upconv=fuse_upconv)
        return cls(model, variables, plan=plan, aot_cache=aot_cache,
                   tensor_parallel=tensor_parallel)

    def translate(self, images, conditions, *, bucket: bool = True):
        """(B,H,W,3) in [-1,1] + (B,num_classes) conditions -> translated.

        ``bucket=True`` (default) pads the batch up to the next power of two
        before dispatch and slices the result, so a serving process that sees
        ragged batch sizes compiles one executable per bucket instead of one
        per exact batch size (jit caches on static shapes).  Padding rows are
        zeros; the model has no cross-batch coupling in eval mode (AdaIN stats
        are per-sample), so real rows are bit-identical either way.
        """
        return self._bucketed(self._translate, images, conditions, bucket)

    def translate_u8(self, images_u8, conditions, *, bucket: bool = True):
        """uint8 NHWC in + uint8 out, with normalize/denormalize fused into
        the jitted forward — the serving fast path: the host<->device wire
        carries 4x less than the f32 ``translate`` round trip, and the host
        never touches float pixels.  Numerics: same formulas as
        ``to_uint8(translate(preprocess(u8)))``, evaluated on device —
        bit-exact for f32 models; bf16 models may differ by 1 uint8 step at
        rounding boundaries (host-side numpy promotes bf16 differently)."""
        return self._bucketed(self._translate_u8, images_u8, conditions, bucket)

    def _bucketed(self, fn, images, conditions, bucket):
        # host inputs stay numpy through padding (one H2D with the call, no
        # extra device concat dispatch — tunnel acks are per-dispatch);
        # device inputs pad on device
        def pad_rows(a, pad):
            lib = jnp if isinstance(a, jax.Array) else np
            a = lib.asarray(a)
            return lib.concatenate([a, lib.zeros((pad,) + a.shape[1:], a.dtype)])

        x, c = images, conditions
        b = np.shape(x)[0]
        nb = 1 << max(b - 1, 0).bit_length()
        if self.plan is not None:  # shardable: multiple of the data axis
            n = self.plan.n_data
            nb = (nb + n - 1) // n * n
        if not bucket or b == 0 or nb == b:
            return fn(jnp.asarray(x), jnp.asarray(c))
        x = pad_rows(x, nb - b)
        c = pad_rows(c, nb - b)
        return fn(jnp.asarray(x), jnp.asarray(c))[:b]

    def translate_to_classes(self, images):
        """All one-hot class translations: -> (num_classes, B, H, W, 3)."""
        return self._translate_all(jnp.asarray(images))

    def sweep(self, images, estimate: Callable, num_frames: int = 10,
              alpha: float = 2.0):
        """demo.py theta sweep: (T, num_classes, B, H, W, 3) frames where axis
        k's condition is sin(theta)*alpha with estimator predictions elsewhere
        (``demo.py:71-78``)."""
        thetas = jnp.asarray(
            np.arange(-np.pi / 2, np.pi / 2 + np.pi / num_frames,
                      np.pi / (num_frames - 1)), jnp.float32)
        x = jnp.asarray(images)
        pred = estimate(x)

        # One jitted sweep per INSTANCE, reused across calls: a per-call
        # closure would make every sweep() a fresh function object and
        # retrace/recompile the full T x num_classes forward even at
        # identical shapes (minutes per call over the TPU tunnel — review
        # finding, round 5).  thetas ships as an argument (shape-keyed:
        # changing num_frames recompiles once per frame count) and alpha as
        # a traced scalar (changing it never recompiles).
        if self._sweep_jit is None:
            def _sweep(x, pred, thetas, alpha):
                eye = jnp.eye(self.model.num_classes, dtype=x.dtype)

                def per_theta(theta):
                    def per_axis(onehot):
                        c = (jnp.sin(theta) * alpha * onehot)[None, :] \
                            + (1.0 - onehot)[None, :] * pred
                        return self.model.apply(self.variables, x, c)
                    return jax.vmap(per_axis)(eye)
                return jax.vmap(per_theta)(thetas)

            self._sweep_jit = jax.jit(_sweep)
        return self._sweep_jit(x, pred, thetas, jnp.float32(alpha))

    @staticmethod
    def to_uint8(images) -> np.ndarray:
        """``(x + 1) * 127.5`` denormalization (``demo.py:80``)."""
        return ((np.asarray(images) + 1.0) * 127.5).clip(0, 255).astype(np.uint8)

    @staticmethod
    def preprocess(images_u8, out_size: Optional[int] = None):
        """uint8 NHWC -> normalized [-1,1] float (test transform)."""
        from weather_unet_tpu.data.transforms import normalize_batch

        return normalize_batch(jnp.asarray(images_u8), out_size=out_size)
