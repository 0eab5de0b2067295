"""Semi-supervised adversarial weather-transfer training.

TPU-native redesign of the reference drivers ``t_est_train.py:214-283`` /
``t_cls_train.py:226-312``: the whole combined step (frozen-estimator
forwards, D hinge update, G update with adversarial + distance-weighted
reconstruction + weather-consistency losses) is ONE pure jitted function.
Per combined step the reference runs 7 network forwards + 2 backwards
(SURVEY.md §3.1); here they fuse into a single XLA program with donated
buffers, batch sharded over the ``'data'`` mesh axis (gradient psum over ICI
inserted by the SPMD partitioner).

Faithfully reproduced training semantics:

* estimator conditions are ``stop_gradient``-ed exactly where the reference
  ``.detach()``-es (``t_est_train.py:219,267``, but gradients DO flow through
  ``estimator(fake)`` into G — ``t_est_train.py:226``),
* spectral-norm ``u`` advances once per D forward in call order: D(real),
  D(fake) in the D update, then D(fake) in the G update — 3 per combined step
  (SURVEY.md §7 hard part 3),
* the G update sees the already-updated discriminator (``d_opt.step()`` runs
  before ``update_inference`` — ``t_est_train.py:389-391``),
* G's two forwards (D step, G step) draw independent dropout masks,
* optimizers are torch-Adam with betas (0.0, 0.999), wd = lr/20
  (``t_est_train.py:172-173``),
* ``loss_con`` eps is 1e-7 (semi-supervised) / 1e-2 (supervised)
  (``t_est_train.py:239``, ``t_cls_train.py:262``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from weather_unet_tpu.core.optim import gan_adam
from weather_unet_tpu.core.state import GanTrainState, TrainState
from weather_unet_tpu.models import ConditionalUNet, SNDisc
from weather_unet_tpu.ops import losses


@dataclasses.dataclass(frozen=True)
class GanConfig:
    """Flag parity with the reference drivers (``t_est_train.py:4-30``,
    ``t_cls_train.py:14-41``)."""

    num_classes: int = 5
    lr: float = 1e-4
    input_size: int = 224
    batch_size: int = 8
    gd_train_ratio: int = 1
    mode: str = "est"            # 'est' (t_est_train) | 'cls' (t_cls_train)
    supervised: bool = False     # cls mode: use dataset one-hot labels
    cross_ent: bool = False      # cls mode: CE on estimator logits
    dataset: str = "flicker"     # cls mode: 'flicker' | 'i2w'
    lmda: Optional[float] = None
    num_epoch: int = 50
    dtype: Any = jnp.float32
    dropout_rate: float = 0.3   # reference cunet.py:28; 0.0 for parity tests

    @property
    def con_eps(self) -> float:
        return 1e-2 if self.supervised else 1e-7


def build_gan_state(cfg: GanConfig, rng) -> tuple[ConditionalUNet, SNDisc, GanTrainState]:
    """Initialize generator/discriminator models and the paired train state."""
    gen = ConditionalUNet(num_classes=cfg.num_classes, dtype=cfg.dtype,
                          dropout_rate=cfg.dropout_rate)
    disc = SNDisc(num_classes=cfg.num_classes, dtype=cfg.dtype)
    kg, kd = jax.random.split(rng)
    x = jnp.zeros((1, cfg.input_size, cfg.input_size, 3), cfg.dtype)
    c = jnp.zeros((1, cfg.num_classes), cfg.dtype)
    g_vars = gen.init(kg, x, c)
    d_vars = disc.init(kd, x, c)
    tx = gan_adam(cfg.lr)
    state = GanTrainState(
        gen=TrainState.create(g_vars["params"], tx),
        disc=TrainState.create(d_vars["params"], tx),
        spectral=d_vars["spectral"],
    )
    return gen, disc, state


def make_gan_step(gen: ConditionalUNet, disc: SNDisc,
                  est_apply: Callable, cfg: GanConfig):
    """Build the combined train step.

    Args:
      est_apply: frozen weather net — ``est_apply(images) -> (B, num_classes)``
        raw outputs (signals for est mode, logits for cls mode).  Gradients
        may flow through it (needed for G's weather-consistency loss).

    Returns ``step(state, images, c_d, rand_images, c_r, rng, *, do_g)``
    where ``c_d``/``c_r`` are int class labels (cls mode; ignored in est
    mode), ``do_g`` is static (GD_train_ratio gating, two compiled variants).
    """

    n_cls = cfg.num_classes

    def conditions_from(images):
        out = est_apply(images)
        if cfg.mode == "cls":
            out = jax.nn.softmax(out, axis=1)   # t_cls_train.py:174-177
        return out

    def step(state: GanTrainState, images, c_d, rand_images, c_r, rng, *, do_g: bool):
        k_fake_d, k_fake_g = jax.random.split(rng)

        if cfg.mode == "cls" and cfg.supervised:
            rand_labels = jax.nn.one_hot(c_r, n_cls, dtype=images.dtype)  # t_cls_train.py:421
            pred_labels = jax.nn.one_hot(c_d, n_cls, dtype=images.dtype)
        else:
            rand_labels = jax.lax.stop_gradient(conditions_from(rand_images))
            pred_labels = jax.lax.stop_gradient(conditions_from(images))

        # ---------------- discriminator update (t_est_train.py:261-283)
        fake_detached = jax.lax.stop_gradient(
            gen.apply({"params": state.gen.params}, images, rand_labels,
                      train=True, rngs={"dropout": k_fake_d})
        )

        def d_loss_fn(d_params):
            (real_out, _), m1 = disc.apply(
                {"params": d_params, "spectral": state.spectral},
                images, pred_labels, update_stats=True, mutable=["spectral"],
            )
            (fake_out, _), m2 = disc.apply(
                {"params": d_params, "spectral": m1["spectral"]},
                fake_detached, rand_labels, update_stats=True, mutable=["spectral"],
            )
            loss = losses.dis_hinge(fake_out, real_out)
            return loss, m2["spectral"]

        (d_loss, spectral), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.disc.params
        )
        disc_state = state.disc.apply_gradients(d_grads)
        metrics = {"d_loss": d_loss}

        gen_state = state.gen
        if do_g:
            # ------------- generator update (t_est_train.py:214-259)
            if cfg.mode == "cls" and cfg.cross_ent:
                # integer CE targets — t_cls_train.py:430-438
                if cfg.supervised or cfg.dataset == "i2w":
                    ce_targets = c_r
                else:  # semi-supervised flicker: argmax of estimator logits
                    ce_targets = jnp.argmax(
                        jax.lax.stop_gradient(est_apply(rand_images)), axis=1
                    )

            def g_loss_fn(g_params):
                fake = gen.apply({"params": g_params}, images, rand_labels,
                                 train=True, rngs={"dropout": k_fake_g})
                (fake_out, _), m3 = disc.apply(
                    {"params": disc_state.params, "spectral": spectral},
                    fake, rand_labels, update_stats=True, mutable=["spectral"],
                )
                g_adv = losses.gen_hinge(fake_out)
                if cfg.mode == "cls" and cfg.cross_ent:
                    g_w = losses.cross_entropy_loss(est_apply(fake), ce_targets)
                else:
                    g_w = losses.mse_loss(conditions_from(fake), rand_labels)
                loss_con = losses.reconstruction_con_loss(
                    fake, images, pred_labels, rand_labels, eps=cfg.con_eps
                )
                g_l1 = losses.l1_loss(fake, images)
                g_loss = g_adv + loss_con + g_w
                aux = (m3["spectral"],
                       {"g_loss": g_loss, "g_loss_adv": g_adv, "g_loss_w": g_w,
                        "loss_con": loss_con, "g_loss_l1": g_l1})
                return g_loss, aux

            (_, (spectral, g_metrics)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.gen.params)
            gen_state = state.gen.apply_gradients(g_grads)
            metrics.update(g_metrics)

        new_state = GanTrainState(
            gen=gen_state, disc=disc_state, spectral=spectral,
            epoch=state.epoch, global_step=state.global_step + 1,
        )
        return new_state, metrics

    return step


def make_eval_step(gen: ConditionalUNet, disc: SNDisc, est_apply: Callable,
                   cfg: GanConfig):
    """Test-time evaluation matching ``t_est_train.py:285-334``: translate the
    whole test batch to each reference sample's condition, score G/D losses.

    The reference loops over the batch re-running the whole batch per
    reference sample; here that is one vmapped computation.  NOTES:
    * the reference runs G in train mode here (dropout active,
      ``t_est_train.py:299-308``) — reproduced via ``dropout_rng``;
    * ``g_loss_w`` scores the estimator's RAW outputs against the requested
      labels in both modes (``t_cls_train.py:337`` uses ``estimator_``, the
      pre-softmax net) — hence ``est_apply`` directly, no softmax;
    * INTENTIONAL DEVIATION: the reference never switches D to eval mode, so
      its spectral-norm ``u`` buffers advance by 2×batch_size power
      iterations during each evaluation() sweep.  Here evaluation reads the
      stored ``u`` without mutating it (the vmapped design is stateless).
      Power iteration has long since converged at that point, so sigma —
      and hence training dynamics — is unaffected beyond float noise.
    """

    def eval_step(state: GanTrainState, images, labels, ref_labels, dropout_rng):
        bsz = images.shape[0]

        def one_ref(ref_label, rng):
            ref_expand = jnp.tile(ref_label[None, :], (bsz, 1))
            fake = gen.apply({"params": state.gen.params}, images, ref_expand,
                             train=True, rngs={"dropout": rng})
            fake_c = est_apply(fake)
            (real_out, _) = disc.apply(
                {"params": state.disc.params, "spectral": state.spectral},
                images, labels)
            (fake_out, _) = disc.apply(
                {"params": state.disc.params, "spectral": state.spectral},
                fake, ref_expand)
            return {
                "g_loss_adv": losses.gen_hinge(fake_out),
                "g_loss_l1": losses.l1_loss(fake, images),
                "g_loss_w": losses.mse_loss(fake_c, ref_expand),
                "d_loss": losses.dis_hinge(fake_out, real_out),
            }, fake

        rngs = jax.random.split(dropout_rng, bsz)
        metrics, fakes = jax.vmap(one_ref)(ref_labels, rngs)
        return jax.tree.map(jnp.mean, metrics), fakes

    return eval_step
