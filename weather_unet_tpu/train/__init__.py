"""Training drivers: GAN weather transfer, classifier, estimator."""

from weather_unet_tpu.train.gan import GanConfig, build_gan_state, make_gan_step
from weather_unet_tpu.train.supervised import (
    make_classifier_step, make_estimator_step, make_eval_metrics,
    resnet_pretrained_mask,
)
