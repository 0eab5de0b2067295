"""weather_unet_tpu — a TPU-native (JAX/XLA/Pallas) weather image-translation framework.

A from-scratch rebuild of the capabilities of the PyTorch reference
``Sota0726/weather-Unet`` (conditional U-Net weather transfer trained
adversarially with a spectral-norm projection discriminator and a frozen
ResNet-101 weather estimator/classifier), redesigned TPU-first:

* NHWC layouts and ``lax.conv_general_dilated`` on the MXU,
* bilinear ``align_corners`` resize expressed as two small matmuls,
* explicit functional state (spectral-norm power-iteration vectors, BN
  statistics, dropout PRNG keys) threaded through jitted train steps,
* data parallelism via ``jax.sharding.Mesh`` + NamedSharding over ICI,
* host-side decode + on-device batched augmentation.

Package layout (see SURVEY.md §7):
  ops/         functional op library (convs, resize, norms, losses, spectral norm)
  kernels/     Pallas TPU kernels for fused hot ops
  models/      ConditionalUNet, SNDisc, ResNet-101, FID InceptionV3
  data/        dataframe/image datasets, samplers, device augmentation, prefetch
  train/       GAN / classifier / estimator trainers, checkpointing, metrics
  parallel/    mesh + sharding helpers
  evaluation/  FID, Inception Score, transfer-consistency evals
  cli/         command-line entry points with reference flag parity
  compat/      PyTorch checkpoint import/export
"""

__version__ = "0.1.0"
