"""Functional op library (NHWC, PyTorch-compatible numerics)."""

from weather_unet_tpu.ops.convs import conv2d, max_pool_2x2, global_sum_pool, global_avg_pool
from weather_unet_tpu.ops.resize import upsample_bilinear_align_corners, resize_bilinear_torch
from weather_unet_tpu.ops.norm import adain, instance_whiten, batch_whiten
from weather_unet_tpu.ops.spectral import spectral_normalize, power_iteration
from weather_unet_tpu.ops.dropout import PackedDropout, packed_dropout
from weather_unet_tpu.ops import losses
from weather_unet_tpu.ops import inits
