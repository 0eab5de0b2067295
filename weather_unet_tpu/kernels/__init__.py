"""Pallas TPU kernels for fused hot ops."""

from weather_unet_tpu.kernels.adain_pallas import adain_fused
