"""Data pipeline: datasets, samplers, on-device augmentation, prefetch."""

from weather_unet_tpu.data.datasets import (
    FlickrDataset, ImagePathDataset, ClassImageDataset, ImageFolder,
    OneYearWeatherSignals,
    WEATHER_CLASSES_I2W, WEATHER_CLASSES_FLICKR, SIGNAL_COLUMNS,
    class_id_from_string, zscore_columns,
)
from weather_unet_tpu.data.sampler import ImbalancedSampler
from weather_unet_tpu.data.pipeline import BatchLoader, device_prefetch
from weather_unet_tpu.data import transforms
