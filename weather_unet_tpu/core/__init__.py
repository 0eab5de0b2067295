"""Core: train state, optimizers with torch-Adam semantics, config."""

from weather_unet_tpu.core.state import TrainState, GanTrainState
from weather_unet_tpu.core.optim import torch_adam
