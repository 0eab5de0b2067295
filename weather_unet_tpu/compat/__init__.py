"""PyTorch checkpoint interop (import reference .pt files / export back)."""

from weather_unet_tpu.compat.torch_io import (
    load_torch_file,
    cunet_from_torch, cunet_to_torch,
    sndisc_from_torch, sndisc_to_torch,
    resnet_from_torch, resnet_to_torch,
    gan_checkpoint_from_torch,
)
