"""Model zoo: ConditionalUNet, SNDisc, ResNet-101, FID InceptionV3."""

from weather_unet_tpu.models.cunet import ConditionalUNet
from weather_unet_tpu.models.sndisc import SNDisc
from weather_unet_tpu.models.resnet import ResNet101, ResNet
