from ctagan_tpu.models.generator import Generator
from ctagan_tpu.models.discriminator import (
    Discriminator,
    NLayerDiscriminator,
    MultiScaleDiscriminator,
)
from ctagan_tpu.models.reg import RegNet
