"""SPEGNet-TPU model zoo: Hiera encoder, CFI, EFE+PED, and the composition root."""

from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig
from spegnet_tpu.models.hiera import Hiera, HIERA_VARIANTS
