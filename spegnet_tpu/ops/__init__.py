"""TPU-native tensor ops: resize, attention, conv helpers, morphology, EDT."""

from spegnet_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_dynamic,
    resize_matrix_np,
)
