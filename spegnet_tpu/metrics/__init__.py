"""COD evaluation metrics: S_alpha, E_phi (adaptive), F_beta^w, MAE, F_beta^m."""

from spegnet_tpu.metrics.numpy_reference import compute_sample_metrics_np
from spegnet_tpu.metrics.jax_metrics import (
    compute_batch_metrics,
    compute_sample_metrics,
    edt_for_canvas,
)
