"""SPEGNet-TPU: a TPU-native (JAX/XLA/Pallas/pjit) camouflaged-object-detection framework.

A from-scratch rebuild of the capabilities of the SPEGNet reference stack
(PyTorch/CUDA, see /root/reference) designed TPU-first:

- NHWC layouts, bf16 compute on the MXU, XLA-fused convolutions.
- The Hiera hierarchical ViT encoder implemented natively in JAX with fused
  Pallas attention kernels for the hot windowed/global attention stages.
- Ragged original-resolution supervision (the reference's per-sample Python
  loops) recast as static-shape canvas math: dynamic-size bilinear resize
  into fixed canvases with validity masks, so the whole train step jits.
- On-device vectorized COD metrics (S_alpha, F_beta^w, E_phi, MAE, F_beta^m).
- Multi-chip scaling via jax.sharding.Mesh + pjit (data/model axes), not a
  port of any GPU communication stack.
"""

__version__ = "0.1.0"
