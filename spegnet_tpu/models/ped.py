"""Edge Feature Extraction (EFE) + Progressive Edge-guided Decoder (PED).

TPU-native re-design of the reference detection head
(reference: models/object_detection.py:86-341).  NHWC throughout; the 2x
decoder upsamples are MXU matmuls (see spegnet_tpu.ops.resize).

Parity notes:
* EFE: 3x3 conv (no bias) + BN + ReLU to 64ch, then 1x1 conv (with bias) to a
  1-channel edge logit map (reference: object_detection.py:112-157).
* DecoderBlock: bilinear 2x upsample -> optional concat of edge features
  (upsampled to match) -> two [3x3 conv (bias) + BN + ReLU]
  (reference: object_detection.py:159-238).  Decoder convs keep their bias
  (torch Conv2d default), unlike EFE/CFI convs.
* Peak-and-fade edge channel schedule [64, 64, None] and channel progression
  256 -> 256 -> 128 -> 64 with per-stage 1x1 prediction heads
  (reference: object_detection.py:240-341, models/spegnet.py:130-135).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from spegnet_tpu.ops.resize import resize_bilinear


class EdgeDetectionModule(nn.Module):
    """EFE: context features -> (edge logit map, edge guidance features)."""

    out_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
            use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        f = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(f)
        f = nn.relu(f)
        edge_map = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype, name="edge_conv")(f)
        return edge_map, f


class _ConvParams(nn.Module):
    """3x3-conv parameter holder with nn.Conv's names/shapes/initializers;
    weights directly accessible so the fused upsample+conv path can split the
    kernel across the concat inputs (checkpoints unchanged)."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features), jnp.float32,
        )
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)

    def __call__(self, x):
        return jax.lax.conv_general_dilated(
            x, self.kernel.astype(self.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + self.bias.astype(self.dtype)


class DecoderBlock(nn.Module):
    """2x upsample + optional edge-feature concat + dual 3x3 conv refinement.

    The first conv is algebraically fused with the 2x bilinear upsample
    (conv-of-concat == sum of per-part convs; each upsample+conv pair becomes
    one lhs-dilated conv on the LOW-res input — see
    ops/fused_upsample_conv.py).  Exact: tests/test_cfi_ped.py still compares
    against the reference torch DecoderBlock, and the fused op is equality-
    tested against resize+conv.  At 512^2 this removes ~1 GB of HBM traffic
    per batch-16 decoder stage.
    """

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_features: Optional[jnp.ndarray] = None, train: bool = False):
        from spegnet_tpu.ops.fused_upsample_conv import upsample2x_conv3x3

        h, w = x.shape[1:3]
        cx = x.shape[-1]
        ce = edge_features.shape[-1] if edge_features is not None else 0
        conv1 = _ConvParams(self.out_channels, cx + ce, dtype=self.dtype,
                            name="conv1")
        kernel = conv1.kernel.astype(self.dtype)

        # NOTE: the polyphase (s2d-output) form was measured and REJECTED at
        # the full-model level: isolated micros say its matmuls are ~2x
        # faster for Cout <= 128 (tools/dec_s2d_micro.py), but the d2s
        # materialization broke XLA fusion and net-cost ~0.2-0.9 ms/img
        # (160.5 -> 156.1/139.8 img/s) — the lhs-dilated composed conv stays.
        # upsample2x_conv3x3_sum remains available (exact, tested).
        y = upsample2x_conv3x3(
            x, kernel[:, :, :cx], bias=conv1.bias.astype(self.dtype))
        if edge_features is not None:
            k_edge = kernel[:, :, cx:]
            if edge_features.shape[1:3] == (h, w):
                # Same 2x factor as x: fuse this upsample+conv too.
                y = y + upsample2x_conv3x3(edge_features, k_edge)
            else:
                ef = edge_features
                if ef.shape[1:3] != (2 * h, 2 * w):
                    ef = resize_bilinear(ef, (2 * h, 2 * w))
                y = y + jax.lax.conv_general_dilated(
                    ef, k_edge, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).astype(self.dtype)
        x = y
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
            use_bias=True, dtype=self.dtype, name="conv2",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn2",
        )(x)
        return nn.relu(x)


class BoundaryAwareDecoder(nn.Module):
    """Progressive decoder with deep supervision (one logit head per stage)."""

    decoder_channels: Sequence[int] = (256, 128, 64)
    n_classes: int = 1
    edge_stages: Sequence[bool] = (True, True, False)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_features=None, train: bool = False):
        predictions = []
        for i, out_ch in enumerate(self.decoder_channels):
            ef = edge_features if self.edge_stages[i] else None
            x = DecoderBlock(out_ch, dtype=self.dtype, name=f"block{i}")(x, ef, train)
            pred = nn.Conv(
                self.n_classes, (1, 1), use_bias=True, dtype=self.dtype, name=f"head{i}"
            )(x)
            predictions.append(pred)
        return predictions
