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


class DecoderBlock(nn.Module):
    """2x upsample + optional edge-feature concat + dual 3x3 conv refinement."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, edge_features: Optional[jnp.ndarray] = None, train: bool = False):
        h, w = x.shape[1:3]
        x = resize_bilinear(x, (2 * h, 2 * w))
        if edge_features is not None:
            if edge_features.shape[1:3] != x.shape[1:3]:
                edge_features = resize_bilinear(edge_features, x.shape[1:3])
            x = jnp.concatenate([x, edge_features], axis=-1)
        for i in (1, 2):
            x = nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1), (1, 1)],
                use_bias=True, dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, name=f"bn{i}",
            )(x)
            x = nn.relu(x)
        return x


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
