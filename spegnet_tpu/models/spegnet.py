"""SPEGNet composition root: Hiera encoder -> CFI -> EFE -> PED.

Mirrors the reference wiring (reference: models/spegnet.py:90-206):
  encoder stages 2..4 -> AdaptiveAttentionFusion(512) -> EfficientASPP(256)
  -> EdgeDetectionModule(64) -> BoundaryAwareDecoder([256,128,64],
  edge guidance on stages 1-2 only).

Stage-1 (H/4) encoder features are computed but unused by CFI, exactly like
the reference (reference: models/spegnet.py:105,169-174) — XLA dead-code
eliminates that branch's fusion cost at compile time when not requested.

I/O is channels-last: input [B, H, W, 3] (normalized), outputs are logits.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp

from spegnet_tpu.models.cfi import AdaptiveAttentionFusion, EfficientASPP
from spegnet_tpu.models.hiera import HIERA_VARIANTS, Hiera
from spegnet_tpu.models.ped import BoundaryAwareDecoder, EdgeDetectionModule


@dataclasses.dataclass(frozen=True)
class SPEGNetConfig:
    """Model hyperparameters (schema-compatible with configs/default.yaml)."""

    variant: str = "large"
    fusion_channels: int = 512
    context_channels: int = 256
    edge_channels: int = 64
    decoder_channels: Sequence[int] = (256, 128, 64)
    n_classes: int = 1
    compute_dtype: str = "float32"
    remat: bool = False
    spatial_axis: str = None  # mesh axis for sequence/spatial parallelism
    # Flagged W8A8 inference speed mode for the encoder trunk
    # (ops/fused_block_t_i8.py + ops/fused_block_i8.py; BASELINE.md plan
    # of record) and the fused decoder block (ops/fused_decoder.py int8=).
    # Inference only: training always runs the exact bf16/f32 path.
    int8_encoder: bool = False
    int8_decoder: bool = False

    @classmethod
    def from_dict(cls, model_config: Dict[str, Any]) -> "SPEGNetConfig":
        enc = model_config.get("encoder", {})
        return cls(
            variant=enc.get("variant", "large"),
            compute_dtype=model_config.get("compute_dtype", "float32"),
            remat=model_config.get("remat", False),
            spatial_axis=model_config.get("spatial_axis"),
            int8_encoder=model_config.get("int8_encoder", False),
            int8_decoder=model_config.get("int8_decoder", False),
        )

    @property
    def dtype(self) -> jnp.dtype:
        return jnp.dtype(self.compute_dtype)


class SPEGNet(nn.Module):
    """Synergistic Perception-Guided Network, TPU-native."""

    config: SPEGNetConfig = SPEGNetConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        dtype = cfg.dtype

        features = Hiera(
            variant=cfg.variant, dtype=dtype, remat=cfg.remat,
            spatial_axis=cfg.spatial_axis,
            int8=cfg.int8_encoder and not train, name="encoder",
        )(x)
        stage2, stage3, stage4 = features[1], features[2], features[3]

        fused = AdaptiveAttentionFusion(
            out_channels=cfg.fusion_channels, dtype=dtype, name="fusion"
        )([stage2, stage3, stage4], train)

        context = EfficientASPP(
            in_channels=cfg.fusion_channels,
            out_channels=cfg.context_channels,
            dtype=dtype,
            name="context",
        )(fused, train)

        edge_map, edge_features = EdgeDetectionModule(
            out_channels=cfg.edge_channels, dtype=dtype, name="edge_detector"
        )(context, train)

        predictions = BoundaryAwareDecoder(
            decoder_channels=tuple(cfg.decoder_channels),
            n_classes=cfg.n_classes,
            edge_stages=(True, True, False),
            dtype=dtype,
            # Under spatial (H) sharding the decoder activations arrive
            # H-sharded; the fused kernels' shard_map covers the data axis
            # only, so keep the decomposed path (GSPMD partitions it).
            fused_ok=cfg.spatial_axis is None,
            int8=cfg.int8_decoder and not train,
            name="decoder",
        )(context, edge_features, train)

        return {
            "predictions": predictions,  # [B,H/4,W/4,1], [B,H/2,W/2,1], [B,H,W,1]
            "edge": edge_map,            # [B,H/8,W/8,1]
            "features": {
                "context": context,
                "fused": fused,
                "edge_features": edge_features,
            },
        }

    @property
    def encoder_channels(self):
        return HIERA_VARIANTS[self.config.variant].channels
