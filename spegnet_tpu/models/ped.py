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

Inference fast path: blocks 1-2 run as single fused Pallas kernels
(ops/fused_decoder.py) when dtype is bf16 and not training -- the whole
upsample+conv+BN+ReLU+conv+BN+ReLU(+head) chain stays in VMEM in polyphase
layout.  The decomposed path below remains the reference semantics (and the
training path); both share one parameter tree (param-holder submodules with
nn.Conv/nn.BatchNorm-identical names, so checkpoints are unchanged).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from spegnet_tpu.ops.resize import resize_bilinear

# auto/1: fused Pallas decoder blocks in bf16 inference; 0: decomposed.
USE_PALLAS_DECODER = os.environ.get("SPEGNET_PALLAS_DECODER", "auto")


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
    """Conv parameter holder with nn.Conv's names/shapes/initializers;
    weights directly accessible so fused paths can repack them
    (checkpoints unchanged)."""

    features: int
    in_features: int
    ksize: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.ksize, self.ksize, self.in_features, self.features),
            jnp.float32,
        )
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)

    def __call__(self, x):
        p = self.ksize // 2
        return jax.lax.conv_general_dilated(
            x, self.kernel.astype(self.dtype), (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + self.bias.astype(self.dtype)


class _BNParams(nn.Module):
    """BatchNorm parameter holder reproducing flax.linen.BatchNorm
    (momentum 0.9, eps 1e-5, f32 running stats, fast variance) with
    identical param/collection names -- stats directly accessible so the
    fused decoder can fold them."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)
        self.ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        self.ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))

    def __call__(self, x, train: bool = False):
        if train:
            x32 = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x32, axes)
            var = jnp.mean(jnp.square(x32), axes) - jnp.square(mean)
            if not self.is_initializing():
                self.ra_mean.value = (self.momentum * self.ra_mean.value
                                      + (1 - self.momentum) * mean)
                self.ra_var.value = (self.momentum * self.ra_var.value
                                     + (1 - self.momentum) * var)
        else:
            mean, var = self.ra_mean.value, self.ra_var.value
        dt = self.dtype
        y = x.astype(dt) - mean.astype(dt)
        mul = (jax.lax.rsqrt(var + self.epsilon)
               * self.scale.astype(jnp.float32)).astype(dt)
        return y * mul + self.bias.astype(dt)

    def stats(self):
        """(gamma, beta, mean, var, eps) for BN folding."""
        return dict(gamma=self.scale, beta=self.bias,
                    mean=self.ra_mean.value, var=self.ra_var.value,
                    eps=self.epsilon)


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
    in_features: int
    edge_features_ch: int = 0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.conv1 = _ConvParams(
            self.out_channels, self.in_features + self.edge_features_ch,
            dtype=self.dtype, name="conv1")
        self.bn1 = _BNParams(self.out_channels, dtype=self.dtype, name="bn1")
        self.conv2 = _ConvParams(self.out_channels, self.out_channels,
                                 dtype=self.dtype, name="conv2")
        self.bn2 = _BNParams(self.out_channels, dtype=self.dtype, name="bn2")

    def __call__(self, x, edge_features: Optional[jnp.ndarray] = None,
                 train: bool = False):
        from spegnet_tpu.ops.fused_upsample_conv import upsample2x_conv3x3

        h, w = x.shape[1:3]
        cx = x.shape[-1]
        kernel = self.conv1.kernel.astype(self.dtype)

        # NOTE: the polyphase (s2d-output) form was measured and REJECTED at
        # the full-model level for the decomposed path (the d2s
        # materialization broke XLA fusion; see git history) — the
        # lhs-dilated composed conv stays here.  The bf16 inference path
        # instead runs the whole block inside ops/fused_decoder.py where the
        # polyphase intermediate never leaves VMEM.
        y = upsample2x_conv3x3(
            x, kernel[:, :, :cx], bias=self.conv1.bias.astype(self.dtype))
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
        x = nn.relu(self.bn1(y, train))
        x = self.conv2(x)
        return nn.relu(self.bn2(x, train))


class BoundaryAwareDecoder(nn.Module):
    """Progressive decoder with deep supervision (one logit head per stage).

    bf16 inference runs blocks 1-2 + their heads as fused Pallas kernels
    (ops/fused_decoder.py); training / f32 / unsupported geometries use the
    decomposed blocks above.  One parameter tree either way."""

    decoder_channels: Sequence[int] = (256, 128, 64)
    n_classes: int = 1
    edge_stages: Sequence[bool] = (True, True, False)
    dtype: jnp.dtype = jnp.float32
    fused_ok: bool = True
    # W8A8 conv matmuls in the fused block-2 kernel (flagged inference
    # speed mode, see ops/fused_decoder.py / SPEGNetConfig.int8_decoder).
    int8: bool = False

    @nn.compact
    def __call__(self, x, edge_features=None, train: bool = False):
        from spegnet_tpu.ops import fused_decoder as fd

        ce = edge_features.shape[-1] if edge_features is not None else 0
        blocks, heads = [], []
        cin = x.shape[-1]
        for i, out_ch in enumerate(self.decoder_channels):
            ef_ch = ce if (self.edge_stages[i]
                           and edge_features is not None) else 0
            blocks.append(DecoderBlock(
                out_ch, in_features=cin, edge_features_ch=ef_ch,
                dtype=self.dtype, name=f"block{i}"))
            heads.append(_ConvParams(self.n_classes, out_ch, ksize=1,
                                     dtype=self.dtype, name=f"head{i}"))
            cin = out_ch

        def run_block(i, x):
            ef = edge_features if self.edge_stages[i] else None
            y = blocks[i](x, ef, train)
            return y, heads[i](y)

        x0, pred0 = run_block(0, x)
        x1, pred1 = run_block(1, x0)

        # Block 2 (the 2S-resolution, Cm=64 stage that half-fills MXU lanes
        # on the decomposed path) runs as ONE fused Pallas kernel with its
        # head, in bf16 inference.  Block 1 stays decomposed: its Cm=128
        # already fills the 128-lane tiles and the measured kernel loses to
        # XLA there (10.5 vs 8.7-9.1 ms, tools/dec_pallas_micro.py dec1 --
        # the in-kernel 4x edge branch runs as many small M=64/128 dots).
        b, s2 = x1.shape[0], x1.shape[1]
        use_fused = (
            not train
            and self.fused_ok
            and USE_PALLAS_DECODER in ("auto", "1")
            and self.dtype == jnp.bfloat16
            and x1.dtype == jnp.bfloat16
            and len(self.decoder_channels) == 3
            and self.n_classes == 1
            and not self.edge_stages[2]
            and x1.shape[1] == x1.shape[2]
            and fd.decoder_supported(b, s2, self.dtype)
        )
        if not use_fused:
            _, pred2 = run_block(2, x1)
            return [pred0, pred1, pred2]

        blk2 = blocks[2]
        cm2_ = self.decoder_channels[2]
        p2 = fd.pack_params(
            blk2.conv1.kernel, blk2.conv1.bias, blk2.bn1.stats(),
            blk2.conv2.kernel, blk2.conv2.bias, blk2.bn2.stats(),
            head_w=heads[2].kernel.reshape(cm2_, 1),
            head_b=heads[2].bias, dtype=self.dtype)
        strips2 = fd.make_strips(x1, blk2.conv1.kernel, dtype=self.dtype)
        _, pred2_raw = fd.fused_decoder_block_auto(x1, p2, strips2,
                                                   int8=self.int8)
        pred2 = pred2_raw.reshape(b, 2 * s2, 2 * s2, 1)
        return [pred0, pred1, pred2]
