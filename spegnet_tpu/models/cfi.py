"""Contextual Feature Integration (CFI): attention fusion + efficient ASPP.

TPU-native re-design of the reference CFI stage
(reference: models/feature_integration.py:90-416).  Everything is NHWC so the
1x1 convs lower to plain MXU matmuls and the depthwise dilated convs hit the
vector unit with lane-major channels.

Behavioral parity notes (verified against the reference modules in
tests/test_cfi_ped.py):

* SE reduction floor: hidden = max(C // reduction, 32)
  (reference: feature_integration.py:118).
* The e-ASPP fusion conv is a grouped 1x1 with groups == reduced_channels over
  the *branch-major* concatenation, i.e. group i consumes 5 consecutive
  channels [5i, 5i+5) of the concat — PyTorch grouped-conv semantics, not
  "channel i of each branch" (reference: feature_integration.py:349-360).
  XLA's ``feature_group_count`` partitions channels identically.
* All convs are bias-free + BatchNorm + ReLU, BN eps 1e-5 / momentum 0.1
  (torch defaults).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from spegnet_tpu.ops.resize import resize_bilinear


class BatchNorm(nn.Module):
    """BatchNorm2d with torch defaults, applied over N,H,W (channels-last).

    Under pjit with a batch-sharded input the mean/var reductions are global
    (XLA inserts the cross-chip collectives), which is the TPU-native
    equivalent of synchronized BN.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn",
        )(x)


class _Grouped1x1(nn.Module):
    """Grouped 1x1 conv lowered to ONE dense MXU matmul with a block-diagonal
    weight (zeros outside each group's input slice) — numerically identical to
    PyTorch grouped-conv semantics but ~35x faster than XLA's
    feature_group_count lowering at e-ASPP's groups=128 (5.0 ms -> 0.14 ms at
    batch 16, measured on v5e).  The parameter keeps nn.Conv's exact name and
    [1, 1, cin/groups, cout] shape, so checkpoints and the torch importer are
    unaffected."""

    features: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        per = cin // self.groups
        cpg = self.features // self.groups
        kernel = self.param(
            "kernel", nn.linear.default_kernel_init,
            (1, 1, per, self.features), jnp.float32,
        )
        k2 = kernel[0, 0].astype(self.dtype)                      # [per, cout]
        group_of_o = jnp.arange(self.features) // max(cpg, 1)      # [cout]
        onehot = jax.nn.one_hot(group_of_o, self.groups, dtype=self.dtype)
        # W[g*per + j, o] = k2[j, o] iff output o belongs to group g.
        w = jnp.einsum("po,og->gpo", k2, onehot).reshape(cin, self.features)
        return jax.lax.dot_general(
            x.astype(self.dtype), w,
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)


class ConvBNReLU(nn.Module):
    """Conv2d(bias=False) + BN + ReLU, NHWC."""

    features: int
    kernel: int = 3
    dilation: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kernel == 1 and self.groups > 1:
            x = _Grouped1x1(self.features, self.groups, self.dtype, name="conv")(x)
        else:
            pad = self.dilation * (self.kernel // 2)
            x = nn.Conv(
                self.features,
                (self.kernel, self.kernel),
                padding=[(pad, pad), (pad, pad)],
                kernel_dilation=(self.dilation, self.dilation),
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        return nn.relu(x)


class SqueezeExcitation(nn.Module):
    """SE channel attention: GAP -> FC(C->max(C//r,32)) -> ReLU -> FC -> sigmoid.

    Reference: feature_integration.py:90-151.
    """

    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = max(c // self.reduction, 32)
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(self.dtype)  # [B, C]
        y = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        y = nn.sigmoid(y)
        return x * y[:, None, None, :]


class _Conv1x1Params(nn.Module):
    """1x1-conv parameter holder with nn.Conv's names/shapes/initializers
    ({kernel: [1, 1, cin, cout]}); the weight is directly accessible so the
    fusion can split it across its concat inputs (checkpoints unchanged)."""

    features: int
    in_features: int

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (1, 1, self.in_features, self.features), jnp.float32,
        )


class AdaptiveAttentionFusion(nn.Module):
    """Upsample stages 3/4 to stage-2 resolution, concat, 1x1 reduce, SE.

    Reference: feature_integration.py:153-246.  Inputs are NHWC feature maps
    [stage2, stage3, stage4]; output [B, H2, W2, out_channels].

    TPU lowering: conv1x1(concat(...)) == sum of per-stage 1x1 matmuls, and a
    bias-free 1x1 conv commutes exactly with bilinear resize — so each stage
    is projected to out_channels at its NATIVE resolution and upsampled
    afterwards.  This skips materializing the [B, 64, 64, 2016] concat and
    runs the big matmuls on 4x/16x fewer pixels; numerically identical
    (golden-tested against the reference module in tests/test_cfi_ped.py).
    """

    out_channels: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = False):
        target_hw = features[0].shape[1:3]
        cin = sum(f.shape[-1] for f in features)
        conv = _Conv1x1Params(self.out_channels, cin, name="conv1x1")
        kernel = conv.kernel[0, 0].astype(self.dtype)

        x = None
        off = 0
        for f in features:
            c = f.shape[-1]
            y = jax.lax.dot_general(
                f.astype(self.dtype), kernel[off: off + c],
                (((3,), (0,)), ((), ())),
            )
            if f.shape[1:3] != target_hw:
                y = resize_bilinear(y, target_hw)
            x = y if x is None else x + y
            off += c
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn",
        )(x)
        x = nn.relu(x)
        return SqueezeExcitation(dtype=self.dtype, name="se_block")(x)


class EfficientASPP(nn.Module):
    """Memory-efficient ASPP: reduce -> {4 depthwise dilated 3x3 + global} ->
    grouped 1x1 fuse -> expand.

    Reference: feature_integration.py:248-416.
    """

    in_channels: int = 512
    out_channels: int = 256
    reduction_factor: int = 4
    dilation_rates: Sequence[int] = (1, 6, 12, 18)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        rc = self.in_channels // self.reduction_factor
        size = x.shape[1:3]

        x = ConvBNReLU(rc, kernel=1, dtype=self.dtype, name="reduce")(x, train)

        branches = []
        for i, rate in enumerate(self.dilation_rates):
            branches.append(
                ConvBNReLU(
                    rc, kernel=3, dilation=rate, groups=rc,
                    dtype=self.dtype, name=f"branch{i}",
                )(x, train)
            )
        # Global context branch: GAP -> 1x1 conv -> BN -> ReLU -> broadcast.
        g = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(self.dtype)
        g = ConvBNReLU(rc, kernel=1, dtype=self.dtype, name="global_branch")(g, train)
        # Bilinear upsample of a 1x1 map == broadcast (parity with
        # F.interpolate(global, size) on a 1x1 input).
        g = jnp.broadcast_to(g, (g.shape[0], size[0], size[1], rc))
        branches.append(g)

        x = jnp.concatenate(branches, axis=-1)  # [B, H, W, rc * 5], branch-major
        x = ConvBNReLU(rc, kernel=1, groups=rc, dtype=self.dtype, name="fusion")(x, train)
        x = ConvBNReLU(self.out_channels, kernel=1, dtype=self.dtype, name="expand")(x, train)
        return x
