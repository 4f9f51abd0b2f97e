"""Hiera hierarchical vision transformer (SAM2 image-encoder trunk) in JAX.

The reference delegates its encoder to the external ``sam2`` package's Hiera
trunk (reference: models/feature_encoding.py:107,156-159) — PyTorch modules
running cuDNN kernels.  This is a from-scratch, TPU-first reimplementation of
that public architecture (Hiera, Ryali et al. ICML 2023; SAM2, Meta 2024):

* channels-last [B, H, W, C] end to end — patch embed lowers to one MXU conv,
  every Linear is a lane-major matmul;
* windowed attention is expressed as a batched dense attention over
  [B * num_windows, window^2, C] blocks (no attention matrix ever hits HBM at
  stage 1/2 once the fused Pallas kernel is enabled — see
  spegnet_tpu.ops.attention);
* static shapes everywhere: window padding amounts are trace-time constants
  because the encoder contract requires H, W divisible by 32
  (reference: feature_encoding.py:232-233).

Architecture recap (Hiera-Large):
  patch embed 7x7/s4 -> 4 stages of MultiScaleBlocks, depths [2, 6, 36, 4],
  channels [144, 288, 576, 1152], heads [2, 4, 8, 16]; stage transitions do
  2x2 max-pool Q-pooling with a channel-doubling skip projection; window sizes
  per stage [8, 4, 16, 8] with blocks {23, 33, 43} using global attention;
  absolute position embedding = bicubic-resized 7x7 background embed + tiled
  8x8 window embed.

Feature pyramid out: [H/4 x C1, H/8 x C2, H/16 x C3, H/32 x C4]
(reference: models/feature_encoding.py:209-236).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from spegnet_tpu.ops.attention import scaled_dot_product_attention
from spegnet_tpu.ops.resize import resize_bicubic


@dataclasses.dataclass(frozen=True)
class HieraConfig:
    embed_dim: int
    num_heads: int
    stages: Tuple[int, ...]
    global_att_blocks: Tuple[int, ...]
    window_pos_embed_bkg_spatial_size: Tuple[int, int]
    window_spec: Tuple[int, ...]
    dim_mul: float = 2.0
    head_mul: float = 2.0
    q_stride: Tuple[int, int] = (2, 2)
    mlp_ratio: float = 4.0

    @property
    def depth(self) -> int:
        return sum(self.stages)

    @property
    def stage_ends(self) -> Tuple[int, ...]:
        return tuple(sum(self.stages[: i + 1]) - 1 for i in range(len(self.stages)))

    @property
    def q_pool_blocks(self) -> Tuple[int, ...]:
        # First block of stages 2..4 pools (q_pool = 3 stage transitions).
        return tuple(e + 1 for e in self.stage_ends[:3])

    @property
    def channels(self) -> Tuple[int, ...]:
        return tuple(int(self.embed_dim * self.dim_mul**i) for i in range(len(self.stages)))


# Variant table.  Channel widths follow the reference encoder's table
# (reference: models/feature_encoding.py:141-148); stage/window/global-block
# hyperparameters follow the public SAM2.1 Hiera configs.  'test' is a
# framework-internal micro variant for CI / multi-chip dry runs.
HIERA_VARIANTS = {
    "tiny": HieraConfig(96, 1, (1, 2, 7, 2), (5, 7, 9), (7, 7), (8, 4, 14, 7)),
    "small": HieraConfig(96, 1, (1, 2, 11, 2), (7, 10, 13), (7, 7), (8, 4, 14, 7)),
    "base": HieraConfig(96, 1, (2, 3, 16, 3), (12, 16, 20), (14, 14), (8, 4, 14, 7)),
    "base_plus": HieraConfig(112, 2, (2, 3, 16, 3), (12, 16, 20), (14, 14), (8, 4, 14, 7)),
    "large": HieraConfig(144, 2, (2, 6, 36, 4), (23, 33, 43), (7, 7), (8, 4, 16, 8)),
    "huge": HieraConfig(256, 4, (2, 6, 36, 4), (23, 33, 43), (7, 7), (8, 4, 16, 8)),
    "test": HieraConfig(16, 1, (1, 1, 1, 1), (2,), (7, 7), (2, 2, 2, 2)),
}


def _window_partition(x: jnp.ndarray, ws: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """[B, H, W, C] -> [B * nWh * nWw, ws, ws, C], zero-padding H/W to ws."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)
    return x, (hp, wp)


def _window_unpartition(
    x: jnp.ndarray, ws: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    hp, wp = pad_hw
    h, w = hw
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w, :]


def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def compute_pos_embed(bkg: jnp.ndarray, win: jnp.ndarray,
                      hw: Tuple[int, int]) -> jnp.ndarray:
    """Absolute position embedding: bicubic-resized background [Hb, Wb, C] +
    tiled window embed [ws, ws, C] -> [h, w, C].  Pure function (testable
    standalone); SAM2 Hiera `_get_pos_embed` semantics."""
    h, w = hw
    pe = resize_bicubic(bkg, (h, w))
    tiles = (h // win.shape[0], w // win.shape[1], 1)
    return pe + jnp.tile(win, tiles)


class _LinearParams(nn.Module):
    """Dense-compatible parameter holder ({kernel, bias} with nn.Dense's
    names, shapes and initializers) whose weights are also directly
    accessible (setup-style), so fused kernels can consume transformed
    (lane-padded) views.  Keeps checkpoints and the torch importer
    byte-identical while the TPU fast paths use padded weight layouts."""

    features: int
    in_features: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.linear.default_kernel_init,
            (self.in_features, self.features), jnp.float32,
        )
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)

    def __call__(self, x, transform=None):
        kernel, bias = self.kernel, self.bias
        if transform is not None:
            kernel, bias = transform(kernel, bias)
        y = jax.lax.dot_general(
            x, kernel.astype(self.dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
        )
        return y + bias.astype(self.dtype)


class _LayerNormParams(nn.Module):
    """LayerNorm with nn.LayerNorm's param names/shapes/initializers
    ({scale, bias}) and directly accessible weights for fused kernels.
    Normalization math in f32, eps 1e-6 (torch/SAM2 convention)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-6

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones,
                                (self.features,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        xc = x32 - mu
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + self.epsilon) * self.scale + self.bias
        return y.astype(self.dtype)


class PatchEmbed(nn.Module):
    """7x7 stride-4 patch-embed conv, lowered space-to-depth.

    XLA's direct lowering of a 7x7/s4 conv on a 3-channel input runs at
    ~6 TF/s on the v5e (the 3-deep contraction defeats MXU tiling).  Instead:
    rearrange the input into 4x4 pixel cells ([B, H/4, W/4, 48]) — a 7-tap
    stride-4 window then spans exactly 2 cells per axis — and run ONE dense
    2x2 conv with the 7x7 kernel scattered into a [2, 2, 48, C] weight
    (unused sub-positions zero).  Identical math, reordered summation.

    The parameter keeps nn.Conv's names/shapes/initializers
    ({kernel: [7, 7, 3, C], bias: [C]}), so checkpoints and the torch
    importer are unchanged.  (Reference encoder patch embed:
    external sam2 Hiera trunk, see models/feature_encoding.py:156.)
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param("kernel", nn.linear.default_kernel_init,
                            (7, 7, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        if h % 4 or w % 4:
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(self.dtype), (4, 4), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(self.dtype)
        # tap i covers input row 4p + (i - 3): cell p-1 (sub-row i+1) for
        # i < 3, cell p (sub-row i-3) for i >= 3.
        w2 = jnp.zeros((2, 4, 2, 4, cin, self.features), jnp.float32)
        for i in range(7):
            dy, sy = (0, i + 1) if i < 3 else (1, i - 3)
            for j in range(7):
                dx, sx = (0, j + 1) if j < 3 else (1, j - 3)
                w2 = w2.at[dy, sy, dx, sx].set(kernel[i, j])
        w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 16 * cin,
                                                    self.features)
        # Space-to-depth via 4 strided ROW slices + free row-major reshapes
        # (a single 6-D transpose with (4, 4, 3) inner dims is a pathological
        # tiled-layout shuffle — measured as slow as the original conv).
        # Channel order after concat: (sub_row, sub_col, cin) — matches w2.
        rows = [x[:, r::4].reshape(b, h // 4, w // 4, 4 * cin)
                for r in range(4)]
        cells = jnp.concatenate(rows, axis=-1)
        y = jax.lax.conv_general_dilated(
            cells, w2.astype(self.dtype), (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class MultiScaleAttention(nn.Module):
    """Attention with optional 2x2 max-pool Q-pooling (stage transitions).

    On TPU (non-pooling blocks) the fused lane-padded path is used: the qkv
    weight columns are zero-padded so each (q|k|v, head) owns a 128-aligned
    lane block, the Pallas kernel indexes those blocks straight out of the
    matmul output (no transposes/slices in HBM — they previously cost more
    than the attention math), and the output projection absorbs the padded
    layout through zero rows.  Numerically exact: pad lanes contribute 0 to
    both attention matmuls (see ops/pallas_attention.py).
    """

    dim: int
    dim_out: int
    num_heads: int
    q_pool: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.dim_out // self.num_heads

    @property
    def hp(self) -> int:
        """Per-head lane width (head_dim zero-padded to a 128 multiple)."""
        return -(-self.head_dim // 128) * 128

    def setup(self):
        self.qkv = _LinearParams(3 * self.dim_out, in_features=self.dim,
                                 dtype=self.dtype)
        self.proj = _LinearParams(self.dim_out, in_features=self.dim_out,
                                  dtype=self.dtype)

    def pad_qkv(self, kernel, bias):
        # [C, 3C] -> [C, 3, H, D] -> zero-pad D to HP -> [C, 3*H*HP]
        heads, d, hp = self.num_heads, self.head_dim, self.hp
        k5 = kernel.reshape(kernel.shape[0], 3, heads, d)
        k5 = jnp.pad(k5, ((0, 0), (0, 0), (0, 0), (0, hp - d)))
        b5 = jnp.pad(bias.reshape(3, heads, d), ((0, 0), (0, 0), (0, hp - d)))
        return k5.reshape(-1, 3 * heads * hp), b5.reshape(-1)

    def pad_proj(self, kernel, bias):
        # [C, C] -> zero rows at each head's pad lanes -> [H*HP, C]
        heads, d, hp = self.num_heads, self.head_dim, self.hp
        k3 = kernel.reshape(heads, d, self.dim_out)
        k3 = jnp.pad(k3, ((0, 0), (0, hp - d), (0, 0)))
        return k3.reshape(heads * hp, self.dim_out), bias

    def __call__(self, x):
        from spegnet_tpu.ops.attention import USE_PALLAS
        from spegnet_tpu.ops.pallas_attention import (
            fused_attention_lanes,
            lanes_supported,
        )

        b, h, w, _ = x.shape
        head_dim = self.head_dim
        use_lanes = (
            not self.q_pool
            and USE_PALLAS in ("auto", "1")
            and lanes_supported(h * w, head_dim)
        )
        if use_lanes:
            qkv_p = self.qkv(x.reshape(b, h * w, -1), transform=self.pad_qkv)
            o_p = fused_attention_lanes(qkv_p, self.num_heads, head_dim ** -0.5)
            out = self.proj(o_p, transform=self.pad_proj)
            return out.reshape(b, h, w, self.dim_out)

        qkv = self.qkv(x).reshape(b, h * w, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.q_pool:
            q = _max_pool_2x2(q.reshape(b, h, w, -1))
            h, w = q.shape[1:3]
            q = q.reshape(b, h * w, self.num_heads, head_dim)
        o = scaled_dot_product_attention(q, k, v)  # [B, L_q, heads, head_dim]
        o = o.reshape(b, h, w, self.dim_out)
        return self.proj(o)


class MultiScaleBlock(nn.Module):
    """Hiera block: LN -> (window) attention [+ Q-pool] -> residual -> LN -> MLP.

    Non-pooling blocks on TPU run as ONE fused Pallas kernel.  The preferred
    path is the transposed window-major kernel (ops/fused_block_t.py): the
    surrounding stage keeps activations as [B, C, N] (channels on sublanes —
    every Hiera width is a 16-row tile multiple — tokens window-major on
    lanes), which removes both the per-block window partition/unpartition HBM
    round trips and the 72->128 head-lane padding of the gen-1 kernel
    (ops/fused_block.py, still used for small-window shapes the T-kernel
    does not cover).  `t_ctx = (H, W, L)` marks that the input is already in
    the transposed layout with attention groups of L tokens.

    Pooling/projection blocks (3 stage transitions in Hiera-L) and non-TPU
    backends use the decomposed path.
    """

    dim: int
    dim_out: int
    num_heads: int
    q_stride: bool = False
    window_size: int = 0
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    t_ctx: Optional[Tuple[int, int, int]] = None
    t_weights_only: bool = False
    # W8A8 projections (ops/fused_block_t_i8.py): flagged inference speed
    # mode, eligibility re-checked per geometry (supported_i8).
    int8: bool = False
    # Sequence parallelism: mesh axis the [B, C, N] token dim is sharded
    # over.  Windowed kernels run shard-local (halo-free); global-attention
    # blocks set t_global_ref and run the token-major XLA reference in the
    # SAME layout, GSPMD inserting the k/v gathering collectives.
    token_axis: Optional[str] = None
    t_global_ref: bool = False

    @nn.compact
    def __call__(self, x):
        from spegnet_tpu.ops.attention import USE_PALLAS
        from spegnet_tpu.ops import fused_block as fb
        from spegnet_tpu.ops import fused_block_i8 as fb_i8
        from spegnet_tpu.ops import fused_block_t as fbt
        from spegnet_tpu.ops import fused_block_t_i8 as fbt_i8

        hidden = int(self.dim_out * self.mlp_ratio)
        # Exact (erf) GELU matches torch nn.GELU bit-for-bit in f32 parity
        # tests; under bf16 compute the tanh approximation is used instead:
        # max |gelu_erf - gelu_tanh| = 5.0e-4 on [-6, 6] — below bf16 rounding
        # at those magnitudes — while erf costs ~3.7x more VPU time on TPU
        # (~30 ms/batch-16 across the Hiera-L trunk, measured).
        approx_gelu = self.dtype == jnp.bfloat16

        norm1 = _LayerNormParams(self.dim, dtype=self.dtype, name="norm1")
        norm2 = _LayerNormParams(self.dim_out, dtype=self.dtype, name="norm2")
        attn = MultiScaleAttention(
            dim=self.dim, dim_out=self.dim_out, num_heads=self.num_heads,
            q_pool=self.q_stride, dtype=self.dtype, name="attn",
        )
        fc1 = _LinearParams(hidden, in_features=self.dim_out,
                            dtype=self.dtype, name="mlp_fc1")
        fc2 = _LinearParams(self.dim_out, in_features=hidden,
                            dtype=self.dtype, name="mlp_fc2")

        if self.t_ctx is not None and self.q_stride:
            # Unified-layout (Morton) stage transition: x is [B, C, N] in
            # Z-order at the INPUT grid (h, w); output is [B, Cout, N/4] in
            # Z-order at (h/2, w/2) — the qpool kernel's ::4 compaction IS
            # the Morton pooling map, so no relayout exists anywhere.  The
            # proj + MLP tail runs in the same [B, C, N] layout (channels
            # on sublanes), replacing the window-major path's two
            # token-major transposes + from_t + to_t (tools/morton_seg.py:
            # 2.6 ms/fwd batch-16 across the three transitions).
            heads, d = self.num_heads, self.dim_out // self.num_heads
            hp = fbt.round_hp(d)
            dt = self.dtype
            h, w, l = self.t_ctx
            proj_mod = _LinearParams(self.dim_out, in_features=self.dim,
                                     dtype=self.dtype, name="proj")
            kq = attn.qkv.kernel.reshape(self.dim, 3, heads, d)
            kq = kq.transpose(1, 2, 3, 0)
            kq = jnp.pad(kq, ((0, 0), (0, 0), (0, hp - d), (0, 0)))
            kq = kq.reshape(3 * heads * hp, self.dim)
            bq = jnp.pad(attn.qkv.bias.reshape(3, heads, d),
                         ((0, 0), (0, 0), (0, hp - d))).reshape(-1, 1)
            wts = fbt.QPoolWeights(
                ln_scale=norm1.scale.reshape(-1, 1),
                ln_bias=norm1.bias.reshape(-1, 1),
                wqkv_t=kq.astype(dt), bqkv_t=bq.astype(dt),
                wsc_t=proj_mod.kernel.T.astype(dt),
                bsc_t=proj_mod.bias.reshape(-1, 1).astype(dt),
            )
            if (self.int8 and self.token_axis is None
                    and fbt_i8.qpool_supported_i8(
                        self.dim, heads, l, x.shape[2], dt,
                        batch=x.shape[0])):
                # W8A8 transition front (t23/t34 — Cin 288/576; t12's
                # Cin=144 misses the int8 sublane tile and stays bf16).
                o_p, sc_p = fbt_i8.qpool_front_i8(
                    x, fbt_i8.pack_qpool_i8(wts), heads, hp, l,
                    d ** -0.5, 1e-6)
            else:
                o_p, sc_p = fbt.qpool_front(x, wts, heads, hp, l,
                                            d ** -0.5, 1e-6,
                                            self.token_axis)
            kp = attn.proj.kernel.reshape(heads, d, self.dim_out)
            kp = jnp.pad(kp, ((0, 0), (0, hp - d), (0, 0)))
            kp = kp.reshape(heads * hp, self.dim_out)
            out1 = sc_p + (
                jnp.einsum("fc,bfn->bcn", kp.astype(dt), o_p,
                           preferred_element_type=jnp.float32).astype(dt)
                + attn.proj.bias.astype(dt)[None, :, None])
            # LN + MLP in the transposed layout (channels on sublanes).
            y32 = out1.astype(jnp.float32)
            mu = y32.mean(1, keepdims=True)
            yc = y32 - mu
            y = (yc * jax.lax.rsqrt((yc * yc).mean(1, keepdims=True) + 1e-6)
                 * norm2.scale[None, :, None]
                 + norm2.bias[None, :, None]).astype(dt)
            y = jnp.einsum("cf,bcn->bfn", fc1.kernel.astype(dt), y,
                           preferred_element_type=jnp.float32).astype(dt) \
                + fc1.bias.astype(dt)[None, :, None]
            y = nn.gelu(y, approximate=approx_gelu)
            y = jnp.einsum("fc,bfn->bcn", fc2.kernel.astype(dt), y,
                           preferred_element_type=jnp.float32).astype(dt) \
                + fc2.bias.astype(dt)[None, :, None]
            return out1 + y

        if self.t_ctx is not None:
            # Transposed window-major fused path: x is [B, C, N].
            heads, d = attn.num_heads, attn.head_dim
            hp = fbt.round_hp(d)
            _, _, l_t = self.t_ctx
            dt = self.dtype
            kq = attn.qkv.kernel.reshape(self.dim, 3, heads, d)
            kq = kq.transpose(1, 2, 3, 0)
            kq = jnp.pad(kq, ((0, 0), (0, 0), (0, hp - d), (0, 0)))
            kq = kq.reshape(3 * heads * hp, self.dim)
            bq = jnp.pad(attn.qkv.bias.reshape(3, heads, d),
                         ((0, 0), (0, 0), (0, hp - d))).reshape(-1, 1)
            kp = attn.proj.kernel.reshape(heads, d, self.dim_out)
            kp = jnp.pad(kp, ((0, 0), (0, hp - d), (0, 0)))
            kp = kp.reshape(heads * hp, self.dim_out).T
            weights = fbt.TBlockWeights(
                ln1_scale=norm1.scale.reshape(-1, 1),
                ln1_bias=norm1.bias.reshape(-1, 1),
                wqkv_t=kq.astype(dt), bqkv_t=bq.astype(dt),
                wproj_t=kp.astype(dt),
                bproj_t=attn.proj.bias.reshape(-1, 1).astype(dt),
                ln2_scale=norm2.scale.reshape(-1, 1),
                ln2_bias=norm2.bias.reshape(-1, 1),
                wfc1_t=fc1.kernel.T.astype(dt),
                bfc1_t=fc1.bias.reshape(-1, 1).astype(dt),
                wfc2_t=fc2.kernel.T.astype(dt),
                bfc2_t=fc2.bias.reshape(-1, 1).astype(dt),
            )
            if self.t_weights_only:
                # Runs of identical blocks execute as ONE lax.scan over
                # stacked weights (see Hiera.__call__); this block only
                # contributes its transposed weight views.
                return weights
            if self.t_global_ref:
                # Global attention under sequence parallelism: stay in the
                # [B, C, N] layout but run the token-major XLA reference —
                # GSPMD partitions it over the ambient mesh and inserts the
                # cross-shard k/v collectives (softmax attention is
                # permutation-equivariant, so the Morton/window-major token
                # order is immaterial).
                return fbt.block_t_reference(
                    x, weights, heads=heads, hp=hp, l=l_t, scale=d ** -0.5,
                    eps=1e-6, approx_gelu=approx_gelu)
            if (self.int8 and self.token_axis is None
                    and fbt_i8.supported_i8(
                        self.dim, self.num_heads, l_t, x.shape[2], dt,
                        batch=x.shape[0])):
                return fbt_i8.fused_block_t_i8(
                    x, fbt_i8.pack_i8(weights), heads, hp, l_t,
                    d ** -0.5, 1e-6, approx_gelu)
            return fbt.fused_block_t(x, weights, heads, hp, l_t,
                                     d ** -0.5, 1e-6, approx_gelu,
                                     self.token_axis)

        h, w = x.shape[1:3]
        ws = self.window_size
        l = ws * ws if ws > 0 else h * w
        divisible = ws == 0 or (h % ws == 0 and w % ws == 0)

        proj_mod = None
        if self.dim != self.dim_out:
            proj_mod = _LinearParams(self.dim_out, in_features=self.dim,
                                     dtype=self.dtype, name="proj")

        use_qpool_t = (
            self.q_stride
            and proj_mod is not None
            and ws > 1 and ws % 2 == 0 and divisible
            and USE_PALLAS in ("auto", "1")
            and self.dtype == jnp.bfloat16
            and fbt.qpool_supported(self.dim, self.num_heads, l, h * w,
                                    self.dtype, batch=x.shape[0])
        )
        if use_qpool_t:
            # Fused transition front (ops/fused_block_t.py): LN -> qkv +
            # shortcut proj -> pooled-q window attention in ONE kernel on the
            # micro-window transposed layout; 2x2 Q-pooling is a lane
            # roll-max whose off-group lanes are discarded by the ::4
            # compaction.  Replaces the decomposed path's worst offender
            # (stage-1->2 transition: 10.5 ms of window-partition copies and
            # [4, 16] micro-attentions at batch 16).
            heads, d = self.num_heads, self.dim_out // self.num_heads
            hp = fbt.round_hp(d)
            dt = self.dtype
            kq = attn.qkv.kernel.reshape(self.dim, 3, heads, d)
            kq = kq.transpose(1, 2, 3, 0)
            kq = jnp.pad(kq, ((0, 0), (0, 0), (0, hp - d), (0, 0)))
            kq = kq.reshape(3 * heads * hp, self.dim)
            bq = jnp.pad(attn.qkv.bias.reshape(3, heads, d),
                         ((0, 0), (0, 0), (0, hp - d))).reshape(-1, 1)
            wts = fbt.QPoolWeights(
                ln_scale=norm1.scale.reshape(-1, 1),
                ln_bias=norm1.bias.reshape(-1, 1),
                wqkv_t=kq.astype(dt), bqkv_t=bq.astype(dt),
                wsc_t=proj_mod.kernel.T.astype(dt),
                bsc_t=proj_mod.bias.reshape(-1, 1).astype(dt),
            )
            xt = fbt.to_t_micro(x, ws)
            if self.int8 and fbt_i8.qpool_supported_i8(
                    self.dim, heads, l, h * w, dt, batch=x.shape[0]):
                o_p, sc_p = fbt_i8.qpool_front_i8(
                    xt, fbt_i8.pack_qpool_i8(wts), heads, hp, l,
                    d ** -0.5, 1e-6)
            else:
                o_p, sc_p = fbt.qpool_front(xt, wts, heads, hp, l,
                                            d ** -0.5, 1e-6)
            kp = attn.proj.kernel.reshape(heads, d, self.dim_out)
            kp = jnp.pad(kp, ((0, 0), (0, hp - d), (0, 0)))
            kp = kp.reshape(heads * hp, self.dim_out)
            o_n = o_p.transpose(0, 2, 1)              # [B, N/4, H*HP]
            out1 = sc_p.transpose(0, 2, 1) + (
                jnp.einsum("bnf,fc->bnc", o_n, kp.astype(dt),
                           preferred_element_type=jnp.float32).astype(dt)
                + attn.proj.bias.astype(dt))
            x2 = fbt.from_t(out1.transpose(0, 2, 1), ws // 2,
                            (h // 2, w // 2))
            y = norm2(x2)
            y = fc1(y)
            y = nn.gelu(y, approximate=approx_gelu)
            y = fc2(y)
            return x2 + y
        n_rows = x.shape[0] * ((h // ws) * (w // ws) if ws > 0 else 1) \
            if divisible else 0
        use_fused = (
            self.dim == self.dim_out
            and not self.q_stride
            and USE_PALLAS in ("auto", "1")
            and divisible
            and fb.supported(1, l, self.dtype, batch_rows=n_rows)
        )
        if use_fused:
            b = x.shape[0]
            if ws > 0:
                xw, pad_hw = _window_partition(x, ws)
                xw = xw.reshape(-1, l, self.dim)
            else:
                xw = x.reshape(b, l, self.dim)
            wqkv, bqkv = attn.pad_qkv(attn.qkv.kernel, attn.qkv.bias)
            wproj, bproj = attn.pad_proj(attn.proj.kernel, attn.proj.bias)
            dt = self.dtype
            weights = fb.BlockWeights(
                ln1_scale=norm1.scale.reshape(1, -1),
                ln1_bias=norm1.bias.reshape(1, -1),
                wqkv=wqkv.astype(dt), bqkv=bqkv.reshape(1, -1).astype(dt),
                wproj=wproj.astype(dt), bproj=bproj.reshape(1, -1).astype(dt),
                ln2_scale=norm2.scale.reshape(1, -1),
                ln2_bias=norm2.bias.reshape(1, -1),
                wfc1=fc1.kernel.astype(dt),
                bfc1=fc1.bias.reshape(1, -1).astype(dt),
                wfc2=fc2.kernel.astype(dt),
                bfc2=fc2.bias.reshape(1, -1).astype(dt),
            )
            if self.int8 and fb_i8.supported_i8(
                    xw.shape[0], l, self.dim, dt, batch_rows=n_rows):
                # W8A8 gen-1 path (Hiera-L stage 4): inference-only, see
                # ops/fused_block_i8.py.
                out = fb_i8.fused_block_i8(
                    xw, fb_i8.pack_i8(weights), attn.num_heads, attn.hp,
                    attn.head_dim ** -0.5, 1e-6, approx_gelu,
                )
            else:
                out = fb.fused_block(
                    xw, weights, attn.num_heads, attn.hp,
                    attn.head_dim ** -0.5, 1e-6, approx_gelu,
                )
            if ws > 0:
                out = out.reshape(-1, ws, ws, self.dim)
                return _window_unpartition(out, ws, pad_hw, (h, w))
            return out.reshape(b, h, w, self.dim)

        shortcut = x
        x = norm1(x)

        if self.dim != self.dim_out:
            proj = proj_mod(x)
            shortcut = _max_pool_2x2(proj) if self.q_stride else proj

        hw = x.shape[1:3]
        pad_hw = hw
        if ws > 0:
            x, pad_hw = _window_partition(x, ws)

        x = attn(x)

        if self.q_stride:
            # Q-pooling halved the spatial extent inside each window.
            ws = ws // 2
            hw = shortcut.shape[1:3]
            pad_h = (ws - hw[0] % ws) % ws if ws > 0 else 0
            pad_w = (ws - hw[1] % ws) % ws if ws > 0 else 0
            pad_hw = (hw[0] + pad_h, hw[1] + pad_w)

        if self.window_size > 0:
            x = _window_unpartition(x, ws, pad_hw, hw)

        x = shortcut + x
        y = norm2(x)
        y = fc1(y)
        y = nn.gelu(y, approximate=approx_gelu)
        y = fc2(y)
        return x + y


class Hiera(nn.Module):
    """The full trunk.  Input NHWC [B, H, W, 3], H and W divisible by 32.

    Returns the 4-stage feature pyramid, channels-last.
    """

    variant: str = "large"
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # rematerialize blocks (training memory vs FLOPs)
    # W8A8 block projections (ops/fused_block_t_i8.py), inference only —
    # callers must not set this on a differentiated path (no custom_vjp).
    int8: bool = False
    # Spatial (sequence) parallelism: shard the token-H axis over this mesh
    # axis.  Hiera's windows are non-overlapping, so windowed attention and
    # the 2x2 pooling transitions are halo-free under an H-sharding; XLA only
    # inserts collectives at the global-attention blocks.  The TPU answer to
    # "sequence scaling" for 1024^2+ inputs (survey §5 long-context row).
    spatial_axis: Optional[str] = None

    @property
    def config(self) -> HieraConfig:
        return HIERA_VARIANTS[self.variant]

    @property
    def channels(self) -> Tuple[int, ...]:
        return self.config.channels

    def get_output_shapes(self, height: int, width: int):
        """(C, H, W) per stage for a given input size
        (API parity with the reference encoder: feature_encoding.py:239-271)."""
        if height % 32 or width % 32:
            raise ValueError("Input dimensions must be divisible by 32")
        shapes = []
        for i, c in enumerate(self.channels):
            s = 4 * (2 ** i)
            shapes.append((c, height // s, width // s))
        return shapes

    def _pos_embed(self, hw: Tuple[int, int]) -> jnp.ndarray:
        cfg = self.config
        h, w = hw
        bkg = self.param(
            "pos_embed",
            nn.initializers.zeros,
            (*cfg.window_pos_embed_bkg_spatial_size, cfg.embed_dim),
        )
        win = self.param(
            "pos_embed_window",
            nn.initializers.zeros,
            (cfg.window_spec[0], cfg.window_spec[0], cfg.embed_dim),
        )
        return compute_pos_embed(bkg, win, (h, w)).astype(self.dtype)

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        if x.shape[1] % 32 or x.shape[2] % 32:
            raise ValueError("Input spatial dims must be divisible by 32")
        x = x.astype(self.dtype)
        x = PatchEmbed(cfg.embed_dim, dtype=self.dtype, name="patch_embed")(x)
        x = x + self._pos_embed(x.shape[1:3])

        from jax.sharding import PartitionSpec as P

        def _sp_mesh():
            mesh = jax.sharding.get_abstract_mesh()
            if (self.spatial_axis is None or mesh is None
                    or getattr(mesh, "empty", False)
                    or self.spatial_axis not in getattr(mesh, "axis_names", ())):
                return None
            return mesh

        def constrain(t):
            if _sp_mesh() is None:
                return t  # no sp mesh in context: run unsharded
            return jax.lax.with_sharding_constraint(
                t, P("data", self.spatial_axis, None, None)
            )

        # Sequence parallelism x fused kernels (SURVEY §5 long-context row):
        # when the ambient mesh carries the spatial axis (and a 'data' axis,
        # which the kernels' shard_map wrappers are built around), the
        # [B, C, N] trunk runs with its TOKEN dim sharded over it — windowed
        # kernels shard-local and halo-free, global blocks via the in-layout
        # XLA reference with GSPMD collectives (see MultiScaleBlock).
        sp_mesh = _sp_mesh()
        sp_n = 1
        if (sp_mesh is not None and "data" in sp_mesh.axis_names):
            sp_n = int(sp_mesh.shape[self.spatial_axis])
        sp_active = sp_n > 1
        sp_tok = self.spatial_axis if sp_active else None

        def constrain_t(t):
            if not sp_active:
                return t
            return jax.lax.with_sharding_constraint(
                t, P("data", None, self.spatial_axis))

        x = constrain(x)

        embed_dim, num_heads = cfg.embed_dim, cfg.num_heads
        cur_stage = 1
        outputs = []
        block_cls = MultiScaleBlock
        if self.remat:
            # Recompute block internals in the backward pass, keeping only the
            # MXU matmul outputs (dots policy): fits Hiera-L training at the
            # reference's batch 42 in a single v5e's 16 GB HBM.
            block_cls = nn.remat(
                MultiScaleBlock,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            )
        from spegnet_tpu.ops.attention import USE_PALLAS
        from spegnet_tpu.ops import fused_block_t as fbt
        from spegnet_tpu.ops import fused_block_t_i8 as fbt_i8

        # Per-block static configs (dims/heads/window), first pass.
        specs = []
        for i in range(cfg.depth):
            dim_out = embed_dim
            window_size = cfg.window_spec[cur_stage - 1]
            if i in cfg.global_att_blocks:
                window_size = 0
            if i - 1 in cfg.stage_ends:
                dim_out = int(embed_dim * cfg.dim_mul)
                num_heads = int(num_heads * cfg.head_mul)
                cur_stage += 1
            specs.append(dict(
                dim=embed_dim, dim_out=dim_out, heads=num_heads,
                q=i in cfg.q_pool_blocks, ws=window_size,
                end=i in cfg.stage_ends,
            ))
            embed_dim = dim_out

        # Transposed window-major layout management: runs of non-pooling
        # blocks execute on [B, C, N] activations (see ops/fused_block_t.py),
        # entering/leaving the layout at stage boundaries instead of paying a
        # window partition/unpartition per block.  Consecutive identical
        # T-blocks (stage 3's 14/9/9-block windowed runs in Hiera-L) run as
        # ONE lax.scan over their stacked transposed weights — one Pallas
        # program in the compiled module instead of one per block, which
        # keeps HLO size and compile time flat in depth (and gives the
        # canonical scan-over-layers remat during training).  Global
        # attention blocks accept any window ordering (softmax attention is
        # permutation-equivariant over tokens).
        # Layout state: None (NHWC) | int ws (window-major [B, C, N]) |
        # "z" (Morton [B, C, N] — the unified trunk layout, see
        # ops/fused_block_t.to_z).  Under Morton, one lane order serves
        # every window size AND the 2x2 pooling transitions (the qpool
        # kernel's ::4 compaction is the Morton pooling map), so the whole
        # trunk runs without a single mid-trunk relayout; stage outputs
        # for the pyramid exit via from_z on a side edge.
        t_order = None
        h = w = 0

        def pow2(v: int) -> bool:
            return v > 0 and (v & (v - 1)) == 0

        h0, w0 = x.shape[1:3]
        use_z = (
            os.environ.get("SPEGNET_MORTON", "auto") in ("auto", "1")
            and (self.spatial_axis is None or sp_active)
            and self.dtype == jnp.bfloat16
            and USE_PALLAS in ("auto", "1")
            and h0 == w0 and pow2(h0)
        )

        def block_mod(i, sp, t_ctx=None, weights_only=False, cls=None,
                      global_ref=False):
            return (cls or block_cls)(
                dim=sp["dim"], dim_out=sp["dim_out"], num_heads=sp["heads"],
                q_stride=sp["q"], window_size=sp["ws"],
                mlp_ratio=cfg.mlp_ratio, dtype=self.dtype, t_ctx=t_ctx,
                t_weights_only=weights_only, int8=self.int8,
                token_axis=sp_tok, t_global_ref=global_ref,
                name=f"block{i}",
            )

        i = 0
        while i < cfg.depth:
            sp = specs[i]
            if t_order is None:
                h, w = x.shape[1:3]
            ws_i = sp["ws"]
            l_i = ws_i * ws_i if ws_i else h * w
            if (t_order == "z" and sp["q"] and sp["dim"] != sp["dim_out"]
                    and ws_i > 1 and ws_i % 2 == 0 and pow2(ws_i)
                    and ws_i <= h
                    and (h * w) % sp_n == 0
                    and fbt.qpool_supported(sp["dim"], sp["heads"], l_i,
                                            (h * w) // sp_n, self.dtype,
                                            batch=x.shape[0])):
                # In-layout Morton stage transition: [B, C, N] in, pooled
                # [B, Cout, N/4] out, still Morton.  A transition is the
                # FIRST block of the new stage, so it is only also a stage
                # END for depth-1 stages.
                x = constrain_t(block_mod(i, sp, t_ctx=(h, w, l_i))(x))
                h, w = h // 2, w // 2
                if sp["end"]:
                    outputs.append(constrain(fbt.from_z(x, (h, w))))
                i += 1
                continue
            # Global blocks under sequence parallelism stay IN layout via
            # the token-major XLA reference (any geometry); everything else
            # needs the kernel gate at the SHARD-local token count.
            sp_global = sp_active and ws_i == 0
            can_t = (
                (self.spatial_axis is None or sp_active)
                and sp["dim"] == sp["dim_out"]
                and not sp["q"]
                and USE_PALLAS in ("auto", "1")
                and (ws_i == 0 or (h % ws_i == 0 and w % ws_i == 0))
                and self.dtype == jnp.bfloat16
                and (h * w) % sp_n == 0
                and (sp_global
                     or fbt.supported(sp["dim"], sp["heads"], l_i,
                                      (h * w) // sp_n, self.dtype,
                                      batch=x.shape[0]))
            )
            if use_z:
                # Morton serves every window size; only pow2 windows tile
                # as contiguous lane runs.
                fits = can_t and (ws_i == 0 or pow2(ws_i))
                if t_order is not None and not fits:
                    x = fbt.from_z(x, (h, w))
                    t_order = None
                if fits and t_order is None:
                    t_order = "z"
                    x = constrain_t(fbt.to_z(x))
            else:
                fits = can_t and (t_order is None or ws_i == 0
                                  or ws_i == t_order)
                if t_order is not None and not fits:
                    x = fbt.from_t(x, t_order, (h, w))
                    t_order = None
                if can_t and t_order is None:
                    t_order = ws_i
                    x = constrain_t(fbt.to_t(x, t_order))

            if t_order is not None:
                # Extend the run over identical specs (dict equality covers
                # dims/heads/window AND the stage-end flag, so a run never
                # crosses a stage boundary or swallows a differing block).
                j = i + 1
                while j < cfg.depth and specs[j] == sp:
                    j += 1
                run = list(range(i, j))
                t_ctx = (h, w, l_i)
                if sp_global and len(run) > 1:
                    # Global-attention runs under sequence parallelism take
                    # the in-layout XLA reference per block (singletons in
                    # every production variant; a plain loop covers the
                    # general case).
                    for k in run:
                        x = block_mod(k, sp, t_ctx=t_ctx, global_ref=True)(x)
                    x = constrain_t(x)
                elif len(run) == 1:
                    x = block_mod(i, sp, t_ctx=t_ctx,
                                  global_ref=sp_global)(x)
                    if sp_global:
                        x = constrain_t(x)
                else:
                    tws = [block_mod(k, sp, t_ctx=t_ctx, weights_only=True,
                                     cls=MultiScaleBlock)(x) for k in run]
                    heads = sp["heads"]
                    hp = fbt.round_hp(sp["dim_out"] // heads)
                    scale = (sp["dim_out"] // heads) ** -0.5
                    approx = self.dtype == jnp.bfloat16
                    # W8A8 scan: quantize each block's weights, stack, and
                    # scan the int8 kernel (inference only — never remat'd;
                    # the i8 kernel has no token-sharded wrapper, so sp
                    # keeps bf16).
                    use_i8 = (self.int8 and not sp_active
                              and fbt_i8.supported_i8(
                                  sp["dim"], heads, l_i, h * w, self.dtype,
                                  batch=x.shape[0]))
                    if use_i8:
                        tws = [fbt_i8.pack_i8(w) for w in tws]
                    stacked = jax.tree_util.tree_map(
                        lambda *a: jnp.stack(a), *tws)
                    blk = (fbt_i8.fused_block_t_i8 if use_i8
                           else fbt.fused_block_t)
                    extra = () if use_i8 else (sp_tok,)

                    def body(xc, wts, heads=heads, hp=hp, l=l_i, scale=scale,
                             blk=blk, extra=extra):
                        return blk(xc, wts, heads, hp, l, scale, 1e-6,
                                   approx, *extra), None

                    if self.remat and not use_i8:
                        body = jax.checkpoint(
                            body, policy=jax.checkpoint_policies
                            .dots_with_no_batch_dims_saveable)
                    x, _ = jax.lax.scan(body, x, stacked)
                ended = specs[j - 1]["end"]
                i = j
            else:
                x = block_mod(i, sp)(x)
                ended = sp["end"]
                i += 1

            if ended:
                if t_order == "z":
                    # Emit the NHWC pyramid output on a side edge; the
                    # trunk itself NEVER leaves the Morton layout (the next
                    # block is an in-layout transition).  Unused outputs
                    # (stage 1) are dead code under jit.
                    outputs.append(constrain(fbt.from_z(x, (h, w))))
                else:
                    if t_order is not None:
                        x = fbt.from_t(x, t_order, (h, w))
                        t_order = None
                    x = constrain(x)
                    outputs.append(x)
        return outputs
