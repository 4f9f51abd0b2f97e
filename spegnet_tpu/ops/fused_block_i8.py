"""int8 (W8A8) variant of the gen-1 token-major fused Hiera block kernel.

Completes the flagged int8 encoder mode (ops/fused_block_t_i8.py) for the
one stage that does NOT run the transposed T-kernel: Hiera-L stage 4
(C=1152, 16 heads — `fused_block_t.supported` keeps heads > 8 on the gen-1
lanes layout because the per-head transposed attention dots get too small).
Same quantization scheme, rotated into the token-major layout:

* weights: symmetric per-output-COLUMN int8.  Gen-1 weights are [K, M]
  with M the output features on lanes, so one f32 scale per column;
  packed at trace time (``pack_i8``) — under jit a one-off
  constant-folded elementwise pass.
* activations: symmetric per-token int8, computed IN-KERNEL.  Tokens live
  on sublanes here, so the scale is a [T, 1] column from a lane absmax.
* qkv / proj / fc1 / fc2 contract int8 x int8 -> int32 on the MXU;
  dequantization is a rank-1 f32 rescale (token scale x column scale)
  fused into the bias add.  Attention (q.k, softmax, p.v), LayerNorm,
  GELU and the residual stream stay bf16/f32 — identical to the bf16
  kernel (ops/fused_block.py).

The lane-padded head convention (head_dim 72 -> hp 128, zero pad) is
numerically inert under quantization too: zero weight columns quantize to
zero codes with the floor scale, and the attention output's pad lanes are
exact zeros so the per-token absmax for the proj contraction never sees
garbage.

Inference-only: no custom_vjp (training runs the bf16 path).  Accuracy is
a measured quantity, not a contract — the bench publishes the int8 path's
sigmoid-mask MAE vs the f32 decomposed model (BASELINE.md plan of record).

Reference behavior: same SAM2 Hiera MultiScaleBlock as fused_block
(reference: models/feature_encoding.py:46-57); the quantization has no
reference counterpart (the reference is bf16/f32 PyTorch only).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spegnet_tpu.ops import fused_block as _fb
from spegnet_tpu.ops.fused_block import (
    BlockWeights,
    _layernorm,
    _pick_wins,
    _VMEM_LIMIT,
)
from spegnet_tpu.ops.fused_block_t import spmd_mode


class BlockWeightsI8(NamedTuple):
    """Column-quantized token-major block weights.

    w*_q are int8 [K, M]; s* are the matching f32 per-column scales
    [1, M]; biases are f32 [1, M] (added post-dequant in f32).  LN params
    as in BlockWeights.
    """

    ln1_scale: jax.Array   # [1, C] f32
    ln1_bias: jax.Array    # [1, C] f32
    wqkv_q: jax.Array      # [C, 3*H*HP] int8
    sqkv: jax.Array        # [1, 3*H*HP] f32
    bqkv: jax.Array        # [1, 3*H*HP] f32
    wproj_q: jax.Array     # [H*HP, C] int8
    sproj: jax.Array       # [1, C] f32
    bproj: jax.Array       # [1, C] f32
    ln2_scale: jax.Array   # [1, C] f32
    ln2_bias: jax.Array    # [1, C] f32
    wfc1_q: jax.Array      # [C, hidden] int8
    sfc1: jax.Array        # [1, hidden] f32
    bfc1: jax.Array        # [1, hidden] f32
    wfc2_q: jax.Array      # [hidden, C] int8
    sfc2: jax.Array        # [1, C] f32
    bfc2: jax.Array        # [1, C] f32


def quantize_cols(w):
    """[K, M] -> (int8 [K, M], f32 scales [1, M]): symmetric per-column
    absmax.  |w| <= absmax column-wise, so w/s lands in [-127, 127]
    exactly and the round needs no clamp."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=0, keepdims=True) * (1.0 / 127.0)
    s = jnp.maximum(s, 1e-12)
    return jnp.round(w32 / s).astype(jnp.int8), s


def pack_i8(w: BlockWeights) -> BlockWeightsI8:
    """Quantize a block's token-major weights (biases promoted to f32)."""
    wqkv_q, sqkv = quantize_cols(w.wqkv)
    wproj_q, sproj = quantize_cols(w.wproj)
    wfc1_q, sfc1 = quantize_cols(w.wfc1)
    wfc2_q, sfc2 = quantize_cols(w.wfc2)
    f32 = jnp.float32
    return BlockWeightsI8(
        ln1_scale=w.ln1_scale, ln1_bias=w.ln1_bias,
        wqkv_q=wqkv_q, sqkv=sqkv, bqkv=w.bqkv.astype(f32),
        wproj_q=wproj_q, sproj=sproj, bproj=w.bproj.astype(f32),
        ln2_scale=w.ln2_scale, ln2_bias=w.ln2_bias,
        wfc1_q=wfc1_q, sfc1=sfc1, bfc1=w.bfc1.astype(f32),
        wfc2_q=wfc2_q, sfc2=sfc2, bfc2=w.bfc2.astype(f32),
    )


def _quant_tokens(x):
    """bf16/f32 [T, K] -> (int8 [T, K], f32 scales [T, 1]): symmetric
    per-token (per-sublane) absmax over the K lanes.  Reciprocal-then-
    multiply so kernel and XLA reference quantize to identical codes."""
    x32 = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) * (1.0 / 127.0)
    sx = jnp.maximum(sx, 1e-12)
    return jnp.round(x32 * pl.reciprocal(sx, approx=False)).astype(jnp.int8), sx


def _qdot(xq, sx, wq, sw, bias):
    """int8 [T, K] @ int8 [K, M] -> f32 [T, M], dequantized + bias."""
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * sw + bias


def _kernel_i8(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
               wproj_ref, sproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
               wfc1_ref, sfc1_ref, bfc1_ref, wfc2_ref, sfc2_ref, bfc2_ref,
               o_ref, attn_buf, *, wins: int, l: int, heads: int,
               hp: int, scale: float, eps: float, approx_gelu: bool):
    """Mirror of fused_block._kernel with W8A8 projections."""
    dt = o_ref.dtype
    x = x_ref[...].reshape(wins * l, x_ref.shape[-1])

    h1 = _layernorm(x, ln1s_ref[...], ln1b_ref[...], eps, dt)
    h1q, s1 = _quant_tokens(h1)
    qkv = _qdot(h1q, s1, wqkv_ref[...], sqkv_ref[...],
                bqkv_ref[...]).astype(dt)

    for w in range(wins):
        rows = slice(w * l, (w + 1) * l)
        for h in range(heads):
            q = qkv[rows, h * hp:(h + 1) * hp]
            k = qkv[rows, (heads + h) * hp:(heads + h + 1) * hp]
            v = qkv[rows, (2 * heads + h) * hp:(2 * heads + h + 1) * hp]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(dt), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            attn_buf[rows, h * hp:(h + 1) * hp] = (
                o * pl.reciprocal(denom, approx=False)
            ).astype(dt)

    oq, so = _quant_tokens(attn_buf[...])
    proj = _qdot(oq, so, wproj_ref[...], sproj_ref[...], bproj_ref[...])
    x = x + proj.astype(dt)

    h2 = _layernorm(x, ln2s_ref[...], ln2b_ref[...], eps, dt)
    h2q, s2 = _quant_tokens(h2)
    y = _qdot(h2q, s2, wfc1_ref[...], sfc1_ref[...], bfc1_ref[...])
    y = jax.nn.gelu(y, approximate=approx_gelu).astype(dt)
    yq, sy = _quant_tokens(y)
    y = _qdot(yq, sy, wfc2_ref[...], sfc2_ref[...], bfc2_ref[...])
    out = x + y.astype(dt)
    o_ref[...] = out.reshape(wins, l, x_ref.shape[-1])


def _forward_i8(x, weights: BlockWeightsI8, *, heads: int, hp: int,
                scale: float, eps: float, approx_gelu: bool,
                interpret: Optional[bool] = None):
    if interpret is None:
        from spegnet_tpu.ops.fused_block_t import INTERPRET

        interpret = INTERPRET  # live lookup: tests monkeypatch it
    n, l, c = x.shape
    hidden = weights.wfc1_q.shape[1]
    wins = _pick_wins(n, l, c, heads, hp, hidden, x.dtype.itemsize)
    grid = (n // wins,)

    x_spec = pl.BlockSpec((wins, l, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    def w_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    flops_mm = 2 * n * l * (c * weights.wqkv_q.shape[1]
                            + heads * hp * c + 2 * c * hidden)
    cost = pl.CostEstimate(
        flops=flops_mm + 4 * n * heads * l * l * hp,
        bytes_accessed=2 * n * l * c * x.dtype.itemsize,
        transcendentals=n * heads * l * l + n * l * hidden,
    )
    return pl.pallas_call(
        functools.partial(_kernel_i8, wins=wins, l=l, heads=heads, hp=hp,
                          scale=scale, eps=eps, approx_gelu=approx_gelu),
        out_shape=jax.ShapeDtypeStruct((n, l, c), x.dtype),
        grid=grid,
        in_specs=[x_spec] + [w_spec(w) for w in weights],
        out_specs=x_spec,
        scratch_shapes=[pltpu.VMEM((wins * l, heads * hp), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(x, *weights)


def fused_block_i8(x, weights: BlockWeightsI8, heads: int, hp: int,
                   scale: float, eps: float, approx_gelu: bool, **kw):
    """Run one W8A8 gen-1 block; shard_mapped over the data axis under a
    >1-device GSPMD mesh (same contract as fused_block)."""
    mode = spmd_mode()
    fn = functools.partial(_forward_i8, heads=heads, hp=hp, scale=scale,
                           eps=eps, approx_gelu=approx_gelu, **kw)
    if not isinstance(mode, tuple):
        return fn(x, weights)
    mesh, axes = mode
    return jax.shard_map(fn, mesh=mesh, in_specs=(P(axes), P()),
                         out_specs=P(axes), check_vma=False)(x, weights)


def supported_i8(n_windows: int, l: int, c: int, dtype,
                 batch_rows: Optional[int] = None) -> bool:
    """int8-path eligibility: everything the bf16 gen-1 kernel needs, plus
    the feature width (the contracted lanes dim of every projection) must
    fill whole int8 lane tiles (128) so the quantized contractions carry
    no alignment garbage.  Hiera-L stage 4 (C=1152 = 9x128) qualifies;
    stages 1-3 run the T-kernel's int8 path instead."""
    return _fb.supported(n_windows, l, dtype, batch_rows=batch_rows) \
        and c % 128 == 0


# ---------------------------------------------------------------------------
# XLA reference: identical quantized math, token-major (parity oracle)
# ---------------------------------------------------------------------------


def _quant_tokens_ref(x):
    """XLA twin of _quant_tokens ([..., T, K]); same reciprocal-then-
    multiply so kernel and reference quantize to identical int8 codes."""
    x32 = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) * (1.0 / 127.0)
    sx = jnp.maximum(sx, 1e-12)
    return jnp.round(x32 * (1.0 / sx)).astype(jnp.int8), sx


def _qdot_ref(xq, sx, wq, sw, bias):
    """[..., T, K] int8 @ [K, M] int8 -> f32 [..., T, M]."""
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * sw + bias


def block_i8_reference(x, weights: BlockWeightsI8, *, heads: int, hp: int,
                       scale: float, eps: float, approx_gelu: bool):
    """Pure-XLA implementation of the identical quantized math; test oracle
    (mirrors fused_block.block_reference)."""
    n, l, c = x.shape
    dt = x.dtype
    w = weights
    h1 = _layernorm(x, w.ln1_scale, w.ln1_bias, eps, dt)
    h1q, s1 = _quant_tokens_ref(h1)
    qkv = _qdot_ref(h1q, s1, w.wqkv_q, w.sqkv, w.bqkv).astype(dt)
    t = qkv.reshape(n, l, 3, heads, hp)
    q, k, v = t[:, :, 0], t[:, :, 1], t[:, :, 2]
    s = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    o = jnp.einsum("nhqk,nkhd->nqhd", p, v,
                   preferred_element_type=jnp.float32)
    o = o.astype(dt).reshape(n, l, heads * hp)
    oq, so = _quant_tokens_ref(o)
    proj = _qdot_ref(oq, so, w.wproj_q, w.sproj, w.bproj)
    x = x + proj.astype(dt)
    h2 = _layernorm(x, w.ln2_scale, w.ln2_bias, eps, dt)
    h2q, s2 = _quant_tokens_ref(h2)
    y = _qdot_ref(h2q, s2, w.wfc1_q, w.sfc1, w.bfc1)
    y = jax.nn.gelu(y, approximate=approx_gelu).astype(dt)
    yq, sy = _quant_tokens_ref(y)
    y = _qdot_ref(yq, sy, w.wfc2_q, w.sfc2, w.bfc2)
    return x + y.astype(dt)
