"""int8 (W8A8) variant of the transposed fused Hiera block kernel.

Flagged inference speed mode — the plan of record for the 400 img/s
north-star (BASELINE.md): bf16 speed-of-light on a v5e is ~330 img/s, but
the MXU runs int8 x int8 -> int32 at ~354 TOPS at Hiera stage-3 shapes
(1.5-2.0x bf16, measured: tools/int8_micro.py), so quantizing the four
block projections roughly halves the encoder trunk's matmul time.

Quantization scheme (per-forward dynamic, no calibration set needed):

* weights: symmetric per-output-row int8.  The transposed weights are
  [M, K] with M the output features, so one f32 scale per row; packed at
  trace time from the bf16 ``TBlockWeights`` (``pack_i8``) — under jit the
  quantization itself is a one-off constant-folded/CSE'd elementwise pass.
* activations: symmetric per-token int8, computed IN-KERNEL.  In the
  transposed layout tokens live on lanes, so the scale is a [1, T] row
  from a sublane absmax — the same reduction pattern the LayerNorm in the
  kernel already uses.
* all four projections (qkv / proj / fc1 / fc2) contract in int8 on the
  MXU with int32 accumulation; dequantization is a rank-1 f32 rescale
  (row scale x token scale) fused into the bias add.  Attention (q.k,
  softmax, p.v), LayerNorm, GELU and the residual stream stay bf16/f32 —
  identical to the bf16 kernel (ops/fused_block_t.py).

Inference-only: there is deliberately no custom_vjp (training runs the
bf16 path; straight-through estimators are out of scope).  Accuracy is a
measured quantity, not a contract: the bench reports the int8 path's
sigmoid-mask MAE vs the f32 decomposed model next to the bf16 path's
(BASELINE.md: int8 may count toward the 400 target only with that number
published).

Reference behavior: same SAM2 Hiera MultiScaleBlock as fused_block_t
(models/feature_encoding.py:46-57 in the reference); the quantization has
no reference counterpart (the reference is bf16/f32 PyTorch only).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spegnet_tpu.ops import fused_block_t as _fbt
from spegnet_tpu.ops.fused_block_t import (
    QPoolWeights,
    TBlockWeights,
    _group_max4,
    _ln_sub,
    _MASK_NEG,
    _mm,
    _pick_cols,
    _pick_cw,
    _sel4,
    _VMEM_LIMIT,
    qpool_supported,
    spmd_mode,
    supported,
)


class TBlockWeightsI8(NamedTuple):
    """Row-quantized transposed block weights.

    w*_q are int8 [M, K]; s* are the matching f32 per-row scales [M, 1];
    biases are f32 [M, 1] (added post-dequant in f32).  LN params as in
    TBlockWeights.
    """

    ln1_scale: jax.Array   # [C, 1] f32
    ln1_bias: jax.Array    # [C, 1] f32
    wqkv_q: jax.Array      # [3*H*HP, C] int8
    sqkv: jax.Array        # [3*H*HP, 1] f32
    bqkv: jax.Array        # [3*H*HP, 1] f32
    wproj_q: jax.Array     # [C, H*HP] int8
    sproj: jax.Array       # [C, 1] f32
    bproj: jax.Array       # [C, 1] f32
    ln2_scale: jax.Array   # [C, 1] f32
    ln2_bias: jax.Array    # [C, 1] f32
    wfc1_q: jax.Array      # [hidden, C] int8
    sfc1: jax.Array        # [hidden, 1] f32
    bfc1: jax.Array        # [hidden, 1] f32
    wfc2_q: jax.Array      # [C, hidden] int8
    sfc2: jax.Array        # [C, 1] f32
    bfc2: jax.Array        # [C, 1] f32


def quantize_rows(w):
    """[M, K] -> (int8 [M, K], f32 scales [M, 1]): symmetric per-row absmax.

    |w| <= absmax row-wise, so w/s is in [-127, 127] exactly and the round
    needs no clamp."""
    w32 = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w32), axis=1, keepdims=True) * (1.0 / 127.0)
    s = jnp.maximum(s, 1e-12)
    return jnp.round(w32 / s).astype(jnp.int8), s


def pack_i8(w: TBlockWeights) -> TBlockWeightsI8:
    """Quantize a block's transposed weights (biases promoted to f32)."""
    wqkv_q, sqkv = quantize_rows(w.wqkv_t)
    wproj_q, sproj = quantize_rows(w.wproj_t)
    wfc1_q, sfc1 = quantize_rows(w.wfc1_t)
    wfc2_q, sfc2 = quantize_rows(w.wfc2_t)
    f32 = jnp.float32
    return TBlockWeightsI8(
        ln1_scale=w.ln1_scale, ln1_bias=w.ln1_bias,
        wqkv_q=wqkv_q, sqkv=sqkv, bqkv=w.bqkv_t.astype(f32),
        wproj_q=wproj_q, sproj=sproj, bproj=w.bproj_t.astype(f32),
        ln2_scale=w.ln2_scale, ln2_bias=w.ln2_bias,
        wfc1_q=wfc1_q, sfc1=sfc1, bfc1=w.bfc1_t.astype(f32),
        wfc2_q=wfc2_q, sfc2=sfc2, bfc2=w.bfc2_t.astype(f32),
    )


def _quant_tokens(x):
    """bf16/f32 [K, T] -> (int8 [K, T], f32 scales [1, T]): symmetric
    per-token (per-lane) absmax over the K sublanes."""
    x32 = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x32), axis=0, keepdims=True) * (1.0 / 127.0)
    sx = jnp.maximum(sx, 1e-12)
    return jnp.round(x32 * pl.reciprocal(sx, approx=False)).astype(jnp.int8), sx


def _qdot(wq, sw, xq, sx, bias):
    """int8 [M, K] @ int8 [K, T] -> f32 [M, T], dequantized + bias."""
    acc = jax.lax.dot_general(
        wq, xq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sw * sx + bias


def _kernel_i8(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, sqkv_ref, bqkv_ref,
               wproj_ref, sproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
               wfc1_ref, sfc1_ref, bfc1_ref, wfc2_ref, sfc2_ref, bfc2_ref,
               o_ref, attn_buf, *, heads: int, hp: int, l: int, cw: int,
               scale: float, eps: float, approx_gelu: bool):
    """Mirror of fused_block_t._kernel with W8A8 projections."""
    dt = o_ref.dtype
    x = x_ref[0]                               # [C, T]
    t = x.shape[1]

    h1 = _ln_sub(x, ln1s_ref[...], ln1b_ref[...], eps, dt)
    h1q, s1 = _quant_tokens(h1)
    qkv = _qdot(wqkv_ref[...], sqkv_ref[...], h1q, s1,
                bqkv_ref[...]).astype(dt)      # [3*H*HP, T]

    if l < cw:
        row = jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 0) // l
        col = jax.lax.broadcasted_iota(jnp.int32, (cw, cw), 1) // l
        mask = jnp.where(row == col, 0.0, _MASK_NEG)           # [CW, CW] f32
    else:
        mask = None

    for c0 in range(0, t, cw):
        for h in range(heads):
            q = qkv[h * hp:(h + 1) * hp, c0:c0 + cw]
            k = qkv[(heads + h) * hp:(heads + h + 1) * hp, c0:c0 + cw]
            v = qkv[(2 * heads + h) * hp:(2 * heads + h + 1) * hp,
                    c0:c0 + cw]
            s = jax.lax.dot_general(
                q, k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                           # [CW, CW]
            if mask is not None:
                s = s + mask
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            p = (p * pl.reciprocal(denom, approx=False)).astype(dt)
            o = jax.lax.dot_general(
                v, p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                   # [HP, CW]
            attn_buf[h * hp:(h + 1) * hp, c0:c0 + cw] = o.astype(dt)

    oq, so = _quant_tokens(attn_buf[...])
    proj = _qdot(wproj_ref[...], sproj_ref[...], oq, so, bproj_ref[...])
    x = x + proj.astype(dt)

    h2 = _ln_sub(x, ln2s_ref[...], ln2b_ref[...], eps, dt)
    h2q, s2 = _quant_tokens(h2)
    y = _qdot(wfc1_ref[...], sfc1_ref[...], h2q, s2, bfc1_ref[...])
    y = jax.nn.gelu(y, approximate=approx_gelu).astype(dt)      # [hidden, T]
    yq, sy = _quant_tokens(y)
    y = _qdot(wfc2_ref[...], sfc2_ref[...], yq, sy, bfc2_ref[...])
    o_ref[0] = x + y.astype(dt)


def _forward_i8(xt, weights: TBlockWeightsI8, *, heads: int, hp: int, l: int,
                scale: float, eps: float, approx_gelu: bool,
                interpret: Optional[bool] = None, cw: Optional[int] = None,
                t_cap: Optional[int] = None):
    if interpret is None:
        interpret = _fbt.INTERPRET  # live lookup: tests monkeypatch it
    b, c, n = xt.shape
    hidden = weights.wfc1_q.shape[0]
    if cw is None:
        cw = _pick_cw(l, n)
    if t_cap is None:
        t_cap = 4096 if heads <= 2 else 2048
    t_cell = _pick_cols(n, cw, heads, t_cap)
    grid = (b, n // t_cell)

    x_spec = pl.BlockSpec((1, c, t_cell), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)

    def w_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i, j: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    flops_mm = 2 * b * n * (c * weights.wqkv_q.shape[0]
                            + heads * hp * c + 2 * c * hidden)
    cost = pl.CostEstimate(
        flops=flops_mm + 4 * b * heads * n * cw * hp,
        bytes_accessed=2 * b * n * c * xt.dtype.itemsize,
        transcendentals=b * heads * n * cw + b * n * hidden,
    )
    return pl.pallas_call(
        functools.partial(_kernel_i8, heads=heads, hp=hp, l=l, cw=cw,
                          scale=scale, eps=eps, approx_gelu=approx_gelu),
        out_shape=jax.ShapeDtypeStruct((b, c, n), xt.dtype),
        grid=grid,
        in_specs=[x_spec] + [w_spec(w) for w in weights],
        out_specs=x_spec,
        scratch_shapes=[pltpu.VMEM((heads * hp, t_cell), xt.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(xt, *weights)


def fused_block_t_i8(xt, weights: TBlockWeightsI8, heads: int, hp: int,
                     l: int, scale: float, eps: float, approx_gelu: bool,
                     **kw):
    """Run one W8A8 block; shard_mapped over the data axis under a
    >1-device GSPMD mesh (same contract as fused_block_t)."""
    mode = spmd_mode()
    fn = functools.partial(_forward_i8, heads=heads, hp=hp, l=l, scale=scale,
                           eps=eps, approx_gelu=approx_gelu, **kw)
    if not isinstance(mode, tuple):
        return fn(xt, weights)
    mesh, axes = mode
    return jax.shard_map(fn, mesh=mesh, in_specs=(P(axes), P()),
                         out_specs=P(axes), check_vma=False)(xt, weights)


def supported_i8(c: int, heads: int, l: int, n_tok: int, dtype,
                 batch: Optional[int] = None) -> bool:
    """int8-path eligibility: everything the bf16 T-kernel needs, plus the
    channel width must fill whole int8 sublane tiles (32 rows) so the
    quantized contractions carry no alignment garbage.  Excludes stage 1
    (C=144); stages 2/3 (288/576) and the globals qualify."""
    return supported(c, heads, l, n_tok, dtype, batch=batch) and c % 32 == 0


# ---------------------------------------------------------------------------
# int8 Q-pool transition front (BASELINE.md round-4 plan of record)
# ---------------------------------------------------------------------------


class QPoolWeightsI8(NamedTuple):
    """Row-quantized transition-front weights (mirrors QPoolWeights)."""

    ln_scale: jax.Array    # [Cin, 1] f32
    ln_bias: jax.Array     # [Cin, 1] f32
    wqkv_q: jax.Array      # [3*H*HP, Cin] int8
    sqkv: jax.Array        # [3*H*HP, 1] f32
    bqkv: jax.Array        # [3*H*HP, 1] f32
    wsc_q: jax.Array       # [Cout, Cin] int8
    ssc: jax.Array         # [Cout, 1] f32
    bsc: jax.Array         # [Cout, 1] f32


def pack_qpool_i8(w: QPoolWeights) -> QPoolWeightsI8:
    """Quantize a transition front's weights (biases promoted to f32)."""
    wqkv_q, sqkv = quantize_rows(w.wqkv_t)
    wsc_q, ssc = quantize_rows(w.wsc_t)
    f32 = jnp.float32
    return QPoolWeightsI8(
        ln_scale=w.ln_scale, ln_bias=w.ln_bias,
        wqkv_q=wqkv_q, sqkv=sqkv, bqkv=w.bqkv_t.astype(f32),
        wsc_q=wsc_q, ssc=ssc, bsc=w.bsc_t.astype(f32),
    )


def _qpool_kernel_i8(x_ref, lns_ref, lnb_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                     wsc_ref, ssc_ref, bsc_ref, o_ref, sc_ref, *, heads: int,
                     hp: int, l: int, cw: int, scale: float, eps: float):
    """Mirror of fused_block_t._qpool_kernel with the two Cin-contractions
    (qkv + shortcut proj — both share ONE per-token activation quant of the
    LN output) in W8A8; pooling, lane compaction, and attention stay
    bf16/f32 exactly as the bf16 kernel."""
    dt = o_ref.dtype
    x = x_ref[0]                               # [Cin, T]
    t = x.shape[1]

    h1 = _ln_sub(x, lns_ref[...], lnb_ref[...], eps, dt)
    h1q, s1 = _quant_tokens(h1)
    qkv = _qdot(wqkv_ref[...], sqkv_ref[...], h1q, s1,
                bqkv_ref[...]).astype(dt)
    sc = _qdot(wsc_ref[...], ssc_ref[...], h1q, s1,
               bsc_ref[...]).astype(dt)        # [Cout, T]
    sc_ref[0] = _mm(_group_max4(sc), _sel4(t, dt)).astype(dt)

    if l < cw:
        row = (4 * jax.lax.broadcasted_iota(jnp.int32, (cw // 4, cw), 0)) // l
        col = jax.lax.broadcasted_iota(jnp.int32, (cw // 4, cw), 1) // l
        mask = jnp.where(row == col, 0.0, _MASK_NEG)
    else:
        mask = None

    sel = _sel4(cw, dt)
    qp = _group_max4(qkv[:heads * hp])         # pooled q (group-start lanes)
    for c0 in range(0, t, cw):
        for h in range(heads):
            q = qp[h * hp:(h + 1) * hp, c0:c0 + cw]
            qc = jax.lax.dot_general(             # compact: [HP, CW/4]
                q, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dt)
            k = qkv[(heads + h) * hp:(heads + h + 1) * hp, c0:c0 + cw]
            v = qkv[(2 * heads + h) * hp:(2 * heads + h + 1) * hp,
                    c0:c0 + cw]
            s = jax.lax.dot_general(
                qc, k, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                             # [CW/4, CW]
            if mask is not None:
                s = s + mask
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            p = (p * pl.reciprocal(denom, approx=False)).astype(dt)
            o = jax.lax.dot_general(
                v, p, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                     # [HP, CW/4]
            o_ref[0, h * hp:(h + 1) * hp, c0 // 4:(c0 + cw) // 4] = \
                o.astype(dt)


def _qpool_forward_i8(xt, weights: QPoolWeightsI8, *, heads: int, hp: int,
                      l: int, scale: float, eps: float,
                      interpret: Optional[bool] = None,
                      cw: Optional[int] = None, t_cap: Optional[int] = None):
    if interpret is None:
        interpret = _fbt.INTERPRET
    b, cin, n = xt.shape
    cout = weights.wsc_q.shape[0]
    if cw is None:
        cw = _pick_cw(l, n)
    t_cell = _pick_cols(n, cw, heads, t_cap or 2048)
    grid = (b, n // t_cell)

    def spec(c):
        return pl.BlockSpec((1, c, t_cell), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    def w_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i, j: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    cost = pl.CostEstimate(
        flops=2 * b * n * cin * (weights.wqkv_q.shape[0] + cout)
        + 4 * b * heads * n * cw * hp,
        bytes_accessed=2 * b * n * (cin + cout) * xt.dtype.itemsize,
        transcendentals=b * heads * n * cw,
    )

    def out_spec(c):
        return pl.BlockSpec((1, c, t_cell // 4), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_qpool_kernel_i8, heads=heads, hp=hp, l=l, cw=cw,
                          scale=scale, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((b, heads * hp, n // 4), xt.dtype),
                   jax.ShapeDtypeStruct((b, cout, n // 4), xt.dtype)),
        grid=grid,
        in_specs=[spec(cin)] + [w_spec(w) for w in weights],
        out_specs=(out_spec(heads * hp), out_spec(cout)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(xt, *weights)


def qpool_front_i8(xt, weights: QPoolWeightsI8, heads: int, hp: int, l: int,
                   scale: float, eps: float, **kw):
    """W8A8 transition front: same contract as fused_block_t.qpool_front,
    inference-only (no custom_vjp — training runs the bf16 path).
    Shard_mapped over the data axis under a >1-device GSPMD mesh."""
    mode = spmd_mode()
    fn = functools.partial(_qpool_forward_i8, heads=heads, hp=hp, l=l,
                           scale=scale, eps=eps, **kw)
    if not isinstance(mode, tuple):
        return fn(xt, weights)
    mesh, axes = mode
    return jax.shard_map(fn, mesh=mesh, in_specs=(P(axes), P()),
                         out_specs=(P(axes), P(axes)),
                         check_vma=False)(xt, weights)


def qpool_supported_i8(cin: int, heads: int, l: int, n_tok: int, dtype,
                       batch: Optional[int] = None) -> bool:
    """int8 transition-front eligibility: the bf16 front's geometry rules
    plus whole int8 sublane tiles on the contraction width (Cin % 32 == 0).
    t23 (Cin=288) and t34 (Cin=576) qualify; t12 (Cin=144) stays bf16."""
    return (qpool_supported(cin, heads, l, n_tok, dtype, batch=batch)
            and cin % 32 == 0)


def qpool_i8_reference(xt, weights: QPoolWeightsI8, *, heads: int, hp: int,
                       l: int, scale: float, eps: float):
    """Token-major XLA twin of _qpool_kernel_i8 (identical quant math):
    parity oracle, mirrors fused_block_t.qpool_front_reference."""
    b, cin, n = xt.shape
    dt = xt.dtype
    w = weights
    x = xt.transpose(0, 2, 1)                  # [B, N, Cin]
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h1 = (xc * jax.lax.rsqrt(var + eps) * w.ln_scale[:, 0]
          + w.ln_bias[:, 0]).astype(dt)
    h1q, s1 = _quant_tokens_ref(h1)
    qkv = _qdot_ref(h1q, s1, w.wqkv_q, w.sqkv, w.bqkv).astype(dt)
    sc = _qdot_ref(h1q, s1, w.wsc_q, w.ssc, w.bsc).astype(dt)
    sc_p = sc.reshape(b, n // 4, 4, -1).max(axis=2)          # [B, N/4, Cout]

    t = qkv.reshape(b, n // l, l, 3, heads, hp)
    q, k, v = t[..., 0, :, :], t[..., 1, :, :], t[..., 2, :, :]
    qp = q.reshape(b, n // l, l // 4, 4, heads, hp).max(axis=3)
    s = jnp.einsum("bwqhd,bwkhd->bwhqk", qp, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    o = jnp.einsum("bwhqk,bwkhd->bwqhd", p, v,
                   preferred_element_type=jnp.float32).astype(dt)
    o = o.reshape(b, n // 4, heads * hp)
    return o.transpose(0, 2, 1), sc_p.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# XLA reference: identical quantized math, token-major (parity oracle)
# ---------------------------------------------------------------------------


def _quant_tokens_ref(x):
    """Token-major twin of _quant_tokens: [..., N, K] -> per-token scales
    over the trailing feature axis.  Reciprocal-then-multiply exactly like
    the kernel (a * (1/b) is not bitwise a / b), so kernel and reference
    quantize to identical int8 codes."""
    x32 = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) * (1.0 / 127.0)
    sx = jnp.maximum(sx, 1e-12)
    return jnp.round(x32 * (1.0 / sx)).astype(jnp.int8), sx


def _qdot_ref(xq, sx, wq, sw, bias):
    """[..., N, K] int8 @ [M, K] int8 -> f32 [..., N, M]."""
    acc = jax.lax.dot_general(
        xq, wq, (((xq.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * sw[:, 0] + bias[:, 0]


def block_t_i8_reference(xt, weights: TBlockWeightsI8, *, heads: int,
                         hp: int, l: int, scale: float, eps: float,
                         approx_gelu: bool):
    """Pure-XLA implementation of the identical quantized math; test oracle
    (mirrors fused_block_t.block_t_reference)."""
    b, c, n = xt.shape
    dt = xt.dtype
    w = weights
    x = xt.transpose(0, 2, 1)                            # [B, N, C]

    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h1 = (xc * jax.lax.rsqrt(var + eps) * w.ln1_scale[:, 0]
          + w.ln1_bias[:, 0]).astype(dt)

    h1q, s1 = _quant_tokens_ref(h1)
    qkv = _qdot_ref(h1q, s1, w.wqkv_q, w.sqkv, w.bqkv).astype(dt)
    t = qkv.reshape(b, n // l, l, 3, heads, hp)
    q, k, v = t[..., 0, :, :], t[..., 1, :, :], t[..., 2, :, :]
    s = jnp.einsum("bwqhd,bwkhd->bwhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    o = jnp.einsum("bwhqk,bwkhd->bwqhd", p, v,
                   preferred_element_type=jnp.float32).astype(dt)
    o = o.reshape(b, n, heads * hp)
    oq, so = _quant_tokens_ref(o)
    proj = _qdot_ref(oq, so, w.wproj_q, w.sproj, w.bproj).astype(dt)
    x = x + proj

    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    h2 = (xc * jax.lax.rsqrt(var + eps) * w.ln2_scale[:, 0]
          + w.ln2_bias[:, 0]).astype(dt)
    h2q, s2 = _quant_tokens_ref(h2)
    y = _qdot_ref(h2q, s2, w.wfc1_q, w.sfc1, w.bfc1)
    y = jax.nn.gelu(y, approximate=approx_gelu).astype(dt)
    yq, sy = _quant_tokens_ref(y)
    y = _qdot_ref(yq, sy, w.wfc2_q, w.sfc2, w.bfc2).astype(dt)
    return (x + y).transpose(0, 2, 1)
