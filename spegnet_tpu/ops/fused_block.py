"""Fully fused Hiera block kernel (Pallas, TPU).

One pallas_call computes an entire non-pooling MultiScaleBlock —
LN1 -> qkv -> (windowed|global) attention -> proj -> +residual -> LN2 ->
MLP -> +residual — with the block's weights resident in VMEM and each
activation tile making exactly ONE HBM round trip (read x, write out).

Why: at batch 16 the decomposed path moves every intermediate
(LN output, qkv, attention in/out, proj, MLP hidden) through HBM —
~0.6 GB per stage-1 block for 130 GF of matmul work.  The fused kernel's
traffic is 2 x the activation tile (~38 MB), turning the windowed stages
from bandwidth-bound (14-32 TF/s) into MXU-bound.

Layout: builds on the lane-padded attention convention
(ops/pallas_attention.py): the qkv weight is zero-padded so each
(q|k|v, head) owns a ceil(D/128)*128-lane block, attention slices lanes at
128-aligned offsets (free), and the proj weight absorbs the padding through
zero rows.  Numerically the pad lanes are inert in every matmul.

Scope: dim == dim_out, no Q-pooling (45 of Hiera-L's 48 blocks; the 3 stage
transitions keep the decomposed path).  Windowed blocks pass
[B*windows, ws*ws, C]; global blocks pass [B, H*W, C] (one "window").
Gradients: custom_vjp recomputes through a pure-XLA reference of the same
padded math, so training stays exact w.r.t. the fused forward's semantics.

Reference behavior being reproduced: the SAM2 Hiera MultiScaleBlock
(reference: models/feature_encoding.py:46-57 describes the trunk; the
block math is vendored in spegnet_tpu/models/hiera.py and golden-tested in
tests/test_hiera*.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Fused whole-block wins only for small windows, where the decomposed path is
# dominated by per-intermediate HBM traffic (measured: window 8 block
# 5.2 -> 3.2 ms, window 4 block 2.2 -> 1.8 ms at batch 16).  At L >= 256 the
# decomposed lanes-attention path pipelines better (1.29 vs 1.35 ms at
# stage-3 window 16), so the cutoff stays at 64 tokens.
_MAX_L = 64
_VMEM_LIMIT = 100 * 1024 * 1024


class BlockWeights(NamedTuple):
    """All tensors the kernel needs, already lane-padded and compute-dtype.

    ln scales/biases stay f32 (the LN math runs in f32).
    """

    ln1_scale: jax.Array   # [C] f32
    ln1_bias: jax.Array    # [C] f32
    wqkv: jax.Array        # [C, 3*H*HP]
    bqkv: jax.Array        # [3*H*HP]
    wproj: jax.Array       # [H*HP, C]
    bproj: jax.Array       # [C]
    ln2_scale: jax.Array   # [C] f32
    ln2_bias: jax.Array    # [C] f32
    wfc1: jax.Array        # [C, hidden]
    bfc1: jax.Array        # [hidden]
    wfc2: jax.Array        # [hidden, C]
    bfc2: jax.Array        # [C]


def supported(n_windows: int, l: int, dtype,
              batch_rows: int | None = None) -> bool:
    """Gen-1 whole-block kernel eligibility.  Under a >1-device GSPMD mesh
    the kernel runs inside a shard_map over 'data' (see
    fused_block_t.spmd_mode); the leading [B*windows] dim must divide it."""
    from spegnet_tpu.ops.fused_block_t import INTERPRET, spmd_mode

    if jax.default_backend() not in ("tpu", "axon") and not INTERPRET:
        return False
    mode = spmd_mode()
    if mode == "unsupported":
        return False
    if isinstance(mode, tuple):
        n_data = int(mode[0].shape["data"])
        if batch_rows is None or batch_rows % n_data or batch_rows < n_data:
            return False
    return 16 <= l <= _MAX_L


def _layernorm(x, scale, bias, eps, out_dtype):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps) * scale + bias
    return y.astype(out_dtype)


def _kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, ln2s_ref, ln2b_ref, wfc1_ref, bfc1_ref, wfc2_ref,
            bfc2_ref, o_ref, attn_buf, *, wins: int, l: int, heads: int,
            hp: int, scale: float, eps: float, approx_gelu: bool):
    dt = o_ref.dtype
    x = x_ref[...].reshape(wins * l, x_ref.shape[-1])

    h1 = _layernorm(x, ln1s_ref[...], ln1b_ref[...], eps, dt)
    qkv = jax.lax.dot_general(
        h1, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...]
    qkv = qkv.astype(dt)

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

    proj = jax.lax.dot_general(
        attn_buf[...], wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[...]
    x = x + proj.astype(dt)

    h2 = _layernorm(x, ln2s_ref[...], ln2b_ref[...], eps, dt)
    y = jax.lax.dot_general(
        h2, wfc1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc1_ref[...]
    y = jax.nn.gelu(y, approximate=approx_gelu).astype(dt)
    y = jax.lax.dot_general(
        y, wfc2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bfc2_ref[...]
    out = x + y.astype(dt)
    o_ref[...] = out.reshape(wins, l, x_ref.shape[-1])


def _pick_wins(n: int, l: int, c: int, heads: int, hp: int, hidden: int,
               itemsize: int) -> int:
    """Windows per grid cell: bounded by a VMEM budget for the activation
    tiles (weights are shared across cells; scores are per-head transients).
    """
    c_pad = -(-c // 128) * 128
    hidden_pad = -(-hidden // 128) * 128
    per_token = (2 * c_pad + 4 * heads * hp + hidden_pad) * itemsize + 8 * c_pad
    budget = 24 * 1024 * 1024
    scores = l * max(l, 128) * 4
    cap = max(1, (budget - scores) // max(per_token * l, 1))
    target = max(1, min(cap, 8192 // max(l, 64)))
    for w in range(min(target, n), 0, -1):
        if n % w == 0:
            return w
    return 1


def _forward(x, weights: BlockWeights, *, heads: int, hp: int, scale: float,
             eps: float, approx_gelu: bool, interpret: bool | None = None):
    if interpret is None:
        from spegnet_tpu.ops.fused_block_t import INTERPRET

        interpret = INTERPRET
    n, l, c = x.shape
    hidden = weights.wfc1.shape[1]
    wins = _pick_wins(n, l, c, heads, hp, hidden, x.dtype.itemsize)
    grid = (n // wins,)

    x_spec = pl.BlockSpec((wins, l, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)

    def w_spec(arr):
        return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    flops_mm = 2 * n * l * (c * weights.wqkv.shape[1]
                            + heads * hp * c + 2 * c * hidden)
    cost = pl.CostEstimate(
        flops=flops_mm + 4 * n * heads * l * l * hp,
        bytes_accessed=2 * n * l * c * x.dtype.itemsize,
        transcendentals=n * heads * l * l + n * l * hidden,
    )
    return pl.pallas_call(
        functools.partial(_kernel, wins=wins, l=l, heads=heads, hp=hp,
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


def block_reference(x, weights: BlockWeights, *, heads: int, hp: int,
                    scale: float, eps: float, approx_gelu: bool):
    """Pure-XLA implementation of the identical (lane-padded) math; used for
    the custom_vjp backward and for parity tests."""
    n, l, c = x.shape
    dt = x.dtype
    h1 = _layernorm(x, weights.ln1_scale, weights.ln1_bias, eps, dt)
    qkv = (jnp.einsum("nlc,cf->nlf", h1, weights.wqkv.astype(dt),
                      preferred_element_type=jnp.float32)
           + weights.bqkv).astype(dt)
    t = qkv.reshape(n, l, 3, heads, hp)
    q, k, v = t[:, :, 0], t[:, :, 1], t[:, :, 2]
    s = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(dt)
    o = jnp.einsum("nhqk,nkhd->nqhd", p, v,
                   preferred_element_type=jnp.float32)
    o = o.astype(dt).reshape(n, l, heads * hp)
    proj = (jnp.einsum("nlf,fc->nlc", o, weights.wproj.astype(dt),
                       preferred_element_type=jnp.float32)
            + weights.bproj).astype(dt)
    x = x + proj
    h2 = _layernorm(x, weights.ln2_scale, weights.ln2_bias, eps, dt)
    y = (jnp.einsum("nlc,ch->nlh", h2, weights.wfc1.astype(dt),
                    preferred_element_type=jnp.float32)
         + weights.bfc1).astype(dt)
    y = jax.nn.gelu(y, approximate=approx_gelu)
    y = (jnp.einsum("nlh,hc->nlc", y, weights.wfc2.astype(dt),
                    preferred_element_type=jnp.float32)
         + weights.bfc2).astype(dt)
    return x + y


def _forward_spmd(x, weights: BlockWeights, **kw):
    from jax.sharding import PartitionSpec as P

    from spegnet_tpu.ops.fused_block_t import spmd_mode

    mode = spmd_mode()
    if not isinstance(mode, tuple):
        return _forward(x, weights, **kw)
    mesh, axes = mode
    fn = functools.partial(_forward, **kw)
    return jax.shard_map(fn, mesh=mesh, in_specs=(P(axes), P()),
                         out_specs=P(axes), check_vma=False)(x, weights)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_block(x, weights: BlockWeights, heads: int, hp: int, scale: float,
                eps: float, approx_gelu: bool):
    return _forward_spmd(x, weights, heads=heads, hp=hp, scale=scale, eps=eps,
                         approx_gelu=approx_gelu)


def _fwd(x, weights, heads, hp, scale, eps, approx_gelu):
    out = _forward_spmd(x, weights, heads=heads, hp=hp, scale=scale, eps=eps,
                        approx_gelu=approx_gelu)
    return out, (x, weights)


def _bwd(heads, hp, scale, eps, approx_gelu, res, g):
    x, weights = res
    _, vjp = jax.vjp(
        lambda x, w: block_reference(x, w, heads=heads, hp=hp, scale=scale,
                                     eps=eps, approx_gelu=approx_gelu),
        x, weights,
    )
    return vjp(g)


fused_block.defvjp(_fwd, _bwd)
