"""Fused TPU attention kernel (Pallas) for Hiera's windowed/global stages.

Why: the XLA path materializes the f32 [L, L] probability tensor in HBM
twice per block (scores out, softmax in/out, PV in).  At Hiera-L 512^2 that
is ~540 MB of traffic per *global* stage-3 block (L=1024, 8 heads, batch 8)
— measured at 679 us/block vs 269 us for windowed blocks.  Hiera's sequence
lengths are small (window^2 = 16..256 tokens; global = 1024 at 512^2 input,
4096 at 1024^2), so an entire (window, head) problem fits in VMEM: one grid
cell loads Q/K/V [L, D], computes scores + softmax + PV entirely on-chip and
writes only the [L, D] output.  No online-softmax tiling needed below
L ~ 2048; above that the dispatcher falls back to XLA.

The kernel folds multiple (window, head) problems per grid cell (WINS) so
tiny windows (L=16..64) amortize DMA/loop overhead.

Training: pallas_call has no autodiff; `fused_attention` carries a
custom_vjp whose backward recomputes through the XLA reference path, so the
fused forward is used everywhere and gradients stay exact.

Numerics: scores and softmax in f32 (max-subtracted), probabilities cast to
the input dtype for the PV matmul — identical to the reference einsum path
(spegnet_tpu/ops/attention.py) within bf16 rounding; parity-tested in
tests/test_pallas_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Whole-problem-in-VMEM path up to this L (scores [L, L] f32 <= 4 MB).
_SMALL_L = 1024
# Q-blocked path (full K/V in VMEM, scores [BQ, L]) up to this L — covers the
# 1024^2-input global attention (L = 4096).  Beyond: XLA fallback.
_MAX_L = 8192
_Q_BLOCKS = (512, 256, 128, 64)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, wins: int):
    def one(i, _):
        q = q_ref[i, :, :]
        k = k_ref[i, :, :]
        v = v_ref[i, :, :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        # Normalize the [L, D] output instead of the [L, L] probabilities:
        # one fewer L^2 VPU pass (the softmax is the kernel's critical path).
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o = o * pl.reciprocal(denom, approx=False)
        o_ref[i, :, :] = o.astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, wins, one, 0, unroll=True)


def _qblock_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    """Long-L path: one Q block vs the full K/V (which fit VMEM at Hiera
    sizes); the [BQ, L] score tile never leaves VMEM."""
    q = q_ref[0, :, :]
    k = k_ref[0, :, :]
    v = v_ref[0, :, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, :, :] = (o * pl.reciprocal(denom, approx=False)).astype(o_ref.dtype)


def _pick_wins(n: int, l: int, d: int, itemsize: int) -> int:
    """Problems per grid cell: enough to amortize overhead, bounded by VMEM
    (double-buffered blocks) and divisibility of n."""
    # per-problem VMEM: q,k,v,o blocks (2x for pipelining) + scores f32
    per = 4 * l * max(d, 128) * itemsize * 2 + l * max(l, 128) * 4
    budget = 12 * 1024 * 1024
    cap = max(1, budget // per)
    target = max(1, min(cap, 4096 // max(l, 64)))
    for w in range(min(target, n), 0, -1):
        if n % w == 0:
            return w
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    return _fused_forward(q, k, v)


def _fused_forward(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    b, l, h, d = q.shape
    scale = d ** -0.5
    # [B, L, H, D] -> [B*H, L, D] problem-major layout.
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, l, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, l, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, l, d)
    n = b * h
    cost = pl.CostEstimate(
        flops=4 * n * l * l * d,
        bytes_accessed=4 * n * l * d * q.dtype.itemsize,
        transcendentals=n * l * l,
    )
    if l <= _SMALL_L:
        wins = _pick_wins(n, l, d, q.dtype.itemsize)
        grid = (n // wins,)
        spec = pl.BlockSpec((wins, l, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_attn_kernel, scale=scale, wins=wins),
            out_shape=jax.ShapeDtypeStruct((n, l, d), q.dtype),
            grid=grid,
            in_specs=[spec, spec, spec],
            out_specs=spec,
            cost_estimate=cost,
        )(qt, kt, vt)
    else:
        bq = next(x for x in _Q_BLOCKS if l % x == 0)
        grid = (n, l // bq)
        q_spec = pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)
        kv_spec = pl.BlockSpec((1, l, d), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_qblock_kernel, scale=scale),
            out_shape=jax.ShapeDtypeStruct((n, l, d), q.dtype),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            cost_estimate=cost,
        )(qt, kt, vt)
    return out.reshape(b, h, l, d).transpose(0, 2, 1, 3)


def _fwd(q, k, v):
    return _fused_forward(q, k, v), (q, k, v)


def _bwd(res, g):
    from spegnet_tpu.ops.attention import attention_reference

    q, k, v = res
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


fused_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Lane-padded zero-copy path
# ---------------------------------------------------------------------------
#
# The classic [B, L, H, D] entry costs three strided slice copies plus
# problem-major transposes in XLA before the kernel can run — measured at
# ~3 ms per windowed Hiera block at batch 16 (more than the attention math).
# This path removes ALL of it:
#
#   * the qkv projection's weight columns are reordered/zero-padded so its
#     output is [B, L, 3*H*HP] with HP = ceil(D/128)*128 lanes per head —
#     each (q|k|v, head) occupies its own 128-aligned lane block;
#   * the kernel's BlockSpecs index lane blocks directly (grid over heads),
#     so q/k/v are DMA'd straight out of the matmul's natural output layout —
#     no XLA transpose, slice, or copy anywhere;
#   * zero lanes are numerically inert in both matmuls (0-contributions), and
#     the output projection absorbs the padded layout with zero *rows* built
#     from the canonical [C, C] weight, so downstream is also copy-free.
#
# The MXU was already padding D=72 to 128 internally; making the padding
# explicit costs nothing on the attention matmuls and ~1.8x on the (small)
# qkv matmul, while deleting the dominant layout traffic.


def lanes_supported(l: int, head_dim: int) -> bool:
    """Static dispatch test for the lane-padded kernel (L = tokens/window)."""
    from spegnet_tpu.ops.fused_block_t import spmd_safe

    if jax.default_backend() not in ("tpu", "axon") or not spmd_safe():
        return False
    if l <= _SMALL_L:
        return l >= 16
    return l <= _MAX_L and any(l % x == 0 for x in _Q_BLOCKS)


def _lanes_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, wins: int):
    def one(w, _):
        q = q_ref[w]
        k = k_ref[w]
        v = v_ref[w]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[w] = (o * pl.reciprocal(denom, approx=False)).astype(o_ref.dtype)
        return _

    jax.lax.fori_loop(0, wins, one, 0, unroll=True)


def _lanes_qblock_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o * pl.reciprocal(denom, approx=False)).astype(o_ref.dtype)


def _pick_wins_lanes(n: int, l: int, hp: int, itemsize: int) -> int:
    per = 4 * l * hp * itemsize * 2 + l * max(l, 128) * 4
    budget = 12 * 1024 * 1024
    cap = max(1, budget // per)
    target = max(1, min(cap, 4096 // max(l, 64)))
    for w in range(min(target, n), 0, -1):
        if n % w == 0:
            return w
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def fused_attention_lanes(qkv_p: jax.Array, heads: int, scale: float) -> jax.Array:
    """qkv_p: [B, L, 3*H*HP] lane-padded packed projections (layout: q-heads,
    then k-heads, then v-heads, each head one HP-lane block).  Returns
    [B, L, H*HP]; padded lanes of the output carry PV garbage*0 = zeros only
    where v's pad lanes are zero, which the padded proj weight ignores."""
    return _lanes_forward(qkv_p, heads, scale)


def _lanes_forward(qkv_p: jax.Array, heads: int, scale: float) -> jax.Array:
    b, l, c3 = qkv_p.shape
    hp = c3 // (3 * heads)
    cost = pl.CostEstimate(
        flops=4 * b * heads * l * l * hp,
        bytes_accessed=(3 + 1) * b * l * heads * hp * qkv_p.dtype.itemsize,
        transcendentals=b * heads * l * l,
    )
    if l <= _SMALL_L:
        wins = _pick_wins_lanes(b, l, hp, qkv_p.dtype.itemsize)
        grid = (b // wins, heads)

        def in_spec(j):
            return pl.BlockSpec((wins, l, hp),
                                lambda i, h, j=j: (i, 0, j * heads + h),
                                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            functools.partial(_lanes_kernel, scale=scale, wins=wins),
            out_shape=jax.ShapeDtypeStruct((b, l, heads * hp), qkv_p.dtype),
            grid=grid,
            in_specs=[in_spec(0), in_spec(1), in_spec(2)],
            out_specs=pl.BlockSpec((wins, l, hp), lambda i, h: (i, 0, h),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
            cost_estimate=cost,
        )(qkv_p, qkv_p, qkv_p)
    else:
        bq = next(x for x in _Q_BLOCKS if l % x == 0)
        grid = (b, heads, l // bq)
        q_spec = pl.BlockSpec((1, bq, hp), lambda i, h, j: (i, j, h),
                              memory_space=pltpu.VMEM)

        def kv_spec(j):
            return pl.BlockSpec((1, l, hp),
                                lambda i, h, jq, j=j: (i, 0, j * heads + h),
                                memory_space=pltpu.VMEM)

        out = pl.pallas_call(
            functools.partial(_lanes_qblock_kernel, scale=scale),
            out_shape=jax.ShapeDtypeStruct((b, l, heads * hp), qkv_p.dtype),
            grid=grid,
            in_specs=[q_spec, kv_spec(1), kv_spec(2)],
            out_specs=pl.BlockSpec((1, bq, hp), lambda i, h, j: (i, j, h),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
            cost_estimate=cost,
        )(qkv_p, qkv_p, qkv_p)
    return out


def _lanes_reference(qkv_p: jax.Array, heads: int, scale: float) -> jax.Array:
    """XLA reference with identical semantics (zero pad lanes included)."""
    b, l, c3 = qkv_p.shape
    hp = c3 // (3 * heads)
    t = qkv_p.reshape(b, l, 3, heads, hp)
    q, k, v = t[:, :, 0], t[:, :, 1], t[:, :, 2]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(qkv_p.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o.reshape(b, l, heads * hp)


def _lanes_fwd(qkv_p, heads, scale):
    return _lanes_forward(qkv_p, heads, scale), qkv_p


def _lanes_bwd(heads, scale, qkv_p, g):
    _, vjp = jax.vjp(lambda t: _lanes_reference(t, heads, scale), qkv_p)
    return vjp(g)


fused_attention_lanes.defvjp(_lanes_fwd, _lanes_bwd)


def is_supported(q: jax.Array, k: jax.Array, v: jax.Array) -> bool:
    """Fused path: TPU backend, [B, L, H, D] self-attention with equal Q/K
    lengths, L small enough to solve fully in VMEM."""
    try:
        platform = q.devices().pop().platform if hasattr(q, "devices") else None
    except Exception:
        platform = None
    if platform is None:
        # Abstract values during tracing: decide by backend default.
        platform = jax.default_backend()
    if platform not in ("tpu", "axon"):
        return False
    from spegnet_tpu.ops.fused_block_t import spmd_safe

    if not spmd_safe():
        return False
    if q.ndim != 4 or q.shape != k.shape or q.shape != v.shape:
        return False
    _, l, _, d = q.shape
    if l > _SMALL_L and not any(l % x == 0 for x in _Q_BLOCKS):
        return False
    return l <= _MAX_L and d <= 256 and l >= 16
