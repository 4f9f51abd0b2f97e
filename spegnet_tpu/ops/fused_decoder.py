"""Fused PED decoder-block Pallas kernel (inference).

One kernel per DecoderBlock executes the block's whole chain --
``2x-bilinear-upsample -> conv3x3 (+ optional 4x-upsampled edge branch)
-> BN -> ReLU -> conv3x3 -> BN -> ReLU [-> 1x1 head]`` -- entirely in
VMEM, in the polyphase (space-to-depth) layout.  This is the
channels-packed decoder treatment ROOFLINE.md names as the #1 inference
gap: the decomposed XLA path runs dec2's convs at 50-70 TF/s because
64-channel tensors half-fill the MXU's 128 output lanes, and the earlier
XLA-level polyphase attempt lost its matmul win to the depth-to-space
materialization between conv1 and conv2.  Here the s2d intermediate
never leaves VMEM and no lane-retiling reshape exists anywhere:

* conv1 (the fused upsample+conv of ops/fused_upsample_conv.py) runs as
  the polyphase form: im2col patches [S, 9*Cin] built with sublane
  shifts, TWO matmuls split by the output row-phase py, each with
  N = 2*Cmid output lanes ((px, c) packed) -- full 128-lane tiles for
  both decoder geometries (Cmid=128: 256 lanes, Cmid=64: 128 lanes).
* the conv1 activations live in two VMEM ring strips A_py[(row cells),
  S, (px, c)], BN+ReLU folded (scale/offset precomputed outside).
* conv2 (plain SAME conv3x3 on the 2S grid) runs in phase space: one
  patch buffer [S, 16*Cmid] over the union of 4 real rows x 4 real
  cols; the two output row-phases contract overlapping contiguous
  12*Cmid lane ranges of it (4/3 FLOP padding, full MXU, no gathers).
* dec1's edge branch (``conv3x3(resize_bilinear_4x(ef))``, reference
  models/object_detection.py:193-199 + 210-214) is composed into 16
  small phase kernels on the 64^2 edge grid and added pre-BN in-kernel.
* borders: the polyphase forms are interior-exact; the outermost output
  rows/cols (where conv zero-padding meets the bilinear clamp) are
  computed exactly in XLA (ops/fused_upsample_conv._border_strips plus
  thin slices for the edge branch) and pasted in-kernel before BN.
* the optional 1x1 prediction head emits [B, 2S, S, 2] whose reshape to
  NHWC [B, 2S, 2S, 1] is free (row-major (J, px) == real column order).

The kernel's output stays in s2d layout [B, S, S, (py, px, c)] (the
layout of ops/fused_upsample_conv.upsample2x_conv3x3_s2d); callers
d2s only when a consumer needs NHWC.

Reference semantics: models/object_detection.py:159-238 (DecoderBlock),
:240-341 (decoder + heads).  Parity: tests/test_fused_decoder.py checks
this kernel against the decomposed ops (upsample2x_conv3x3 + XLA convs)
that are themselves golden-tested against the reference torch modules.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spegnet_tpu.ops import fused_block_t as _fbt
from spegnet_tpu.ops.fused_block_i8 import quantize_cols
from spegnet_tpu.ops.fused_block_t import spmd_mode
from spegnet_tpu.ops.fused_upsample_conv import (
    _border_strips,
    _compose_kernel,
    _conv,
)
from spegnet_tpu.ops.resize import resize_bilinear

_VMEM_LIMIT = 100 * 1024 * 1024

# Experiment knobs (timing ablations via tools/dec_pallas_micro.py).
import os as _os
_UNROLL = _os.environ.get("SPEGNET_DEC_UNROLL", "1")
_NOSHIFT = _os.environ.get("SPEGNET_DEC_NOSHIFT", "0") == "1"  # WRONG MATH
_SKIP1 = _os.environ.get("SPEGNET_DEC_SKIP1", "0") == "1"      # WRONG MATH
_SKIP2 = _os.environ.get("SPEGNET_DEC_SKIP2", "0") == "1"      # WRONG MATH
_NOPATCH = _os.environ.get("SPEGNET_DEC_NOPATCH", "0") == "1"  # WRONG MATH
_RG1 = int(_os.environ.get("SPEGNET_DEC_RG1", "0"))
_RG2 = int(_os.environ.get("SPEGNET_DEC_RG2", "0"))


def _pick_rg1(sh, has_edge):
    """conv1 rows per matmul.  Swept on the v5e (tools/dec_pallas_micro):
    per-row dots win -- Mosaic overlaps the next row's VPU patch build with
    the current dot, while bigger groups serialize phases (10.43 ms at
    rg1=1 vs 10.76/10.84/11.16 at 2/3/6 for the dec2 geometry)."""
    if has_edge:
        return 1
    if _RG1 > 0 and (sh + 2) % _RG1 == 0:
        return _RG1
    return 1


def _pick_rg2(sh):
    """conv2 output cell rows per matmul pair (M = rg2*S); 2 measured best
    (same sweep: rg2=4 cost ~0.7 ms over rg2=2)."""
    if _RG2 > 0 and sh % _RG2 == 0:
        return _RG2
    return next(g for g in (2, 1) if sh % g == 0)


# ---------------------------------------------------------------------------
# Composed-weight packing (pure JAX, runs outside the kernel at trace time)
# ---------------------------------------------------------------------------


def _up4_taps() -> np.ndarray:
    """A[p, d, j]: weight of source cell offset (j-1) in the 4x bilinear
    upsample sample at real offset (p + d - 1) relative to cell 4I.

    up4[4I + m] = sum_j A[p, d, j] * ef[I + j - 1]  with m = p + d - 1;
    torch align_corners=False: src = (m + 0.5)/4 - 0.5, clamped taps."""
    a = np.zeros((4, 3, 3), np.float32)
    for p in range(4):
        for d in range(3):
            m = p + d - 1
            src = (m + 0.5) / 4.0 - 0.5
            f = int(np.floor(src))
            frac = src - f
            for tap, w in ((f, 1.0 - frac), (f + 1, frac)):
                if w == 0.0:
                    continue
                j = tap + 1  # cell offset -1..1 -> 0..2
                assert 0 <= j <= 2, (p, d, tap)
                a[p, d, j] += w
    return a


def pack_w1(k3: jax.Array, dtype) -> jax.Array:
    """[3,3,Cin,Cm] conv kernel -> [9*Cin, 4*Cm] polyphase upsample+conv
    weights; row order (u, v, ci), col order (py, px, co) == the s2d lane
    order, so ONE matmul emits a whole s2d row (N = 4*Cm lanes keeps all
    MXUs fed).  Matches ops/fused_upsample_conv._poly_core's algebra."""
    ke = _compose_kernel(k3.astype(jnp.float32))  # [6, 6, Cin, Cm]
    cin, cm = k3.shape[2], k3.shape[3]
    rows = []
    for u in range(3):
        for v in range(3):
            cols = [ke[2 * u + 1 - py, 2 * v + 1 - px]
                    for py in (0, 1) for px in (0, 1)]
            rows.append(jnp.concatenate(cols, axis=-1))
    return jnp.concatenate(rows, axis=0).reshape(
        9 * cin, 4 * cm).astype(dtype)


def pack_w2(k2: jax.Array, dtype) -> jax.Array:
    """[3,3,Cm,Co] SAME-conv kernel -> [12*Cm, 2*Co] phase-space weights.

    The kernel builds ONE patch buffer P[S, (a4, b, c)] with
      a4: source rows (i-1,py1), (i,py0), (i,py1), (i+1,py0)
      b : source cols (J-1,px1), (J,px0), (J,px1), (J+1,px0)
    Output phase py'=0 contracts a4 in {0,1,2} (lanes [0 : 12Cm)),
    py'=1 contracts a4 in {1,2,3} (lanes [4Cm : 16Cm)) -- both
    contiguous lane ranges, and in BOTH the relative row slot equals dy,
    so one weight matrix serves both matmuls.  Rows are (dy, b, ci);
    cols (px', co).  dx per (b, px'): px'=0 -> (0,1,2,-), px'=1 ->
    (-,0,1,2); missing taps are zero columns (the 4/3 FLOP padding)."""
    cm, co = k2.shape[2], k2.shape[3]
    k2 = k2.astype(jnp.float32)
    w = jnp.zeros((3, 4, cm, 2, co), jnp.float32)
    for a in range(3):
        for b in range(4):
            if b <= 2:  # px'=0 uses cols b=0..2 with dx=b
                w = w.at[a, b, :, 0, :].set(k2[a, b])
            if b >= 1:  # px'=1 uses cols b=1..3 with dx=b-1
                w = w.at[a, b, :, 1, :].set(k2[a, b - 1])
    return w.reshape(12 * cm, 2 * co).astype(dtype)


def pack_we(k_edge: jax.Array, cm: int, dtype) -> jax.Array:
    """[3,3,Ce,Cm] edge-branch kernel -> [2, 9*Ce, 8*Cm]: the 16 composed
    phase kernels of ``conv3x3(resize_bilinear_4x(ef))`` on the Ce-channel
    edge grid.  Leading dim: output CELL-row parity (row phase p = 2*par +
    py); rows (u, v, ci) over the 3x3 source-cell window; cols packed
    (jpar, py, px, co) with column phase q = 2*jpar + px -- so one matmul
    yields both row-phases and, after a 2x row interleave, the J-parity
    halves sit in aligned lane ranges.  Interior-exact; borders pasted."""
    a = jnp.asarray(_up4_taps())  # [4, 3, 3] (phase, conv tap d, cell j)
    k = k_edge.astype(jnp.float32)
    ce = k.shape[2]
    mats = []
    for par in (0, 1):
        cols = []
        for jpar in (0, 1):
            for py in (0, 1):
                for px in (0, 1):
                    w_pq = jnp.einsum("yxio,yu,xv->uvio", k,
                                      a[2 * par + py], a[2 * jpar + px])
                    cols.append(w_pq.reshape(9 * ce, cm))
        mats.append(jnp.concatenate(cols, axis=-1))
    return jnp.stack(mats).astype(dtype)


def fold_bn(bias, gamma, beta, mean, var, eps: float = 1e-5):
    """Inference BN folded over a preceding conv bias: returns (s, t) with
    relu(bn(conv + bias)) == relu(conv * s + t), f32."""
    s = gamma.astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + eps)
    b = 0.0 if bias is None else bias.astype(jnp.float32)
    t = (b - mean.astype(jnp.float32)) * s + beta.astype(jnp.float32)
    return s, t


class DecParams(NamedTuple):
    """Kernel-ready packed parameters for one fused decoder block."""

    w1: jax.Array            # [9*Cin, 4*Cm] compute dtype
    w2: jax.Array            # [12*Cm, 2*Cm]
    s1t1: jax.Array          # [2, 4*Cm] f32: rows (scale, offset), (py,px,c)
    s2t2: jax.Array          # [2, 2*Cm] f32
    we: Optional[jax.Array]  # [2, 9*Ce, 8*Cm] or None (no edge branch)
    h2: Optional[jax.Array]  # [2*Cm, 2] head weights (block-diag) or None
    hb: Optional[jax.Array]  # [1, 2] f32 head bias or None


def pack_params(k1, b1, bn1, k2, b2, bn2, k_edge=None, head_w=None,
                head_b=None, dtype=jnp.bfloat16) -> DecParams:
    """Fold a DecoderBlock's Flax params into kernel form.

    bn1/bn2: dicts with gamma/beta/mean/var.  k1 covers the x part only
    ([3,3,Cin,Cm]); k_edge ([3,3,Ce,Cm]) the 4x edge branch, if any.
    head_w: [Cm, n] 1x1 head kernel (n==1)."""
    cm = k1.shape[-1]
    s1, t1 = fold_bn(b1, **bn1)
    s2, t2 = fold_bn(b2, **bn2)
    we = None if k_edge is None else pack_we(k_edge, cm, dtype)
    h2 = hb = None
    if head_w is not None:
        hw = head_w.reshape(cm, -1)[:, 0].astype(dtype)
        z = jnp.zeros_like(hw)
        # (px', c) lanes -> px' column: blockdiag so each py' matmul emits
        # [S, 2] = predictions for real cols (2J, 2J+1).
        h2 = jnp.stack([jnp.concatenate([hw, z]),
                        jnp.concatenate([z, hw])], axis=1)
        hb = jnp.broadcast_to(
            head_b.astype(jnp.float32).reshape(1, -1), (1, 2))
    # BN scales fold into the matmul weight COLUMNS (the kernel then only
    # adds the offset row): w1/we columns carry s1, w2 columns carry s2.
    if we is not None:
        we = (we.astype(jnp.float32) * jnp.tile(s1, 8)).astype(dtype)
    return DecParams(
        w1=(pack_w1(k1, jnp.float32) * jnp.tile(s1, 4)).astype(dtype),
        w2=(pack_w2(k2, jnp.float32) * jnp.tile(s2, 2)).astype(dtype),
        s1t1=jnp.stack([jnp.tile(s1, 4), jnp.tile(t1, 4)]),
        s2t2=jnp.stack([jnp.tile(s2, 2), jnp.tile(t2, 2)]),
        we=we, h2=h2, hb=hb)


# ---------------------------------------------------------------------------
# Exact border strips (XLA, thin)
# ---------------------------------------------------------------------------


def make_strips(x, k1, k_edge=None, ef=None, dtype=jnp.bfloat16):
    """Exact outermost-row/col values of the block's conv1 output (pre-bias),
    packed for the kernel: (top [B,S,2Cm], bot [B,S,2Cm], left [B,2,S,Cm],
    right [B,2,S,Cm]).  top/bot lanes are (px, c); left/right leading 2 is
    the row phase py.  See ops/fused_upsample_conv._border_strips."""
    b, s = x.shape[0], x.shape[1]
    cm = k1.shape[-1]
    y_top, y_bot, y_left, y_right = _border_strips(x, k1.astype(jnp.float32))
    if k_edge is not None:
        # Edge branch: plain SAME conv on E = resize4(ef); its border rows
        # need only thin slices of E (plus the zero row outside).
        e = resize_bilinear(ef, (2 * s, 2 * s)).astype(x.dtype)
        ke = k_edge.astype(x.dtype)
        y_top = y_top + _conv(e[:, 0:2], ke[1:3], [(0, 0), (1, 1)]).astype(
            x.dtype)
        y_bot = y_bot + _conv(e[:, -2:], ke[0:2], [(0, 0), (1, 1)]).astype(
            x.dtype)
        y_left = y_left + _conv(
            e[:, :, 0:2], ke[:, 1:3], [(1, 1), (0, 0)]).astype(x.dtype)
        y_right = y_right + _conv(
            e[:, :, -2:], ke[:, 0:2], [(1, 1), (0, 0)]).astype(x.dtype)
    # All strips in the kernel's (py, px, c) 4*Cm lane order.  top/bot
    # carry real values only in their own py half (lane masks pick them);
    # left/right are tiled over px and get a unit sublane dim so the
    # kernel's per-row dynamic read indexes an untiled leading dim.
    top = jnp.tile(y_top[:, 0].reshape(b, s, 2 * cm), (1, 1, 2))
    bot = jnp.tile(y_bot[:, 0].reshape(b, s, 2 * cm), (1, 1, 2))
    left = jnp.repeat(y_left[:, :, 0].reshape(b, s, 2, cm), 2,
                      axis=2).reshape(b, s, 1, 4 * cm)
    right = jnp.repeat(y_right[:, :, 0].reshape(b, s, 2, cm), 2,
                       axis=2).reshape(b, s, 1, 4 * cm)
    return (top.astype(dtype), bot.astype(dtype), left.astype(dtype),
            right.astype(dtype))


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------


def _sub_iota(row):
    return jax.lax.broadcasted_iota(jnp.int32, row.shape, 0)


def _roll_rows(row, shift):
    """Sublane roll; Mosaic's rotate has no sub-32-bit support, so 16-bit
    data detours through f32 (cheap VPU widen/narrow)."""
    if row.dtype.itemsize >= 4:
        return pltpu.roll(row, shift, axis=0)
    return pltpu.roll(row.astype(jnp.float32), shift,
                      axis=0).astype(row.dtype)


def _shift_clamp(row, v):
    """Source-column tap v in {0,1,2} (col J-1+v) with edge clamp.
    roll+select instead of concatenate: Mosaic rejects concats whose
    operands carry mismatched sublane/lane pad offsets."""
    if _NOSHIFT:
        return row
    if v == 0:  # P[J] = row[J-1]; P[0] = row[0]
        return jnp.where(_sub_iota(row) == 0, row,
                         _roll_rows(row, 1))
    if v == 2:  # P[J] = row[J+1]; P[S-1] = row[S-1]
        return jnp.where(_sub_iota(row) == row.shape[0] - 1, row,
                         _roll_rows(row, row.shape[0] - 1))
    return row


def _shift_zero(row, up):
    """Neighbor-column fetch with conv zero padding at the image border."""
    if _NOSHIFT:
        return row
    zero = jnp.zeros_like(row)
    if up:   # P[J] = row[J+1], zero at J = S-1
        return jnp.where(_sub_iota(row) == row.shape[0] - 1, zero,
                         _roll_rows(row, row.shape[0] - 1))
    return jnp.where(_sub_iota(row) == 0, zero,
                     _roll_rows(row, 1))  # P[J] = row[J-1]


def _interleave_rows(a, b):
    """[N, C] x 2 -> [2N, C] with rows alternating a0, b0, a1, b1, ..."""
    n, c = a.shape
    return jnp.concatenate(
        [a[:, None, :], b[:, None, :]], axis=1).reshape(2 * n, c)


def _dec_kernel(cfg, *refs):
    (s, cin, cm, sh, has_edge, has_head, he, ce, int8) = cfg
    sh4, cm2, cm4 = sh + 4, 2 * cm, 4 * cm
    it = iter(refs)
    x_hbm = next(it)
    top_ref, bot_ref, left_ref, right_ref = (next(it) for _ in range(4))
    w1_ref, w2_ref, s1t1_ref, s2t2_ref = (next(it) for _ in range(4))
    sw1_ref = next(it) if int8 else None
    sw2_ref = next(it) if int8 else None
    sx_ref = next(it) if int8 else None
    we_ref = next(it) if has_edge else None
    ef_ref = next(it) if has_edge else None
    h2_ref = next(it) if has_head else None
    hb_ref = next(it) if has_head else None
    out_ref = next(it)
    pred_ref = next(it) if has_head else None
    xbuf, a_ref, p1_ref, p2_ref = (next(it) for _ in range(4))
    pe_ref = next(it) if has_edge else None
    sem = next(it)

    bi = pl.program_id(0)
    si = pl.program_id(1)
    nsi = pl.num_programs(1)
    nbi = pl.num_programs(0)
    i0 = si * sh

    # Strip input rows (with conv1's 2-cell halo), edge-clamped via slot
    # arithmetic: slot(row) = clamp(row, 0, S-1) - xstart is always in
    # [0, sh+4) because xstart = clamp(i0-2, 0, S-(sh+4)).  The copy is
    # double-buffered across grid steps: each step starts the NEXT strip's
    # copy before waiting on its own (slot = step parity).
    def xs_of(si_):
        return jnp.clip(si_ * sh - 2, 0, s - sh4)

    step = bi * nsi + si
    slot = jax.lax.rem(step, 2)
    xstart = xs_of(si)

    @pl.when(step == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(xstart, sh4)], xbuf.at[0], sem.at[0]).start()

    @pl.when(step + 1 < nbi * nsi)
    def _():
        si2 = jax.lax.rem(si + 1, nsi)
        bi2 = bi + jnp.where(si + 1 == nsi, 1, 0)
        pltpu.make_async_copy(
            x_hbm.at[bi2, pl.ds(xs_of(si2), sh4)],
            xbuf.at[1 - slot], sem.at[1 - slot]).start()

    pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(xstart, sh4)], xbuf.at[slot], sem.at[slot]).wait()
    xb = xbuf.at[slot]

    f32 = jnp.float32
    dt = out_ref.dtype
    evenj = (jax.lax.broadcasted_iota(jnp.int32, (s, cm4), 0) % 2 == 0)
    t1 = s1t1_ref[1:2, :].astype(f32)
    t2 = s2t2_ref[1:2, :].astype(f32)

    # conv1: rows grouped so each matmul has M = rg1*S (small dots leave
    # MXUs idle -- measured 162 -> 215 TF/s going M 256 -> 1152).  With the
    # edge branch the group is 1 (per-row phase weights); the row index is
    # static everywhere (i0*sh is even, so cell parity is (r+1) % 2).
    rows1 = sh + 2
    rg1 = _pick_rg1(sh, has_edge)

    def conv1_group(g):
        for r in range(g, g + rg1):
            cell = i0 - 1 + r
            cc = jnp.clip(cell, 0, s - 1)
            # im2col patches: 3 source rows x 3 clamped col shifts.
            for u in range(3):
                xslot = jnp.clip(cc - 1 + u, 0, s - 1) - xstart
                row = xb[pl.ds(xslot, 1)][0]  # [S, Cin]
                for v in range(3):
                    if _NOPATCH:
                        break
                    k = u * 3 + v
                    p1_ref[(r - g) * s:(r - g + 1) * s,
                           k * cin:(k + 1) * cin] = _shift_clamp(row, v)
        # One matmul, N = 4*Cm lanes (py, px, c) == s2d rows.  int8 mode
        # (W8A8): x arrives PRE-QUANTIZED per image (int8 strips, half the
        # DMA bytes), so the patches here are already int8 and conv1 pays
        # ZERO in-kernel quantization — the per-token absmax+round of the
        # first formulation serialized against the dots and lost (ROOFLINE
        # negative); dequant is a (scalar image scale x column scale)
        # rank-1 rescale.
        if int8:
            y = jax.lax.dot_general(
                p1_ref[:], w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(f32) * (sx_ref[bi] * sw1_ref[:])
        else:
            y = jnp.dot(p1_ref[:], w1_ref[:], preferred_element_type=f32)

        if has_edge:
            # conv3x3(resize4(ef)): one matmul over the edge grid against
            # the composed phase kernels for this cell-row parity; columns
            # (jpar, py, px, c), rows interleaved 2x to J resolution, then
            # the J-parity half selected -- all aligned lane ranges.
            r = g
            cc = jnp.clip(i0 - 1 + r, 0, s - 1)
            ei = cc // 2
            for u in range(3):
                erow = ef_ref[0, pl.ds(jnp.clip(ei - 1 + u, 0, he - 1), 1),
                              :, :][0]  # [He, Ce]
                for v in range(3):
                    k = u * 3 + v
                    pe_ref[:, k * ce:(k + 1) * ce] = _shift_clamp(erow, v)
            wp = we_ref[(r + 1) % 2]  # [9Ce, 8Cm]; static cell parity
            oe = jnp.dot(pe_ref[:], wp, preferred_element_type=f32)
            rep = _interleave_rows(oe, oe)  # [S, 8Cm]; row J = oe[J//2]
            y = y + jnp.where(evenj, rep[:, :cm4], rep[:, cm4:])

        # BN scale lives in the weights; only offset + ReLU + cast here.
        a = jnp.maximum(y + t1, 0.0).astype(dt)
        a_ref[g:g + rg1] = a.reshape(rg1, s, cm4)

    if not _SKIP1:
        for g in range(0, rows1, rg1):
            conv1_group(g)

    # Exact border paste, strip-level: the strips arrive as POST-activation
    # values (BN+ReLU applied outside -- elementwise, so paste-then-BN ==
    # BN-then-paste).  Top/bottom hit one row per image; left/right write
    # one column of every strip, masked to their px chunks.  Left/right
    # win at the corners (applied last).
    @pl.when(si == 0)
    def _():
        a_ref[1:2, :, :cm2] = top_ref[0:1, :, :cm2]  # cell 0 == slot 1

    @pl.when(si == nsi - 1)
    def _():
        a_ref[sh:sh + 1, :, cm2:] = bot_ref[0:1, :, cm2:]  # cell S-1

    lblk = left_ref[0, pl.ds(i0, sh + 2), :, :]    # padded: row k = cell k-1
    rblk = right_ref[0, pl.ds(i0, sh + 2), :, :]
    # px=0 chunks (lanes [0:cm), [2cm:3cm)) for the left column, px=1
    # chunks for the right -- static lane slices, no masks.
    a_ref[:, 0:1, 0:cm] = lblk[:, :, 0:cm]
    a_ref[:, 0:1, cm2:cm2 + cm] = lblk[:, :, cm2:cm2 + cm]
    a_ref[:, s - 1:s, cm:cm2] = rblk[:, :, cm:cm2]
    a_ref[:, s - 1:s, cm2 + cm:] = rblk[:, :, cm2 + cm:]

    # conv2's zero padding at the top/bottom image edge: the a4=0 chunk of
    # output row 0 reads py1 of cell -1, the a4=3 chunk of the last row
    # reads py0 of cell S -- both must be zero, not clamped garbage.
    @pl.when(si == 0)
    def _():
        a_ref[0:1, :, cm2:] = jnp.zeros((1, s, cm2), dt)

    @pl.when(si == nsi - 1)
    def _():
        a_ref[sh + 1:sh + 2, :, :cm2] = jnp.zeros((1, s, cm2), dt)

    # conv2: rg2 output cell rows per matmul (M = rg2*S).  Patch rows
    # [d*S:(d+1)*S) serve output cell i0 + g + d; lanes (a4, b, c): a4 = 4
    # source (row, py) pairs, b = 4 source (col, px) pairs; see pack_w2.
    # A slot k holds cell i0 - 1 + k; all indices static.
    rg2 = _pick_rg2(sh)

    # int8 conv2: ONE strip-level activation scale (absmax over a_ref,
    # computed after the exact border pastes so |patch| <= amax holds and
    # round() never overflows 127).  The patch buffer is then quantized by
    # a pure elementwise round — no per-token reduce to serialize against
    # the dots.  Symmetric scalar quant is trivially slice-stable for the
    # two overlapping contractions.
    if int8:
        amax = jnp.max(jnp.abs(a_ref[:].astype(f32)))
        sa = jnp.maximum(amax * (1.0 / 127.0), 1e-12)
        ra = 1.0 / sa  # scalar; pl.reciprocal can't lower rank-0

    def conv2_group(g):
        for d in range(rg2):
            for a4, (off, py) in enumerate(((0, 1), (1, 0), (1, 1), (2, 0))):
                arow = a_ref[g + d + off]                # [S, 4Cm]
                half = arow[:, py * cm2:(py + 1) * cm2]  # [S, 2Cm]
                base = a4 * 4 * cm
                lo, hi = half[:, :cm], half[:, cm:]
                if _NOPATCH:
                    continue
                p2_ref[d * s:(d + 1) * s, base:base + cm] = \
                    _shift_zero(hi, up=False)
                p2_ref[d * s:(d + 1) * s, base + cm:base + 2 * cm] = lo
                p2_ref[d * s:(d + 1) * s, base + 2 * cm:base + 3 * cm] = hi
                p2_ref[d * s:(d + 1) * s, base + 3 * cm:base + 4 * cm] = \
                    _shift_zero(lo, up=True)
        w2 = w2_ref[:]
        if int8:
            p2q = jnp.round(p2_ref[:].astype(f32) * ra).astype(jnp.int8)
            dsc = sa * sw2_ref[:]
            o0 = jax.lax.dot_general(
                p2q[:, :12 * cm], w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(f32) * dsc
            o1 = jax.lax.dot_general(
                p2q[:, 4 * cm:], w2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(f32) * dsc
        else:
            p2 = p2_ref[:]
            o0 = jnp.dot(p2[:, :12 * cm], w2, preferred_element_type=f32)
            o1 = jnp.dot(p2[:, 4 * cm:], w2, preferred_element_type=f32)
        z0 = jnp.maximum(o0 + t2, 0.0).astype(dt)  # [rg2*S, 2Cm] py'=0
        z1 = jnp.maximum(o1 + t2, 0.0).astype(dt)
        out_ref[0, g:g + rg2, :, :cm2] = z0.reshape(rg2, s, cm2)
        out_ref[0, g:g + rg2, :, cm2:] = z1.reshape(rg2, s, cm2)
        if has_head:
            h2 = h2_ref[:]
            hb = hb_ref[:].astype(f32)
            pr0 = (jnp.dot(z0, h2, preferred_element_type=f32) + hb)
            pr1 = (jnp.dot(z1, h2, preferred_element_type=f32) + hb)
            for d in range(rg2):
                pred_ref[0, 2 * (g + d):2 * (g + d) + 1] = \
                    pr0[d * s:(d + 1) * s].astype(dt)[None]
                pred_ref[0, 2 * (g + d) + 1:2 * (g + d) + 2] = \
                    pr1[d * s:(d + 1) * s].astype(dt)[None]

    if not _SKIP2:
        for g in range(0, sh, rg2):
            conv2_group(g)
    else:
        out_ref[0, 0:sh] = a_ref[0:sh]
        if has_head:
            pred_ref[...] = jnp.zeros_like(pred_ref)


def fused_decoder_block(x, params: DecParams, strips, ef=None, *,
                        sh: int = 0, int8: bool = False,
                        interpret: Optional[bool] = None):
    """Run one fused decoder block.

    x: [B, S, S, Cin] NHWC.  strips: output of make_strips.  ef: [B, He,
    He, Ce] edge features iff params.we is not None.  int8: W8A8 conv
    matmuls (flagged inference speed mode, see ops/fused_block_i8.py;
    borders stay exact, BN offset/ReLU/head stay f32/bf16).  Returns
    (out_s2d [B, S, S, 4*Cm] in (py, px, c) lane order,
     pred [B, 2S, S, 2] or None -- reshape(B, 2S, 2S, 1) is free).
    """
    b, s, _, cin = x.shape
    cm = params.w1.shape[-1] // 4
    has_edge = params.we is not None
    has_head = params.h2 is not None
    ip = _fbt.INTERPRET if interpret is None else interpret
    if has_edge:
        int8 = False  # edge-branch geometry stays bf16 (dec1 is gated off)
    if int8 and not ip and cin % 128:
        int8 = False  # int8 patch writes need lane-tile-aligned Cin chunks
    if sh <= 0:
        sh = 16 if s >= 256 else 8
    assert s % sh == 0 and sh % 2 == 0, (s, sh)
    he = ce = 0
    dt = x.dtype

    # Strips are raw conv values; the kernel pastes POST-activation rows
    # (elementwise BN+ReLU commutes with pasting), so transform them here
    # and pad left/right with one row so slot k maps to cell k-1 directly.
    s1_4, t1_4 = params.s1t1[0], params.s1t1[1]

    def _act(v):
        return jnp.maximum(
            v.astype(jnp.float32) * s1_4 + t1_4, 0.0).astype(dt)

    top, bot, left, right = (_act(v) for v in strips)
    left = jnp.pad(left, ((0, 0), (1, 1), (0, 0), (0, 0)))
    right = jnp.pad(right, ((0, 0), (1, 1), (0, 0), (0, 0)))
    strips = (top, bot, left, right)
    if int8:
        w1_in, sw1 = quantize_cols(params.w1)
        w2_in, sw2 = quantize_cols(params.w2)
        # Per-image symmetric activation quant OUTSIDE the kernel: the
        # strips DMA as int8 (half the bytes) and conv1's im2col patches
        # are built from already-quantized rows — no in-kernel quant work.
        x32 = x.astype(jnp.float32)
        sx = jnp.maximum(
            jnp.max(jnp.abs(x32), axis=(1, 2, 3)) * (1.0 / 127.0), 1e-12)
        x_in = jnp.round(x32 / sx[:, None, None, None]).astype(jnp.int8)
        sxs = sx  # [B] f32, lives in SMEM (indexed by program_id)
    else:
        w1_in, w2_in = params.w1.astype(dt), params.w2.astype(dt)
        x_in = x
    inputs = [x_in, *strips, w1_in, w2_in, params.s1t1, params.s2t2]
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec((1, s, 4 * cm), lambda bi, si: (bi, 0, 0)),
        pl.BlockSpec((1, s, 4 * cm), lambda bi, si: (bi, 0, 0)),
        pl.BlockSpec((1, s + 2, 1, 4 * cm), lambda bi, si: (bi, 0, 0, 0)),
        pl.BlockSpec((1, s + 2, 1, 4 * cm), lambda bi, si: (bi, 0, 0, 0)),
        pl.BlockSpec((9 * cin, 4 * cm), lambda bi, si: (0, 0)),
        pl.BlockSpec((12 * cm, 2 * cm), lambda bi, si: (0, 0)),
        pl.BlockSpec((2, 4 * cm), lambda bi, si: (0, 0)),
        pl.BlockSpec((2, 2 * cm), lambda bi, si: (0, 0)),
    ]
    if int8:
        inputs += [sw1, sw2, sxs]
        in_specs += [
            pl.BlockSpec((1, 4 * cm), lambda bi, si: (0, 0)),
            pl.BlockSpec((1, 2 * cm), lambda bi, si: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
    if has_edge:
        he, ce = ef.shape[1], ef.shape[-1]
        inputs += [params.we.astype(dt), ef]
        in_specs += [
            pl.BlockSpec((2, 9 * ce, 8 * cm), lambda bi, si: (0, 0, 0)),
            pl.BlockSpec((1, he, he, ce), lambda bi, si: (bi, 0, 0, 0)),
        ]
    if has_head:
        inputs += [params.h2.astype(dt), params.hb]
        in_specs += [
            pl.BlockSpec((2 * cm, 2), lambda bi, si: (0, 0)),
            pl.BlockSpec((1, 2), lambda bi, si: (0, 0)),
        ]

    out_shape = [jax.ShapeDtypeStruct((b, s, s, 4 * cm), dt)]
    out_specs = [
        pl.BlockSpec((1, sh, s, 4 * cm), lambda bi, si: (bi, si, 0, 0))]
    if has_head:
        out_shape.append(jax.ShapeDtypeStruct((b, 2 * s, s, 2), dt))
        out_specs.append(
            pl.BlockSpec((1, 2 * sh, s, 2), lambda bi, si: (bi, si, 0, 0)))

    rg1 = _pick_rg1(sh, has_edge)
    rg2 = _pick_rg2(sh)
    xdt = jnp.int8 if int8 else dt
    scratch = [
        pltpu.VMEM((2, sh + 4, s, cin), xdt),  # double-buffered x strips
        pltpu.VMEM((sh + 2, s, 4 * cm), dt),
        pltpu.VMEM((rg1 * s, 9 * cin), xdt),
        pltpu.VMEM((rg2 * s, 16 * cm), dt),
    ]
    if has_edge:
        scratch.append(pltpu.VMEM((he, 9 * ce), dt))
    scratch.append(pltpu.SemaphoreType.DMA((2,)))

    cfg = (s, cin, cm, sh, has_edge, has_head, he, ce, int8)
    run = pl.pallas_call(
        functools.partial(_dec_kernel, cfg),
        grid=(b, s // sh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=ip,
    )
    res = run(*inputs)
    return (res[0], res[1]) if has_head else (res[0], None)


def decoder_supported(b: int, s: int, dtype, sh: int = 0) -> bool:
    """Can the fused kernel run this geometry here?  bf16 only on hardware
    (interpret mode is dtype-agnostic); batch must divide the data axis
    under a >1-device GSPMD mesh (the call is shard_mapped over it)."""
    from spegnet_tpu.ops.fused_block_t import _data_axis_size

    if dtype != jnp.bfloat16 and not _fbt.INTERPRET:
        return False
    if sh <= 0:
        sh = 16 if s >= 256 else 8
    if s % sh or s < 2 * sh:
        return False
    mode = spmd_mode()
    if mode == "unsupported":
        return False
    if isinstance(mode, tuple):
        d = _data_axis_size(mode)
        if b % d or b // d < 1:
            return False
    return True


def fused_decoder_block_auto(x, params: DecParams, strips, ef=None, **kw):
    """fused_decoder_block, shard_mapped over the data axis when a >1-device
    GSPMD mesh is ambient (GSPMD cannot partition a tpu_custom_call; per-
    shard shapes must reach the Pallas program — see fused_block_t)."""
    mode = spmd_mode()
    if not isinstance(mode, tuple):
        return fused_decoder_block(x, params, strips, ef=ef, **kw)
    mesh, axes = mode
    from jax.sharding import PartitionSpec as P

    batched = P(axes)
    repl = P()
    p_spec = jax.tree.map(lambda _: repl, params)
    in_specs = (batched, p_spec, (batched,) * 4)
    args = (x, params, strips)
    if ef is not None:
        in_specs += (batched,)
        args += (ef,)
    out_specs = (batched, batched) if params.h2 is not None \
        else (batched, repl)

    def fn(x_, params_, strips_, *maybe_ef):
        e = maybe_ef[0] if maybe_ef else None
        out, pred = fused_decoder_block(x_, params_, strips_, ef=e, **kw)
        return out, (pred if pred is not None else jnp.zeros((), x_.dtype))

    out, pred = jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)(*args)
    return out, (pred if params.h2 is not None else None)


# ---------------------------------------------------------------------------
# Decomposed XLA reference (tests + numerics documentation)
# ---------------------------------------------------------------------------


def decoder_block_reference(x, k1, b1, bn1, k2, b2, bn2, k_edge=None,
                            ef=None, head_w=None, head_b=None):
    """The same block via the existing exact ops: upsample2x_conv3x3 (+ XLA
    edge branch) -> folded BN/ReLU -> conv3x3 -> folded BN/ReLU [-> head].
    Returns (y2 NHWC [B, 2S, 2S, Cm], pred [B, 2S, 2S, 1] | None)."""
    from spegnet_tpu.ops.fused_upsample_conv import upsample2x_conv3x3

    dt = x.dtype
    s = x.shape[1]
    y = upsample2x_conv3x3(x, k1.astype(dt))
    if k_edge is not None:
        e = resize_bilinear(ef, (2 * s, 2 * s)).astype(dt)
        y = y + _conv(e, k_edge.astype(dt), [(1, 1), (1, 1)]).astype(dt)
    s1, t1 = fold_bn(b1, **bn1)
    y = jnp.maximum(y.astype(jnp.float32) * s1 + t1, 0.0).astype(dt)
    y2 = _conv(y, k2.astype(dt), [(1, 1), (1, 1)]).astype(dt)
    s2, t2 = fold_bn(b2, **bn2)
    y2 = jnp.maximum(y2.astype(jnp.float32) * s2 + t2, 0.0).astype(dt)
    pred = None
    if head_w is not None:
        pred = (jnp.einsum("bhwc,cn->bhwn", y2.astype(jnp.float32),
                           head_w.reshape(y2.shape[-1], -1)
                           .astype(jnp.float32))
                + head_b.astype(jnp.float32)).astype(dt)
    return y2, pred
