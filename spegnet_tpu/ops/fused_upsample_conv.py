"""Fused 2x bilinear upsample + 3x3 conv (exact, XLA-native).

The PED decoder's hot pattern is `resize_bilinear(x, 2x) -> conv3x3`
(reference: models/object_detection.py:193-199): at 512^2 the upsampled
intermediate alone is ~1 GB per batch-16 stage and must round-trip HBM twice.
Because both ops are linear convolutions they compose: torch's
align_corners=False 2x bilinear is a 2-phase 4-tap filter KU=[1/4,3/4,3/4,1/4]
(with edge clamping), so

    conv3x3(up2(x)) == conv_general_dilated(edge_pad(x, 1), K_eff,
                                            lhs_dilation=2, padding=1)

with K_eff[r, s] = sum_{dy,dx} k3[dy,dx] * KU[r-dy] * KU[s-dx]  (6x6).
XLA phase-decomposes the lhs-dilated conv and reads only the LOW-res input —
measured 12.4 -> 8.1 ms (256->512, 128ch) and 12.2 -> 6.1 ms (128->256,
320ch) at batch 16 on v5e.

Borders: the composed form sees bilinear-extended values where the plain
conv's zero padding should see zeros — only the outermost output row/col on
each side is affected.  Those four strips are recomputed exactly from thin
upsampled slices and pasted, making the whole op numerically identical to
resize+conv (tests/test_fused_upsample_conv.py asserts equality in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from spegnet_tpu.ops.resize import resize_bilinear

_KU = (0.25, 0.75, 0.75, 0.25)


def _compose_kernel(k3: jax.Array) -> jax.Array:
    """[3, 3, Cin, Cout] -> [6, 6, Cin, Cout] composed with the 2x bilinear
    transposed-conv kernel on both spatial axes."""
    ku = jnp.asarray(_KU, jnp.float32)
    # M[r, d] = KU[r - d] for r in 0..5, d in 0..2 (0 outside 0..3).
    r = jnp.arange(6)[:, None]
    d = jnp.arange(3)[None, :]
    idx = r - d
    m = jnp.where((idx >= 0) & (idx < 4), ku[jnp.clip(idx, 0, 3)], 0.0)
    return jnp.einsum("rd,se,deio->rsio", m, m, k3.astype(jnp.float32))


def _conv(x, k, padding, lhs_dilation=None):
    # No preferred_element_type: the TPU conv accumulates in f32 internally
    # and the callers cast immediately, while an explicit f32 output breaks
    # the conv transpose rule under bf16 autodiff (mixed-dtype operands).
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding, lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _border_strips(x: jax.Array, k3: jax.Array):
    """Exact outermost-output-row/col strips of conv3x3(up2(x)): the composed
    forms see bilinear-extended values where the plain conv's zero padding
    should see zeros — only these four strips differ.  Returns
    (y_top [B,1,2W,Co], y_bot [B,1,2W,Co], y_left [B,2H,1,Co],
    y_right [B,2H,1,Co]) in x.dtype."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    k3dt = k3.astype(dt)

    def colup(rows):  # [B, r, W, C] -> [B, r, 2W, C]
        return resize_bilinear(rows.astype(dt), (rows.shape[1], 2 * x.shape[2]))

    def rowup(cols):  # [B, H, c, C] -> [B, 2H, c, C]
        return resize_bilinear(cols.astype(dt), (2 * x.shape[1], cols.shape[2]))

    u_top = colup(jnp.stack(
        [x32[:, 0], 0.75 * x32[:, 0] + 0.25 * x32[:, 1]], axis=1))
    u_bot = colup(jnp.stack(
        [0.25 * x32[:, -2] + 0.75 * x32[:, -1], x32[:, -1]], axis=1))
    u_left = rowup(jnp.stack(
        [x32[:, :, 0], 0.75 * x32[:, :, 0] + 0.25 * x32[:, :, 1]], axis=2))
    u_right = rowup(jnp.stack(
        [0.25 * x32[:, :, -2] + 0.75 * x32[:, :, -1], x32[:, :, -1]], axis=2))

    # y row 0 uses u rows {-1 (zero), 0, 1} -> conv k3 rows 1..2 over u_top.
    y_top = _conv(u_top, k3dt[1:3], [(0, 0), (1, 1)]).astype(dt)
    y_bot = _conv(u_bot, k3dt[0:2], [(0, 0), (1, 1)]).astype(dt)
    y_left = _conv(u_left, k3dt[:, 1:3], [(1, 1), (0, 0)]).astype(dt)
    y_right = _conv(u_right, k3dt[:, 0:2], [(1, 1), (0, 0)]).astype(dt)
    return y_top, y_bot, y_left, y_right


def _up2c3_primal(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """The fast forward form: one lhs-dilated conv on the low-res input."""
    dt = x.dtype
    k3 = kernel.astype(jnp.float32)
    ke = _compose_kernel(k3).astype(dt)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = _conv(xp, ke, [(1, 1), (1, 1)], lhs_dilation=(2, 2))
    y = y.astype(dt)
    return _paste_borders(y, _border_strips(x, k3))


def _up2c3_poly_ref(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Mathematically identical formulation via the polyphase core + one
    depth-to-space + NHWC border paste (tests assert equality)."""
    k3 = kernel.astype(jnp.float32)
    y = d2s_nhwc(_poly_core(x, k3))
    return _paste_borders(y, _border_strips(x, k3))


def _up2c3_resize_ref(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Mathematically identical decomposed formulation (resize then conv)."""
    u = resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]))
    return (_conv(u, kernel.astype(x.dtype), [(1, 1), (1, 1)])
            .astype(x.dtype))


# Which equivalent formulation the BACKWARD differentiates ("poly" |
# "resize" | "primal" | "hand" | "hand2").  The gradients of any equivalent
# formulation are the SAME function, so the VJP may pick the fastest
# lowering.  Measured pull(dy) per decoder geometry (custom_vjp pull,
# batch 8, bf16, /tmp/handchk): resize 3.92 / 11.45 / 11.28 ms.  The
# round-3 hand-formed lowering (dx as one conv-transpose on the s2d grid,
# dk as 9 tap-einsums with the B*S*S contraction) measured 3.73 / 21.08 /
# 11.28 — its two overheads were the s2d relayout of dy (an XLA
# lane-retiling reshape, CLAUDE.md pathology) and the edge-pad-adjoint ring
# fold (8 dynamic-update-slice adds = full-tensor copies).  "hand2" below
# replaces the s2d with four H/W-STRIDED slices + channel-block concat (no
# lane retile: W stride-2 is a sublane gather) and the ring fold with ONE
# fused iota-select pass; tools/upc_bwd_probe.py A/Bs the forms in-process
# per geometry.  (When probing linear ops fold SQUARED sums into the chain
# — XLA factors plain sums through matmuls.)
import os as _os

# Default stays "resize": "auto" (hand at the S=128/Cin>=256 geometry,
# ~0.9 ms/batch-8 faster in isolation) made THIS environment's remote
# compile helper die mid-train-step compile ("response body closed") — the
# hand form's extra distinct ops push the program over the helper's
# payload fragility (CLAUDE.md) for a <0.5% step win.  Re-evaluate on a
# normally-hosted TPU where XLA compiles locally.
_BWD_FORM = _os.environ.get("SPEGNET_UPC_BWD", "resize")


def _s2d_nhwc(y: jax.Array) -> jax.Array:
    """[B, 2S, 2S, C] -> [B, S, S, 4C] (py, px, c): inverse of d2s_nhwc."""
    b, h2, w2, c = y.shape
    y = y.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h2 // 2, w2 // 2, 4 * c)


def _strips_only(x, kernel):
    """The border-strip function as a (x, kernel) -> strips pytree map, for
    autodiff of the (cheap) border path in the hand backward."""
    return _border_strips(x, kernel.astype(jnp.float32))


def _s2d_strided(y: jax.Array) -> jax.Array:
    """== _s2d_nhwc, lowered as four H/W-strided slices + channel-block
    concat: H stride-2 is free (major dim), W stride-2 is a sublane gather —
    neither is the lane-retiling reshape the reshape/transpose form lowers
    to (CLAUDE.md pathology)."""
    return jnp.concatenate(
        [y[:, py::2, px::2, :] for py in (0, 1) for px in (0, 1)], axis=-1)


def _ring_fold(dxp: jax.Array) -> jax.Array:
    """Adjoint of `jnp.pad(x, 1, mode="edge")` applied to the VALID-conv
    output dxp [B, H+2, W+2, C]: the outer ring folds into the adjacent
    inner cells.  ONE fused elementwise select pass instead of 8
    dynamic-update-slice adds (each a full-tensor copy in XLA)."""
    h = dxp.shape[1] - 2
    w = dxp.shape[2] - 2
    core = dxp[:, 1:-1, 1:-1]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w, 1), 2)
    zero = jnp.zeros((), dxp.dtype)
    top, bot = dxp[:, 0:1, 1:-1], dxp[:, -1:, 1:-1]
    left, right = dxp[:, 1:-1, 0:1], dxp[:, 1:-1, -1:]
    out = (core
           + jnp.where(row == 0, top, zero)
           + jnp.where(row == h - 1, bot, zero)
           + jnp.where(col == 0, left, zero)
           + jnp.where(col == w - 1, right, zero))
    corners = (jnp.where((row == 0) & (col == 0), dxp[:, 0:1, 0:1], zero)
               + jnp.where((row == 0) & (col == w - 1), dxp[:, 0:1, -1:], zero)
               + jnp.where((row == h - 1) & (col == 0), dxp[:, -1:, 0:1], zero)
               + jnp.where((row == h - 1) & (col == w - 1),
                           dxp[:, -1:, -1:], zero))
    return out + corners


def _up2c3_bwd_hand(x, kernel, dy, v2: bool = False):
    """Hand-formed exact VJP of conv3x3(up2(x), k).

    The primal is paste(d2s(poly_core(x, k)), strips(x, k)) where paste
    overwrites the outermost output rows/cols (left/right win corners), so
    dy splits into an interior part flowing through the polyphase core's
    transpose and four thin border slices flowing through the strip convs
    (autodiffed -- they are O(edge) work).  Equality with autodiff of the
    resize form is asserted by tests/test_fused_upsample_conv.py."""
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    ho, wo = 2 * h, 2 * w
    dt = x.dtype

    # Split dy: interior (border rows/cols zeroed) + the four strips.
    row = jax.lax.broadcasted_iota(jnp.int32, (1, ho, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wo, 1), 2)
    interior = (row != 0) & (row != ho - 1) & (col != 0) & (col != wo - 1)
    dy_int = jnp.where(interior, dy, jnp.zeros((), dy.dtype))
    notlr = (col != 0) & (col != wo - 1)
    d_top = jnp.where(notlr, dy[:, 0:1], jnp.zeros((), dy.dtype))
    d_bot = jnp.where(notlr, dy[:, -1:], jnp.zeros((), dy.dtype))
    d_left = dy[:, :, 0:1]
    d_right = dy[:, :, -1:]

    dys = (_s2d_strided if v2 else _s2d_nhwc)(dy_int)  # [B, S, S, 4Co]
    ke = _compose_kernel(kernel.astype(jnp.float32))
    kp = jnp.stack([jnp.stack([
        ke[1 - py::2, 1 - px::2] for px in (0, 1)], 0)
        for py in (0, 1)], 0)
    kp = kp.transpose(2, 3, 4, 0, 1, 5).reshape(3, 3, cin, 4 * cout)

    # dx (main): transpose of conv_VALID(edge_pad(x), kp) = conv(pad(dys, 2),
    # flipped io-swapped kp), then the edge-pad adjoint folds the outer ring
    # inward.
    kpt = jnp.flip(kp, (0, 1)).transpose(0, 1, 3, 2).astype(dt)
    dxp = _conv(dys, kpt, [(2, 2), (2, 2)]).astype(dt)
    if v2:
        dx = _ring_fold(dxp)
    else:
        dx = dxp[:, 1:-1, 1:-1]
        dx = dx.at[:, 0].add(dxp[:, 0, 1:-1])
        dx = dx.at[:, -1].add(dxp[:, -1, 1:-1])
        dx = dx.at[:, :, 0].add(dxp[:, 1:-1, 0])
        dx = dx.at[:, :, -1].add(dxp[:, 1:-1, -1])
        dx = dx.at[:, 0, 0].add(dxp[:, 0, 0])
        dx = dx.at[:, 0, -1].add(dxp[:, 0, -1])
        dx = dx.at[:, -1, 0].add(dxp[:, -1, 0])
        dx = dx.at[:, -1, -1].add(dxp[:, -1, -1])

    # dk (main): 9 per-tap einsums over (edge-padded x shifts, dys) with the
    # B*S*S contraction on the MXU, then the compose-kernel adjoint.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    taps = []
    for u in range(3):
        for v in range(3):
            taps.append(jnp.einsum(
                "bhwc,bhwd->cd", xp[:, u:u + h, v:v + w], dys,
                preferred_element_type=jnp.float32))
    dkp = jnp.stack(taps).reshape(3, 3, cin, 2, 2, cout)
    ku = jnp.asarray(_KU, jnp.float32)
    r6 = jnp.arange(6)[:, None]
    d3 = jnp.arange(3)[None, :]
    idx = r6 - d3
    m = jnp.where((idx >= 0) & (idx < 4), ku[jnp.clip(idx, 0, 3)], 0.0)
    dke = jnp.zeros((6, 6, cin, cout), jnp.float32)
    for py in (0, 1):
        for px in (0, 1):
            dke = dke.at[1 - py::2, 1 - px::2].set(dkp[:, :, :, py, px])
    dk = jnp.einsum("rd,se,rsio->deio", m, m, dke)

    # Border path: autodiff of the strip convs (thin slices, O(edge) work).
    _, pull = jax.vjp(_strips_only, x, kernel)
    dx_b, dk_b = pull((d_top, d_bot, d_left, d_right))
    return (dx + dx_b.astype(dt),
            (dk + dk_b.astype(jnp.float32)).astype(kernel.dtype))


@jax.custom_vjp
def _up2c3(x: jax.Array, kernel: jax.Array) -> jax.Array:
    return _up2c3_primal(x, kernel)


def _up2c3_fwd(x, kernel):
    return _up2c3_primal(x, kernel), (x, kernel)


def _up2c3_bwd(res, dy):
    x, kernel = res
    form = _BWD_FORM
    if form == "auto":
        # Per-geometry pick from tools/upc_bwd_probe.py (in-process A/B,
        # batch 8): "hand" wins only the S=128, Cin>=256 decoder-1 x-branch
        # (7.12 vs 8.04 ms); "resize" wins everywhere else (up0 0.62 vs
        # 2.71, up2 13.61 vs 16.38).
        s_sq = x.shape[1] == x.shape[2] == 128
        form = "hand" if (s_sq and x.shape[-1] >= 256) else "resize"
    if form in ("hand", "hand2"):
        return _up2c3_bwd_hand(x, kernel, dy, v2=form == "hand2")
    ref = {"poly": _up2c3_poly_ref, "resize": _up2c3_resize_ref,
           "primal": _up2c3_primal}[form]
    _, pull = jax.vjp(ref, x, kernel)
    return pull(dy)


_up2c3.defvjp(_up2c3_fwd, _up2c3_bwd)


def upsample2x_conv3x3(x: jax.Array, kernel: jax.Array,
                       bias: jax.Array | None = None) -> jax.Array:
    """Exactly `conv3x3(resize_bilinear(x, 2x), kernel) [+ bias]`, NHWC,
    SAME zero padding on the conv — without materializing the upsample."""
    y = _up2c3(x, kernel)
    if bias is not None:
        y = y + bias.astype(x.dtype)
    return y


def _paste_borders(y: jax.Array, strips) -> jax.Array:
    """Paste the four exact border strips into NHWC y via broadcasted selects
    (ONE fused elementwise pass) instead of chained dynamic-update-slices,
    which XLA executed as full-tensor copies (~5 ms at the 512² stage,
    measured).  Left/right outermost so they win at the corners."""
    y_top, y_bot, y_left, y_right = strips
    ho, wo = y.shape[1:3]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, ho, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wo, 1), 2)
    y = jnp.where(row == 0, y_top, jnp.where(row == ho - 1, y_bot, y))
    y = jnp.where(col == 0, y_left, jnp.where(col == wo - 1, y_right, y))
    return y


def _poly_core(x: jax.Array, k3: jax.Array) -> jax.Array:
    """Raw polyphase conv: [B, S, S, Cin] -> [B, S, S, 4*Cout] in s2d
    (py, px, co) layout, WITHOUT border repair or bias.  Interior-exact;
    the outermost output rows/cols need _border_strips pasted on top."""
    dt = x.dtype
    cin = x.shape[-1]
    co = k3.shape[-1]
    ke = _compose_kernel(k3)  # [6, 6, Cin, Cout] f32

    # Phase kernels: out[2j + p] = sum_u ke[2u + (1 - p)] xp[j + u]
    # (xp = edge-pad(x, 1)); stacked as channels (py, px, co).
    kp = jnp.stack([jnp.stack([
        ke[1 - py::2, 1 - px::2] for px in (0, 1)], 0) for py in (0, 1)], 0)
    kp = kp.transpose(2, 3, 4, 0, 1, 5).reshape(3, 3, cin, 4 * co).astype(dt)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    return _conv(xp, kp, [(0, 0), (0, 0)]).astype(dt)


def upsample2x_conv3x3_sum(parts, bias: jax.Array | None = None) -> jax.Array:
    """Exactly ``sum_i conv3x3(resize_bilinear(x_i, 2x), k_i) [+ bias]`` for
    same-spatial-shape inputs, via the polyphase core: the per-part matmuls
    run ~2x faster than the lhs-dilated composed conv when Cout <= 128 (they
    fill the MXU's 128 output lanes with 4*Cout), the parts sum in s2d space,
    and ONE depth-to-space + ONE NHWC border paste finish the job.  The s2d
    tensor is never sliced per phase — the earlier per-phase paste+concat in
    s2d space cost ~1 ms/img more than this at the full-model level."""
    dt = parts[0][0].dtype
    ys = None
    strips = None
    for x, kernel in parts:
        k3 = kernel.astype(jnp.float32)
        y = _poly_core(x, k3)
        st = _border_strips(x, k3)
        ys = y if ys is None else ys + y
        strips = st if strips is None else tuple(
            a + b for a, b in zip(strips, st))
    y = _paste_borders(d2s_nhwc(ys), strips)
    if bias is not None:
        y = y + bias.astype(dt)
    return y


def upsample2x_conv3x3_s2d(x: jax.Array, kernel: jax.Array,
                           bias: jax.Array | None = None) -> jax.Array:
    """Exactly ``space_to_depth(conv3x3(resize_bilinear(x, 2x)))``:
    [B, S, S, Cin] -> [B, S, S, 4*Cout], channel layout (py, px, co)
    phase-major (out[b, 2i+py, 2j+px, c] == ret[b, i, j, (2*py+px)*Co + c]).

    The polyphase form runs the matmuls ~2x faster than the lhs-dilated
    composed conv when Cout <= 128 (the lhs-dilated form phase-decomposes to
    per-phase convs whose Cout half-fills the MXU's 128-lane output tiles;
    the poly kernel's 4*Cout output dim fills them) — measured on v5e at
    batch 16: 8.04 -> 4.13 ms (256², 128->64), 6.18 -> 5.01 ms (128²,
    320->128).  The depth-to-space back (d2s_nhwc) costs 0.9-1.75 ms at
    those shapes, keeping the net win (tools/dec_s2d_micro.py).
    """
    dt = x.dtype
    b, hs, ws, cin = x.shape
    co = kernel.shape[-1]
    k3 = kernel.astype(jnp.float32)
    y = _poly_core(x, k3)  # [B, S, S, 4Co]

    # Exact border repair, pasted per phase block (see _border_strips).
    y_top, y_bot, y_left, y_right = _border_strips(x, k3)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, hs, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ws, 1), 2)
    blocks = []
    for py in (0, 1):
        for px in (0, 1):
            blk = y[..., (2 * py + px) * co: (2 * py + px + 1) * co]
            if py == 0:  # true row 0 lives in phase py=0, cell row 0
                blk = jnp.where(row == 0, y_top[:, :, px::2], blk)
            else:        # true row 2H-1: phase py=1, cell row H-1
                blk = jnp.where(row == hs - 1, y_bot[:, :, px::2], blk)
            if px == 0:
                blk = jnp.where(col == 0, y_left[:, py::2], blk)
            else:
                blk = jnp.where(col == ws - 1, y_right[:, py::2], blk)
            blocks.append(blk)
    y = jnp.concatenate(blocks, axis=-1)
    if bias is not None:
        y = y + jnp.tile(bias, 4).astype(dt)
    return y


def d2s_nhwc(y_s2d: jax.Array) -> jax.Array:
    """[B, S, S, 4C] (py, px, c) -> [B, 2S, 2S, C]: inverse of the s2d
    layout produced by upsample2x_conv3x3_s2d.  Cheap when the contiguous
    channel chunk (C) is >= a full 128-lane tile or the data is small
    (measured 0.40/0.90/1.75 ms at the three decoder geometries, batch 16)."""
    b, hs, ws, c4 = y_s2d.shape
    c = c4 // 4
    y = y_s2d.reshape(b, hs, ws, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * hs, 2 * ws, c)
