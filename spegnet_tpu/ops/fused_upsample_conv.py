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


def upsample2x_conv3x3(x: jax.Array, kernel: jax.Array,
                       bias: jax.Array | None = None) -> jax.Array:
    """Exactly `conv3x3(resize_bilinear(x, 2x), kernel) [+ bias]`, NHWC,
    SAME zero padding on the conv — without materializing the upsample."""
    dt = x.dtype
    k3 = kernel.astype(jnp.float32)
    ke = _compose_kernel(k3).astype(dt)

    # NOTE on the rejected polyphase alternative: computing the four output
    # phases as one dense [3, 3, Cin, 4*Cout] conv runs the matmuls ~2x
    # faster for Cout <= 128 (the lhs-dilated form half-fills the MXU's
    # 128-lane output tiles), but the depth-to-space back to NHWC costs MORE
    # than the saving: a [.., 2W, 64] <-> [.., W, 128] reinterpretation is a
    # lane-RETILING in XLA's (8, 128)-tiled layout (measured +4.2 ms at
    # 256->512/64ch vs the conv's -3.9 ms).  The lhs-dilated conv writes the
    # half-filled tiles directly from the MXU, so it stays.
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = _conv(xp, ke, [(1, 1), (1, 1)], lhs_dilation=(2, 2))
    y = y.astype(dt)

    # --- exact border strips -------------------------------------------
    # u rows 0..1 / last two, cols 0..1 / last two (torch up2 semantics).
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

    # Paste via broadcasted selects (ONE fused elementwise pass) instead of
    # chained dynamic-update-slices, which XLA executed as full-tensor copies
    # (~5 ms at the 512² stage, measured).  Left/right outermost so they win
    # at the corners, matching the previous paste order.
    ho, wo = y.shape[1:3]
    row = jax.lax.broadcasted_iota(jnp.int32, (1, ho, 1, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, wo, 1), 2)
    y = jnp.where(row == 0, y_top, jnp.where(row == ho - 1, y_bot, y))
    y = jnp.where(col == 0, y_left, jnp.where(col == wo - 1, y_right, y))
    if bias is not None:
        y = y + bias.astype(dt)
    return y
