"""Device-side binary morphology (dilate/erode/close) via reduce_window.

TPU equivalent of the cv2 morphological ops used by the offline edge
generator (reference: utils/camo_edge_processor.py:137-142): on binary masks,
dilation with a 3x3 ones kernel is a 3x3 max-pool (stride 1) and erosion a
3x3 min-pool, so GT edge maps can also be synthesized on-the-fly on device
(e.g. for datasets that ship masks but no edges).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pool(x: jnp.ndarray, init, op, k: int = 3) -> jnp.ndarray:
    """[..., H, W] stride-1 kxk window reduction with edge replication.

    cv2 uses BORDER_CONSTANT with the border value chosen so border pixels
    behave as replicated for dilate/erode on binary images; replication
    matches cv2's default BORDER_REFLECT_101 behavior for binary masks'
    interiors and is exact for masks that don't touch the border.
    """
    p = k // 2
    pad = [(0, 0)] * (x.ndim - 2) + [(p, p), (p, p)]
    x = jnp.pad(x, pad, mode="edge")
    window = (1,) * (x.ndim - 2) + (k, k)
    strides = (1,) * x.ndim
    return jax.lax.reduce_window(x, init, op, window, strides, "VALID")


def dilate(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    for _ in range(iterations):
        mask = _pool(mask, -jnp.inf, jax.lax.max)
    return mask


def erode(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    for _ in range(iterations):
        mask = _pool(mask, jnp.inf, jax.lax.min)
    return mask


def morphological_edges(mask: jnp.ndarray, edge_width: int = 1) -> jnp.ndarray:
    """dilate - erode, then MORPH_CLOSE (dilate-then-erode), binary in/out."""
    edges = dilate(mask, edge_width) - erode(mask, edge_width)
    edges = erode(dilate(edges, 1), 1)
    return jnp.clip(edges, 0.0, 1.0)
