"""Bit-packed {0,1} ground-truth wire for training batches.

The tunneled chip's host->device link (~51 MB/s measured,
tools/step_anatomy.py) makes the per-step batch transfer the training
bottleneck.  Masks/edges are exactly {0,1} (data/pipeline.py process_mask
thresholds at 127.5, reference: utils/dataset.py), so they ship as one bit
per pixel: packed along the H axis (sublanes) with numpy's MSB-first order,
8x smaller than the uint8 wire.  The device-side unpack is a shift+mask plus
a sublane-interleave reshape (cheap on TPU; lane layout untouched).

Contract: a TrainBatch whose masks/edges dtype is uint8 carries PACKED
[B, Hc/8, Wc] canvases (Hc is always a multiple of 8 — canvas buckets are
multiples of 32).  Validation batches keep unpacked GTs (the host needs
them for EDT maps).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pack_gt(a: np.ndarray) -> np.ndarray:
    """[B, Hc, Wc] {0,1} -> [B, Hc/8, Wc] uint8, MSB-first along H."""
    assert a.shape[1] % 8 == 0, a.shape
    return np.packbits(a.astype(np.uint8), axis=1)


def unpack_gt(p: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse of pack_gt: [B, Hc/8, Wc] uint8 -> [B, Hc, Wc]
    uint8 {0,1}."""
    b, h8, w = p.shape
    shifts = (7 - jnp.arange(8, dtype=jnp.uint8)).reshape(1, 1, 8, 1)
    bits = (p[:, :, None, :] >> shifts) & jnp.uint8(1)  # [B, H/8, 8, W]
    return bits.reshape(b, h8 * 8, w)
