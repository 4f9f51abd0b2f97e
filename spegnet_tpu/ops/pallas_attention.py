"""Fused TPU attention kernel (Pallas) — placeholder gate for round-1 slice.

The fused kernel lands in the optimization phase; until then `is_supported`
returns False so the dispatcher uses the XLA reference path.
"""

from __future__ import annotations

import jax


def is_supported(q: jax.Array, k: jax.Array, v: jax.Array) -> bool:
    return False


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    raise NotImplementedError
