"""Attention primitives for the Hiera encoder.

``scaled_dot_product_attention`` is the dispatch point: a plain XLA einsum
implementation (always available, used for parity tests) and a fused Pallas
TPU kernel (spegnet_tpu.ops.pallas_attention) that keeps the [L, L] score
matrix in VMEM instead of round-tripping it through HBM — the main bandwidth
win at Hiera stage 1/2 where thousands of small windows are processed per
batch.

Semantics match ``torch.nn.functional.scaled_dot_product_attention``:
softmax(Q K^T / sqrt(head_dim)) V, no masking (Hiera uses none).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# "auto"/"1" enable the fused kernel where supported; "0" forces XLA.
# Module-level so it can be flipped at runtime (a re-jit picks it up).
USE_PALLAS = os.environ.get("SPEGNET_PALLAS_ATTENTION", "auto")


def attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """[B, Lq, H, D] x [B, Lk, H, D] -> [B, Lq, H, D], plain XLA."""
    head_dim = q.shape[-1]
    scale = head_dim ** -0.5
    # Compute scores in f32 for numerical stability regardless of input dtype.
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v)
    return o


def scaled_dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Dispatch to the fused Pallas kernel on TPU when profitable."""
    if USE_PALLAS in ("auto", "1"):
        try:
            from spegnet_tpu.ops.pallas_attention import fused_attention, is_supported

            if is_supported(q, k, v):
                return fused_attention(q, k, v)
        except ImportError:
            pass
    return attention_reference(q, k, v)
