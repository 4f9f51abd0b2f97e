"""Pallas fused attention: parity vs the XLA reference path (interpret mode
on CPU; the real-TPU path is exercised by bench/verify runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spegnet_tpu.ops import pallas_attention
from spegnet_tpu.ops.attention import attention_reference


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp)
    monkeypatch.setattr(pallas_attention.pl, "pallas_call", interp)
    yield


@pytest.mark.parametrize(
    "b,l,h,d",
    [
        (4, 64, 2, 72),    # Hiera stage-1 windows
        (2, 256, 8, 72),   # stage-3 windows
        (1, 1024, 8, 72),  # stage-3 global at 512^2
        (1, 4096, 2, 72),  # stage-3 global at 1024^2 (q-blocked path)
        (3, 16, 4, 32),    # tiny windows
    ],
)
def test_fused_matches_reference(rng, b, l, h, d):
    q = jnp.asarray(rng.standard_normal((b, l, h, d), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((b, l, h, d), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((b, l, h, d), dtype=np.float32))
    ref = attention_reference(q, k, v)
    out = pallas_attention.fused_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_fused_gradients_match_reference(rng):
    q = jnp.asarray(rng.standard_normal((2, 64, 2, 32), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((2, 64, 2, 32), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((2, 64, 2, 32), dtype=np.float32))

    def loss_fused(q, k, v):
        return jnp.sum(pallas_attention.fused_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3)


def test_dispatcher_gating():
    x = jnp.zeros((1, 4096, 2, 72))  # too long -> XLA path
    assert not pallas_attention.is_supported(x, x, x)
    y = jnp.zeros((1, 256, 2, 72))
    # On CPU tests the dispatcher must refuse (no TPU backend).
    assert not pallas_attention.is_supported(y, y, y)


def _pack_lanes(rng, b, l, h, d, hp=128):
    qkv = rng.standard_normal((b, l, 3, h, d)).astype(np.float32)
    qkv_p = np.zeros((b, l, 3, h, hp), np.float32)
    qkv_p[..., :d] = qkv
    return qkv, jnp.asarray(qkv_p.reshape(b, l, 3 * h * hp))


@pytest.mark.parametrize(
    "b,l,h,d",
    [
        (4, 64, 2, 72),    # stage-1 windows, wins-folded
        (1, 1024, 8, 72),  # stage-3 global at 512^2
        (1, 4096, 2, 72),  # q-blocked long-L path
    ],
)
def test_lanes_kernel_matches_reference(rng, b, l, h, d):
    """The lane-padded zero-copy kernel == plain attention on the unpadded
    heads, and its pad lanes stay exactly zero."""
    qkv, qkv_p = _pack_lanes(rng, b, l, h, d)
    scale = d ** -0.5
    out = np.asarray(pallas_attention.fused_attention_lanes(qkv_p, h, scale))
    out = out.reshape(b, l, h, 128)
    ref = attention_reference(
        jnp.asarray(qkv[:, :, 0]), jnp.asarray(qkv[:, :, 1]), jnp.asarray(qkv[:, :, 2])
    )
    np.testing.assert_allclose(out[..., :d], np.asarray(ref), atol=2e-5, rtol=1e-4)
    assert np.abs(out[..., d:]).max() == 0.0


def test_lanes_gradients_match_reference(rng):
    b, l, h, d = 2, 64, 2, 72
    qkv, qkv_p = _pack_lanes(rng, b, l, h, d)
    scale = d ** -0.5

    def loss_lanes(t):
        return jnp.sum(pallas_attention.fused_attention_lanes(t, h, scale) ** 2)

    def loss_ref(t):
        # _lanes_reference applies the true head_dim's scale (72^-0.5), not
        # the padded width's.
        return jnp.sum(pallas_attention._lanes_reference(t, h, scale) ** 2)

    g = np.asarray(jax.grad(loss_lanes)(qkv_p))
    g_ref = np.asarray(jax.grad(loss_ref)(qkv_p))
    np.testing.assert_allclose(g, g_ref, atol=2e-4, rtol=1e-3)


def test_lanes_block_end_to_end_matches_canonical(rng, monkeypatch):
    """Force the lanes path on CPU (interpret mode): a whole MultiScaleBlock
    must match the canonical (XLA attention) path."""
    from spegnet_tpu.models.hiera import MultiScaleBlock
    import spegnet_tpu.ops.attention as attmod

    blk = MultiScaleBlock(dim=144, dim_out=144, num_heads=2, window_size=8)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 144)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)

    monkeypatch.setattr(pallas_attention, "lanes_supported", lambda l, d: True)
    fast = blk.apply(variables, x)
    monkeypatch.setattr(attmod, "USE_PALLAS", "0")
    ref = blk.apply(variables, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
