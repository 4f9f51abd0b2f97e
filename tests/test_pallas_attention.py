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
