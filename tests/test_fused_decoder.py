"""Fused decoder-block Pallas kernel vs the decomposed exact ops.

The decomposed reference (upsample2x_conv3x3 + XLA convs) is itself golden-
tested against the reference torch DecoderBlock (tests/test_cfi_ped.py), so
agreement here transitively proves reference parity.  Interpret-mode Pallas
on CPU; f32 for tight tolerances plus a bf16 run at kernel-precision tol.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spegnet_tpu.ops import fused_block_t as fbt
from spegnet_tpu.ops import fused_decoder as fd
from spegnet_tpu.ops.fused_upsample_conv import d2s_nhwc


@pytest.fixture(autouse=True)
def interpret_on(monkeypatch):
    monkeypatch.setattr(fbt, "INTERPRET", True)
    yield


def _bn(rng, c):
    return dict(
        gamma=jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32)),
        beta=jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1),
        mean=jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.1),
        var=jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32)),
    )


def _mkcase(rng, b, s, cin, cm, edge=False, head=False, he=16, ce=8,
            dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((b, s, s, cin)).astype(np.float32))
    k1 = jnp.asarray(
        rng.standard_normal((3, 3, cin, cm)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal(cm).astype(np.float32) * 0.1)
    k2 = jnp.asarray(
        rng.standard_normal((3, 3, cm, cm)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal(cm).astype(np.float32) * 0.1)
    bn1, bn2 = _bn(rng, cm), _bn(rng, cm)
    k_edge = ef = head_w = head_b = None
    if edge:
        k_edge = jnp.asarray(
            rng.standard_normal((3, 3, ce, cm)).astype(np.float32) * 0.05)
        ef = jnp.asarray(
            rng.standard_normal((b, he, he, ce)).astype(np.float32))
    if head:
        head_w = jnp.asarray(
            rng.standard_normal((cm, 1)).astype(np.float32) * 0.1)
        head_b = jnp.asarray(rng.standard_normal(1).astype(np.float32))
    return dict(x=x.astype(dtype), k1=k1, b1=b1, bn1=bn1, k2=k2, b2=b2,
                bn2=bn2, k_edge=k_edge,
                ef=None if ef is None else ef.astype(dtype),
                head_w=head_w, head_b=head_b)


def _run_both(c, sh=0, dtype=jnp.float32):
    params = fd.pack_params(c["k1"], c["b1"], c["bn1"], c["k2"], c["b2"],
                            c["bn2"], k_edge=c["k_edge"],
                            head_w=c["head_w"], head_b=c["head_b"],
                            dtype=dtype)
    strips = fd.make_strips(c["x"], c["k1"], k_edge=c["k_edge"], ef=c["ef"],
                            dtype=dtype)
    out_s2d, pred = fd.fused_decoder_block(
        c["x"], params, strips, ef=c["ef"], sh=sh, interpret=True)
    got = d2s_nhwc(out_s2d)
    want, want_pred = fd.decoder_block_reference(
        c["x"], c["k1"], c["b1"], c["bn1"], c["k2"], c["b2"], c["bn2"],
        k_edge=c["k_edge"], ef=c["ef"], head_w=c["head_w"],
        head_b=c["head_b"])
    if pred is not None:
        b, s = c["x"].shape[0], c["x"].shape[1]
        pred = pred.reshape(b, 2 * s, 2 * s, 1)
    return got, want, pred, want_pred


def test_plain_block_f32(rng):
    """dec2-shaped (no edge, with head), small geometry."""
    c = _mkcase(rng, b=2, s=32, cin=16, cm=8, head=True)
    got, want, pred, want_pred = _run_both(c, sh=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pred), np.asarray(want_pred),
                               rtol=2e-4, atol=2e-4)


def test_edge_block_f32(rng):
    """dec1-shaped: 4x-upsampled edge branch, no head."""
    c = _mkcase(rng, b=2, s=32, cin=16, cm=8, edge=True, he=16, ce=8)
    got, want, pred, _ = _run_both(c, sh=8)
    assert pred is None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_odd_strip_boundaries(rng):
    """Strip count > 2 exercises interior halos top/bottom handling."""
    c = _mkcase(rng, b=1, s=48, cin=8, cm=8, head=True)
    got, want, _, _ = _run_both(c, sh=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bf16_close_to_f32_reference(rng):
    c = _mkcase(rng, b=1, s=32, cin=16, cm=8, edge=True, dtype=jnp.bfloat16)
    got, want, _, _ = _run_both(c, sh=8, dtype=jnp.bfloat16)
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    denom = np.maximum(np.abs(w), 1.0)
    assert np.max(np.abs(g - w) / denom) < 6e-2


def test_supported_gate():
    assert fd.decoder_supported(4, 256, jnp.bfloat16)
    assert fd.decoder_supported(4, 128, jnp.bfloat16)
    assert not fd.decoder_supported(4, 100, jnp.bfloat16)


def test_int8_block_drift_vs_exact(rng):
    """W8A8 fused block (flagged speed mode) must track the exact f32
    reference closely on smooth inputs — a catastrophic-quantization-bug
    canary, not an accuracy contract (the bench publishes the real
    mask-MAE).  Borders are pasted exactly, so they must match tightly."""
    c = _mkcase(rng, b=1, s=32, cin=16, cm=8, head=True)
    params = fd.pack_params(c["k1"], c["b1"], c["bn1"], c["k2"], c["b2"],
                            c["bn2"], head_w=c["head_w"], head_b=c["head_b"])
    strips = fd.make_strips(c["x"], c["k1"])
    out_s2d, pred = fd.fused_decoder_block(
        c["x"], params, strips, sh=8, int8=True, interpret=True)
    got = np.asarray(d2s_nhwc(out_s2d), np.float32)
    want, want_pred = fd.decoder_block_reference(
        c["x"], c["k1"], c["b1"], c["bn1"], c["k2"], c["b2"], c["bn2"],
        head_w=c["head_w"], head_b=c["head_b"])
    want = np.asarray(want, np.float32)
    denom = np.abs(want).mean() + 1e-6
    rel = np.abs(got - want) / denom
    assert float(rel.mean()) < 5e-2, float(rel.mean())
    assert float(rel.max()) < 0.5, float(rel.max())
    b, s = c["x"].shape[0], c["x"].shape[1]
    pred = np.asarray(pred.reshape(b, 2 * s, 2 * s, 1), np.float32)
    want_pred = np.asarray(want_pred, np.float32)
    pdenom = np.abs(want_pred).mean() + 1e-6
    assert float(np.abs(pred - want_pred).mean() / pdenom) < 5e-2


def test_int8_edge_block_falls_back_to_bf16(rng):
    """int8 is silently disabled for edge-branch geometries (dec1): the
    result must be bit-identical to the bf16 kernel."""
    c = _mkcase(rng, b=1, s=32, cin=16, cm=8, edge=True)
    params = fd.pack_params(c["k1"], c["b1"], c["bn1"], c["k2"], c["b2"],
                            c["bn2"], k_edge=c["k_edge"])
    strips = fd.make_strips(c["x"], c["k1"], k_edge=c["k_edge"], ef=c["ef"])
    a, _ = fd.fused_decoder_block(c["x"], params, strips, ef=c["ef"], sh=8,
                                  int8=True, interpret=True)
    b_, _ = fd.fused_decoder_block(c["x"], params, strips, ef=c["ef"], sh=8,
                                   int8=False, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))
