"""int8 (W8A8) fused block (ops/fused_block_t_i8.py): interpret-mode parity
on CPU vs the pure-XLA quantized reference (identical quant math -> tight
tolerance), quantizer properties, drift vs the bf16/f32 exact block (loose
bound: int8 is a flagged speed mode whose accuracy is a *measured* quantity,
see BASELINE.md plan of record), eligibility gating, and SPMD activation on
the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from spegnet_tpu.ops import fused_block_t as fbt
from spegnet_tpu.ops import fused_block_t_i8 as i8

from tests.test_fused_block_t import make_weights


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fbt, "INTERPRET", True)
    yield


def test_quantize_rows_properties(rng):
    w = jnp.asarray(rng.standard_normal((48, 96)).astype(np.float32))
    wq, s = i8.quantize_rows(w)
    assert wq.dtype == jnp.int8 and s.shape == (48, 1)
    assert int(jnp.max(jnp.abs(wq.astype(jnp.int32)))) <= 127
    # dequantized error bounded by half a step per element
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(s) - np.asarray(w))
    assert float(err.max()) <= float(np.asarray(s).max()) * 0.5 + 1e-7
    # all-zero row gets the floor scale, zero codes
    wq0, s0 = i8.quantize_rows(jnp.zeros((2, 8)))
    assert int(jnp.max(jnp.abs(wq0.astype(jnp.int32)))) == 0
    assert float(s0.min()) > 0


@pytest.mark.parametrize("hw,ws,c,heads,d", [
    (16, 4, 32, 2, 16),    # masked chunks: 128-lane chunk packs 8 windows
    (32, 16, 32, 2, 16),   # per-window path: L = 256
    (16, 0, 32, 2, 16),    # global: L = N = 256
])
def test_i8_kernel_matches_i8_reference(rng, hw, ws, c, heads, d):
    hp = fbt.round_hp(d)
    weights = i8.pack_i8(make_weights(rng, c, heads, d, 4 * c, hp))
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    l = ws * ws if ws else hw * hw
    kw = dict(heads=heads, hp=hp, l=l, scale=d ** -0.5, eps=1e-6,
              approx_gelu=False)
    want = np.asarray(i8.block_t_i8_reference(xt, weights, **kw))
    got = np.asarray(i8.fused_block_t_i8(xt, weights, heads, hp, l,
                                         d ** -0.5, 1e-6, False))
    # Same quant math, but kernel and reference order their f32 dots
    # differently, so knife-edge pre-quant values may flip ONE int8 code:
    # demand exactness on >99% of elements and <= ~1 dequant step elsewhere.
    diff = np.abs(got - want)
    assert float((diff > 5e-4).mean()) < 0.01, float((diff > 5e-4).mean())
    assert float(diff.max()) < 0.2, float(diff.max())


def test_i8_drift_vs_exact_block(rng):
    """W8A8 must track the exact f32 block closely on smooth inputs — a
    catastrophic-quantization-bug canary, not an accuracy contract."""
    c, heads, d, ws, hw = 32, 2, 16, 4, 16
    hp = fbt.round_hp(d)
    w = make_weights(rng, c, heads, d, 4 * c, hp)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    kw = dict(heads=heads, hp=hp, l=ws * ws, scale=d ** -0.5, eps=1e-6,
              approx_gelu=False)
    exact = np.asarray(fbt.block_t_reference(xt, w, **kw))
    quant = np.asarray(i8.block_t_i8_reference(xt, i8.pack_i8(w), **kw))
    rel = np.abs(quant - exact) / (np.abs(exact).mean() + 1e-6)
    assert float(rel.mean()) < 5e-2, float(rel.mean())
    assert float(rel.max()) < 0.5, float(rel.max())


def test_supported_i8_gating():
    # stage-1 width (144) excluded: not an int8 sublane-tile multiple
    assert not i8.supported_i8(144, 2, 64, 16384, jnp.bfloat16)
    # stage-2/3 widths qualify (interpret mode makes `supported` pass on CPU)
    assert i8.supported_i8(288, 4, 16, 4096, jnp.bfloat16)
    assert i8.supported_i8(576, 8, 256, 1024, jnp.bfloat16)


def test_spegnet_int8_smoke(rng, monkeypatch):
    """Full model with int8_encoder=True (tiny variant, interpret mode):
    the int8 kernel must actually engage, outputs stay finite and close to
    the bf16 path's masks."""
    from spegnet_tpu.models import SPEGNet, SPEGNetConfig

    calls = {"n": 0}
    orig = i8._forward_i8

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(i8, "_forward_i8", counting)

    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    bf16 = SPEGNet(SPEGNetConfig(variant="tiny", compute_dtype="bfloat16"))
    q = SPEGNet(SPEGNetConfig(variant="tiny", compute_dtype="bfloat16",
                              int8_encoder=True))
    variables = bf16.init(jax.random.PRNGKey(0), x)
    p_bf16 = bf16.apply(variables, x)["predictions"][-1]
    p_i8 = q.apply(variables, x)["predictions"][-1]
    assert calls["n"] > 0, "int8 kernel never engaged"
    m_bf16 = np.asarray(jax.nn.sigmoid(p_bf16.astype(jnp.float32)))
    m_i8 = np.asarray(jax.nn.sigmoid(p_i8.astype(jnp.float32)))
    assert np.isfinite(m_i8).all()
    assert float(np.abs(m_i8 - m_bf16).mean()) < 0.05
    # training must NOT take the int8 path (inference-only: no vjp)
    calls["n"] = 0
    q.apply(variables, x, train=True, mutable=["batch_stats"])
    assert calls["n"] == 0


def test_hiera_int8_scan_path(rng, monkeypatch):
    """Runs of identical blocks must take the int8 kernel through the
    lax.scan-over-stacked-weights path (the production stage-3 shape; the
    tiny variant's 14-wide windows never qualify at test sizes, so use a
    micro variant with 4-wide windows)."""
    from spegnet_tpu.models import hiera as hmod

    monkeypatch.setitem(
        hmod.HIERA_VARIANTS, "i8test",
        hmod.HieraConfig(32, 2, (1, 1, 3, 1), (), (7, 7), (4, 4, 4, 4)))

    calls = {"n": 0}
    orig = i8._forward_i8

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(i8, "_forward_i8", counting)

    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    enc_bf = hmod.Hiera(variant="i8test", dtype=jnp.bfloat16)
    enc_i8 = hmod.Hiera(variant="i8test", dtype=jnp.bfloat16, int8=True)
    v = enc_bf.init(jax.random.PRNGKey(0), x)
    want = enc_bf.apply(v, x)
    assert calls["n"] == 0
    got = enc_i8.apply(v, x)
    assert calls["n"] > 0, "int8 kernel never engaged via the scan path"
    for a, b in zip(got, want):
        a32 = np.asarray(a, np.float32)
        b32 = np.asarray(b, np.float32)
        assert np.isfinite(a32).all()
        denom = np.abs(b32).mean() + 1e-6
        assert float(np.abs(a32 - b32).mean() / denom) < 0.1


def _make_qpool_weights(rng, cin, heads, d, hp):
    cout = heads * d
    return fbt.QPoolWeights(
        ln_scale=jnp.asarray(
            rng.standard_normal((cin, 1)).astype(np.float32) * 0.1 + 1),
        ln_bias=jnp.asarray(
            rng.standard_normal((cin, 1)).astype(np.float32) * 0.1),
        wqkv_t=jnp.asarray(np.pad(
            rng.standard_normal((3, heads, d, cin)).astype(np.float32) * 0.2,
            ((0, 0), (0, 0), (0, hp - d), (0, 0))).reshape(-1, cin)),
        bqkv_t=jnp.asarray(np.pad(
            rng.standard_normal((3, heads, d)).astype(np.float32) * 0.1,
            ((0, 0), (0, 0), (0, hp - d))).reshape(-1, 1)),
        wsc_t=jnp.asarray(
            rng.standard_normal((cout, cin)).astype(np.float32) * 0.2),
        bsc_t=jnp.asarray(
            rng.standard_normal((cout, 1)).astype(np.float32) * 0.1),
    )


@pytest.mark.parametrize("cin,heads,d,ws,hw", [
    (32, 2, 16, 16, 32),   # t23-like (L = 256)
    (32, 16, 8, 8, 16),    # t34-like (heads > 8)
])
def test_qpool_i8_kernel_matches_i8_reference(rng, cin, heads, d, ws, hw):
    """Interpret-mode parity of the W8A8 transition front vs the token-major
    quantized reference (identical quant math -> near-exact; see the 1-code
    knife-edge allowance in test_i8_kernel_matches_i8_reference)."""
    hp = fbt.round_hp(d)
    wts = i8.pack_qpool_i8(_make_qpool_weights(rng, cin, heads, d, hp))
    x = jnp.asarray(
        rng.standard_normal((2, hw, hw, cin)).astype(np.float32) * 0.5)
    xt = fbt.to_t_micro(x, ws)
    kw = dict(heads=heads, hp=hp, l=ws * ws, scale=d ** -0.5, eps=1e-6)
    o_ref, sc_ref = i8.qpool_i8_reference(xt, wts, **kw)
    o_f, sc_f = i8.qpool_front_i8(xt, wts, heads, hp, ws * ws,
                                  d ** -0.5, 1e-6)
    for got, want in ((o_f, o_ref), (sc_f, sc_ref)):
        diff = np.abs(np.asarray(got) - np.asarray(want))
        assert float((diff > 5e-4).mean()) < 0.01, float((diff > 5e-4).mean())
        assert float(diff.max()) < 0.2, float(diff.max())


def test_qpool_i8_drift_vs_exact_front(rng):
    """W8A8 front must track the exact front closely on smooth inputs
    (catastrophic-quantization canary, mirrors test_i8_drift_vs_exact_block)."""
    cin, heads, d, ws, hw = 32, 2, 16, 4, 16
    hp = fbt.round_hp(d)
    w = _make_qpool_weights(rng, cin, heads, d, hp)
    x = jnp.asarray(
        rng.standard_normal((2, hw, hw, cin)).astype(np.float32) * 0.5)
    xt = fbt.to_t_micro(x, ws)
    kw = dict(heads=heads, hp=hp, l=ws * ws, scale=d ** -0.5, eps=1e-6)
    for exact, quant in zip(
            fbt.qpool_front_reference(xt, w, **kw),
            i8.qpool_i8_reference(xt, i8.pack_qpool_i8(w), **kw)):
        e = np.asarray(exact, np.float32)
        q = np.asarray(quant, np.float32)
        rel = np.abs(q - e) / (np.abs(e).mean() + 1e-6)
        assert float(rel.mean()) < 5e-2, float(rel.mean())
        assert float(rel.max()) < 0.5, float(rel.max())


def test_qpool_supported_i8_gating():
    # t12 (Cin=144) excluded: not an int8 sublane-tile multiple
    assert not i8.qpool_supported_i8(144, 4, 16, 16384, jnp.bfloat16)
    # t23 / t34 qualify
    assert i8.qpool_supported_i8(288, 8, 256, 4096, jnp.bfloat16)
    assert i8.qpool_supported_i8(576, 16, 64, 1024, jnp.bfloat16)


def test_qpool_i8_engages_in_model(rng, monkeypatch):
    """With int8_encoder=True the W8A8 transition front must actually run
    for the int8-eligible transitions of a Cin%32==0 variant (tiny: 96/192),
    and never during training (no vjp exists)."""
    from spegnet_tpu.models import SPEGNet, SPEGNetConfig

    calls = {"n": 0}
    orig = i8._qpool_forward_i8

    def counting(*a, **kw):
        calls["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(i8, "_qpool_forward_i8", counting)

    # widen the geometry gate as the bf16 qpool tests do (production L=256
    # shapes don't arise at test sizes)
    def widened(cin, heads, l, n_tok, dtype, batch=None):
        return (
            cin % 16 == 0 and l % 4 == 0
            and (128 % l == 0 if l < 128 else l % 128 == 0)
            and fbt._pick_cw(l, n_tok) % max(l, 128) == 0
            and n_tok % fbt._pick_cw(l, n_tok) == 0)

    # qpool_supported_i8 calls the name captured at from-import time in the
    # i8 module, so BOTH bindings must be patched for the widened gate to
    # reach the int8 eligibility check (advisor round-4 finding).
    monkeypatch.setattr(fbt, "qpool_supported", widened)
    monkeypatch.setattr(i8, "qpool_supported", widened)

    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    q = SPEGNet(SPEGNetConfig(variant="tiny", compute_dtype="bfloat16",
                              int8_encoder=True))
    variables = q.init(jax.random.PRNGKey(0), x)
    p = q.apply(variables, x)["predictions"][-1]
    assert calls["n"] > 0, "int8 qpool front never engaged"
    assert np.isfinite(np.asarray(p, np.float32)).all()
    calls["n"] = 0
    q.apply(variables, x, train=True, mutable=["batch_stats"])
    assert calls["n"] == 0


def test_i8_spmd_active_on_mesh(rng):
    """Under a >1-device GSPMD mesh the i8 kernel must run shard_mapped and
    match the unsharded result."""
    from spegnet_tpu.parallel.mesh import create_mesh

    c, heads, d, ws, hw = 32, 2, 16, 4, 8
    hp = fbt.round_hp(d)
    weights = i8.pack_i8(make_weights(rng, c, heads, d, 4 * c, hp))
    x = jnp.asarray(rng.standard_normal((4, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    args = (heads, hp, ws * ws, d ** -0.5, 1e-6, False)
    want = np.asarray(i8.fused_block_t_i8(xt, weights, *args))

    mesh = create_mesh({"data": 2, "model": 2}, jax.devices("cpu")[:4])
    with jax.set_mesh(mesh):
        assert isinstance(fbt.spmd_mode(), tuple)
        xs = jax.device_put(xt, NamedSharding(mesh, P("data")))
        got = np.asarray(jax.jit(
            lambda a, w: i8.fused_block_t_i8(a, w, *args))(xs, weights))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)
