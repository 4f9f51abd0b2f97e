"""Transposed window-major fused block kernel (ops/fused_block_t.py):
interpret-mode parity on CPU vs the pure-XLA transposed reference, layout
round-trips, masked-chunk == per-window equivalence, gradients via the
custom_vjp, and the whole MultiScaleBlock T-path vs the canonical path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spegnet_tpu.ops import fused_block_t as fbt


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fbt.pl, "pallas_call", interp)
    yield


def make_weights(rng, c, heads, d, hidden, hp):
    def arr(*shape, scale=0.2):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)

    wqkv = np.zeros((3, heads, hp, c), np.float32)
    wqkv[:, :, :d] = rng.standard_normal((3, heads, d, c)) * 0.2
    bqkv = np.zeros((3, heads, hp), np.float32)
    bqkv[..., :d] = rng.standard_normal((3, heads, d)) * 0.1
    wproj = np.zeros((c, heads, hp), np.float32)
    wproj[:, :, :d] = rng.standard_normal((c, heads, d)) * 0.2
    return fbt.TBlockWeights(
        ln1_scale=arr(c, 1, scale=1.0) + 1.0, ln1_bias=arr(c, 1, scale=0.1),
        wqkv_t=jnp.asarray(wqkv.reshape(-1, c)),
        bqkv_t=jnp.asarray(bqkv.reshape(-1, 1)),
        wproj_t=jnp.asarray(wproj.reshape(c, -1)),
        bproj_t=arr(c, 1, scale=0.1),
        ln2_scale=arr(c, 1, scale=1.0) + 1.0, ln2_bias=arr(c, 1, scale=0.1),
        wfc1_t=arr(hidden, c), bfc1_t=arr(hidden, 1, scale=0.1),
        wfc2_t=arr(c, hidden), bfc2_t=arr(c, 1, scale=0.1),
    )


@pytest.mark.parametrize("hw,ws,c,heads,d", [
    (16, 4, 32, 2, 16),    # masked chunks: 128-lane chunk packs 8 windows
    (32, 16, 48, 2, 24),   # per-window path: L = 256
    (16, 0, 32, 2, 16),    # global: L = N = 256
])
def test_fused_block_t_matches_reference(rng, hw, ws, c, heads, d):
    hp = fbt.round_hp(d)
    weights = make_weights(rng, c, heads, d, 4 * c, hp)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    l = ws * ws if ws else hw * hw
    kw = dict(heads=heads, hp=hp, l=l, scale=d ** -0.5, eps=1e-6,
              approx_gelu=False)
    want = np.asarray(fbt.block_t_reference(xt, weights, **kw))
    got = np.asarray(fbt.fused_block_t(xt, weights, heads, hp, l,
                                       d ** -0.5, 1e-6, False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_layout_round_trip(rng):
    x = jnp.asarray(rng.standard_normal((3, 24, 16, 8)).astype(np.float32))
    for ws in (0, 4, 8):
        xt = fbt.to_t(x, ws)
        assert xt.shape == (3, 8, 24 * 16)
        np.testing.assert_array_equal(np.asarray(fbt.from_t(xt, ws, (24, 16))),
                                      np.asarray(x))


def test_window_major_order():
    """to_t must place each ws x ws window's tokens contiguously."""
    h = w = 8
    x = jnp.arange(h * w, dtype=jnp.float32).reshape(1, h, w, 1)
    xt = fbt.to_t(x, 4)[0, 0]  # [N]
    first_window = np.asarray(x[0, :4, :4, 0]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(xt[:16]), first_window)


def test_masked_chunk_equals_per_window(rng):
    """cw > L (several windows per masked chunk) must equal exact per-window
    attention (the reference always groups exactly by L)."""
    c, heads, d = 32, 2, 16
    hp = fbt.round_hp(d)
    weights = make_weights(rng, c, heads, d, 4 * c, hp)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, 8)  # L = 64, N = 1024
    kw = dict(heads=heads, hp=hp, l=64, scale=d ** -0.5, eps=1e-6,
              approx_gelu=False)
    want = np.asarray(fbt.block_t_reference(xt, weights, **kw))
    for cw in (128, 256, 512):
        got = np.asarray(fbt._forward(xt, weights, cw=cw, **kw))
        np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4,
                                   err_msg=f"cw={cw}")


def test_fused_block_t_gradients(rng):
    c, heads, d, ws, hw = 32, 2, 16, 4, 8
    hp = fbt.round_hp(d)
    weights = make_weights(rng, c, heads, d, 4 * c, hp)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    args = (heads, hp, ws * ws, d ** -0.5, 1e-6, False)

    g1 = jax.grad(lambda x, w: jnp.sum(
        fbt.fused_block_t(x, w, *args) ** 2), argnums=(0, 1))(xt, weights)
    g2 = jax.grad(lambda x, w: jnp.sum(
        fbt.block_t_reference(x, w, heads=heads, hp=hp, l=ws * ws,
                              scale=d ** -0.5, eps=1e-6,
                              approx_gelu=False) ** 2),
        argnums=(0, 1))(xt, weights)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_block_t_path_vs_canonical(rng):
    """Whole MultiScaleBlock: T-path (t_ctx set, interpret) must match the
    decomposed canonical path after the layout round-trip."""
    import spegnet_tpu.ops.attention as attmod
    from spegnet_tpu.models.hiera import MultiScaleBlock

    h = w = 16
    blk_ref = MultiScaleBlock(dim=32, dim_out=32, num_heads=2, window_size=4)
    x = jnp.asarray(rng.standard_normal((2, h, w, 32)).astype(np.float32))
    variables = blk_ref.init(jax.random.PRNGKey(0), x)

    blk_t = MultiScaleBlock(dim=32, dim_out=32, num_heads=2, window_size=4,
                            t_ctx=(h, w, 16))
    out_t = blk_t.apply(variables, fbt.to_t(x, 4))
    got = np.asarray(fbt.from_t(out_t, 4, (h, w)))

    old = attmod.USE_PALLAS
    try:
        attmod.USE_PALLAS = "0"
        ref = np.asarray(blk_ref.apply(variables, x))
    finally:
        attmod.USE_PALLAS = old
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)


def test_hiera_t_scan_path_vs_canonical(rng, monkeypatch):
    """Full tiny Hiera: force the T-layout + scan-over-run path on CPU
    (interpret) and compare against the fully decomposed encoder."""
    import spegnet_tpu.ops.attention as attmod
    import spegnet_tpu.models.hiera as hmod
    from spegnet_tpu.models.hiera import Hiera

    monkeypatch.setattr(
        fbt, "supported",
        lambda c, heads, l, n_tok, dtype, batch=None: (
            c % 16 == 0 and (128 % l == 0 if l < 128 else l % 128 == 0)
            and fbt._pick_cw(l, n_tok) % max(l, 128) == 0
            and n_tok % fbt._pick_cw(l, n_tok) == 0),
    )
    # bfloat16 gate: run in bf16 like the TPU path, compare loosely.
    enc = Hiera(variant="tiny", dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    fast = enc.apply(variables, x)

    monkeypatch.setattr(attmod, "USE_PALLAS", "0")
    ref = enc.apply(variables, x)
    for a, b in zip(fast, ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 0.03, np.abs(a - b).max()


def test_hiera_morton_trunk_vs_canonical(rng, monkeypatch):
    """Full-Morton trunk: every stage run AND all three q-pool transitions
    execute in one Z-order [B, C, N] layout (no mid-trunk relayout; the
    trunk loop's `use_z` mode with in-layout transition blocks), compared
    against the fully decomposed encoder.  All-pow2 window spec so each
    window is a contiguous lane run at every grid level."""
    import spegnet_tpu.ops.attention as attmod
    from spegnet_tpu.models.hiera import HIERA_VARIANTS, Hiera, HieraConfig

    monkeypatch.setattr(
        fbt, "supported",
        lambda c, heads, l, n_tok, dtype, batch=None: (
            c % 16 == 0 and (128 % l == 0 if l < 128 else l % 128 == 0)
            and fbt._pick_cw(l, n_tok) % max(l, 128) == 0
            and n_tok % fbt._pick_cw(l, n_tok) == 0),
    )
    monkeypatch.setattr(
        fbt, "qpool_supported",
        lambda cin, heads, l, n_tok, dtype, batch=None: (
            cin % 16 == 0 and l % 4 == 0 and l <= 256
            and (128 % l == 0 if l < 128 else l % 128 == 0)
            and fbt._pick_cw(l, n_tok) % max(l, 128) == 0
            and n_tok % fbt._pick_cw(l, n_tok) == 0),
    )
    # embed 32, heads 1 -> (1, 2, 4, 8); windows (4, 2, 8, 4): every stage
    # pow2 so all runs stay in Morton; block 3 is global attention.
    cfgs = dict(HIERA_VARIANTS)
    cfgs["zmini"] = HieraConfig(32, 1, (1, 1, 2, 1), (3,), (7, 7),
                                (4, 2, 8, 4))
    monkeypatch.setattr("spegnet_tpu.models.hiera.HIERA_VARIANTS", cfgs)
    enc = Hiera(variant="zmini", dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    fast = enc.apply(variables, x)

    monkeypatch.setattr(attmod, "USE_PALLAS", "0")
    ref = enc.apply(variables, x)
    assert [o.shape for o in fast] == [o.shape for o in ref]
    for a, b in zip(fast, ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 0.03, np.abs(a - b).max()


@pytest.mark.parametrize("cin,heads,d,ws,hw", [
    (32, 2, 24, 4, 16),    # t12-like (L = 16)
    (32, 2, 16, 16, 32),   # t23-like (L = 256, widened gate)
    (32, 16, 8, 8, 16),    # t34-like (heads > 8, widened gate)
])
def test_qpool_front_reference_vs_fused(rng, cin, heads, d, ws, hw):
    """Interpret-mode parity of the fused transition front (with its
    garbage-lane pooling trick + ::4 compaction) vs the exact reference,
    at all three Hiera-L transition shape classes (qpool_supported now
    admits L = 256 and heads > 8 — measured wins, see the gate)."""
    hp = fbt.round_hp(d)
    cout = heads * d
    k = jax.random.PRNGKey(3)
    wts = fbt.QPoolWeights(
        ln_scale=jnp.asarray(rng.standard_normal((cin, 1)).astype(np.float32) * 0.1 + 1),
        ln_bias=jnp.asarray(rng.standard_normal((cin, 1)).astype(np.float32) * 0.1),
        wqkv_t=jnp.asarray(np.pad(
            rng.standard_normal((3, heads, d, cin)).astype(np.float32) * 0.2,
            ((0, 0), (0, 0), (0, hp - d), (0, 0))).reshape(-1, cin)),
        bqkv_t=jnp.asarray(np.pad(
            rng.standard_normal((3, heads, d)).astype(np.float32) * 0.1,
            ((0, 0), (0, 0), (0, hp - d))).reshape(-1, 1)),
        wsc_t=jnp.asarray(rng.standard_normal((cout, cin)).astype(np.float32) * 0.2),
        bsc_t=jnp.asarray(rng.standard_normal((cout, 1)).astype(np.float32) * 0.1),
    )
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)).astype(np.float32) * 0.5)
    xt = fbt.to_t_micro(x, ws)
    kw = dict(heads=heads, hp=hp, l=ws * ws, scale=d ** -0.5, eps=1e-6)
    o_ref, sc_ref = fbt.qpool_front_reference(xt, wts, **kw)
    o_f, sc_f = fbt.qpool_front(xt, wts, heads, hp, ws * ws, d ** -0.5, 1e-6)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_ref),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sc_f), np.asarray(sc_ref),
                               atol=5e-4, rtol=1e-4)

    g1 = jax.grad(lambda x, w: sum(jnp.sum(t ** 2) for t in
                                   fbt.qpool_front(x, w, heads, hp, ws * ws,
                                                   d ** -0.5, 1e-6)),
                  argnums=(0, 1))(xt, wts)
    g2 = jax.grad(lambda x, w: sum(jnp.sum(t ** 2) for t in
                                   fbt.qpool_front_reference(x, w, **kw)),
                  argnums=(0, 1))(xt, wts)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_qpool_block_vs_decomposed(rng, monkeypatch):
    """Whole transition MultiScaleBlock: fused T front path (forced on CPU,
    interpret) must match the decomposed canonical path."""
    import spegnet_tpu.ops.attention as attmod
    from spegnet_tpu.models.hiera import MultiScaleBlock

    monkeypatch.setattr(fbt, "qpool_supported",
                        lambda cin, heads, l, n, dt, batch=None: True)
    blk = MultiScaleBlock(dim=32, dim_out=48, num_heads=2, q_stride=True,
                          window_size=4, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)
    fast = blk.apply(variables, x)
    assert fast.shape == (2, 8, 8, 48)

    monkeypatch.setattr(attmod, "USE_PALLAS", "0")
    ref = blk.apply(variables, x)
    a = np.asarray(fast, np.float32)
    b = np.asarray(ref, np.float32)
    scale = max(np.abs(b).max(), 1e-3)
    assert np.abs(a - b).max() / scale < 0.03, np.abs(a - b).max()


@pytest.mark.parametrize("cin,heads,d,ws,hw", [
    (32, 2, 24, 4, 16),    # t12-like (L = 16)
    (32, 2, 16, 16, 32),   # t23-like (L = 256)
    (32, 16, 8, 8, 16),    # t34-like (heads > 8)
])
def test_qpool_backward_kernel_vs_reference(rng, cin, heads, d, ws, hw):
    """The hand-derived fused transition-front backward kernel (interpret)
    must match autodiff of qpool_front_reference — including the even tie
    split of both max-pool scatters — for dx and every weight grad."""
    hp = fbt.round_hp(d)
    cout = heads * d
    wts = fbt.QPoolWeights(
        ln_scale=jnp.asarray(rng.standard_normal((cin, 1)).astype(np.float32) * 0.1 + 1),
        ln_bias=jnp.asarray(rng.standard_normal((cin, 1)).astype(np.float32) * 0.1),
        wqkv_t=jnp.asarray(np.pad(
            rng.standard_normal((3, heads, d, cin)).astype(np.float32) * 0.2,
            ((0, 0), (0, 0), (0, hp - d), (0, 0))).reshape(-1, cin)),
        bqkv_t=jnp.asarray(np.pad(
            rng.standard_normal((3, heads, d)).astype(np.float32) * 0.1,
            ((0, 0), (0, 0), (0, hp - d))).reshape(-1, 1)),
        wsc_t=jnp.asarray(rng.standard_normal((cout, cin)).astype(np.float32) * 0.2),
        bsc_t=jnp.asarray(rng.standard_normal((cout, 1)).astype(np.float32) * 0.1),
    )
    x = jnp.asarray(rng.standard_normal((2, hw, hw, cin)).astype(np.float32) * 0.5)
    xt = fbt.to_t_micro(x, ws)
    kw = dict(heads=heads, hp=hp, l=ws * ws, scale=d ** -0.5, eps=1e-6)
    n = hw * hw
    go = jnp.asarray(rng.standard_normal(
        (2, heads * hp, n // 4)).astype(np.float32) * 0.1)
    gsc = jnp.asarray(rng.standard_normal(
        (2, cout, n // 4)).astype(np.float32) * 0.1)

    dx_k, dw_k = fbt._qpool_backward(xt, wts, go, gsc, interpret=True, **kw)
    _, vjp = jax.vjp(lambda xx, w: fbt.qpool_front_reference(xx, w, **kw),
                     xt, wts)
    dx_r, dw_r = vjp((go, gsc))

    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r),
                               atol=2e-3, rtol=1e-3)
    for name, a, b in zip(fbt.QPoolWeights._fields,
                          jax.tree_util.tree_leaves(dw_k),
                          jax.tree_util.tree_leaves(dw_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("ws,hw,opts", [
    (4, 16, {}),                                  # masked chunks, defaults
    (0, 16, {}),                                  # global window
    (4, 16, {"acw": 256}),                        # one wide masked chunk
    (4, 16, {"acw": 128, "unroll": True}),        # unrolled static slices
    (4, 16, {"slots": True}),                     # per-cell weight-grad slots
    (4, 16, {"acw": 128, "unroll": True, "slots": True}),
])
def test_fused_backward_kernel_vs_reference(rng, ws, hw, opts):
    """The hand-derived fused backward kernel (interpret) must match the
    autodiff of the token-major reference for dx and every weight grad —
    at every tuning-knob combination (acw sub-chunking / unrolled sweeps /
    per-cell weight-grad slots; see tools/bwd_probe.py)."""
    c, heads, d = 32, 2, 16
    hp = fbt.round_hp(d)
    weights = make_weights(rng, c, heads, d, 4 * c, hp)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    l = ws * ws if ws else hw * hw
    kw = dict(heads=heads, hp=hp, l=l, scale=d ** -0.5, eps=1e-6,
              approx_gelu=True)
    g = jnp.asarray(rng.standard_normal(xt.shape).astype(np.float32) * 0.1)

    dx_k, dw_k = fbt._backward(xt, weights, g, interpret=True, **kw, **opts)
    _, vjp = jax.vjp(lambda xx, w: fbt.block_t_reference(xx, w, **kw),
                     xt, weights)
    dx_r, dw_r = vjp(g)

    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r),
                               atol=2e-3, rtol=1e-3)
    for name, a, b in zip(fbt.TBlockWeights._fields,
                          jax.tree_util.tree_leaves(dw_k),
                          jax.tree_util.tree_leaves(dw_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("ws,hw", [(4, 16), (0, 16)])
def test_residual_saving_backward_vs_reference(rng, ws, hw):
    """_forward_res must reproduce _forward's output exactly, and
    _backward_res (reading the saved qkv/attn-out/u/z instead of recomputing
    them) must match autodiff of the token-major reference."""
    c, heads, d = 32, 2, 16
    hp = fbt.round_hp(d)
    weights = make_weights(rng, c, heads, d, 4 * c, hp)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    l = ws * ws if ws else hw * hw
    kw = dict(heads=heads, hp=hp, l=l, scale=d ** -0.5, eps=1e-6,
              approx_gelu=True)
    g = jnp.asarray(rng.standard_normal(xt.shape).astype(np.float32) * 0.1)

    out_plain = fbt._forward(xt, weights, interpret=True, **kw)
    out_res, extras = fbt._forward_res(xt, weights, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(out_plain), np.asarray(out_res))

    dx_k, dw_k = fbt._backward_res(xt, weights, g, extras,
                                   interpret=True, **kw)
    _, vjp = jax.vjp(lambda xx, w: fbt.block_t_reference(xx, w, **kw),
                     xt, weights)
    dx_r, dw_r = vjp(g)

    np.testing.assert_allclose(np.asarray(dx_k), np.asarray(dx_r),
                               atol=2e-3, rtol=1e-3)
    for name, a, b in zip(fbt.TBlockWeights._fields,
                          jax.tree_util.tree_leaves(dw_k),
                          jax.tree_util.tree_leaves(dw_r)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-3, err_msg=name)


def test_residual_saving_vjp_path(rng, monkeypatch):
    """fused_block_t's custom_vjp with SAVE_RESIDUALS forced on (interpret)
    must match the recompute backward's gradients (up to f32
    reduction-order noise — measured maxabs ~1e-3 at grad scale ~1e4)."""
    monkeypatch.setattr(fbt, "INTERPRET", True)
    c, heads, d, ws, hw = 32, 2, 16, 4, 16
    hp = fbt.round_hp(d)
    weights = make_weights(rng, c, heads, d, 4 * c, hp)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    kw = (heads, hp, ws * ws, d ** -0.5, 1e-6, True)

    def loss(xx, w):
        return jnp.sum(fbt.fused_block_t(xx, w, *kw) ** 2)

    monkeypatch.setattr(fbt, "SAVE_RESIDUALS", "1")
    gx_res, gw_res = jax.grad(loss, argnums=(0, 1))(xt, weights)
    monkeypatch.setattr(fbt, "SAVE_RESIDUALS", "0")
    gx_rec, gw_rec = jax.grad(loss, argnums=(0, 1))(xt, weights)

    np.testing.assert_allclose(np.asarray(gx_res), np.asarray(gx_rec),
                               atol=2e-3, rtol=1e-3)
    for name, a, b in zip(fbt.TBlockWeights._fields,
                          jax.tree_util.tree_leaves(gw_res),
                          jax.tree_util.tree_leaves(gw_rec)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-3, rtol=1e-3, err_msg=name)


@pytest.mark.parametrize("cw_pol,acw_pol", [
    ("512", "l128"), ("l128", "l128"), ("l128", "cw"),
])
def test_chunk_width_policies_exact(rng, monkeypatch, cw_pol, acw_pol):
    """CW/ACW policies are pure-speed knobs: the block-diagonal -1e30 mask
    zeroes cross-window lanes exactly in f32, so forward AND backward must
    match the default-policy kernel bit-for-bit-ish at every chunking."""
    hw, ws, c, heads, d = 16, 4, 32, 2, 16
    hp = fbt.round_hp(d)
    weights = make_weights(rng, c, heads, d, 4 * c, hp)
    x = jnp.asarray(rng.standard_normal((2, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    args = (heads, hp, ws * ws, d ** -0.5, 1e-6, False)

    def loss(xt, w):
        return jnp.sum(fbt.fused_block_t(xt, w, *args) ** 2)

    want_y = np.asarray(fbt.fused_block_t(xt, weights, *args))
    want_gx, want_gw = jax.grad(loss, argnums=(0, 1))(xt, weights)

    monkeypatch.setattr(fbt, "CW_POLICY", cw_pol)
    monkeypatch.setattr(fbt, "ACW_POLICY", acw_pol)
    got_y = np.asarray(fbt.fused_block_t(xt, weights, *args))
    got_gx, got_gw = jax.grad(loss, argnums=(0, 1))(xt, weights)

    np.testing.assert_allclose(got_y, want_y, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(want_gx),
                               atol=1e-5, rtol=1e-5)
    for name, a, b in zip(fbt.TBlockWeights._fields,
                          jax.tree_util.tree_leaves(got_gw),
                          jax.tree_util.tree_leaves(want_gw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5, err_msg=name)
