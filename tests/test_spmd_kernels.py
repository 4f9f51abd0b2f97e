"""Fused Pallas kernels under a >1-device GSPMD mesh (round-2 verdict #3).

The T-kernel, its fused backward, and the Q-pool transition front must stay
ACTIVE under a multi-device mesh: ops/fused_block_t wraps each kernel call in
a jax.shard_map over the 'data' axis (weight grads psum inside the wrap).
These tests run the real wrappers on the 8-virtual-device CPU mesh with
interpret-mode Pallas and compare against the unsharded decomposed path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from spegnet_tpu.ops import fused_block_t as fbt
from spegnet_tpu.parallel.mesh import create_mesh

from tests.test_fused_block_t import make_weights


@pytest.fixture(autouse=True)
def interpret_on(monkeypatch):
    monkeypatch.setattr(fbt, "INTERPRET", True)
    yield


def _mesh():
    return create_mesh({"data": 2, "model": 2}, jax.devices("cpu")[:4])


def test_spmd_mode_detection():
    assert fbt.spmd_mode() is None  # no mesh
    mesh = _mesh()
    with jax.set_mesh(mesh):
        mode = fbt.spmd_mode()
        assert isinstance(mode, tuple) and mode[1] == ("data",)
        assert fbt.supported(32, 2, 16, 256, jnp.float32, batch=4)
        assert not fbt.supported(32, 2, 16, 256, jnp.float32, batch=3)
        assert not fbt.supported(32, 2, 16, 256, jnp.float32, batch=None)
    no_data = create_mesh({"model": 2}, jax.devices("cpu")[:2])
    with jax.set_mesh(no_data):
        assert fbt.spmd_mode() == "unsupported"
        assert not fbt.supported(32, 2, 16, 256, jnp.float32, batch=4)


def test_fused_block_t_under_mesh(rng):
    """Forward + backward through the shard_map wrapper == single-device."""
    c, heads, d, ws, hw = 32, 2, 16, 4, 16
    hp = fbt.round_hp(d)
    weights = make_weights(rng, c, heads, d, 4 * c, hp)
    x = jnp.asarray(rng.standard_normal((4, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    args = (heads, hp, ws * ws, d ** -0.5, 1e-6, False)

    def loss(xt, w):
        return jnp.sum(fbt.fused_block_t(xt, w, *args) ** 2)

    # Single-device ground truth (interpret kernel, no mesh).
    want_y = np.asarray(fbt.fused_block_t(xt, weights, *args))
    want_gx, want_gw = jax.grad(loss, argnums=(0, 1))(xt, weights)

    mesh = _mesh()
    with jax.set_mesh(mesh):
        xt_s = jax.device_put(xt, NamedSharding(mesh, P("data")))
        w_s = jax.device_put(weights, NamedSharding(mesh, P()))
        got_y = jax.jit(lambda x, w: fbt.fused_block_t(x, w, *args))(xt_s, w_s)
        got_gx, got_gw = jax.jit(jax.grad(loss, argnums=(0, 1)))(xt_s, w_s)

    np.testing.assert_allclose(np.asarray(got_y), want_y, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(want_gx),
                               atol=1e-4, rtol=1e-4)
    for name, a, b in zip(fbt.TBlockWeights._fields,
                          jax.tree_util.tree_leaves(got_gw),
                          jax.tree_util.tree_leaves(want_gw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_fused_backward_kernel_under_mesh(rng):
    """BACKWARD='kernel' path: the fused backward kernel runs inside the
    shard_map (psum of weight grads over 'data') and matches the reference
    vjp computed without a mesh."""
    c, heads, d, ws, hw = 32, 2, 16, 4, 16
    hp = fbt.round_hp(d)
    weights = make_weights(rng, c, heads, d, 4 * c, hp)
    x = jnp.asarray(rng.standard_normal((4, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    kw = dict(heads=heads, hp=hp, l=ws * ws, scale=d ** -0.5, eps=1e-6,
              approx_gelu=True)
    g = jnp.asarray(rng.standard_normal(xt.shape).astype(np.float32) * 0.1)

    _, vjp = jax.vjp(lambda xx, w: fbt.block_t_reference(xx, w, **kw),
                     xt, weights)
    want_dx, want_dw = vjp(g)

    mesh = _mesh()
    with jax.set_mesh(mesh):
        xt_s = jax.device_put(xt, NamedSharding(mesh, P("data")))
        g_s = jax.device_put(g, NamedSharding(mesh, P("data")))
        w_s = jax.device_put(weights, NamedSharding(mesh, P()))
        got_dx, got_dw = jax.jit(
            lambda x, w, g: fbt._backward_spmd(x, w, g, **kw))(xt_s, w_s, g_s)

    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                               atol=2e-3, rtol=1e-3)
    for name, a, b in zip(fbt.TBlockWeights._fields,
                          jax.tree_util.tree_leaves(got_dw),
                          jax.tree_util.tree_leaves(want_dw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=1e-3, err_msg=name)


def test_qpool_front_under_mesh(rng):
    cin, heads, d, ws, hw = 32, 2, 24, 4, 16
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
    x = jnp.asarray(rng.standard_normal((4, hw, hw, cin)).astype(np.float32) * 0.5)
    xt = fbt.to_t_micro(x, ws)
    kw = dict(heads=heads, hp=hp, l=ws * ws, scale=d ** -0.5, eps=1e-6)
    o_ref, sc_ref = fbt.qpool_front_reference(xt, wts, **kw)

    mesh = _mesh()
    with jax.set_mesh(mesh):
        xt_s = jax.device_put(xt, NamedSharding(mesh, P("data")))
        w_s = jax.device_put(wts, NamedSharding(mesh, P()))
        o_f, sc_f = jax.jit(
            lambda x, w: fbt.qpool_front(x, w, heads, hp, ws * ws,
                                         d ** -0.5, 1e-6))(xt_s, w_s)
    np.testing.assert_allclose(np.asarray(o_f), np.asarray(o_ref),
                               atol=5e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sc_f), np.asarray(sc_ref),
                               atol=5e-4, rtol=1e-4)


def test_hiera_fused_under_mesh(rng):
    """Tiny Hiera forward, bf16, fused T-path ACTIVE under a dp mesh: the
    whole-trunk proof that kernels and GSPMD coexist (vs decomposed, no mesh)."""
    import spegnet_tpu.ops.attention as attmod
    from spegnet_tpu.models.hiera import Hiera

    enc = Hiera(variant="tiny", dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)

    old = attmod.USE_PALLAS
    try:
        attmod.USE_PALLAS = "0"
        ref = [np.asarray(o, np.float32) for o in enc.apply(variables, x)]
    finally:
        attmod.USE_PALLAS = old

    mesh = _mesh()
    with jax.set_mesh(mesh):
        x_s = jax.device_put(x, NamedSharding(mesh, P("data")))
        v_s = jax.device_put(variables, NamedSharding(mesh, P()))
        outs = jax.jit(lambda v, x: enc.apply(v, x))(v_s, x_s)
    for a, b in zip(outs, ref):
        a = np.asarray(a, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 0.03, np.abs(a - b).max()


def _sp_mesh():
    return create_mesh({"data": 2, "sp": 2}, jax.devices("cpu")[:4])


def test_fused_block_t_token_sharded(rng):
    """Sequence parallelism at the op level (round-4 verdict #5): the
    T-kernel runs with the TOKEN axis sharded over 'sp' inside its
    shard_map wrapper (halo-free: whole windows per shard) and matches the
    unsharded kernel in forward AND backward (weight grads psummed over
    data x sp)."""
    c, heads, d, ws, hw = 32, 2, 16, 4, 16
    hp = fbt.round_hp(d)
    weights = make_weights(rng, c, heads, d, 4 * c, hp)
    x = jnp.asarray(rng.standard_normal((4, hw, hw, c)).astype(np.float32) * 0.5)
    xt = fbt.to_t(x, ws)
    args = (heads, hp, ws * ws, d ** -0.5, 1e-6, False)

    def loss(xt, w, tok=None):
        return jnp.sum(fbt.fused_block_t(xt, w, *args, tok) ** 2)

    want_y = np.asarray(fbt.fused_block_t(xt, weights, *args))
    want_gx, want_gw = jax.grad(loss, argnums=(0, 1))(xt, weights)

    mesh = _sp_mesh()
    with jax.set_mesh(mesh):
        xt_s = jax.device_put(xt, NamedSharding(mesh, P("data", None, "sp")))
        w_s = jax.device_put(weights, NamedSharding(mesh, P()))
        got_y = jax.jit(
            lambda x, w: fbt.fused_block_t(x, w, *args, "sp"))(xt_s, w_s)
        got_gx, got_gw = jax.jit(
            jax.grad(lambda x, w: loss(x, w, "sp"), argnums=(0, 1))
        )(xt_s, w_s)

    np.testing.assert_allclose(np.asarray(got_y), want_y, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(want_gx),
                               atol=1e-4, rtol=1e-4)
    for name, a, b in zip(fbt.TBlockWeights._fields,
                          jax.tree_util.tree_leaves(got_gw),
                          jax.tree_util.tree_leaves(want_gw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_qpool_front_token_sharded(rng):
    """Q-pool transition front with the token axis sharded over 'sp': the
    ::4 Morton/micro-window pooling is shard-local, outputs stay
    token-sharded, and fwd+bwd match the unsharded custom_vjp."""
    cin, heads, d, ws, hw = 32, 2, 24, 4, 16
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
    x = jnp.asarray(rng.standard_normal((4, hw, hw, cin)).astype(np.float32) * 0.5)
    xt = fbt.to_t_micro(x, ws)
    args = (heads, hp, ws * ws, d ** -0.5, 1e-6)

    def loss(xt, w, tok=None):
        o, sc = fbt.qpool_front(xt, w, *args, tok)
        return jnp.sum(o ** 2) + jnp.sum(sc ** 2)

    want_o, want_sc = fbt.qpool_front(xt, wts, *args)
    want_gx, want_gw = jax.grad(loss, argnums=(0, 1))(xt, wts)

    mesh = _sp_mesh()
    with jax.set_mesh(mesh):
        xt_s = jax.device_put(xt, NamedSharding(mesh, P("data", None, "sp")))
        w_s = jax.device_put(wts, NamedSharding(mesh, P()))
        got_o, got_sc = jax.jit(
            lambda x, w: fbt.qpool_front(x, w, *args, "sp"))(xt_s, w_s)
        got_gx, got_gw = jax.jit(
            jax.grad(lambda x, w: loss(x, w, "sp"), argnums=(0, 1))
        )(xt_s, w_s)

    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_sc), np.asarray(want_sc),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(want_gx),
                               atol=1e-4, rtol=1e-4)
    for name, a, b in zip(fbt.QPoolWeights._fields,
                          jax.tree_util.tree_leaves(got_gw),
                          jax.tree_util.tree_leaves(want_gw)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=name)
