"""Spatial (sequence) parallelism: H-sharded encoder on the CPU mesh must be
numerically identical to the unsharded model (windows are halo-free)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig
from spegnet_tpu.parallel.mesh import create_mesh


def test_spatial_sharded_forward_matches(rng):
    mesh = create_mesh({"data": 2, "sp": 4})
    base = SPEGNet(SPEGNetConfig(variant="test"))
    sharded = SPEGNet(SPEGNetConfig(variant="test", spatial_axis="sp"))

    x_np = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    variables = base.init(jax.random.PRNGKey(0), jnp.asarray(x_np))
    ref = np.asarray(base.apply(variables, jnp.asarray(x_np))["predictions"][-1])

    with jax.set_mesh(mesh):
        xs = jax.device_put(
            jnp.asarray(x_np), NamedSharding(mesh, P("data", None, None, None))
        )
        vs = jax.device_put(variables, NamedSharding(mesh, P()))
        out = jax.jit(lambda v, x: sharded.apply(v, x)["predictions"][-1])(vs, xs)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_spatial_sharding_actually_shards(rng):
    """The stage activations must really be partitioned along H over 'sp'.

    Returns the raw encoder stage features out of the jitted program and
    asserts their committed sharding spec partitions the H (token-row) axis
    over 'sp'.  This fails if the with_sharding_constraint in Hiera is
    removed or the spatial_axis plumbing breaks — unlike an isfinite check.
    """
    from spegnet_tpu.models.hiera import Hiera

    mesh = create_mesh({"data": 1, "sp": 8})
    model = Hiera(variant="test", spatial_axis="sp")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
        vs = jax.device_put(variables, NamedSharding(mesh, P()))
        feats = jax.jit(lambda v, x: model.apply(v, x))(vs, xs)

    # Stages 1-2 have H (16, 8) divisible by the 8-way sp axis; later stages
    # are smaller than the axis and XLA may legitimately pad/replicate them.
    for i, f in enumerate(feats[:2]):
        spec = tuple(f.sharding.spec) + (None,) * (4 - len(f.sharding.spec))
        assert spec[1] == "sp", (
            f"stage {i} feature is not H-sharded over 'sp': {spec}"
        )
        # And the per-device shard really holds 1/8 of the rows.
        shard_shape = f.sharding.shard_shape(f.shape)
        assert shard_shape[1] * 8 == f.shape[1], (i, shard_shape, f.shape)


def test_spatial_sharded_fused_path_matches(rng, monkeypatch):
    """Sequence parallelism composed WITH the fused kernels (round-4 verdict
    #5): the bf16 Morton trunk runs with its token axis sharded over 'sp'
    through the shard_map-wrapped T-kernel and Q-pool front (shard-LOCAL
    shapes reach the Pallas programs), global-attention blocks ride the
    in-layout XLA reference with GSPMD collectives, and the whole encoder
    matches the unsharded fused output."""
    import jax.numpy as jnp

    from spegnet_tpu.models.hiera import Hiera
    from spegnet_tpu.ops import fused_block_t as fbt

    monkeypatch.setattr(fbt, "INTERPRET", True)

    # Record the shapes each Pallas program actually receives: under sp the
    # kernels must see LOCAL token counts (global / sp_size).
    fwd_shapes, qpool_shapes = [], []
    orig_fwd, orig_qpool = fbt._forward, fbt._qpool_forward

    def rec_fwd(xt, w, **kw):
        fwd_shapes.append(tuple(xt.shape))
        return orig_fwd(xt, w, **kw)

    def rec_qpool(xt, w, **kw):
        qpool_shapes.append(tuple(xt.shape))
        return orig_qpool(xt, w, **kw)

    monkeypatch.setattr(fbt, "_forward", rec_fwd)
    monkeypatch.setattr(fbt, "_qpool_forward", rec_qpool)

    base = Hiera(variant="tiny", dtype=jnp.bfloat16)
    sharded = Hiera(variant="tiny", dtype=jnp.bfloat16, spatial_axis="sp")
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)).astype(np.float32))
    variables = base.init(jax.random.PRNGKey(0), x)

    ref = [np.asarray(o, np.float32) for o in base.apply(variables, x)]
    assert fwd_shapes and qpool_shapes, "fused paths not active unsharded"
    n1_global = fwd_shapes[0][2]
    fwd_shapes.clear(), qpool_shapes.clear()

    mesh = create_mesh({"data": 2, "sp": 2})
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
        vs = jax.device_put(variables, NamedSharding(mesh, P()))
        outs = jax.jit(lambda v, x: sharded.apply(v, x))(vs, xs)

    assert fwd_shapes, "fused T-kernel not active under sp"
    assert qpool_shapes, "fused qpool front not active under sp"
    # shard_map hands the kernels LOCAL shapes: tokens / sp (and batch / dp).
    assert fwd_shapes[0][2] == n1_global // 2, (fwd_shapes, n1_global)
    # bf16 activations through 12 blocks: a handful of elements land a few
    # ulp apart (different reduction orders in the GSPMD-decomposed stages;
    # the global block runs the in-layout XLA reference), so the gate is a
    # loose elementwise band plus a tight mean-absolute bound — a
    # structural break (wrong halo, wrong psum) would blow BOTH by orders
    # of magnitude.
    for a, b in zip(outs, ref):
        d = np.abs(np.asarray(a, np.float32) - b)
        scale = np.abs(b).mean() + 1e-6
        assert d.max() / scale < 0.25, (d.max(), scale)
        assert d.mean() / scale < 2e-2, (d.mean(), scale)
