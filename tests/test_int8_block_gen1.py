"""int8 (W8A8) gen-1 token-major fused block (ops/fused_block_i8.py): the
stage-4 half of the flagged int8 encoder mode.  Interpret-mode parity on CPU
vs the pure-XLA quantized reference, drift vs the exact bf16/f32 block,
eligibility gating, engagement through MultiScaleBlock at a heads>8
geometry (the shape class that keeps the gen-1 layout), and SPMD activation
on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from spegnet_tpu.ops import fused_block as fb
from spegnet_tpu.ops import fused_block_i8 as i8
from spegnet_tpu.ops import fused_block_t as fbt

from tests.test_fused_block import make_weights


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(fbt, "INTERPRET", True)
    yield


def test_quantize_cols_properties(rng):
    w = jnp.asarray(rng.standard_normal((96, 48)).astype(np.float32))
    wq, s = i8.quantize_cols(w)
    assert wq.dtype == jnp.int8 and s.shape == (1, 48)
    assert int(jnp.max(jnp.abs(wq.astype(jnp.int32)))) <= 127
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(s) - np.asarray(w))
    assert float(err.max()) <= float(np.asarray(s).max()) * 0.5 + 1e-7
    # all-zero column (the hp lane padding) gets the floor scale, zero codes
    wq0, s0 = i8.quantize_cols(jnp.zeros((8, 2)))
    assert int(jnp.max(jnp.abs(wq0.astype(jnp.int32)))) == 0
    assert float(s0.min()) > 0


@pytest.mark.parametrize("n,l,c,heads,d", [
    (8, 64, 128, 2, 64),    # wins folding, c = one lane tile
    (2, 16, 128, 16, 8),    # heads > 8: the stage-4 shape class
])
def test_i8_kernel_matches_i8_reference(rng, n, l, c, heads, d):
    weights = i8.pack_i8(make_weights(rng, c, heads, d, 4 * c))
    x = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32) * 0.5)
    kw = dict(heads=heads, hp=128, scale=d ** -0.5, eps=1e-6,
              approx_gelu=False)
    want = np.asarray(i8.block_i8_reference(x, weights, **kw))
    got = np.asarray(i8.fused_block_i8(x, weights, heads, 128, d ** -0.5,
                                       1e-6, False))
    # Same quant math; kernel and reference order their f32 dots
    # differently, so knife-edge pre-quant values may flip ONE int8 code.
    diff = np.abs(got - want)
    assert float((diff > 5e-4).mean()) < 0.01, float((diff > 5e-4).mean())
    assert float(diff.max()) < 0.2, float(diff.max())


def test_i8_drift_vs_exact_block(rng):
    """W8A8 must track the exact f32 block closely on smooth inputs — a
    catastrophic-quantization-bug canary, not an accuracy contract."""
    n, l, c, heads, d = 2, 16, 128, 16, 8
    w = make_weights(rng, c, heads, d, 4 * c)
    x = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32) * 0.5)
    kw = dict(heads=heads, hp=128, scale=d ** -0.5, eps=1e-6,
              approx_gelu=False)
    exact = np.asarray(fb.block_reference(x, w, **kw))
    quant = np.asarray(i8.block_i8_reference(x, i8.pack_i8(w), **kw))
    rel = np.abs(quant - exact) / (np.abs(exact).mean() + 1e-6)
    assert float(rel.mean()) < 5e-2, float(rel.mean())
    assert float(rel.max()) < 0.5, float(rel.max())


def test_supported_i8_gating():
    # C=1152 (stage 4) is 9 whole lane tiles -> qualifies
    assert i8.supported_i8(64, 64, 1152, jnp.bfloat16)
    # C=144 (stage 1) is not a 128-lane multiple
    assert not i8.supported_i8(64, 64, 144, jnp.bfloat16)
    # everything the bf16 gen-1 kernel rejects stays rejected (L > 64)
    assert not i8.supported_i8(4, 256, 1152, jnp.bfloat16)


def test_hiera_block_int8_engages_gen1(rng, monkeypatch):
    """A heads>8 block (fbt.supported excludes it from the T-kernel) must
    route to the gen-1 int8 kernel when int8=True, and the result must
    track the bf16 block."""
    from spegnet_tpu.models.hiera import MultiScaleBlock

    n_calls = {"i8": 0}
    orig = i8._forward_i8

    def counting(*a, **kw):
        n_calls["i8"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(i8, "_forward_i8", counting)

    c, heads, hw, ws = 128, 16, 8, 4
    x = jnp.asarray(
        rng.standard_normal((2, hw, hw, c)).astype(np.float32) * 0.5)
    blk_bf = MultiScaleBlock(dim=c, dim_out=c, num_heads=heads,
                             window_size=ws, dtype=jnp.bfloat16)
    blk_i8 = MultiScaleBlock(dim=c, dim_out=c, num_heads=heads,
                             window_size=ws, dtype=jnp.bfloat16,
                             int8=True)
    v = blk_bf.init(jax.random.PRNGKey(0), x)
    want = np.asarray(blk_bf.apply(v, x), np.float32)
    assert n_calls["i8"] == 0
    got = np.asarray(blk_i8.apply(v, x), np.float32)
    assert n_calls["i8"] > 0, "gen-1 int8 kernel never engaged"
    assert np.isfinite(got).all()
    denom = np.abs(want).mean() + 1e-6
    assert float(np.abs(got - want).mean() / denom) < 0.1


def test_i8_spmd_active_on_mesh(rng):
    """Under a >1-device GSPMD mesh the gen-1 i8 kernel must run
    shard_mapped and match the unsharded result."""
    from spegnet_tpu.parallel.mesh import create_mesh

    n, l, c, heads, d = 4, 16, 128, 16, 8
    weights = i8.pack_i8(make_weights(rng, c, heads, d, 4 * c))
    x = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32) * 0.5)
    args = (heads, 128, d ** -0.5, 1e-6, False)
    want = np.asarray(i8.fused_block_i8(x, weights, *args))

    mesh = create_mesh({"data": 2, "model": 2}, jax.devices("cpu")[:4])
    with jax.set_mesh(mesh):
        assert isinstance(fbt.spmd_mode(), tuple)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        got = np.asarray(jax.jit(
            lambda a, w: i8.fused_block_i8(a, w, *args))(xs, weights))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)
