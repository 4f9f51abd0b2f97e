"""Fused whole-block kernel (ops/fused_block.py): interpret-mode parity on
CPU vs the pure-XLA block reference and vs the decomposed MultiScaleBlock
path; gradients via the custom_vjp."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spegnet_tpu.ops import fused_block as fb


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        kwargs.pop("compiler_params", None)
        return orig(*args, **kwargs)

    monkeypatch.setattr(fb.pl, "pallas_call", interp)
    yield


def make_weights(rng, c, heads, d, hidden, hp=128):
    def arr(*shape, scale=0.2):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale)

    wqkv = np.zeros((c, 3, heads, hp), np.float32)
    wqkv[..., :d] = rng.standard_normal((c, 3, heads, d)) * 0.2
    bqkv = np.zeros((3, heads, hp), np.float32)
    bqkv[..., :d] = rng.standard_normal((3, heads, d)) * 0.1
    wproj = np.zeros((heads, hp, c), np.float32)
    wproj[:, :d] = rng.standard_normal((heads, d, c)) * 0.2
    return fb.BlockWeights(
        ln1_scale=arr(1, c, scale=1.0) + 1.0, ln1_bias=arr(1, c, scale=0.1),
        wqkv=jnp.asarray(wqkv.reshape(c, -1)),
        bqkv=jnp.asarray(bqkv.reshape(1, -1)),
        wproj=jnp.asarray(wproj.reshape(-1, c)),
        bproj=arr(1, c, scale=0.1),
        ln2_scale=arr(1, c, scale=1.0) + 1.0, ln2_bias=arr(1, c, scale=0.1),
        wfc1=arr(c, hidden), bfc1=arr(1, hidden, scale=0.1),
        wfc2=arr(hidden, c), bfc2=arr(1, c, scale=0.1),
    )


@pytest.mark.parametrize("n,l,c,heads,d", [
    (8, 64, 144, 2, 72),   # stage-1 windows (wins folding)
    (2, 16, 32, 4, 8),     # tiny windows
])
def test_fused_block_matches_reference(rng, n, l, c, heads, d):
    weights = make_weights(rng, c, heads, d, 4 * c)
    x = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32) * 0.5)
    kw = dict(heads=heads, hp=128, scale=d ** -0.5, eps=1e-6,
              approx_gelu=False)
    want = np.asarray(fb.block_reference(x, weights, **kw))
    got = np.asarray(fb.fused_block(x, weights, heads, 128, d ** -0.5,
                                    1e-6, False))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_fused_block_gradients(rng):
    n, l, c, heads, d = 2, 16, 32, 2, 16
    weights = make_weights(rng, c, heads, d, 4 * c)
    x = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32) * 0.5)
    args = (heads, 128, d ** -0.5, 1e-6, False)

    g1 = jax.grad(lambda x, w: jnp.sum(
        fb.fused_block(x, w, *args) ** 2), argnums=(0, 1))(x, weights)
    g2 = jax.grad(lambda x, w: jnp.sum(
        fb.block_reference(x, w, heads=heads, hp=128, scale=d ** -0.5,
                           eps=1e-6, approx_gelu=False) ** 2),
        argnums=(0, 1))(x, weights)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_block_end_to_end_fused_vs_canonical(rng, monkeypatch):
    """Whole MultiScaleBlock: fused path (forced on CPU, interpret) must
    match the decomposed canonical path."""
    import spegnet_tpu.ops.attention as attmod
    from spegnet_tpu.models.hiera import MultiScaleBlock

    blk = MultiScaleBlock(dim=144, dim_out=144, num_heads=2, window_size=8)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 144)).astype(np.float32))
    variables = blk.init(jax.random.PRNGKey(0), x)

    monkeypatch.setattr(fb, "supported",
                        lambda n, l, dt, batch_rows=None: True)
    fast = blk.apply(variables, x)
    monkeypatch.setattr(attmod, "USE_PALLAS", "0")
    ref = blk.apply(variables, x)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)
