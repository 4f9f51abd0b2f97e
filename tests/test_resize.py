"""Parity tests: spegnet_tpu.ops.resize vs torch.nn.functional.interpolate.

The reference pipeline's numerical behavior hinges on torch's bilinear
align_corners=False semantics (reference: engine/trainer.py:366-371,
utils/image_processor.py:123-129).  torch (CPU) is available in the image, so
we test directly against it.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from spegnet_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_dynamic,
    resize_matrix_np,
)


def torch_resize(x_np, out_hw, antialias=False):
    t = torch.from_numpy(x_np)[None, None] if x_np.ndim == 2 else torch.from_numpy(
        x_np.transpose(2, 0, 1)
    )[None]
    y = F.interpolate(
        t.float(), size=out_hw, mode="bilinear", align_corners=False, antialias=antialias
    )
    y = y[0].numpy()
    return y[0] if x_np.ndim == 2 else y.transpose(1, 2, 0)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((16, 16), (32, 32)),   # 2x upsample (decoder path)
        ((32, 32), (64, 64)),   # fusion upsample
        ((8, 8), (64, 64)),     # global-branch 1x1 -> full (well, 8->64)
        ((64, 64), (37, 53)),   # non-integer downsample
        ((33, 47), (64, 64)),   # ragged upsample
        ((64, 64), (64, 64)),   # identity
    ],
)
def test_static_resize_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((*in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    ref = torch_resize(x, out_hw)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((512, 512), (128, 128)), ((211, 317), (64, 96))])
def test_antialias_downsample_matches_torch(rng, in_hw, out_hw):
    x = rng.standard_normal((*in_hw, 3), dtype=np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, antialias=True))
    ref = torch_resize(x, out_hw, antialias=True)
    np.testing.assert_allclose(ours, ref, atol=3e-5, rtol=1e-4)


def test_antialias_matrix_rows_normalized():
    m = resize_matrix_np(512, 128, antialias=True)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)


@pytest.mark.parametrize("out_hw", [(100, 150), (64, 64), (128, 96), (7, 200)])
def test_dynamic_resize_matches_torch(rng, out_hw):
    x = rng.standard_normal((64, 64), dtype=np.float32)
    canvas = (128, 200)
    y, valid = resize_bilinear_dynamic(
        jnp.asarray(x), jnp.int32(out_hw[0]), jnp.int32(out_hw[1]), canvas
    )
    y, valid = np.asarray(y), np.asarray(valid)
    ref = torch_resize(x, out_hw)
    np.testing.assert_allclose(y[: out_hw[0], : out_hw[1]], ref, atol=2e-5, rtol=1e-5)
    # Outside the valid region everything is zero.
    assert np.all(y[out_hw[0]:, :] == 0) and np.all(y[:, out_hw[1]:] == 0)
    assert valid.sum() == out_hw[0] * out_hw[1]


def test_dynamic_resize_jits_with_traced_sizes(rng):
    import jax

    x = jnp.asarray(rng.standard_normal((32, 32), dtype=np.float32))

    @jax.jit
    def f(x, h, w):
        return resize_bilinear_dynamic(x, h, w, (96, 96))[0]

    y1 = f(x, jnp.int32(50), jnp.int32(70))
    y2 = f(x, jnp.int32(96), jnp.int32(96))
    assert y1.shape == y2.shape == (96, 96)
    ref = torch_resize(np.asarray(x), (50, 70))
    np.testing.assert_allclose(np.asarray(y1)[:50, :70], ref, atol=2e-5, rtol=1e-5)
