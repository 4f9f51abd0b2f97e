"""upsample2x_conv3x3 must equal resize_bilinear(2x) -> conv3x3 exactly
(including the border rows/cols the composed form recomputes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spegnet_tpu.ops.fused_upsample_conv import upsample2x_conv3x3
from spegnet_tpu.ops.resize import resize_bilinear


def reference(x, kernel, bias):
    u = resize_bilinear(x, (2 * x.shape[1], 2 * x.shape[2]))
    y = jax.lax.conv_general_dilated(
        u, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + bias if bias is not None else y


@pytest.mark.parametrize("h,w,cin,cout", [
    (8, 8, 16, 8),
    (7, 11, 5, 9),     # odd sizes stress the border strips
    (16, 12, 32, 16),
    (2, 2, 3, 4),      # minimum size (border strips touch everything)
])
def test_matches_resize_then_conv(rng, h, w, cin, cout):
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)) * 0.2
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
    want = np.asarray(reference(x, k, b))
    got = np.asarray(upsample2x_conv3x3(x, k, b))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_gradients_match(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 8)).astype(np.float32)) * 0.2

    g1 = jax.grad(lambda x, k: jnp.sum(upsample2x_conv3x3(x, k) ** 2),
                  argnums=(0, 1))(x, k)
    g2 = jax.grad(lambda x, k: jnp.sum(reference(x, k, None) ** 2),
                  argnums=(0, 1))(x, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("form", ["poly", "resize", "primal", "hand", "hand2", "auto"])
@pytest.mark.parametrize("h,w,cin,cout", [
    (8, 8, 16, 8),
    (7, 11, 5, 9),     # odd sizes stress the border strips
    (2, 2, 3, 4),      # minimum size (border paste touches everything)
])
def test_bwd_forms_match(rng, monkeypatch, form, h, w, cin, cout):
    """Every selectable backward lowering — incl. the hand-formed one
    (selectable via _BWD_FORM, currently off: measured negative, see
    fused_upsample_conv.py) — computes the SAME gradient as autodiff of
    the resize reference."""
    import spegnet_tpu.ops.fused_upsample_conv as fuc

    monkeypatch.setattr(fuc, "_BWD_FORM", form)
    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)) * 0.2
    dy = jnp.asarray(rng.standard_normal(
        (2, 2 * h, 2 * w, cout)).astype(np.float32))

    def via_op(x, k):
        return jnp.sum(upsample2x_conv3x3(x, k) * dy)

    def via_ref(x, k):
        return jnp.sum(reference(x, k, None) * dy)

    g1 = jax.grad(via_op, argnums=(0, 1))(x, k)
    g2 = jax.grad(via_ref, argnums=(0, 1))(x, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)


@pytest.mark.parametrize("h,w,cin,cout", [
    (8, 8, 16, 8),
    (6, 10, 4, 9),     # non-square stresses the per-phase border paste
    (2, 2, 3, 4),      # minimum size (border strips touch everything)
])
def test_s2d_form_matches_resize_then_conv(rng, h, w, cin, cout):
    from spegnet_tpu.ops.fused_upsample_conv import (
        d2s_nhwc,
        upsample2x_conv3x3_s2d,
    )

    x = jnp.asarray(rng.standard_normal((2, h, w, cin)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)).astype(np.float32)) * 0.2
    b = jnp.asarray(rng.standard_normal((cout,)).astype(np.float32))
    want = np.asarray(reference(x, k, b))
    got = np.asarray(d2s_nhwc(upsample2x_conv3x3_s2d(x, k, b)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_sum_form_matches_sum_of_resize_then_conv(rng):
    from spegnet_tpu.ops.fused_upsample_conv import upsample2x_conv3x3_sum

    x1 = jnp.asarray(rng.standard_normal((2, 6, 10, 16)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((2, 6, 10, 4)).astype(np.float32))
    k1 = jnp.asarray(rng.standard_normal((3, 3, 16, 8)).astype(np.float32)) * 0.2
    k2 = jnp.asarray(rng.standard_normal((3, 3, 4, 8)).astype(np.float32)) * 0.2
    b = jnp.asarray(rng.standard_normal((8,)).astype(np.float32))
    want = np.asarray(reference(x1, k1, b)) + np.asarray(reference(x2, k2, None))
    got = np.asarray(upsample2x_conv3x3_sum([(x1, k1), (x2, k2)], bias=b))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_s2d_gradients_match(rng):
    from spegnet_tpu.ops.fused_upsample_conv import (
        d2s_nhwc,
        upsample2x_conv3x3_s2d,
    )

    x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 8)).astype(np.float32)) * 0.2

    g1 = jax.grad(lambda x, k: jnp.sum(
        d2s_nhwc(upsample2x_conv3x3_s2d(x, k)) ** 2), argnums=(0, 1))(x, k)
    g2 = jax.grad(lambda x, k: jnp.sum(reference(x, k, None) ** 2),
                  argnums=(0, 1))(x, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-4)
