"""Native C++ data plane: parity vs the NumPy/scipy/cv2 references."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from spegnet_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_preprocess_matches_torch_antialias(rng):
    rgb = rng.integers(0, 256, (211, 317, 3), np.uint8)
    mean = np.asarray([0.485, 0.456, 0.406], np.float32)
    std = np.asarray([0.229, 0.224, 0.225], np.float32)
    ours = native.preprocess_image(rgb, 128, mean, std)
    t = torch.from_numpy(rgb.transpose(2, 0, 1)).float()[None] / 255.0
    ref = F.interpolate(t, size=(128, 128), mode="bilinear",
                        align_corners=False, antialias=True)[0]
    ref = (ref - torch.from_numpy(mean)[:, None, None]) / torch.from_numpy(std)[:, None, None]
    np.testing.assert_allclose(
        ours, ref.numpy().transpose(1, 2, 0), atol=1e-4, rtol=1e-4
    )


def test_preprocess_upscale(rng):
    rgb = rng.integers(0, 256, (40, 50, 3), np.uint8)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    ours = native.preprocess_image(rgb, 96, mean, std)
    t = torch.from_numpy(rgb.transpose(2, 0, 1)).float()[None] / 255.0
    ref = F.interpolate(t, size=(96, 96), mode="bilinear",
                        align_corners=False, antialias=True)[0]
    np.testing.assert_allclose(
        ours, ref.numpy().transpose(1, 2, 0), atol=1e-5, rtol=1e-4
    )


def test_edt_matches_scipy(rng):
    from scipy import ndimage

    for p in (0.97, 0.5, 0.02):
        fg = rng.random((70, 90)) > p
        if not fg.any():
            continue
        d, idx = native.edt_with_indices(fg)
        d_ref = ndimage.distance_transform_edt(~fg)
        np.testing.assert_allclose(d, d_ref, atol=1e-4)
        # indices must point at foreground pixels at exactly that distance
        oy, ox = idx // 90, idx % 90
        assert fg[oy, ox].all()
        yy, xx = np.mgrid[0:70, 0:90]
        d_implied = np.sqrt(((yy - oy) ** 2 + (xx - ox) ** 2).astype(np.float64))
        np.testing.assert_allclose(d_implied, d_ref, atol=1e-6)


def test_morphological_edges_match_cv2(rng):
    import cv2

    yy, xx = np.mgrid[0:64, 0:64]
    mask = ((((yy - 30) ** 2 + (xx - 34) ** 2) < 200).astype(np.uint8)) * 255
    ours = native.morphological_edges(mask, edge_width=1)
    k = np.ones((3, 3), np.uint8)
    ref = cv2.morphologyEx(
        cv2.subtract(cv2.dilate(mask, k), cv2.erode(mask, k)), cv2.MORPH_CLOSE, k
    )
    np.testing.assert_array_equal(ours, ref)


def test_native_wired_into_edt_for_canvas(rng):
    """edt_for_canvas must produce identical distances whichever backend."""
    from spegnet_tpu.metrics.jax_metrics import edt_for_canvas

    fg = (rng.random((50, 60)) > 0.95).astype(np.float32)
    dst, idx = edt_for_canvas(fg, (64, 64))
    from scipy import ndimage

    d_ref = ndimage.distance_transform_edt(~(fg > 0))
    np.testing.assert_allclose(dst[:50, :60], d_ref, atol=1e-4)
