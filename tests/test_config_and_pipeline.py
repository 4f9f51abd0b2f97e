"""Config precedence, canvas bucketing, prefetcher semantics, morphology."""

import numpy as np
import pytest
import yaml

from spegnet_tpu.config import load_config, overlay_checkpoint_config
from spegnet_tpu.data.pipeline import ImageProcessor, pick_canvas, _Prefetcher


def test_load_config_defaults(tmp_path):
    cfg_path = tmp_path / "c.yaml"
    cfg_path.write_text(yaml.dump({
        "model": {"encoder": {"variant": "large"}},
        "training": {"use_amp": True},
    }))
    cfg = load_config(cfg_path)
    assert cfg["model"]["compute_dtype"] == "bfloat16"  # use_amp -> bf16
    assert cfg["training"]["canvas_buckets"][0] == 512
    assert cfg["parallel"]["mesh"] == {"data": -1}

    cfg_path.write_text(yaml.dump({
        "model": {}, "training": {"use_amp": False},
    }))
    assert load_config(cfg_path)["model"]["compute_dtype"] == "float32"


def test_checkpoint_config_overlay():
    cfg = {"model": {"encoder": {"variant": "large"}, "a": 1}}
    out = overlay_checkpoint_config(cfg, {"model": {"encoder": {"variant": "test"}}})
    assert out["model"]["encoder"]["variant"] == "test"
    assert out["model"]["a"] == 1
    assert cfg["model"]["encoder"]["variant"] == "large"  # input untouched
    assert overlay_checkpoint_config(cfg, None) is cfg


def test_pick_canvas_buckets():
    sizes = np.asarray([[300, 500], [512, 400]])
    assert pick_canvas(sizes, [512, 1024]) == (512, 512)
    sizes = np.asarray([[600, 300]])
    assert pick_canvas(sizes, [512, 1024]) == (1024, 512)
    # beyond the last bucket: next multiple of 256
    sizes = np.asarray([[2100, 100]])
    assert pick_canvas(sizes, [512, 1024]) == (2304, 512)


def test_prefetcher_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = iter(_Prefetcher(lambda: gen(), depth=2))
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetcher_order():
    items = list(range(20))
    out = list(_Prefetcher(lambda: iter(items), depth=3))
    assert out == items


def test_image_processor_mask_threshold(tmp_path, rng):
    from PIL import Image

    arr = rng.integers(0, 256, (30, 40), np.uint8)
    p = tmp_path / "m.png"
    Image.fromarray(arr).save(p)
    mask = ImageProcessor(32).process_mask(str(p))
    np.testing.assert_array_equal(mask, (arr > 127.5).astype(np.float32))


def test_device_morphology_matches_native(rng):
    """Device-side dilate/erode edges vs the C++ (cv2-parity) path for
    interior masks."""
    import jax.numpy as jnp

    from spegnet_tpu import native
    from spegnet_tpu.ops.morphology import morphological_edges

    if not native.available():
        pytest.skip("native library not built")
    yy, xx = np.mgrid[0:48, 0:48]
    mask = (((yy - 24) ** 2 + (xx - 20) ** 2) < 120).astype(np.float32)
    dev = np.asarray(morphological_edges(jnp.asarray(mask)[None])[0])
    nat = native.morphological_edges((mask * 255).astype(np.uint8)) / 255.0
    np.testing.assert_array_equal(dev, nat)


def test_bitpack_roundtrip(rng):
    import jax.numpy as jnp

    from spegnet_tpu.ops.bitpack import pack_gt, unpack_gt

    a = (rng.random((3, 64, 40)) > 0.5).astype(np.uint8)
    p = pack_gt(a)
    assert p.shape == (3, 8, 40) and p.dtype == np.uint8
    out = np.asarray(unpack_gt(jnp.asarray(p)))
    np.testing.assert_array_equal(out, a)


def test_train_batch_uint8_gt_is_packed(tmp_path, rng):
    from PIL import Image

    from spegnet_tpu.data.pipeline import Sample, _make_train_batch
    from spegnet_tpu.ops.bitpack import unpack_gt
    import jax.numpy as jnp

    img = tmp_path / "i.jpg"
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(img)
    m = np.zeros((40, 40), np.uint8)
    m[8:30, 5:20] = 255
    mask = tmp_path / "m.png"
    Image.fromarray(m).save(mask)
    proc = ImageProcessor(target_size=64)
    s = Sample(str(img), str(mask), str(mask))
    tb8 = _make_train_batch([s], proc, [64], None,
                            image_dtype=np.uint8, gt_dtype=np.uint8)
    tbf = _make_train_batch([s], proc, [64], None)
    assert tb8.masks.shape == (1, 8, 64)
    np.testing.assert_array_equal(
        np.asarray(unpack_gt(jnp.asarray(tb8.masks))).astype(np.float32),
        tbf.masks)
