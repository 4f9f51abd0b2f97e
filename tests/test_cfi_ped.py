"""Golden parity tests: JAX CFI/EFE/PED vs the reference PyTorch modules.

The reference's feature_integration.py and object_detection.py import only
torch, so we can execute them directly (read-only) on CPU and compare our
TPU-native modules output-for-output after importing the torch weights.
"""

import importlib.util
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from spegnet_tpu.models.cfi import AdaptiveAttentionFusion, EfficientASPP
from spegnet_tpu.models.ped import BoundaryAwareDecoder, EdgeDetectionModule
from spegnet_tpu.utils.torch_import import convert_spegnet_state_dict

REF = Path("/root/reference")


def _load_ref(module_path, name):
    spec = importlib.util.spec_from_file_location(name, str(REF / module_path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_fi = pytest.importorskip("torch") and _load_ref(
    "models/feature_integration.py", "ref_feature_integration"
)
ref_od = _load_ref("models/object_detection.py", "ref_object_detection")


def to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def to_nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def import_prefixed(torch_module, prefix):
    """Run a torch module's state_dict through the SPEGNet importer by
    prefixing keys the way the full model would."""
    sd = {f"{prefix}.{k}": v for k, v in torch_module.state_dict().items()}
    return convert_spegnet_state_dict(sd)


def test_fusion_parity(rng):
    torch.manual_seed(0)
    tmod = ref_fi.AdaptiveAttentionFusion([36, 72, 144], out_channels=64).eval()
    variables = import_prefixed(tmod, "fusion")
    jmod = AdaptiveAttentionFusion(out_channels=64)

    feats_nchw = [
        rng.standard_normal((2, 36, 16, 16), dtype=np.float32),
        rng.standard_normal((2, 72, 8, 8), dtype=np.float32),
        rng.standard_normal((2, 144, 4, 4), dtype=np.float32),
    ]
    with torch.no_grad():
        ref_out = tmod([torch.from_numpy(f) for f in feats_nchw]).numpy()
    ours = jmod.apply(
        {"params": variables["params"]["fusion"],
         "batch_stats": variables["batch_stats"]["fusion"]},
        [jnp.asarray(to_nhwc(f)) for f in feats_nchw],
    )
    np.testing.assert_allclose(to_nchw(np.asarray(ours)), ref_out, atol=2e-4, rtol=1e-3)


def test_easpp_parity(rng):
    torch.manual_seed(1)
    tmod = ref_fi.EfficientASPP(in_channels=64, out_channels=32, reduction_factor=4).eval()
    # Give BN stats non-trivial values so parity actually tests them.
    with torch.no_grad():
        for m in tmod.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    variables = import_prefixed(tmod, "context")
    jmod = EfficientASPP(in_channels=64, out_channels=32, reduction_factor=4)

    x = rng.standard_normal((2, 64, 16, 16), dtype=np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()
    ours = jmod.apply(
        {"params": variables["params"]["context"],
         "batch_stats": variables["batch_stats"]["context"]},
        jnp.asarray(to_nhwc(x)),
    )
    np.testing.assert_allclose(to_nchw(np.asarray(ours)), ref_out, atol=2e-4, rtol=1e-3)


def test_efe_parity(rng):
    torch.manual_seed(2)
    tmod = ref_od.EdgeDetectionModule(in_channels=32, out_channels=16).eval()
    variables = import_prefixed(tmod, "edge_detector")
    jmod = EdgeDetectionModule(out_channels=16)

    x = rng.standard_normal((2, 32, 16, 16), dtype=np.float32)
    with torch.no_grad():
        ref_map, ref_feat = tmod(torch.from_numpy(x))
    edge_map, edge_feat = jmod.apply(
        {"params": variables["params"]["edge_detector"],
         "batch_stats": variables["batch_stats"]["edge_detector"]},
        jnp.asarray(to_nhwc(x)),
    )
    np.testing.assert_allclose(
        to_nchw(np.asarray(edge_map)), ref_map.numpy(), atol=2e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        to_nchw(np.asarray(edge_feat)), ref_feat.numpy(), atol=2e-4, rtol=1e-3
    )


def test_decoder_parity(rng):
    torch.manual_seed(3)
    tmod = ref_od.BoundaryAwareDecoder(
        in_channels=32, decoder_channels=[32, 16, 8], n_classes=1,
        edge_channels_list=[8, 8, None],
    ).eval()
    variables = import_prefixed(tmod, "decoder")
    jmod = BoundaryAwareDecoder(decoder_channels=(32, 16, 8), n_classes=1)

    x = rng.standard_normal((2, 32, 8, 8), dtype=np.float32)
    edge = rng.standard_normal((2, 8, 8, 8), dtype=np.float32)
    with torch.no_grad():
        ref_preds = tmod(
            torch.from_numpy(x),
            [torch.from_numpy(edge), torch.from_numpy(edge), None],
        )
    ours = jmod.apply(
        {"params": variables["params"]["decoder"],
         "batch_stats": variables["batch_stats"]["decoder"]},
        jnp.asarray(to_nhwc(x)),
        jnp.asarray(to_nhwc(edge)),
    )
    assert len(ours) == 3
    for got, want in zip(ours, ref_preds):
        np.testing.assert_allclose(
            to_nchw(np.asarray(got)), want.numpy(), atol=5e-4, rtol=1e-3
        )


def test_easpp_grouped_fusion_semantics(rng):
    """The grouped 1x1 fuse must read *consecutive* channels per group
    (PyTorch semantics), not one channel per branch — §2.2.1 of the survey."""
    torch.manual_seed(4)
    tmod = ref_fi.EfficientASPP(in_channels=16, out_channels=8, reduction_factor=4).eval()
    # Make the fusion conv weights distinctive so a grouping mismatch shows.
    with torch.no_grad():
        tmod.fusion[0].weight.copy_(
            torch.arange(tmod.fusion[0].weight.numel(), dtype=torch.float32).reshape(
                tmod.fusion[0].weight.shape
            )
            / 10.0
        )
    variables = import_prefixed(tmod, "context")
    jmod = EfficientASPP(in_channels=16, out_channels=8, reduction_factor=4)
    x = rng.standard_normal((1, 16, 8, 8), dtype=np.float32)
    with torch.no_grad():
        ref_out = tmod(torch.from_numpy(x)).numpy()
    ours = jmod.apply(
        {"params": variables["params"]["context"],
         "batch_stats": variables["batch_stats"]["context"]},
        jnp.asarray(to_nhwc(x)),
    )
    np.testing.assert_allclose(to_nchw(np.asarray(ours)), ref_out, atol=2e-3, rtol=1e-3)
