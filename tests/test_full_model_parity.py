"""End-to-end model parity: full JAX SPEGNet vs a torch composition of the
reference's own CFI/EFE/PED modules + the torch Hiera oracle.

This is the strongest parity statement available without the external sam2
package: the torch side IS the reference code (feature_integration.py /
object_detection.py executed directly) wired exactly like the reference
composition root (models/spegnet.py:137-206), and the full state dict flows
through the production importer under the reference's key names.
"""

import importlib.util
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from spegnet_tpu.models.hiera import HIERA_VARIANTS, HieraConfig
from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig
from spegnet_tpu.utils.torch_import import convert_spegnet_state_dict
from tests.torch_hiera_oracle import TorchHiera

REF = Path("/root/reference")


def _load_ref(module_path, name):
    spec = importlib.util.spec_from_file_location(name, str(REF / module_path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


ref_fi = _load_ref("models/feature_integration.py", "ref_fi_full")
ref_od = _load_ref("models/object_detection.py", "ref_od_full")

SMALL = HieraConfig(
    embed_dim=8, num_heads=1, stages=(1, 2, 3, 1), global_att_blocks=(4,),
    window_pos_embed_bkg_spatial_size=(7, 7), window_spec=(8, 4, 4, 2),
)
HIERA_VARIANTS["_parity_small"] = SMALL


class TorchEncoderWrapper(nn.Module):
    """Mirrors HieraSAM2FeatureEncoder's structure: trunk at .encoder."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchHiera(
            embed_dim=SMALL.embed_dim, num_heads=SMALL.num_heads,
            stages=SMALL.stages,
            window_pos_embed_bkg_spatial_size=SMALL.window_pos_embed_bkg_spatial_size,
            window_spec=SMALL.window_spec, global_att_blocks=SMALL.global_att_blocks,
        )

    def forward(self, x):
        return self.encoder(x)


class TorchSPEGNet(nn.Module):
    """The reference composition (models/spegnet.py) over the oracle trunk."""

    def __init__(self):
        super().__init__()
        self.encoder = TorchEncoderWrapper()
        channels = [8, 16, 32, 64]
        self.fusion = ref_fi.AdaptiveAttentionFusion(channels[1:4], out_channels=32)
        self.context = ref_fi.EfficientASPP(
            in_channels=32, out_channels=16, reduction_factor=4
        )
        self.edge_detector = ref_od.EdgeDetectionModule(in_channels=16, out_channels=8)
        self.decoder = ref_od.BoundaryAwareDecoder(
            in_channels=16, decoder_channels=[16, 8, 4], n_classes=1,
            edge_channels_list=[8, 8, None],
        )

    def forward(self, x):
        features = self.encoder(x)
        fused = self.fusion([features[1], features[2], features[3]])
        context = self.context(fused)
        edge_map, edge_features = self.edge_detector(context)
        predictions = self.decoder(
            context, edge_features_list=[edge_features, edge_features, None]
        )
        return predictions, edge_map


def test_full_model_parity(rng):
    torch.manual_seed(0)
    tmodel = TorchSPEGNet().eval()
    with torch.no_grad():
        for p in tmodel.parameters():
            p.uniform_(-0.15, 0.15)
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    variables = convert_spegnet_state_dict(tmodel.state_dict())
    jmodel = SPEGNet(SPEGNetConfig(
        variant="_parity_small", fusion_channels=32, context_channels=16,
        edge_channels=8, decoder_channels=(16, 8, 4),
    ))

    x = rng.standard_normal((2, 3, 64, 64), dtype=np.float32) * 0.5
    with torch.no_grad():
        ref_preds, ref_edge = tmodel(torch.from_numpy(x))

    # Shape-validate the imported tree against the model's expected structure.
    from spegnet_tpu.utils.torch_import import validate_against

    expected = jax.eval_shape(
        jmodel.init, jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 64, 3), jnp.float32),
    )
    validate_against(
        variables,
        {"params": expected["params"], "batch_stats": expected["batch_stats"]},
    )

    out = jmodel.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
    )
    for got, want in zip(out["predictions"], ref_preds):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want.numpy(), atol=2e-3, rtol=1e-2)
    got_edge = np.transpose(np.asarray(out["edge"]), (0, 3, 1, 2))
    np.testing.assert_allclose(got_edge, ref_edge.numpy(), atol=2e-3, rtol=1e-2)


def test_importer_rejects_unknown_keys():
    import pytest

    with pytest.raises(ValueError, match="Unmapped"):
        convert_spegnet_state_dict({"bogus.layer.weight": np.zeros((1,))})
